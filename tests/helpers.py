"""Shared test scene builders."""
from __future__ import annotations

import numpy as np

from fluctus_tpu.scene.envmap import compute_tables
from fluctus_tpu.scene.loaders.obj import MtlMaterial
from fluctus_tpu.scene.scene import HostScene, default_material
from fluctus_tpu.scene.textures import TexturePool


def make_host_scene(v0, v1, v2, materials=None, mat_id=None, env_image=None,
                    normals=None):
    m = len(v0)
    if normals is None:
        n = np.cross(v1 - v0, v2 - v0)
        n = n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-20)
        n0 = n1 = n2 = n.astype(np.float32)
    else:
        n0 = n1 = n2 = np.asarray(normals, np.float32)
    z2 = np.zeros((m, 2), np.float32)
    scene = HostScene(
        v0=np.asarray(v0, np.float32), v1=np.asarray(v1, np.float32),
        v2=np.asarray(v2, np.float32), n0=n0, n1=n1, n2=n2,
        uv0=z2, uv1=z2, uv2=z2,
        mat_id=np.asarray(mat_id if mat_id is not None else np.zeros(m),
                          np.int32),
        materials=materials or [default_material()],
        textures=TexturePool())
    if env_image is not None:
        scene.envmap = compute_tables(np.asarray(env_image, np.float32))
    return scene


def big_quad(y=0.0, half=100.0):
    """Two triangles forming a huge horizontal quad at height y, normal +y."""
    v = np.array([[-half, y, -half], [half, y, -half],
                  [half, y, half], [-half, y, half]], np.float32)
    v0 = np.stack([v[0], v[0]])
    v1 = np.stack([v[2], v[3]])
    v2 = np.stack([v[1], v[2]])
    return v0, v1, v2


def diffuse_material(kd=(0.6, 0.6, 0.6)):
    return MtlMaterial(name="d", kd=kd, ks=(0, 0, 0), ns=0.0, ni=0.0)
