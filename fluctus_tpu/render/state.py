"""Camera/light/render-state persistence + picking.

Capability parity with the reference's state system: the symmetric
read/write of camera, area light, env strength and sampling params keyed by
scene hash (reference: src/tracer.cpp:634-687 iterateStateItems, F2/F3
keys) — JSON instead of a raw binary struct dump — and the DoF focus pick
(reference: src/tracer.cpp:689-718 pickDofDepth, src/kernel_pick.cl).
"""
from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from fluctus_tpu.core.types import (AreaLight, Camera, RenderParams)

STATE_DIR = "data/states"


def _arr(x):
    return np.asarray(x).tolist()


def save_state(params: RenderParams, scene_hash: str,
               state_dir: str = STATE_DIR) -> str:
    os.makedirs(state_dir, exist_ok=True)
    path = os.path.join(state_dir, f"state_{scene_hash}.json")
    cam = params.camera
    al = params.area_light
    data = {
        "camera": {
            "pos": _arr(cam.pos), "dir": _arr(cam.dir), "up": _arr(cam.up),
            "right": _arr(cam.right), "fov": float(cam.fov),
            "aperture_size": float(cam.aperture_size),
            "focal_dist": float(cam.focal_dist),
        },
        "area_light": {
            "pos": _arr(al.pos), "right": _arr(al.right), "up": _arr(al.up),
            "normal": _arr(al.normal), "emission": _arr(al.emission),
            "size": _arr(al.size),
        },
        "env_strength": float(params.env_strength),
        "exposure": float(params.exposure),
    }
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    return path


def load_state(params: RenderParams, scene_hash: str,
               state_dir: str = STATE_DIR) -> RenderParams:
    """Returns params updated from the saved state, or unchanged when no
    state exists (reference behavior on missing state file)."""
    path = os.path.join(state_dir, f"state_{scene_hash}.json")
    if not os.path.exists(path):
        return params
    with open(path) as f:
        d = json.load(f)
    c = d["camera"]
    cam = Camera(
        pos=jnp.asarray(c["pos"], jnp.float32),
        dir=jnp.asarray(c["dir"], jnp.float32),
        up=jnp.asarray(c["up"], jnp.float32),
        right=jnp.asarray(c["right"], jnp.float32),
        fov=jnp.float32(c["fov"]),
        aperture_size=jnp.float32(c["aperture_size"]),
        focal_dist=jnp.float32(c["focal_dist"]))
    a = d["area_light"]
    al = AreaLight(
        pos=jnp.asarray(a["pos"], jnp.float32),
        right=jnp.asarray(a["right"], jnp.float32),
        up=jnp.asarray(a["up"], jnp.float32),
        normal=jnp.asarray(a["normal"], jnp.float32),
        emission=jnp.asarray(a["emission"], jnp.float32),
        size=jnp.asarray(a["size"], jnp.float32))
    return params.replace(camera=cam, area_light=al,
                          env_strength=jnp.float32(d["env_strength"]),
                          exposure=jnp.float32(d["exposure"]))


def pick(scene, params, cfg, ndc_x: float, ndc_y: float):
    """Trace one ray through NDC coords; returns (t, prim) — the reference's
    picking path (kernel_pick.cl via CLContext::pickSingle). Used for
    click-to-focus: params.camera.focal_dist := t on a hit."""
    from fluctus_tpu.integrators import common
    from fluctus_tpu.core import vecmath as vm

    cam = params.camera
    scr_x = (2.0 * ndc_x - 1.0) * (cfg.width / cfg.height)
    scr_y = 2.0 * ndc_y - 1.0
    scale = jnp.tan(jnp.deg2rad(0.5 * cam.fov))
    target = (cam.pos + cam.right * scr_x * scale + cam.up * scr_y * scale
              + cam.dir)
    d = vm.normalize(target - cam.pos)[None, :]
    o = jnp.broadcast_to(cam.pos, (1, 3))
    hit = common.trace_scene(scene, params, cfg, o, d)
    return float(hit.t[0]), int(hit.prim[0])


def pick_dof_depth(scene, params, cfg, ndc_x=0.5, ndc_y=0.5) -> RenderParams:
    """Click-to-focus (reference: src/tracer.cpp:706-718)."""
    t, prim = pick(scene, params, cfg, ndc_x, ndc_y)
    if prim >= 0:
        cam = params.camera.replace(focal_dist=jnp.float32(t))
        params = params.replace(camera=cam)
    return params
