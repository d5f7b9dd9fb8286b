"""Wavefront OBJ + MTL loader with the reference's `shader` extension.

Capability parity with the reference's tinyobjloader-based import
(reference: src/scene.cpp:191-301): positions/normals/texcoords, all face
index formats (v, v/vt, v//vn, v/vt/vn, negative indices), polygon fan
triangulation, per-face material ids shifted by +1 so id 0 is the default
material, MTL Kd/Ks/Ke/Ns/Ni/d and map_Kd/map_Ks/map_bump (bump treated as a
normal map), and the custom `shader <type>` MTL tag mapped to the 7-type BSDF
taxonomy (src/scene.cpp:171-189 parseShaderType).
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

from fluctus_tpu.core.types import (
    BXDF_DIFFUSE, BXDF_GLOSSY, BXDF_GGX_ROUGH_REFLECTION,
    BXDF_IDEAL_REFLECTION, BXDF_GGX_ROUGH_DIELECTRIC, BXDF_IDEAL_DIELECTRIC,
    BXDF_EMISSIVE,
)

SHADER_TYPES = {
    "diffuse": BXDF_DIFFUSE,
    "glossy": BXDF_GLOSSY,
    "rough_reflection": BXDF_GGX_ROUGH_REFLECTION,
    "ideal_reflection": BXDF_IDEAL_REFLECTION,
    "rough_dielectric": BXDF_GGX_ROUGH_DIELECTRIC,
    "ideal_dielectric": BXDF_IDEAL_DIELECTRIC,
    "emissive": BXDF_EMISSIVE,
}


@dataclass
class MtlMaterial:
    name: str
    kd: tuple = (0.8, 0.8, 0.8)
    ks: tuple = (0.0, 0.0, 0.0)
    ke: tuple = (0.0, 0.0, 0.0)
    ns: float = 0.0
    ni: float = 1.0
    map_kd: str = ""
    map_ks: str = ""
    map_bump: str = ""
    bsdf_type: int = BXDF_DIFFUSE


@dataclass
class ObjMesh:
    v0: np.ndarray
    v1: np.ndarray
    v2: np.ndarray
    n0: np.ndarray
    n1: np.ndarray
    n2: np.ndarray
    uv0: np.ndarray
    uv1: np.ndarray
    uv2: np.ndarray
    mat_id: np.ndarray          # per-face, 0-based into [default] + materials
    materials: list = field(default_factory=list)  # list[MtlMaterial]


def _unixify(path: str) -> str:
    """Windows MTL paths -> posix (reference: utils.cpp unixifyPath)."""
    return path.replace("\\", "/")


def parse_shader_type(name: str) -> int:
    """reference: src/scene.cpp:171-189 (unknown -> diffuse)."""
    return SHADER_TYPES.get(name, BXDF_DIFFUSE)


def load_mtl(path: str) -> list[MtlMaterial]:
    mats: list[MtlMaterial] = []
    if not os.path.exists(path):
        return mats
    cur = None
    with open(path, "r", errors="replace") as f:
        for raw in f:
            tok = raw.split()
            if not tok or raw.lstrip().startswith("#"):
                continue
            key = tok[0]
            if key == "newmtl":
                cur = MtlMaterial(name=tok[1] if len(tok) > 1 else "")
                mats.append(cur)
            elif cur is None:
                continue
            elif key == "Kd":
                cur.kd = tuple(float(x) for x in tok[1:4])
            elif key == "Ks":
                cur.ks = tuple(float(x) for x in tok[1:4])
            elif key == "Ke":
                cur.ke = tuple(float(x) for x in tok[1:4])
            elif key == "Ns":
                cur.ns = float(tok[1])
            elif key == "Ni":
                cur.ni = float(tok[1])
            elif key == "map_Kd":
                cur.map_kd = _unixify(tok[-1])
            elif key == "map_Ks":
                cur.map_ks = _unixify(tok[-1])
            elif key in ("map_bump", "bump", "map_Bump", "norm"):
                cur.map_bump = _unixify(tok[-1])
            elif key == "shader":
                cur.bsdf_type = parse_shader_type(tok[1])
    return mats


def _parse_index(s: str, n: int) -> int:
    i = int(s)
    return i - 1 if i > 0 else n + i


def load_obj(path: str) -> ObjMesh:
    folder = os.path.dirname(path)
    positions: list = []
    normals: list = []
    texcoords: list = []
    materials: list[MtlMaterial] = []
    mat_index = {}
    cur_mat = -1  # -1 -> default material (id 0 after +1 shift)

    fv, fn, ft, fm = [], [], [], []

    with open(path, "r", errors="replace") as f:
        for raw in f:
            tok = raw.split()
            if not tok or tok[0].startswith("#"):
                continue
            key = tok[0]
            if key == "v":
                positions.append((float(tok[1]), float(tok[2]), float(tok[3])))
            elif key == "vn":
                normals.append((float(tok[1]), float(tok[2]), float(tok[3])))
            elif key == "vt":
                texcoords.append((float(tok[1]),
                                  float(tok[2]) if len(tok) > 2 else 0.0))
            elif key == "f":
                corners = []
                for c in tok[1:]:
                    parts = c.split("/")
                    vi = _parse_index(parts[0], len(positions))
                    ti = _parse_index(parts[1], len(texcoords)) \
                        if len(parts) > 1 and parts[1] else -1
                    ni = _parse_index(parts[2], len(normals)) \
                        if len(parts) > 2 and parts[2] else -1
                    corners.append((vi, ti, ni))
                for j in range(1, len(corners) - 1):  # fan triangulation
                    tri = (corners[0], corners[j], corners[j + 1])
                    fv.append([c[0] for c in tri])
                    ft.append([c[1] for c in tri])
                    fn.append([c[2] for c in tri])
                    fm.append(cur_mat)
            elif key == "usemtl":
                name = tok[1] if len(tok) > 1 else ""
                cur_mat = mat_index.get(name, -1)
            elif key == "mtllib":
                mtl_path = os.path.join(folder, " ".join(tok[1:]))
                new = load_mtl(mtl_path)
                for m in new:
                    mat_index[m.name] = len(materials)
                    materials.append(m)

    pos = np.asarray(positions, np.float32).reshape(-1, 3)
    nrm = np.asarray(normals, np.float32).reshape(-1, 3) if normals \
        else np.zeros((0, 3), np.float32)
    uv = np.asarray(texcoords, np.float32).reshape(-1, 2) if texcoords \
        else np.zeros((0, 2), np.float32)

    fv_a = np.asarray(fv, np.int64)
    fn_a = np.asarray(fn, np.int64)
    ft_a = np.asarray(ft, np.int64)

    v0, v1, v2 = pos[fv_a[:, 0]], pos[fv_a[:, 1]], pos[fv_a[:, 2]]

    # Normals: per-vertex if all present, else face normal
    # (reference: src/scene.cpp:262-276)
    face_n = np.cross(v1 - v0, v2 - v0)
    face_n /= np.maximum(np.linalg.norm(face_n, axis=1, keepdims=True), 1e-20)
    have_n = (fn_a >= 0).all(axis=1) & (len(nrm) > 0)

    def pick_n(col):
        idx = np.where(fn_a[:, col] >= 0, fn_a[:, col], 0)
        base = nrm[idx] if len(nrm) else np.zeros_like(v0)
        return np.where(have_n[:, None], base, face_n).astype(np.float32)

    def pick_uv(col):
        idx = np.where(ft_a[:, col] >= 0, ft_a[:, col], 0)
        base = uv[idx] if len(uv) else np.zeros((len(fv_a), 2), np.float32)
        return np.where((ft_a[:, col] >= 0)[:, None], base, 0.0).astype(
            np.float32)

    return ObjMesh(
        v0=v0, v1=v1, v2=v2,
        n0=pick_n(0), n1=pick_n(1), n2=pick_n(2),
        uv0=pick_uv(0), uv1=pick_uv(1), uv2=pick_uv(2),
        mat_id=(np.asarray(fm, np.int32) + 1),  # -1 -> 0 = default material
        materials=materials,
    )
