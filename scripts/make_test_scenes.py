#!/usr/bin/env python
"""Generate synthetic test scenes (OBJ+MTL with the `shader` tag) standing in
for reference assets missing from this snapshot (luxball/conference/
country_kitchen ship only .mtl files): a luxball-style glossy+dielectric
ball on a glossy floor, and a Cornell-style box for area-light work.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def icosphere(subdiv=3, radius=1.0, center=(0, 0, 0)):
    t = (1.0 + 5 ** 0.5) / 2.0
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], np.float64)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = [(0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
             (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
             (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
             (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1)]
    verts = verts.tolist()
    cache = {}

    def midpoint(a, b):
        key = (min(a, b), max(a, b))
        if key in cache:
            return cache[key]
        m = np.asarray(verts[a]) + np.asarray(verts[b])
        m /= np.linalg.norm(m)
        verts.append(m.tolist())
        cache[key] = len(verts) - 1
        return cache[key]

    for _ in range(subdiv):
        new = []
        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new += [(a, ab, ca), (b, bc, ab), (c, ca, bc), (ab, bc, ca)]
        faces = new
    v = np.asarray(verts) * radius + np.asarray(center)
    return v, np.asarray(faces, np.int64)


def write_obj(path, objects, materials):
    """objects: list of (name, mat, verts, faces, normals_or_None[, uvs])
    — uvs (optional 6th element) are per-vertex (n, 2) texture coords."""
    mtl_path = os.path.splitext(path)[0] + ".mtl"
    with open(mtl_path, "w") as f:
        for name, props in materials.items():
            f.write(f"newmtl {name}\n")
            for k, v in props.items():
                if isinstance(v, tuple):
                    f.write(f"{k} {v[0]} {v[1]} {v[2]}\n")
                else:
                    f.write(f"{k} {v}\n")
            f.write("\n")
    with open(path, "w") as f:
        f.write(f"mtllib {os.path.basename(mtl_path)}\n")
        off = 1
        noff = 1
        toff = 1
        for obj in objects:
            name, mat, verts, faces, normals = obj[:5]
            uvs = obj[5] if len(obj) > 5 else None
            f.write(f"o {name}\nusemtl {mat}\n")
            for v in verts:
                f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
            if normals is not None:
                for n in normals:
                    f.write(f"vn {n[0]:.6f} {n[1]:.6f} {n[2]:.6f}\n")
            if uvs is not None:
                for t in uvs:
                    f.write(f"vt {t[0]:.6f} {t[1]:.6f}\n")
            for a, b, c in faces:
                def ref(i):
                    s = f"{i+off}"
                    s += f"/{i+toff}" if uvs is not None else "/"
                    if normals is not None:
                        s += f"/{i+noff}"
                    return s.rstrip("/")
                f.write(f"f {ref(a)} {ref(b)} {ref(c)}\n")
            if normals is not None:
                noff += len(normals)
            if uvs is not None:
                toff += len(uvs)
            off += len(verts)


def make_luxball(out_dir):
    """Glossy-coated dielectric ball on a glossy floor (luxball stand-in:
    exercises ideal_dielectric + glossy + MIS env, BASELINE config 2)."""
    sphere_v, sphere_f = icosphere(subdiv=3, radius=1.0, center=(0, 1.0, 0))
    normals = sphere_v - np.array([0, 1.0, 0])
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    inner_v, inner_f = icosphere(subdiv=2, radius=0.6, center=(0, 1.0, 0))
    in_n = (inner_v - np.array([0, 1.0, 0])) / 0.6
    floor_v = np.array([[-3, 0, -3], [3, 0, -3], [3, 0, 3], [-3, 0, 3]],
                       np.float64)
    floor_f = np.array([(0, 2, 1), (0, 3, 2)])
    mats = {
        "shell": {"Kd": (0.59, 0.63, 0.74), "Ks": (0.9, 0.9, 0.9),
                  "Ni": 1.5, "Ns": 500, "shader": "ideal_dielectric"},
        "core": {"Kd": (0.2, 0.3, 0.7), "Ks": (0.3, 0.3, 0.3),
                 "Ni": 1.5, "Ns": 200, "shader": "glossy"},
        "floor": {"Kd": (0.6, 0.58, 0.55), "Ks": (0.2, 0.2, 0.2),
                  "Ni": 1.4, "Ns": 80, "shader": "glossy"},
    }
    write_obj(os.path.join(out_dir, "luxball_proxy.obj"), [
        ("shell", "shell", sphere_v, sphere_f, normals),
        ("core", "core", inner_v, inner_f, in_n),
        ("floor", "floor", floor_v, floor_f, None),
    ], mats)


def make_cornell(out_dir):
    """Cornell-style box: area-light workloads + full BSDF mix
    (configs 2/3 stand-in)."""
    def quad(a, b, c, d):
        v = np.asarray([a, b, c, d], np.float64)
        return v, np.array([(0, 1, 2), (0, 2, 3)])

    s = 2.0
    objs = []
    fl, ff = quad((-s, 0, -s), (s, 0, -s), (s, 0, s), (-s, 0, s))
    objs.append(("floor", "white", fl, ff[:, ::-1], None))
    ce, cf = quad((-s, 2*s, -s), (s, 2*s, -s), (s, 2*s, s), (-s, 2*s, s))
    objs.append(("ceil", "white", ce, cf, None))
    bk, bf = quad((-s, 0, -s), (s, 0, -s), (s, 2*s, -s), (-s, 2*s, -s))
    objs.append(("back", "white", bk, bf, None))
    lw, lf = quad((-s, 0, -s), (-s, 2*s, -s), (-s, 2*s, s), (-s, 0, s))
    objs.append(("left", "red", lw, lf, None))
    rw, rf = quad((s, 0, -s), (s, 2*s, -s), (s, 2*s, s), (s, 0, s))
    objs.append(("right", "green", rw, rf[:, ::-1], None))
    ball_v, ball_f = icosphere(2, 0.7, (-0.7, 0.7, 0.3))
    bn = (ball_v - np.array([-0.7, 0.7, 0.3])) / 0.7
    objs.append(("ball", "mirror", ball_v, ball_f, bn))
    ball2_v, ball2_f = icosphere(2, 0.6, (0.9, 0.6, -0.6))
    b2n = (ball2_v - np.array([0.9, 0.6, -0.6])) / 0.6
    objs.append(("ball2", "ggx", ball2_v, ball2_f, b2n))
    mats = {
        "white": {"Kd": (0.73, 0.73, 0.73), "shader": "diffuse"},
        "red": {"Kd": (0.63, 0.06, 0.05), "shader": "diffuse"},
        "green": {"Kd": (0.14, 0.45, 0.09), "shader": "diffuse"},
        "mirror": {"Ks": (0.92, 0.92, 0.92), "shader": "ideal_reflection"},
        "ggx": {"Ks": (0.8, 0.6, 0.2), "Ni": 2.5, "Ns": 200,
                "shader": "rough_reflection"},
    }
    write_obj(os.path.join(out_dir, "cornell_proxy.obj"), objs, mats)


def _box(lo, hi):
    """Axis-aligned box: 8 verts x 3 copies (per-face normals), 12 tris,
    face-planar UVs."""
    lo = np.asarray(lo, np.float64)
    hi = np.asarray(hi, np.float64)
    verts, normals, uvs, faces = [], [], [], []
    ext = hi - lo
    axes = [((0, 1, 2), 1), ((1, 2, 0), 1), ((2, 0, 1), 1)]
    for (a, b, c), _ in axes:
        for side in (0, 1):
            n = np.zeros(3)
            n[a] = 1.0 if side else -1.0
            base = len(verts)
            for (ub, vb) in ((0, 0), (1, 0), (1, 1), (0, 1)):
                p = np.zeros(3)
                p[a] = hi[a] if side else lo[a]
                p[b] = lo[b] + ub * ext[b]
                p[c] = lo[c] + vb * ext[c]
                verts.append(p)
                normals.append(n.copy())
                uvs.append((ub * ext[b], vb * ext[c]))
            order = [(0, 1, 2), (0, 2, 3)] if side else [(0, 2, 1),
                                                         (0, 3, 2)]
            for f in order:
                faces.append(tuple(base + i for i in f))
    return (np.asarray(verts), np.asarray(faces, np.int64),
            np.asarray(normals), np.asarray(uvs))


def _make_textures(out_dir):
    """Procedural texture PNGs: checkerboard floor tiles + wood grain +
    a ripple normal map (exercises map_Kd + map_bump, SURVEY §2.5)."""
    from PIL import Image
    rng = np.random.default_rng(7)
    n = 256
    yy, xx = np.mgrid[0:n, 0:n] / n

    check = ((np.floor(xx * 8) + np.floor(yy * 8)) % 2)
    base = np.stack([0.75 - 0.45 * check, 0.72 - 0.40 * check,
                     0.66 - 0.34 * check], -1)
    base += rng.normal(0, 0.02, base.shape)
    Image.fromarray((np.clip(base, 0, 1) ** (1 / 2.2) * 255)
                    .astype(np.uint8)).save(
        os.path.join(out_dir, "kitchen_floor.png"))

    grain = np.sin(xx * 40 + 3 * np.sin(yy * 6)) * 0.5 + 0.5
    wood = np.stack([0.45 + 0.25 * grain, 0.27 + 0.15 * grain,
                     0.12 + 0.06 * grain], -1)
    wood += rng.normal(0, 0.015, wood.shape)
    Image.fromarray((np.clip(wood, 0, 1) ** (1 / 2.2) * 255)
                    .astype(np.uint8)).save(
        os.path.join(out_dir, "kitchen_wood.png"))

    # tangent-space ripple normal map for the floor
    h = 0.05 * np.sin(xx * 50) * np.sin(yy * 50)
    gy, gx = np.gradient(h)
    nrm = np.stack([-gx * 40, -gy * 40, np.ones_like(h)], -1)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    Image.fromarray(((nrm * 0.5 + 0.5) * 255).astype(np.uint8)).save(
        os.path.join(out_dir, "kitchen_floor_n.png"))


def make_kitchen(out_dir):
    """Config-3 protocol stand-in (country_kitchen-class: the reference
    snapshot ships only its .mtl): a CLOSED textured interior exercising
    the full 7-type BSDF taxonomy, map_Kd/map_bump textures, and 8-bounce
    indirect light — lit by a rectangular area light (reference protocol:
    src/tracer.cpp:384-389 renders Country-Kitchen.obj)."""
    _make_textures(out_dir)
    objs = []
    w, d, h = 5.0, 4.0, 2.8           # room extents

    def quad(a, b, c, dd, nrm, uv_scale=1.0):
        v = np.asarray([a, b, c, dd], np.float64)
        f = np.array([(0, 1, 2), (0, 2, 3)])
        n = np.tile(np.asarray(nrm, np.float64), (4, 1))
        e1 = np.linalg.norm(v[1] - v[0])
        e2 = np.linalg.norm(v[3] - v[0])
        uv = np.array([(0, 0), (e1, 0), (e1, e2), (0, e2)]) * uv_scale
        return v, f, n, uv

    objs.append(("floor", "floor",
                 *quad((0, 0, 0), (w, 0, 0), (w, 0, d), (0, 0, d),
                       (0, 1, 0))))
    objs.append(("ceil", "plaster",
                 *quad((0, h, 0), (0, h, d), (w, h, d), (w, h, 0),
                       (0, -1, 0))))
    objs.append(("wall_n", "plaster",
                 *quad((0, 0, 0), (0, h, 0), (w, h, 0), (w, 0, 0),
                       (0, 0, 1))))
    objs.append(("wall_s", "plaster",
                 *quad((0, 0, d), (w, 0, d), (w, h, d), (0, h, d),
                       (0, 0, -1))))
    objs.append(("wall_w", "plaster",
                 *quad((0, 0, 0), (0, 0, d), (0, h, d), (0, h, 0),
                       (1, 0, 0))))
    objs.append(("wall_e", "plaster",
                 *quad((w, 0, 0), (w, h, 0), (w, h, d), (w, 0, d),
                       (-1, 0, 0))))

    # counters + table + shelf (textured wood boxes)
    for i, (lo, hi) in enumerate([
            ((0.1, 0.0, 0.1), (2.6, 0.9, 0.7)),     # counter run
            ((0.1, 0.0, 3.3), (1.4, 0.9, 3.9)),     # island
            ((3.0, 0.0, 2.6), (4.4, 0.75, 3.6)),    # table
            ((0.1, 1.6, 0.1), (1.8, 1.75, 0.5)),    # shelf
            ((4.6, 0.0, 0.1), (4.9, 1.9, 0.9))]):   # cabinet
        objs.append((f"wood{i}", "wood", *_box(lo, hi)))

    # props: full BSDF coverage on curved geometry
    def ball(name, mat, c, r, sub=4):
        v, f = icosphere(sub, r, c)
        n = (v - np.asarray(c)) / r
        return (name, mat, v, f, n)

    objs.append(ball("pot", "steel", (0.7, 1.05, 0.4), 0.15))
    objs.append(ball("kettle", "brushed", (1.6, 1.03, 0.4), 0.13))
    objs.append(ball("glass", "glass", (3.4, 0.89, 3.0), 0.14))
    objs.append(ball("vase", "ceramic", (3.9, 0.92, 3.2), 0.17))
    objs.append(ball("apple", "apple", (1.0, 0.97, 3.6), 0.07, sub=3))
    objs.append(ball("orange", "orange", (0.8, 0.97, 3.5), 0.07, sub=3))
    objs.append(ball("jug", "frosted", (0.4, 1.87, 0.3), 0.11, sub=3))
    objs.append(ball("bulb_fix", "steel", (2.5, 2.6, 2.0), 0.08, sub=3))

    mats = {
        "floor": {"Kd": (0.8, 0.8, 0.8), "map_Kd": "kitchen_floor.png",
                  "map_bump": "kitchen_floor_n.png",
                  "shader": "diffuse"},
        "plaster": {"Kd": (0.70, 0.67, 0.60), "shader": "diffuse"},
        "wood": {"Kd": (0.8, 0.8, 0.8), "map_Kd": "kitchen_wood.png",
                 "Ks": (0.15, 0.15, 0.15), "Ni": 1.45, "Ns": 60,
                 "shader": "glossy"},
        "steel": {"Ks": (0.85, 0.86, 0.88), "shader": "ideal_reflection"},
        "brushed": {"Ks": (0.7, 0.68, 0.65), "Ni": 2.7, "Ns": 300,
                    "shader": "rough_reflection"},
        "glass": {"Ks": (0.95, 0.95, 0.95), "Ni": 1.5,
                  "shader": "ideal_dielectric"},
        "frosted": {"Ks": (0.9, 0.9, 0.9), "Ni": 1.5, "Ns": 400,
                    "shader": "rough_dielectric"},
        "ceramic": {"Kd": (0.26, 0.42, 0.55), "Ks": (0.4, 0.4, 0.4),
                    "Ni": 1.5, "Ns": 150, "shader": "glossy"},
        "apple": {"Kd": (0.55, 0.08, 0.05), "Ks": (0.3, 0.3, 0.3),
                  "Ni": 1.4, "Ns": 120, "shader": "glossy"},
        "orange": {"Kd": (0.8, 0.35, 0.04), "shader": "diffuse"},
    }
    write_obj(os.path.join(out_dir, "kitchen_proxy.obj"), objs, mats)
    n_tris = sum(len(o[3]) for o in objs)
    print(f"kitchen_proxy.obj: {n_tris} tris, {len(mats)} materials")


def _tube(p0, p1, r, seg=16):
    """Closed cylinder between p0 and p1 (2*seg side tris + 2*seg caps)."""
    p0 = np.asarray(p0, np.float64)
    p1 = np.asarray(p1, np.float64)
    ax = p1 - p0
    ln = np.linalg.norm(ax)
    ax = ax / ln
    helper = np.array([0.0, 0.0, 1.0]) if abs(ax[2]) < 0.9 \
        else np.array([1.0, 0.0, 0.0])
    u = np.cross(ax, helper)
    u /= np.linalg.norm(u)
    v = np.cross(ax, u)
    ang = np.linspace(0, 2 * np.pi, seg, endpoint=False)
    ring = (np.cos(ang)[:, None] * u + np.sin(ang)[:, None] * v) * r
    verts = np.concatenate([p0 + ring, p1 + ring, [p0], [p1]])
    normals = np.concatenate([ring / r, ring / r, [-ax], [ax]])
    faces = []
    for i in range(seg):
        j = (i + 1) % seg
        faces += [(i, j, seg + i), (j, seg + j, seg + i)]
        faces += [(2 * seg, j, i), (2 * seg + 1, seg + i, seg + j)]
    return verts, np.asarray(faces, np.int64), normals


def make_conference(out_dir, chairs_x=7, chairs_z=6, cushion_sub=4):
    """Conference-class protocol stand-in (the reference snapshot ships
    only conference.mtl; its benchmark renders conference.obj,
    src/tracer.cpp:384-389): a LARGE FLAT INDOOR room with many
    materials — long table, chair rows with dense cushions, wall/door
    panels, skirting, ceiling light fixtures — the "large flat interior,
    many materials" workload class missing from the 5-scene protocol
    (VERDICT r4 missing 1). ~250k tris at the defaults."""
    objs = []
    w, d, h = 10.0, 7.0, 3.0          # room extents (x, z, y-height)

    def quad(a, b, c, dd, nrm, uv_scale=1.0):
        v = np.asarray([a, b, c, dd], np.float64)
        f = np.array([(0, 1, 2), (0, 2, 3)])
        n = np.tile(np.asarray(nrm, np.float64), (4, 1))
        return v, f, n

    objs.append(("floor", "floor",
                 *quad((0, 0, 0), (w, 0, 0), (w, 0, d), (0, 0, d),
                       (0, 1, 0))))
    objs.append(("ceil", "ceiling",
                 *quad((0, h, 0), (0, h, d), (w, h, d), (w, h, 0),
                       (0, -1, 0))))
    objs.append(("wall_n", "grey_wall",
                 *quad((0, 0, 0), (0, h, 0), (w, h, 0), (w, 0, 0),
                       (0, 0, 1))))
    objs.append(("wall_s", "grey_wall",
                 *quad((0, 0, d), (w, 0, d), (w, h, d), (0, h, d),
                       (0, 0, -1))))
    objs.append(("wall_w", "brown_wall",
                 *quad((0, 0, 0), (0, 0, d), (0, h, d), (0, h, 0),
                       (1, 0, 0))))
    objs.append(("wall_e", "brown_wall",
                 *quad((w, 0, 0), (w, h, 0), (w, h, d), (w, 0, d),
                       (-1, 0, 0))))
    # skirting boards + door + wall screen (the many-flat-materials mix)
    for i, (lo, hi, m) in enumerate([
            (((0.0, 0.0, 0.02), (w, 0.12, 0.06)), None, "skirting"),
            (((0.0, 0.0, d - 0.06), (w, 0.12, d - 0.02)), None, "skirting"),
            (((0.02, 0.0, 0.0), (0.06, 0.12, d)), None, "skirting"),
            (((w - 0.06, 0.0, 0.0), (w - 0.02, 0.12, d)), None, "skirting"),
            (((0.05, 0.0, 2.6), (0.1, 2.2, 3.6)), None, "door"),
            (((w - 0.1, 0.8, 2.0), (w - 0.05, 2.4, 5.0)), None, "screen"),
    ]):
        (lo, hi) = lo
        objs.append((f"panel{i}", m, *_box(lo, hi)[:3]))

    # conference table: big rounded top on tube legs
    tv, tf, tn = _box((2.0, 0.72, 2.2), (8.0, 0.80, 4.8))[:3]
    objs.append(("table_top", "table", tv, tf, tn))
    for lx in (2.4, 7.6):
        for lz in (2.6, 4.4):
            v, f, n = _tube((lx, 0.0, lz), (lx, 0.72, lz), 0.06, seg=24)
            objs.append((f"tleg{lx}{lz}", "chrome", v, f, n))

    # chair rows around the table: tube frames + subdivided cushions
    # (cushions carry the triangle density of the reference's chairs)
    cushion_mats = ["cush_red", "cush_blue", "cush_green"]
    ci = 0
    xs = np.linspace(2.5, 7.5, chairs_x)
    zs = [1.4, 5.6]
    positions = [(x, z) for z in zs for x in xs]
    zs2 = np.linspace(2.8, 4.2, chairs_z - 2) if chairs_z > 2 else []
    positions += [(1.2, z) for z in zs2] + [(8.8, z) for z in zs2]
    for cx, cz in positions:
        facing = 1.0 if cz < d / 2 else -1.0
        mat = cushion_mats[ci % len(cushion_mats)]
        ci += 1
        # seat + back cushions: squashed icospheres
        sv, sf = icosphere(cushion_sub, 1.0, (0, 0, 0))
        seat = sv * np.array([0.22, 0.06, 0.2]) + np.array([cx, 0.46, cz])
        sn = sv / np.linalg.norm(sv, axis=1, keepdims=True)
        objs.append((f"seat{ci}", mat, seat, sf, sn))
        back = sv * np.array([0.2, 0.24, 0.05]) + np.array(
            [cx, 0.85, cz - facing * 0.18])
        objs.append((f"back{ci}", mat, back, sf, sn))
        # frame: 4 legs + 2 back struts
        for dx in (-0.16, 0.16):
            for dz in (-0.14, 0.14):
                v, f, n = _tube((cx + dx, 0.0, cz + dz),
                                (cx + dx, 0.44, cz + dz), 0.018, seg=12)
                objs.append((f"leg{ci}{dx}{dz}", "chrome", v, f, n))
            v, f, n = _tube(
                (cx + dx, 0.44, cz - facing * 0.16),
                (cx + dx, 1.05, cz - facing * 0.2), 0.016, seg=12)
            objs.append((f"strut{ci}{dx}", "chrome", v, f, n))

    # ceiling light fixtures (emissive-looking steel troughs; actual
    # illumination comes from the committed area-light state)
    for i, lx in enumerate(np.linspace(2.0, 8.0, 3)):
        objs.append((f"lightbox{i}", "fixture",
                     *_box((lx - 0.6, h - 0.08, 2.8),
                           (lx + 0.6, h - 0.02, 4.2))[:3]))

    mats = {
        # taxonomy mirrors conference.mtl's flat-material mix (grey/brown
        # walls, floor, ceiling, skirting, door; reference materials 0-8)
        "grey_wall": {"Kd": (0.64, 0.60, 0.61), "shader": "diffuse"},
        "brown_wall": {"Kd": (0.64, 0.40, 0.13), "shader": "diffuse"},
        "floor": {"Kd": (0.38, 0.12, 0.12), "Ks": (0.2, 0.1, 0.1),
                  "Ni": 1.45, "Ns": 302, "shader": "glossy"},
        "ceiling": {"Kd": (0.9, 0.9, 0.9), "shader": "diffuse"},
        "skirting": {"Kd": (0.37, 0.17, 0.17), "Ks": (0.4, 0.2, 0.2),
                     "Ni": 1.45, "Ns": 302, "shader": "glossy"},
        "door": {"Kd": (0.74, 0.40, 0.16), "Ks": (0.3, 0.3, 0.3),
                 "Ni": 1.45, "Ns": 602, "shader": "glossy"},
        "screen": {"Kd": (0.05, 0.05, 0.06), "Ks": (0.4, 0.4, 0.4),
                   "Ni": 1.8, "Ns": 900, "shader": "glossy"},
        "table": {"Kd": (0.30, 0.16, 0.08), "Ks": (0.35, 0.3, 0.25),
                  "Ni": 1.5, "Ns": 250, "shader": "glossy"},
        "chrome": {"Ks": (0.8, 0.81, 0.83), "Ni": 2.7, "Ns": 1200,
                   "shader": "rough_reflection"},
        "fixture": {"Ks": (0.9, 0.9, 0.9), "shader": "ideal_reflection"},
        "cush_red": {"Kd": (0.45, 0.10, 0.10), "shader": "diffuse"},
        "cush_blue": {"Kd": (0.12, 0.18, 0.42), "shader": "diffuse"},
        "cush_green": {"Kd": (0.12, 0.35, 0.15), "shader": "diffuse"},
    }
    write_obj(os.path.join(out_dir, "conference_proxy.obj"), objs, mats)
    n_tris = sum(len(o[3]) for o in objs)
    print(f"conference_proxy.obj: {n_tris} tris, {len(mats)} materials")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--out-dir", default="assets")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    make_luxball(args.out_dir)
    make_cornell(args.out_dir)
    make_kitchen(args.out_dir)
    make_conference(args.out_dir)
    print(f"wrote luxball_proxy + cornell_proxy + kitchen_proxy + "
          f"conference_proxy to {args.out_dir}")
