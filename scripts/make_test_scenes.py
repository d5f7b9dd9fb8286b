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
    """objects: list of (name, mat, verts, faces, normals_or_None)."""
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
        for name, mat, verts, faces, normals in objects:
            f.write(f"o {name}\nusemtl {mat}\n")
            for v in verts:
                f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
            if normals is not None:
                for n in normals:
                    f.write(f"vn {n[0]:.6f} {n[1]:.6f} {n[2]:.6f}\n")
                for a, b, c in faces:
                    f.write(f"f {a+off}//{a+noff} {b+off}//{b+noff} "
                            f"{c+off}//{c+noff}\n")
                noff += len(normals)
            else:
                for a, b, c in faces:
                    f.write(f"f {a+off} {b+off} {c+off}\n")
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


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--out-dir", default="assets")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    make_luxball(args.out_dir)
    make_cornell(args.out_dir)
    print(f"wrote luxball_proxy.obj + cornell_proxy.obj to {args.out_dir}")
