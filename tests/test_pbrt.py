import numpy as np

from fluctus_tpu.core.types import (
    BXDF_DIFFUSE, BXDF_GLOSSY, BXDF_IDEAL_DIELECTRIC, BXDF_IDEAL_REFLECTION)
from fluctus_tpu.scene.loaders.pbrt import load_pbrt
from fluctus_tpu.scene.scene import load_scene


PBRT_SCENE = """
LookAt 0 2 8  0 0 0  0 1 0
Camera "perspective" "float fov" [45]
Film "image" "integer xresolution" [64] "integer yresolution" [64]
WorldBegin
AttributeBegin
  Material "matte" "rgb Kd" [0.7 0.2 0.1]
  Translate 0 1 0
  Shape "trianglemesh"
    "point3 P" [-1 0 -1  1 0 -1  1 0 1  -1 0 1]
    "integer indices" [0 1 2  0 2 3]
AttributeEnd
AttributeBegin
  Material "glass" "float index" [1.6]
  Shape "trianglemesh"
    "point3 P" [-5 0 -5  5 0 -5  5 0 5]
    "integer indices" [0 1 2]
AttributeEnd
MakeNamedMaterial "shiny" "string type" "mirror" "rgb Kr" [0.95 0.95 0.95]
AttributeBegin
  NamedMaterial "shiny"
  Scale 2 2 2
  Rotate 90 0 1 0
  Shape "trianglemesh"
    "point3 P" [0 0 0  1 0 0  0 1 0]
    "integer indices" [0 1 2]
AttributeEnd
WorldEnd
"""


def test_pbrt_parse(tmp_path):
    f = tmp_path / "scene.pbrt"
    f.write_text(PBRT_SCENE)
    (v0, v1, v2, n0, n1, n2, uv0, uv1, uv2, mat_id, mats) = load_pbrt(str(f))
    assert len(v0) == 4  # 2 quad tris + 1 glass + 1 mirror
    types = [m.bsdf_type for m in mats]
    assert BXDF_DIFFUSE in types and BXDF_IDEAL_DIELECTRIC in types \
        and BXDF_IDEAL_REFLECTION in types
    # Translate applied to the quad (y==1)
    quad_tris = mat_id == 1
    assert np.allclose(v0[quad_tris][:, 1], 1.0)
    # Scale applied to the mirror tri (edge length 2)
    mirror = mat_id == 3
    e = np.linalg.norm(v1[mirror] - v0[mirror], axis=1)
    np.testing.assert_allclose(e, 2.0, rtol=1e-6)
    # glass index
    glass = mats[types.index(BXDF_IDEAL_DIELECTRIC)]
    assert glass.ni == 1.6


def test_pbrt_through_load_scene(tmp_path):
    f = tmp_path / "scene.pbrt"
    f.write_text(PBRT_SCENE)
    s = load_scene(str(f))
    assert s.n_tris == 4
    assert s.material_types_mask & BXDF_IDEAL_REFLECTION
    d = s.to_device()  # whole pipeline works on PBRT input
    assert d.geom.v0.shape == (4, 3)


def test_pbrt_roughness_remap(tmp_path):
    f = tmp_path / "r.pbrt"
    f.write_text("""
WorldBegin
Material "plastic" "rgb Kd" [.5 .5 .5] "rgb Ks" [.5 .5 .5] "float roughness" [0.1]
Shape "trianglemesh" "point3 P" [0 0 0 1 0 0 0 1 0] "integer indices" [0 1 2]
WorldEnd
""")
    *_, mat_id, mats = load_pbrt(str(f))
    glossy = [m for m in mats if m.bsdf_type == BXDF_GLOSSY][0]
    # reference convertRoughness: (1-0.1)*5000
    np.testing.assert_allclose(glossy.ns, 4500.0)


def test_pbrt_parse_cache_roundtrip(tmp_path):
    """Cached parse (reference .pbf analogue) returns identical data."""
    f = tmp_path / "c.pbrt"
    f.write_text("""
WorldBegin
Material "plastic" "rgb Kd" [.5 .4 .3] "rgb Ks" [.2 .2 .2] "float roughness" [0.2]
Shape "trianglemesh" "point3 P" [0 0 0 1 0 0 0 1 0] "integer indices" [0 1 2]
WorldEnd
""")
    cache = str(tmp_path / "cache")
    fresh = load_pbrt(str(f), cache_dir=cache)
    import os
    assert any(n.startswith("pbf_") for n in os.listdir(cache))
    cached = load_pbrt(str(f), cache_dir=cache)
    for a, b in zip(fresh[:10], cached[:10]):
        np.testing.assert_array_equal(a, b)
    assert [m for m in fresh[10]] == [m for m in cached[10]] or all(
        ma.kd == mb.kd and ma.ns == mb.ns and ma.bsdf_type == mb.bsdf_type
        for ma, mb in zip(fresh[10], cached[10]))
