import numpy as np

from fluctus_tpu.core.types import BXDF_DIFFUSE, BXDF_GLOSSY
from fluctus_tpu.scene.loaders.obj import load_mtl, load_obj, parse_shader_type
from fluctus_tpu.scene.loaders.ply import load_ply
from fluctus_tpu.scene.scene import load_scene

TEAPOT = "/root/reference/assets/teapot.ply"
EGYPTCAT = "/root/reference/assets/egyptcat/egyptcat.obj"


def test_teapot_ply():
    v0, v1, v2, n0, n1, n2, *_ = load_ply(TEAPOT)
    assert len(v0) > 1000
    assert np.isfinite(v0).all()
    # normals ~unit
    ln = np.linalg.norm(n0, axis=1)
    np.testing.assert_allclose(ln, 1.0, atol=1e-2)


def test_egyptcat_obj_with_materials():
    mesh = load_obj(EGYPTCAT)
    assert len(mesh.v0) > 10000
    names = [m.name for m in mesh.materials]
    assert "egyptcat" in names
    cat = mesh.materials[names.index("egyptcat")]
    # `shader glossy` tag (reference custom MTL extension)
    assert cat.bsdf_type == BXDF_GLOSSY
    assert cat.map_kd == "EgyptCat.png"
    assert cat.ni == 1.8
    # default material is id 0; per-face ids shifted +1
    assert mesh.mat_id.min() >= 0
    assert mesh.mat_id.max() <= len(mesh.materials)


def test_shader_type_mapping():
    assert parse_shader_type("diffuse") == BXDF_DIFFUSE
    assert parse_shader_type("glossy") == BXDF_GLOSSY
    assert parse_shader_type("unknown_thing") == BXDF_DIFFUSE


def test_obj_face_formats(tmp_path):
    obj = tmp_path / "t.obj"
    obj.write_text("""
v 0 0 0
v 1 0 0
v 0 1 0
v 1 1 0
vn 0 0 1
vt 0 0
vt 1 0
vt 0 1
f 1 2 3
f 1/1 2/2 3/3
f 1//1 2//1 3//1
f 1/1/1 2/2/1 3/3/1
f -4 -3 -2
f 1 2 3 4
""")
    mesh = load_obj(str(obj))
    # 5 tri faces + 1 quad -> 2 = 7 triangles
    assert len(mesh.v0) == 7
    assert np.isfinite(mesh.n0).all()


def test_load_scene_dispatch():
    s = load_scene(TEAPOT)
    assert s.n_tris > 1000
    assert len(s.materials) == 1  # default only
    assert s.materials[0].kd == (0.64, 0.64, 0.64)  # reference default
    assert s.world_radius() > 0
    assert s.hash != ""

    s2 = load_scene(EGYPTCAT)
    assert s2.material_types_mask & BXDF_GLOSSY
    # textures imported + atlas packs
    data, offs, ws, hs = s2.textures.pack()
    assert data.size >= 4


def test_scene_to_device():
    s = load_scene(TEAPOT)
    s.build_bvh(cache_dir=None, use_sbvh=False)
    d = s.to_device()
    assert d.geom.v0.shape == (s.n_tris, 3)
    assert d.bvh.node_lo.shape[0] == s.bvh.n_nodes
    assert d.envmap.image.shape == (1, 1, 3)  # dummy env


def test_bvh_cache_roundtrip(tmp_path):
    s = load_scene(TEAPOT)
    cache = str(tmp_path)
    s.build_bvh(cache_dir=cache, use_sbvh=False)
    nodes1 = s.bvh.node_lo.copy()
    s.bvh = None
    s.build_bvh(cache_dir=cache, use_sbvh=False)  # loads from cache
    np.testing.assert_array_equal(s.bvh.node_lo, nodes1)
