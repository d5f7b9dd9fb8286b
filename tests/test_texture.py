"""Direct unit tests for atlas packing + device texture fetches
(reference surface: src/utils.cl:114-182 readTexture / matGetAlbedo /
tangentSpaceNormal; src/clcontext.cpp:570-611 atlas upload)."""
import jax.numpy as jnp
import numpy as np

from fluctus_tpu.core.types import Geometry, TextureAtlas
from fluctus_tpu.ops import texture
from fluctus_tpu.scene.textures import HostTexture, TexturePool


def make_atlas(arrays):
    """Pack (H, W, 4) uint8 arrays through the real TexturePool path."""
    pool = TexturePool()
    for i, a in enumerate(arrays):
        pool.textures.append(HostTexture(name=f"t{i}", rgba=a))
        pool._by_name[f"t{i}"] = i
    data, offs, ws, hs = pool.pack()
    return TextureAtlas(data=jnp.asarray(data), offset=jnp.asarray(offs),
                        width=jnp.asarray(ws), height=jnp.asarray(hs))


def checker(h, w):
    img = np.zeros((h, w, 4), np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    img[..., 0] = np.where((xx + yy) % 2 == 0, 255, 0)
    img[..., 1] = np.where((xx + yy) % 2 == 0, 0, 255)
    img[..., 3] = 255
    return img


def test_fetch_texel_addressing_and_wrap():
    """Nearest-texel fetch addresses the packed atlas correctly, across
    multiple textures with different sizes, and wraps uv outside [0,1)
    (reference: src/utils.cl:114-133)."""
    t0 = checker(4, 8)
    t1 = np.full((2, 2, 4), 37, np.uint8)
    atlas = make_atlas([t0, t1])

    # texel centers of texture 0: uv = ((x+.5)/W, (y+.5)/H)
    xs = np.array([0, 1, 7, 3], np.int32)
    ys = np.array([0, 1, 3, 2], np.int32)
    uv = jnp.asarray(np.stack([(xs + 0.5) / 8, (ys + 0.5) / 4], 1),
                     jnp.float32)
    got = texture.fetch_texel(atlas, jnp.zeros(4, jnp.int32), uv)
    want = t0[ys, xs, :3].astype(np.float32) / 255.0
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)

    # second texture reads its own region (offset correctness)
    got1 = texture.fetch_texel(atlas, jnp.ones(1, jnp.int32),
                               jnp.asarray([[0.25, 0.25]], jnp.float32))
    np.testing.assert_allclose(np.asarray(got1), [[37 / 255.0] * 3],
                               atol=1e-6)

    # wrap addressing: uv + whole periods fetches the same texel
    uv_wrapped = uv + jnp.asarray([[2.0, -3.0]], jnp.float32)
    got_w = texture.fetch_texel(atlas, jnp.zeros(4, jnp.int32), uv_wrapped)
    np.testing.assert_allclose(np.asarray(got_w), want, atol=1e-6)


def test_mat_float3_fallback_and_albedo_gamma():
    """Lanes with tex_idx -1 take the material fallback; albedo applies the
    2.2 gamma to textured AND untextured lanes alike
    (reference: src/utils.cl:136-146)."""
    t0 = np.full((1, 1, 4), 128, np.uint8)
    atlas = make_atlas([t0])
    fallback = jnp.asarray([[0.2, 0.4, 0.8], [0.2, 0.4, 0.8]], jnp.float32)
    idx = jnp.asarray([0, -1], jnp.int32)
    uv = jnp.full((2, 2), 0.5, jnp.float32)

    val = texture.mat_float3(atlas, fallback, idx, uv)
    np.testing.assert_allclose(np.asarray(val[0]), [128 / 255.0] * 3,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(val[1]), [0.2, 0.4, 0.8],
                               atol=1e-6)

    alb = texture.mat_albedo(atlas, fallback, idx, uv)
    np.testing.assert_allclose(np.asarray(alb[0]),
                               [(128 / 255.0) ** 2.2] * 3, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(alb[1]),
                               np.asarray(fallback[1]) ** 2.2, rtol=1e-5)


def test_empty_atlas_statically_skips_fetch():
    """The no-texture placeholder (< 4 bytes) makes mat_float3 return the
    fallback object itself — the fetch is absent from the traced program
    (ADVICE r1: a real 1x1 texture must NOT be misclassified)."""
    pool = TexturePool()
    data, offs, ws, hs = pool.pack()
    empty = TextureAtlas(data=jnp.asarray(data), offset=jnp.asarray(offs),
                         width=jnp.asarray(ws), height=jnp.asarray(hs))
    assert texture._atlas_empty(empty)
    fb = jnp.ones((3, 3), jnp.float32)
    out = texture.mat_float3(empty, fb, jnp.zeros(3, jnp.int32),
                             jnp.zeros((3, 2), jnp.float32))
    assert out is fb

    # a real 1x1 texture packs to exactly 4 bytes and must NOT be empty
    one = make_atlas([np.full((1, 1, 4), 9, np.uint8)])
    assert not texture._atlas_empty(one)


def _flat_quad_geom():
    """One triangle in the z=0 plane with uv = xy: tangent (1,0,0),
    bitangent (0,1,0), geometric normal (0,0,1)."""
    v0 = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    v1 = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    v2 = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    n = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    uv0 = jnp.asarray([[0.0, 0.0]], jnp.float32)
    uv1 = jnp.asarray([[1.0, 0.0]], jnp.float32)
    uv2 = jnp.asarray([[0.0, 1.0]], jnp.float32)
    return Geometry(v0=v0, v1=v1, v2=v2, n0=n, n1=n, n2=n,
                    uv0=uv0, uv1=uv1, uv2=uv2,
                    mat_id=jnp.zeros(1, jnp.int32))


def test_tangent_space_normal():
    """A normal-map texel tilts the shading normal in the triangle's
    (tangent, bitangent, normal) frame; flat texel (0.5, 0.5, 1) keeps it;
    map_n = -1 lanes keep it (reference: src/utils.cl:149-182)."""
    geom = _flat_quad_geom()
    # texel encodes n = (2u-1, 2v-1, 2w-1): tilt toward +x by 45 deg
    s = np.uint8(round(0.5 * (1 / np.sqrt(2)) * 255 + 127.5))
    tex = np.zeros((1, 1, 4), np.uint8)
    tex[..., 0] = s          # x ~ +0.707
    tex[..., 1] = 127        # y ~ 0
    tex[..., 2] = s          # z ~ +0.707
    atlas = make_atlas([tex])

    prim = jnp.zeros(3, jnp.int32)
    uv_tex = jnp.full((3, 2), 0.5, jnp.float32)
    n_sh = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
                            (3, 3))
    map_n = jnp.asarray([0, 0, -1], jnp.int32)
    out = np.asarray(texture.tangent_space_normal(
        geom, atlas, prim, uv_tex, n_sh, map_n))
    # mapped lanes tilt toward +x ~45 deg
    assert abs(out[0, 0] - np.sqrt(0.5)) < 0.02
    assert abs(out[0, 2] - np.sqrt(0.5)) < 0.02
    assert abs(out[0, 1]) < 0.02
    np.testing.assert_allclose(out[0], out[1])
    # unmapped lane unchanged
    np.testing.assert_allclose(out[2], [0.0, 0.0, 1.0], atol=1e-7)
    # all unit length
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)
