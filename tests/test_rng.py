import jax.numpy as jnp
import numpy as np

from fluctus_tpu.core import rng


def test_uniform_range_and_determinism():
    pix = jnp.arange(4096, dtype=jnp.uint32)
    u1 = rng.uniform(pix, 0, 0, rng.Streams.BSDF_U)
    u2 = rng.uniform(pix, 0, 0, rng.Streams.BSDF_U)
    assert np.array_equal(np.asarray(u1), np.asarray(u2))  # stateless replay
    u = np.asarray(u1)
    assert (u >= 0.0).all() and (u < 1.0).all()


def test_streams_decorrelated():
    pix = jnp.arange(8192, dtype=jnp.uint32)
    a = np.asarray(rng.uniform(pix, 0, 0, 0))
    b = np.asarray(rng.uniform(pix, 0, 0, 1))
    c = np.asarray(rng.uniform(pix, 1, 0, 0))
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.05
    assert abs(np.corrcoef(a, c)[0, 1]) < 0.05


def test_uniformity_chi2():
    # 64k draws into 64 bins: chi2 should be ~63 +- ~11; generous bound
    pix = jnp.arange(1 << 16, dtype=jnp.uint32)
    u = np.asarray(rng.uniform(pix, 3, 2, 5))
    counts, _ = np.histogram(u, bins=64, range=(0, 1))
    expected = len(u) / 64
    chi2 = ((counts - expected) ** 2 / expected).sum()
    assert chi2 < 120, chi2


def test_uniform4_independent_outputs():
    pix = jnp.arange(8192, dtype=jnp.uint32)
    a, b, c, d = rng.uniform4(pix, 0, 0, 7)
    m = np.corrcoef(np.stack([np.asarray(x) for x in (a, b, c, d)]))
    off_diag = m[~np.eye(4, dtype=bool)]
    assert (np.abs(off_diag) < 0.05).all()
