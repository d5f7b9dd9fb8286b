"""Golden-image regression suite (SURVEY §4 gap; r2 verdict item 5).

Pixel-level fixed-seed goldens for the BASELINE staged configs: a silent
shading regression that preserves image MEANS (which every statistical test
would miss) fails here. Also makes the reference's by-eye cross-checks
mechanical on luxball (config 2): MK-vs-WF integrator equivalence and
explicit/implicit/MIS estimator consistency
(reference: src/tracer.cpp:837-855)."""
import numpy as np
import pytest

from golden_common import (ATOL, GOLDEN_NAMES, RTOL, golden_path,
                           golden_session, render_golden)


@pytest.mark.parametrize("name", GOLDEN_NAMES)
def test_golden_image(name):
    z = np.load(golden_path(name))
    img = render_golden(name)
    np.testing.assert_allclose(img, z["img"], rtol=RTOL, atol=ATOL)


def test_luxball_mk_vs_wf():
    """Lockstep (MK) and streaming wavefront (WF) share counter-based RNG
    paths, so the two integrators must agree to float tolerance on the
    config-2 scene — delta dielectric + glossy + DoF included."""
    from fluctus_tpu.render import driver
    sess, _ = golden_session("luxball_cfg2")
    mk = driver.render(sess, 4, integrator="lockstep")
    wf = driver.render(sess, 4, integrator="stream")
    # identical sample sets; summation order differs (binning) -> tiny slack
    np.testing.assert_allclose(wf, mk, rtol=1e-4, atol=1e-5)


def test_luxball_sampling_mode_consistency():
    """Implicit-only and MIS estimate the same integral on luxball
    (statistical form of the reference's M-key check,
    src/tracer.cpp:837-855). Explicit-only is a KNOWN biased mode on delta
    BSDFs — NEE cannot sample a delta lobe and implicit env hits are off,
    so dielectric paths lose env light (same semantics as the reference's
    SAMPLE_IMPLICIT gate, wf_logic.cl:84-107): assert it sits strictly
    below MIS rather than pretending it converges."""
    from fluctus_tpu.render import driver
    means = {}
    for mode, (si, se) in {"mis": (True, True), "expl": (False, True),
                           "impl": (True, False)}.items():
        sess, _ = golden_session("luxball_cfg2")
        sess.cfg = sess.cfg.replace(sample_impl=si, sample_expl=se,
                                    width=32, height=32)
        means[mode] = float(np.mean(
            driver.render(sess, 48, integrator="lockstep")))
    assert means["mis"] > 0.01
    np.testing.assert_allclose(means["impl"], means["mis"], rtol=0.25)
    assert means["expl"] < means["mis"]  # delta paths drop env light
    assert means["expl"] > 0.0
