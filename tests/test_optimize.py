import numpy as np
import jax.numpy as jnp


def test_optimize_driver_with_checkpoint(tmp_path):
    """End-to-end optimize driver incl. orbax checkpoint + resume."""
    from fluctus_tpu.io.hdr import write_hdr
    from fluctus_tpu.render.driver import RenderSession
    from fluctus_tpu.render.optimize import run_optimization
    from fluctus_tpu.integrators import lockstep
    import sys
    sys.path.insert(0, "tests")
    from test_integrator import plane_session

    scene, params, cfg = plane_session(max_bounces=1)
    # target rendered with kd*0.5
    kd_true = scene.materials.kd * 0.5
    pix = jnp.arange(cfg.width * cfg.height, dtype=jnp.uint32)
    target = lockstep.sample_radiance(
        scene.replace(materials=scene.materials.replace(kd=kd_true)),
        params, cfg, pix, jnp.uint32(0))
    tpath = str(tmp_path / "target.hdr")
    write_hdr(tpath, np.asarray(target).reshape(cfg.height, cfg.width, 3))

    sess = RenderSession(host_scene=None, scene=scene, params=params, cfg=cfg)
    out = str(tmp_path / "opt")
    diff, hist = run_optimization(sess, tpath, steps=20, lr=0.05, spp=1,
                                  out_dir=out, checkpoint_every=10)
    assert hist[-1] < hist[0]
    # resume continues from step 20's checkpoint rather than restarting;
    # returned history = merged (prior 20 + new 5)
    diff2, hist2 = run_optimization(sess, tpath, steps=25, lr=0.05, spp=1,
                                    out_dir=out, checkpoint_every=10)
    assert len(hist2) == 25


def test_optimize_minibatch_recovers_kd(tmp_path):
    """Variance-reduced path (stratified pixel minibatches + paired-sample
    unbiased loss + spp schedule) recovers a perturbed albedo well past the
    initial error — the r1 verdict's config-5 noise-floor fix."""
    import jax.numpy as jnp
    from fluctus_tpu.io.hdr import write_hdr
    from fluctus_tpu.render.driver import RenderSession
    from fluctus_tpu.render.optimize import run_optimization, spp_schedule
    from fluctus_tpu.integrators import lockstep
    import sys
    sys.path.insert(0, "tests")
    from test_integrator import plane_session

    assert spp_schedule(100, 8) == [(40, 2), (30, 4), (30, 8)]
    assert spp_schedule(10, 2) == [(10, 2)]

    scene, params, cfg = plane_session(max_bounces=1)
    kd_true = scene.materials.kd * 0.5
    pix = jnp.arange(cfg.width * cfg.height, dtype=jnp.uint32)
    target = lockstep.sample_radiance(
        scene.replace(materials=scene.materials.replace(kd=kd_true)),
        params, cfg, pix, jnp.uint32(0))
    tpath = str(tmp_path / "target.hdr")
    write_hdr(tpath, np.asarray(target).reshape(cfg.height, cfg.width, 3))

    sess = RenderSession(host_scene=None, scene=scene, params=params,
                         cfg=cfg)
    err0 = float(jnp.abs(scene.materials.kd - kd_true).max())
    diff, hist = run_optimization(
        sess, tpath, steps=40, lr=0.05, spp=4, minibatch=64,
        out_dir=str(tmp_path / "opt_mb"), checkpoint_every=0)
    err1 = float(jnp.abs(diff["kd"] - kd_true).max())
    assert err1 < err0 * 0.35, (err0, err1)


def test_stream_step_gradient_matches_lockstep_pair():
    """The stream optimizer step's gradient construction — weights from a
    forward stream_radiance pass folded through the weighted stream_loss
    — must equal jax.grad of the lockstep paired-sample loss EXACTLY
    (same estimator, same RNG streams, only float add order differs)."""
    import jax
    import jax.numpy as jnp
    from fluctus_tpu.integrators import lockstep, wavefront
    from fluctus_tpu.parallel.mesh import graft, loss_fn_stream
    import sys
    sys.path.insert(0, "tests")
    from test_integrator import plane_session

    scene, params, cfg = plane_session(max_bounces=1)
    n_pix = cfg.width * cfg.height
    mb, spp = 64, 2
    pix = jnp.arange(mb, dtype=jnp.uint32) * (n_pix // mb)
    tgt = jnp.full((mb, 3), 0.2, jnp.float32)
    diff = {"kd": scene.materials.kd}

    def pair_loss(d):
        s, p = graft(d, scene, params)

        def render(s_idx):
            acc = 0.0
            for k in range(spp):
                acc = acc + lockstep.sample_radiance(
                    s, p, cfg, pix, jnp.uint32(s_idx * spp + k))
            return acc / spp
        ia, ib = render(0), render(1)
        return jnp.mean((ia - tgt) * (ib - tgt))

    l_ref, g_ref = jax.value_and_grad(pair_loss)(diff)

    # stream construction (mirrors optimize.make_step_stream, step_idx=0)
    pix2 = jnp.tile(pix, 2 * spp)
    samp = jnp.repeat(jnp.arange(2 * spp, dtype=jnp.uint32), mb)
    pool = 256
    k, drained = wavefront.plan_stream_segments(
        scene, params, cfg, pix2, samp, pool, deferred=True)
    n_seg = int(k) + 1
    assert int(drained) == 2 * spp * mb

    rad, nd = wavefront.stream_radiance(scene, params, cfg, pix2, samp,
                                        pool, n_seg)
    assert int(nd) == 2 * spp * mb
    i_ab = rad.reshape(2, spp, mb, 3).mean(axis=1)
    l_stream = jnp.mean((i_ab[0] - tgt) * (i_ab[1] - tgt))
    np.testing.assert_allclose(float(l_stream), float(l_ref), rtol=1e-5)

    scale = 1.0 / (spp * mb * 3)
    w = jnp.concatenate([jnp.tile((i_ab[1] - tgt) * scale, (spp, 1)),
                         jnp.tile((i_ab[0] - tgt) * scale, (spp, 1))])
    zeros_t = jnp.zeros((2 * spp * mb, 3), jnp.float32)

    def wloss(d):
        s, n_done = loss_fn_stream(d, scene, params, cfg, pix2, samp,
                                   zeros_t, pool, n_seg, deferred=True,
                                   weight=w)
        return s, n_done
    (_, nd_g), g_stream = jax.value_and_grad(wloss, has_aux=True)(diff)
    assert int(nd_g) == 2 * spp * mb
    np.testing.assert_allclose(np.asarray(g_stream["kd"]),
                               np.asarray(g_ref["kd"]), rtol=1e-4,
                               atol=1e-7)


def test_optimize_driver_stream_method(tmp_path):
    """run_optimization(method='stream') drives the streaming fwd+bwd
    path end-to-end (plan, weighted fold, underdrain re-plan guard) and
    reduces the loss like the lockstep method."""
    from fluctus_tpu.io.hdr import write_hdr
    from fluctus_tpu.render.driver import RenderSession
    from fluctus_tpu.render.optimize import run_optimization
    from fluctus_tpu.integrators import lockstep
    import sys
    sys.path.insert(0, "tests")
    from test_integrator import plane_session

    scene, params, cfg = plane_session(max_bounces=1)
    kd_true = scene.materials.kd * 0.5
    pix = jnp.arange(cfg.width * cfg.height, dtype=jnp.uint32)
    target = lockstep.sample_radiance(
        scene.replace(materials=scene.materials.replace(kd=kd_true)),
        params, cfg, pix, jnp.uint32(0))
    tpath = str(tmp_path / "target.hdr")
    from fluctus_tpu.io.hdr import write_hdr
    write_hdr(tpath, np.asarray(target).reshape(cfg.height, cfg.width, 3))

    sess = RenderSession(host_scene=None, scene=scene, params=params,
                        cfg=cfg)
    diff, hist = run_optimization(
        sess, tpath, steps=15, lr=0.05, spp=2, minibatch=128,
        out_dir=str(tmp_path / "opt_s"), checkpoint_every=0,
        method="stream")
    assert hist[-1] < hist[0]
