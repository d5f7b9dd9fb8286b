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
