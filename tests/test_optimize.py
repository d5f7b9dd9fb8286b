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
