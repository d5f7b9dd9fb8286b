"""Multi-process jax.distributed simulation (SURVEY §4): two OS processes,
4 virtual CPU devices each, one 8-device global mesh; the sharded gradient
step must agree with the single-process reference."""
import os
import re
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from fluctus_tpu.parallel import mesh as pmesh

from test_integrator import plane_session

_HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_grad_step_matches_single():
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PYTHONPATH")}
    worker = os.path.join(_HERE, "distributed_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", coord],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    results = {}
    for out in outs:
        m = re.search(r"RESULT pid=(\d) loss=([0-9.eE+-]+) "
                      r"kd0=([0-9.eE+-]+)", out)
        assert m, out[-3000:]
        results[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
    assert set(results) == {0, 1}
    # both processes computed the same global step
    np.testing.assert_allclose(results[0], results[1], rtol=1e-6)

    # single-process reference on the same scene
    scene, params, cfg = plane_session(max_bounces=1)
    n_pix = cfg.width * cfg.height
    idx = jnp.arange(n_pix, dtype=jnp.uint32)
    tgt = jnp.zeros((n_pix, 3), jnp.float32)
    loss, new = pmesh.grad_step({"kd": scene.materials.kd}, scene, params,
                                cfg, idx, jnp.uint32(0), tgt)
    np.testing.assert_allclose(results[0][0], float(loss), rtol=1e-5)
    np.testing.assert_allclose(results[0][1],
                               float(np.asarray(new["kd"]).reshape(-1)[0]),
                               rtol=1e-5)

    # the streaming grad step across processes: full drain, identical
    # loss to the lockstep step (same estimator via counter RNG), and
    # both processes agree
    for out in outs:
        m = re.search(r"STREAM pid=(\d) loss=([0-9.eE+-]+) "
                      r"kd0=([0-9.eE+-]+) nd=(\d+)", out)
        assert m, out[-3000:]
        assert int(m.group(4)) == n_pix
        np.testing.assert_allclose(float(m.group(2)), float(loss),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(m.group(3)),
                                   float(np.asarray(new["kd"])
                                         .reshape(-1)[0]), rtol=1e-4)
