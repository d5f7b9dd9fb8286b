"""Worker for the 2-process jax.distributed test (SURVEY §4 multi-process
CPU simulation): each process owns 4 virtual CPU devices; the global mesh
spans all 8. Run: python distributed_worker.py <pid> <nprocs> <coord>."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)


def main():
    pid = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    coord = sys.argv[3]

    import jax
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nprocs, process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fluctus_tpu.parallel import mesh as pmesh
    from test_integrator import plane_session

    assert len(jax.devices()) == 4 * nprocs, jax.devices()
    scene, params, cfg = plane_session(max_bounces=1)
    mesh = pmesh.make_mesh(jax.devices())

    scene, params = pmesh.place(scene, params, mesh)
    n_pix = cfg.width * cfg.height
    sharding = pmesh.ray_sharded(mesh)
    n_dev = mesh.size

    idx_global = np.arange(n_pix, dtype=np.uint32)
    tgt_global = np.zeros((n_pix, 3), np.float32)
    # each process hands over ITS devices' rows; jax assembles the global
    # array (the multi-host ingestion path of SURVEY §2.4)
    per = n_pix // n_dev
    lo = pid * (n_dev // nprocs) * per
    hi = lo + (n_dev // nprocs) * per
    idx = jax.make_array_from_process_local_data(sharding, idx_global[lo:hi])
    tgt = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(pmesh.RAY_AXIS)), tgt_global[lo:hi])

    diff = {"kd": scene.materials.kd}
    loss, new = pmesh.grad_step(diff, scene, params, cfg, idx,
                                jnp.uint32(0), tgt)
    # loss and the updated params are fully replicated (psum'd grads), so
    # every process reads its local copy
    loss_v = float(np.asarray(loss.addressable_shards[0].data))
    kd0 = float(np.asarray(
        new["kd"].addressable_shards[0].data).reshape(-1)[0])
    print(f"RESULT pid={pid} loss={loss_v:.9f} kd0={kd0:.9f}", flush=True)

    # the STREAMING grad step (per-shard pools, pmean'd grads) across
    # real OS processes — the r4 production fwd+bwd path
    from fluctus_tpu.integrators import wavefront
    n_loc = n_pix // n_dev
    k, _ = wavefront.plan_stream_segments(
        scene, params, cfg, jnp.arange(n_loc, dtype=jnp.uint32),
        jnp.uint32(0), 64, deferred=True)
    s_loss, s_new, s_nd = pmesh.grad_step_stream(
        diff, scene, params, cfg, idx, jnp.uint32(0), tgt, 64,
        int(k) + 2, mesh)
    s_loss_v = float(np.asarray(s_loss.addressable_shards[0].data))
    s_kd0 = float(np.asarray(
        s_new["kd"].addressable_shards[0].data).reshape(-1)[0])
    s_nd_v = int(np.asarray(s_nd.addressable_shards[0].data))
    print(f"STREAM pid={pid} loss={s_loss_v:.9f} kd0={s_kd0:.9f} "
          f"nd={s_nd_v}", flush=True)


if __name__ == "__main__":
    main()
