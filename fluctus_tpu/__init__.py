"""fluctus_tpu — a TPU-native differentiable wavefront path tracer.

A from-scratch JAX / Pallas / pjit framework reproducing the capabilities of the
reference interactive OpenCL wavefront path tracer (harskish/fluctus), redesigned
for TPU hardware: SoA pytrees instead of OpenCL SoA macros, counter-based
stateless RNG instead of serial per-path seeds, masked lockstep + compacted
wavefront integrators instead of atomic-counter queues, and `jax.sharding.Mesh`
data parallelism over the path axis instead of a single OpenCL command queue.

Layer map (cf. reference SURVEY.md §1):
  L0 device kernels  -> fluctus_tpu.ops (+ Pallas kernels)
  L1 CLContext       -> fluctus_tpu.render.engine (jitted step fns, shardings)
  L2 scene pipeline  -> fluctus_tpu.scene + fluctus_tpu.accel (host NumPy/C++)
  L3 orchestration   -> fluctus_tpu.render.driver + fluctus_tpu.cli
  L4 UI              -> headless image I/O (fluctus_tpu.io)
"""

__version__ = "0.1.0"

from fluctus_tpu.core import types as types  # noqa: F401
