"""Camera ray generation: jittered-AA pinhole + thin-lens DoF, batched and
differentiable w.r.t. camera parameters (reference: src/wf_raygen.cl:25-66,
src/mk_raygen.cl).
"""
from __future__ import annotations

import jax.numpy as jnp

from fluctus_tpu.core import samplers, vecmath as vm
from fluctus_tpu.core.types import Camera


def generate_rays(camera: Camera, pixel_idx: jnp.ndarray, width: int,
                  height: int, u_aa_x, u_aa_y, u_lens_r, u_lens_th,
                  world_radius):
    """Primary rays for a batch of linear pixel indices.

    Exact math parity with reference src/wf_raygen.cl:25-62: jittered NDC,
    horizontal aspect fix, fov-scale on both axes, thin-lens origin offset of
    worldRadius·apertureSize·diskSample. Returns (orig (B,3), dir (B,3))."""
    x = (pixel_idx % width).astype(jnp.float32) + u_aa_x
    y = (pixel_idx // width).astype(jnp.float32) + u_aa_y

    ndc_x = x / width
    ndc_y = y / height
    scr_x = 2.0 * ndc_x - 1.0
    # Row 0 (stored/displayed TOP) must look toward +up: the reference
    # maps scr_y = 2*ndc-1 but displays through GL whose row 0 is the
    # BOTTOM-left origin (src/window.cpp PBO blit); with top-origin image
    # storage the sign flips or every export is upside down (caught on
    # the r4 kitchen interior render).
    scr_y = 1.0 - 2.0 * ndc_y
    scr_x = scr_x * (width / height)

    scale = jnp.tan(jnp.deg2rad(0.5 * camera.fov))
    scr_x = scr_x * scale
    scr_y = scr_y * scale

    orig = jnp.broadcast_to(camera.pos, (pixel_idx.shape[0], 3))
    target = (orig + camera.right * scr_x[:, None]
              + camera.up * scr_y[:, None] + camera.dir)
    dir = vm.normalize(target - orig)

    # Thin-lens depth of field
    fp = camera.pos + dir * camera.focal_dist
    dx, dy = samplers.uniform_disk(u_lens_r, u_lens_th)
    orig = orig + world_radius * camera.aperture_size * (
        camera.right * dx[:, None] + camera.up * dy[:, None])
    dir = vm.normalize(fp - orig)
    return orig, dir


def camera_basis_from_rotation(yaw_deg, pitch_deg,
                               world_right=(1.0, 0.0, 0.0),
                               world_up=(0.0, 1.0, 0.0)):
    """Build (right, up, dir) from yaw/pitch like the reference's
    rotation-matrix construction (src/tracer.cpp:803-818). Camera looks down
    -z of the rotated frame."""
    import numpy as np

    def rot(axis, rad):
        axis = np.asarray(axis, np.float64)
        axis = axis / np.linalg.norm(axis)
        c, s = np.cos(rad), np.sin(rad)
        x, y, z = axis
        return np.array([
            [c + x * x * (1 - c), x * y * (1 - c) - z * s, x * z * (1 - c) + y * s],
            [y * x * (1 - c) + z * s, c + y * y * (1 - c), y * z * (1 - c) - x * s],
            [z * x * (1 - c) - y * s, z * y * (1 - c) + x * s, c + z * z * (1 - c)],
        ])

    r = rot(world_right, np.deg2rad(pitch_deg)) @ rot(world_up,
                                                      np.deg2rad(yaw_deg))
    right = jnp.asarray(r[0], jnp.float32)
    up = jnp.asarray(r[1], jnp.float32)
    dir = jnp.asarray(-r[2], jnp.float32)
    return right, up, dir
