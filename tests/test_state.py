import jax.numpy as jnp
import numpy as np

from fluctus_tpu.core.types import default_params
from fluctus_tpu.render import state as state_mod

from test_integrator import plane_session


def test_state_roundtrip(tmp_path):
    params = default_params(world_radius=3.0)
    cam = params.camera.replace(pos=jnp.array([1.0, 2.0, 3.0], jnp.float32),
                                fov=jnp.float32(45.0),
                                aperture_size=jnp.float32(0.02))
    params = params.replace(camera=cam, env_strength=jnp.float32(2.5))
    state_mod.save_state(params, "abc123", state_dir=str(tmp_path))
    restored = state_mod.load_state(default_params(), "abc123",
                                    state_dir=str(tmp_path))
    np.testing.assert_allclose(np.asarray(restored.camera.pos), [1, 2, 3])
    assert float(restored.camera.fov) == 45.0
    assert float(restored.env_strength) == 2.5


def test_state_missing_is_noop(tmp_path):
    params = default_params()
    out = state_mod.load_state(params, "nope", state_dir=str(tmp_path))
    np.testing.assert_array_equal(np.asarray(out.camera.pos),
                                  np.asarray(params.camera.pos))


def test_pick_focus():
    """Center pick on the plane scene hits the plane and sets focal dist to
    the camera-plane distance (camera at y=3 looking down -> t=3)."""
    scene, params, cfg = plane_session()
    t, prim = state_mod.pick(scene, params, cfg, 0.5, 0.5)
    assert prim >= 0
    np.testing.assert_allclose(t, 3.0, rtol=1e-4)
    p2 = state_mod.pick_dof_depth(scene, params, cfg)
    np.testing.assert_allclose(float(p2.camera.focal_dist), 3.0, rtol=1e-4)
