"""Distributed event tracker matches the single-device solver."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slam_eds_tpu.ops import event_tracker as et
from slam_eds_tpu.parallel import sharded_event_tracker as set_
from slam_eds_tpu.parallel.sharded_ba import make_mesh
from slam_eds_tpu.utils.cameras import Pinhole


@pytest.fixture(scope="module")
def problem():
    H, W, P = 64, 96, 64
    cam = Pinhole(jnp.float32(80.0), jnp.float32(80.0),
                  jnp.float32(W / 2 - 0.5), jnp.float32(H / 2 - 0.5), W, H)
    rng = np.random.default_rng(7)
    ef = jnp.asarray(rng.normal(size=(H, W)) * 0.02, jnp.float32)
    nc = jnp.asarray(np.stack([
        (rng.uniform(8, W - 8, P) - float(cam.cx)) / float(cam.fx),
        (rng.uniform(8, H - 8, P) - float(cam.cy)) / float(cam.fy)], -1),
        jnp.float32)
    grad = jnp.asarray(rng.normal(size=(P, 2)) * 15, jnp.float32)
    idp = jnp.asarray(rng.uniform(0.4, 1.2, P), jnp.float32)
    weights = jnp.ones((P,), jnp.float32)
    mask = jnp.asarray(rng.random(P) > 0.1)
    return cam, ef, nc, grad, idp, weights, mask


def test_sharded_matches_single_device(problem):
    cam, ef, nc, grad, idp, weights, mask = problem
    state = et.initial_tracker_state()

    ref = et.optimize(state, ef, cam, nc, grad, idp, weights, mask,
                      max_iterations=8)
    mesh = make_mesh(jax.devices()[:4], axis=set_.AXIS)
    out = set_.optimize_sharded(state, ef, cam, nc, grad, idp, weights,
                                mask, mesh, max_iterations=8)

    np.testing.assert_allclose(np.asarray(out.state.px),
                               np.asarray(ref.state.px), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.state.qx),
                               np.asarray(ref.state.qx), atol=2e-4)
    np.testing.assert_allclose(float(out.energy), float(ref.energy),
                               rtol=1e-3)
    np.testing.assert_allclose(float(out.loss_scale), float(ref.loss_scale),
                               rtol=1e-2)
    # residual layout matches after the gather
    np.testing.assert_allclose(np.asarray(out.residuals),
                               np.asarray(ref.residuals), atol=2e-4)
