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


def test_sharded_nc_variant_matches_single_device(problem):
    """PhotometricErrorNC under sharding: the event-side normalization is
    its own global (psum) coupling; must match the single-device NC path."""
    cam, ef, nc, grad, idp, weights, mask = problem
    state = et.initial_tracker_state()
    ref = et.optimize(state, ef, cam, nc, grad, idp, weights, mask,
                      max_iterations=8, norm_event=True)
    mesh = make_mesh(jax.devices()[:4], axis=set_.AXIS)
    out = set_.optimize_sharded(state, ef, cam, nc, grad, idp, weights,
                                mask, mesh, max_iterations=8,
                                norm_event=True)
    np.testing.assert_allclose(np.asarray(out.state.px),
                               np.asarray(ref.state.px), atol=3e-4)
    np.testing.assert_allclose(np.asarray(out.state.qx),
                               np.asarray(ref.state.qx), atol=3e-4)
    np.testing.assert_allclose(float(out.energy), float(ref.energy),
                               rtol=2e-3)


def test_sharded_mad_parity_across_shard_counts(problem):
    """The MAD loss-scale estimate must be shard-count-independent (the
    reference's per-thread-chunk normalization makes it depend on
    num_threads — SURVEY §7 flags this; our global psum/all_gather design
    removes it). Also checks pose parity 2-way vs 8-way."""
    cam, ef, nc, grad, idp, weights, mask = problem
    state = et.initial_tracker_state()
    outs = {}
    for n in (2, 8):
        mesh = make_mesh(jax.devices()[:n], axis=set_.AXIS)
        outs[n] = set_.optimize_sharded(state, ef, cam, nc, grad, idp,
                                        weights, mask, mesh,
                                        max_iterations=8)
    np.testing.assert_allclose(float(outs[2].loss_scale),
                               float(outs[8].loss_scale), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(outs[2].state.px),
                               np.asarray(outs[8].state.px), atol=2e-5)
    np.testing.assert_allclose(np.asarray(outs[2].state.vx),
                               np.asarray(outs[8].state.vx), atol=2e-4)


def test_sharded_uneven_points_masked_tail(problem):
    """Uneven point count: P=56 padded to 64 with dead tail lanes spread
    over the shards — masked lanes must not perturb the solve."""
    cam, ef, nc, grad, idp, weights, mask = problem
    # kill the last 8 lanes (the pad); they carry garbage coords
    mask_np = np.asarray(mask).copy()
    mask_np[-8:] = False
    nc_bad = np.asarray(nc).copy()
    nc_bad[-8:] = 1e3          # wildly out of frame
    idp_bad = np.asarray(idp).copy()
    idp_bad[-8:] = 1e-9
    m2 = jnp.asarray(mask_np)
    nc2 = jnp.asarray(nc_bad)
    idp2 = jnp.asarray(idp_bad)
    state = et.initial_tracker_state()
    ref = et.optimize(state, ef, cam, nc2, grad, idp2, weights, m2,
                      max_iterations=8)
    mesh = make_mesh(jax.devices()[:8], axis=set_.AXIS)
    out = set_.optimize_sharded(state, ef, cam, nc2, grad, idp2, weights,
                                m2, mesh, max_iterations=8)
    assert np.isfinite(float(out.energy))
    np.testing.assert_allclose(np.asarray(out.state.px),
                               np.asarray(ref.state.px), atol=2e-4)
    # dead lanes produce exactly zero residuals on both paths
    assert np.all(np.asarray(out.residuals)[-8:] == 0.0)
