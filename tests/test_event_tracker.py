"""Event tracker tests: synthesize a brightness-increment frame from a known
(pose, velocity) and check the tracker recovers the alignment."""
import numpy as np
import jax
import jax.numpy as jnp

from slam_eds_tpu.ops import event_tracker as et
from slam_eds_tpu.utils import lie
from slam_eds_tpu.utils.cameras import Pinhole
from slam_eds_tpu.utils.events import scatter_accumulate
from slam_eds_tpu.utils.image import gaussian_blur
from slam_eds_tpu.utils.lie import SE3

H, W = 96, 128
CAM = Pinhole(jnp.float32(110.0), jnp.float32(110.0),
              jnp.float32(W / 2 - 0.5), jnp.float32(H / 2 - 0.5), W, H)


def make_points(rng, n=256):
    uv = np.stack([rng.uniform(15, W - 15, n), rng.uniform(15, H - 15, n)], -1)
    nc = np.stack([(uv[:, 0] - float(CAM.cx)) / float(CAM.fx),
                   (uv[:, 1] - float(CAM.cy)) / float(CAM.fy)], -1)
    grad = rng.normal(size=(n, 2)) * 50.0
    idp = rng.uniform(0.4, 0.7, n)
    return (jnp.asarray(uv, jnp.float32), jnp.asarray(nc, jnp.float32),
            jnp.asarray(grad, jnp.float32), jnp.asarray(idp, jnp.float32))


def _smooth_field(x, y):
    """Analytic 'normalized event frame' test function."""
    return (0.10 * jnp.sin(0.15 * x) * jnp.cos(0.12 * y)
            + 0.05 * jnp.sin(0.05 * x + 0.07 * y))


def synth_event_frame(nc, grad_out, idp, vx_true, T_ef_kf: SE3, alpha=100.0):
    """Construct an event frame + per-point gradients such that the true
    (pose, velocity) is the exact minimum of the cost:

    choose a smooth field S, warp each point with the true pose, set its
    target c_i = S(warp_i), and pick the KF gradient g_i along the true flow
    with magnitude making model_i = alpha*c_i; then model/||model|| ~ c at
    the truth (alpha >> the 1e-3 norm guard). Residual floor is only the
    bicubic-vs-analytic interpolation error of S.

    grad_out is OVERWRITTEN (returned) to satisfy the construction.
    """
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    img = _smooth_field(jnp.asarray(xs), jnp.asarray(ys))

    z = 1.0 / (idp + 1e-5)
    X = jnp.stack([nc[:, 0] * z, nc[:, 1] * z, z], -1)
    p = X @ T_ef_kf.R.T + T_ef_kf.t
    xp = CAM.fx * p[:, 0] / p[:, 2] + CAM.cx
    yp = CAM.fy * p[:, 1] / p[:, 2] + CAM.cy
    c = _smooth_field(xp, yp)
    # normalize so that model/||model|| == sampled frame exactly at truth
    cn = jnp.linalg.norm(c)
    c = c / cn
    img = img / cn

    flow = et.compute_flow(nc, vx_true, idp)
    f2 = jnp.sum(flow * flow, axis=-1)
    g = -(alpha * c / jnp.maximum(f2, 1e-8))[:, None] * flow
    return img, g


def test_compute_flow_formula():
    nc = jnp.asarray([[0.1, -0.2]], jnp.float32)
    vx = jnp.asarray([0.1, 0.2, 0.3, 0.01, 0.02, 0.03], jnp.float32)
    idp = jnp.asarray([0.5], jnp.float32)
    f = et.compute_flow(nc, vx, idp)
    x, y = 0.1, -0.2
    fx = -0.5 * 0.1 + x * 0.5 * 0.3 + x * y * 0.01 - (1 + x * x) * 0.02 + y * 0.03
    fy = -0.5 * 0.2 + y * 0.5 * 0.3 + (1 + y * y) * 0.01 - x * y * 0.02 - x * 0.03
    np.testing.assert_allclose(np.asarray(f[0]), [fx, fy], atol=1e-6)


def test_residuals_zero_at_truth(rng):
    uv, nc, _, idp = make_points(rng)
    vx = jnp.asarray([0.3, 0.1, -0.2, 0.05, -0.03, 0.08], jnp.float32)
    vx = vx / jnp.linalg.norm(vx)
    T = SE3.exp(jnp.asarray([0.01, -0.005, 0.008, 0.002, 0.001, -0.003],
                            jnp.float32))
    ef, grad = synth_event_frame(nc, None, idp, vx, T)
    st = et.TrackerState(px=T.t, qx=lie.mat_to_quat(T.R), vx=vx)
    r = et.event_residuals(st, ef, CAM, nc, grad, idp,
                           jnp.ones_like(idp), jnp.ones_like(idp, bool))
    # only bicubic-vs-analytic interpolation error remains
    assert float(jnp.abs(r).mean()) < 2e-4


def test_optimize_recovers_pose(rng):
    uv, nc, _, idp = make_points(rng)
    vx_true = jnp.asarray([0.3, 0.1, -0.2, 0.05, -0.03, 0.08], jnp.float32)
    vx_true = vx_true / jnp.linalg.norm(vx_true)
    T_true = SE3.exp(jnp.asarray([0.015, -0.01, 0.008, 0.003, 0.002, -0.004],
                                 jnp.float32))
    ef, grad = synth_event_frame(nc, None, idp, vx_true, T_true)

    st0 = et.TrackerState(px=jnp.zeros(3), qx=lie.quat_identity(),
                          vx=vx_true)  # start at zero pose, true velocity
    res = et.optimize(st0, ef, CAM, nc, grad, idp, jnp.ones_like(idp),
                      jnp.ones_like(idp, bool), max_iterations=50,
                      loss_kind="none")
    T_est = SE3(lie.quat_to_mat(res.state.qx), res.state.px)
    err = T_true.inverse().compose(T_est).log()
    assert float(jnp.linalg.norm(err)) < 2e-3, np.asarray(err)


def test_optimize_recovers_velocity_direction(rng):
    uv, nc, _, idp = make_points(rng, n=384)
    vx_true = jnp.asarray([0.5, -0.2, 0.1, 0.02, 0.04, -0.01], jnp.float32)
    vx_true = vx_true / jnp.linalg.norm(vx_true)
    T_true = SE3.exp(jnp.asarray([0.01, 0.005, -0.004, 0.001, -0.002, 0.002],
                                 jnp.float32))
    ef, grad = synth_event_frame(nc, None, idp, vx_true, T_true)
    v0 = vx_true + jnp.asarray([0.1, -0.05, 0.05, 0.01, -0.01, 0.02])
    st0 = et.TrackerState(px=T_true.t, qx=lie.mat_to_quat(T_true.R),
                          vx=v0 / jnp.linalg.norm(v0))
    res = et.optimize(st0, ef, CAM, nc, grad, idp, jnp.ones_like(idp),
                      jnp.ones_like(idp, bool), max_iterations=60,
                      loss_kind="none")
    cos = float(jnp.dot(res.state.vx, vx_true))
    assert cos > 0.995, (cos, np.asarray(res.state.vx))
    np.testing.assert_allclose(float(jnp.linalg.norm(res.state.vx)), 1.0,
                               atol=1e-5)


def test_warp_coords_and_flow_stat(rng):
    uv, nc, grad, idp = make_points(rng)
    st = et.initial_tracker_state()
    uv_ef, alive = et.warp_coords(st, CAM, nc, idp, jnp.ones_like(idp, bool))
    np.testing.assert_allclose(np.asarray(uv_ef), np.asarray(uv), atol=1e-3)
    assert bool(alive.all())
    assert float(et.mean_flow_magnitude(uv_ef, uv, alive)) < 1e-5


def test_pose_filter_mean(rng):
    f = et.pose_filter_init(5)
    taus = [np.concatenate([rng.normal(size=3) * 0.01, rng.normal(size=3) * 0.005])
            for _ in range(3)]
    for t in taus:
        f = et.pose_filter_push(f, SE3.exp(jnp.asarray(t, jnp.float32)))
    mean = et.pose_filter_mean(f)
    np.testing.assert_allclose(np.asarray(mean.log()),
                               np.mean(taus, axis=0), atol=1e-4)


def test_mad_loss_scale_updates(rng):
    uv, nc, grad, idp = make_points(rng, n=128)
    vx = et.initial_tracker_state().vx
    ef = jnp.zeros((H, W), jnp.float32)
    st = et.initial_tracker_state()
    res = et.optimize(st, ef, CAM, nc, grad, idp, jnp.ones_like(idp),
                      jnp.ones_like(idp, bool), max_iterations=3)
    assert float(res.loss_scale) > 0
    assert np.isfinite(float(res.energy))


def test_analytic_jacobian_matches_autodiff():
    """event_residuals_and_jac vs jacfwd of the residual vector through the
    local parameterization — must agree to float tolerance (the autodiff
    path is the oracle; the analytic one is what optimize() runs)."""
    import jax
    import numpy as np
    from slam_eds_tpu.utils.cameras import Pinhole

    H, W, P = 48, 64, 40
    cam = Pinhole(jnp.float32(60.0), jnp.float32(60.0),
                  jnp.float32(W / 2 - 0.5), jnp.float32(H / 2 - 0.5), W, H)
    rng = np.random.default_rng(3)
    ef = jnp.asarray(rng.normal(size=(H, W)) * 0.05, jnp.float32)
    nc = jnp.asarray(np.stack(
        [(rng.uniform(8, W - 8, P) - float(cam.cx)) / float(cam.fx),
         (rng.uniform(8, H - 8, P) - float(cam.cy)) / float(cam.fy)], -1),
        jnp.float32)
    grad = jnp.asarray(rng.normal(size=(P, 2)) * 12, jnp.float32)
    idp = jnp.asarray(rng.uniform(0.4, 1.2, P), jnp.float32)
    w = jnp.asarray(rng.uniform(0.5, 1.0, P), jnp.float32)
    mask = jnp.asarray(rng.random(P) > 0.15)

    # a non-trivial linearization point
    st0 = et.initial_tracker_state()
    st = et._apply_local(st0, jnp.asarray(
        rng.uniform(-0.05, 0.05, 12), jnp.float32))

    r_an, J_an = et.event_residuals_and_jac(st, ef, cam, nc, grad, idp, w,
                                            mask)

    def res_of(delta):
        return et.event_residuals(et._apply_local(st, delta), ef, cam, nc,
                                  grad, idp, w, mask)

    zero = jnp.zeros(12, jnp.float32)
    r_ad = res_of(zero)
    J_ad = jax.jacfwd(res_of)(zero)

    np.testing.assert_allclose(np.asarray(r_an), np.asarray(r_ad), atol=1e-6)
    np.testing.assert_allclose(np.asarray(J_an), np.asarray(J_ad),
                               atol=2e-4, rtol=2e-3)


def test_nc_jacobian_matches_autodiff():
    """PhotometricErrorNC variant (norm_event=True): the E-side rank-1
    normalization coupling must match forward-mode autodiff."""
    H, W, P = 48, 64, 40
    cam = Pinhole(jnp.float32(60.0), jnp.float32(60.0),
                  jnp.float32(W / 2 - 0.5), jnp.float32(H / 2 - 0.5), W, H)
    rng = np.random.default_rng(7)
    ef = jnp.asarray(rng.normal(size=(H, W)) * 4.0, jnp.float32)  # RAW frame
    nc = jnp.asarray(np.stack(
        [(rng.uniform(8, W - 8, P) - float(cam.cx)) / float(cam.fx),
         (rng.uniform(8, H - 8, P) - float(cam.cy)) / float(cam.fy)], -1),
        jnp.float32)
    grad = jnp.asarray(rng.normal(size=(P, 2)) * 12, jnp.float32)
    idp = jnp.asarray(rng.uniform(0.4, 1.2, P), jnp.float32)
    w = jnp.asarray(rng.uniform(0.5, 1.0, P), jnp.float32)
    mask = jnp.asarray(rng.random(P) > 0.15)

    st = et._apply_local(et.initial_tracker_state(), jnp.asarray(
        rng.uniform(-0.05, 0.05, 12), jnp.float32))

    r_an, J_an = et.event_residuals_and_jac(st, ef, cam, nc, grad, idp, w,
                                            mask, norm_event=True)

    def res_of(delta):
        return et.event_residuals(et._apply_local(st, delta), ef, cam, nc,
                                  grad, idp, w, mask, norm_event=True)

    zero = jnp.zeros(12, jnp.float32)
    np.testing.assert_allclose(np.asarray(r_an), np.asarray(res_of(zero)),
                               atol=5e-6)
    J_ad = jax.jacfwd(res_of)(zero)
    np.testing.assert_allclose(np.asarray(J_an), np.asarray(J_ad),
                               atol=2e-4, rtol=2e-3)


def test_nc_optimize_recovers_pose(rng):
    """NC cost with the RAW (un-normalized) synthetic frame still recovers
    the alignment: scale the frame arbitrarily — NC is scale-invariant."""
    uv, nc, _, idp = make_points(rng)
    vx = jnp.asarray([0.3, 0.1, -0.2, 0.05, -0.03, 0.08], jnp.float32)
    vx = vx / jnp.linalg.norm(vx)
    tau = jnp.asarray([0.02, -0.01, 0.015, 0.004, -0.003, 0.002], jnp.float32)
    T_true = SE3.exp(tau)
    img, grad = synth_event_frame(nc, None, idp, vx, T_true)
    img_raw = img * 37.5   # arbitrary scale: NC normalizes the samples

    st0 = et.TrackerState(
        px=T_true.t + jnp.asarray([0.004, -0.003, 0.002], jnp.float32),
        qx=lie.quat_normalize(lie.quat_mul(
            lie.quat_exp(jnp.asarray([0.002, 0.001, -0.002], jnp.float32)),
            lie.mat_to_quat(T_true.R))),
        vx=vx)
    w = jnp.ones((nc.shape[0],), jnp.float32)
    mask = jnp.ones((nc.shape[0],), bool)
    res = et.optimize(st0, img_raw, CAM, nc, grad, idp, w, mask,
                      max_iterations=30, loss_kind="none",
                      norm_event=True)
    err_t = float(jnp.linalg.norm(res.state.px - T_true.t))
    err0_t = float(jnp.linalg.norm(st0.px - T_true.t))
    assert err_t < 0.5 * err0_t, (err_t, err0_t)
