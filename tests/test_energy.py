"""BA core tests: gradient-check the assembled system against autodiff, and
convergence on a synthetic multi-view scene (fronto-parallel textured plane).
"""
import numpy as np
import jax
import jax.numpy as jnp

from slam_eds_tpu.models import ba_state as bs
from slam_eds_tpu.ops import energy
from slam_eds_tpu.utils import image
from slam_eds_tpu.utils.interp import bilinear, bilinear_3
from slam_eds_tpu.utils.lie import SE3

H, W = 80, 96
FX = FY = 90.0
CX, CY = W / 2 - 0.5, H / 2 - 0.5
PLANE_Z = 2.0


def texture(rng):
    ys, xs = np.mgrid[0:400, 0:400]
    t = (np.sin(xs * 0.15) * np.cos(ys * 0.2)
         + 0.6 * np.sin(xs * 0.05 + ys * 0.08)
         + 0.4 * np.cos(xs * 0.33 - ys * 0.21))
    t = (t - t.min()) / (t.max() - t.min()) * 200.0 + 20.0
    return jnp.asarray(t, jnp.float32)


def surface_z(X, Y):
    """Non-planar world surface z(X, Y) — planar scenes leave a rotation/
    translation near-ambiguity that would make pose recovery ill-posed."""
    return PLANE_Z + 0.35 * jnp.sin(1.3 * X) * jnp.cos(1.1 * Y) + 0.2 * X


def _intersect_surface(origin, dirs, iters=8):
    """Ray-surface intersection by fixed-point iteration on the depth along
    the ray (gentle surface -> converges fast). origin [3], dirs [N, 3]."""
    lam = (PLANE_Z - origin[2]) / dirs[:, 2]
    for _ in range(iters):
        Xw = origin[None, :] + dirs * lam[:, None]
        z_s = surface_z(Xw[:, 0], Xw[:, 1])
        lam = (z_s - origin[2]) / dirs[:, 2]
    return lam


def render(tex, T_wc: SE3):
    """Render the textured surface seen from worldToCam pose T_wc."""
    ys, xs = np.mgrid[0:H, 0:W]
    p = jnp.asarray(np.stack([(xs.ravel() - CX) / FX,
                              (ys.ravel() - CY) / FY,
                              np.ones(H * W)], -1), jnp.float32)
    T_cw = T_wc.inverse()
    dirs = p @ T_cw.R.T
    lam = _intersect_surface(T_cw.t, dirs)
    Xw = T_cw.t[None, :] + dirs * lam[:, None]
    u = Xw[:, 0] * 60.0 + 200.0
    v = Xw[:, 1] * 60.0 + 200.0
    img = bilinear(tex, u, v).reshape(H, W)
    return img


def build_scene(rng, F=4, P=128, perturb=0.0):
    tex = texture(rng)
    taus = [np.zeros(6)]
    for i in range(1, F):
        taus.append(np.concatenate([rng.uniform(-0.08, 0.08, 3),
                                    rng.uniform(-0.02, 0.02, 3)]))
    poses = [SE3.exp(jnp.asarray(t, jnp.float32)) for t in taus]
    imgs = [render(tex, T) for T in poses]
    pyrs = [image.build_pyramid(im, 1)[0][0] for im in imgs]
    target_images = jnp.stack(pyrs)   # [F, H, W, 3]

    state = bs.empty_state(F, P, jnp.asarray([FX, FY, CX, CY], jnp.float32))
    R = jnp.stack([T.R for T in poses])
    t = jnp.stack([T.t for T in poses])
    state = state._replace(
        T_eval=SE3(R, t),
        frame_valid=jnp.ones(F, bool),
        frame_energy_th=jnp.full((F,), 1e8, jnp.float32),
    )
    # points on a grid in frame 0 (identity -> plane depth = PLANE_Z)
    n_side = int(np.sqrt(P))
    us = np.linspace(8, W - 9, n_side)
    vs = np.linspace(8, H - 9, n_side)
    uu, vv = np.meshgrid(us, vs)
    uv = np.stack([uu.ravel(), vv.ravel()], -1)[:P].astype(np.float32)
    npts = uv.shape[0]
    colors = []
    for k in range(8):
        dx, dy = image.PATTERN_DSO8[k]
        colors.append(np.asarray(bilinear(imgs[0], jnp.asarray(uv[:, 0] + dx),
                                          jnp.asarray(uv[:, 1] + dy))))
    colors = np.stack(colors, -1)
    # true idepths: frame 0 is at identity, so camera depth = ray length along
    # z of the surface intersection
    dirs = jnp.asarray(np.stack([(uv[:, 0] - CX) / FX, (uv[:, 1] - CY) / FY,
                                 np.ones(npts)], -1), jnp.float32)
    lam = _intersect_surface(jnp.zeros(3), dirs)
    idp = np.asarray(1.0 / lam, np.float32)
    if perturb:
        idp = idp * (1 + rng.uniform(-perturb, perturb, npts)).astype(np.float32)

    pad = lambda a, sh: np.concatenate([a, np.zeros((P - npts,) + sh, a.dtype)])
    state = state._replace(
        p_uv=jnp.asarray(pad(uv, (2,))),
        p_idepth=jnp.asarray(pad(idp, ())),
        p_idepth_zero=jnp.asarray(pad(idp, ())),
        p_color=jnp.asarray(pad(colors, (8,))),
        p_weight=jnp.ones((P, 8), jnp.float32),
        p_prior=jnp.full((P,), 1.0, jnp.float32),
        p_status=jnp.asarray(np.concatenate([np.full(npts, bs.PT_ACTIVE),
                                             np.zeros(P - npts)]), jnp.int32),
        p_host=jnp.zeros((P,), jnp.int32),
        r_active=jnp.asarray(
            np.concatenate([np.tile([False] + [True] * (F - 1), (npts, 1)),
                            np.zeros((P - npts, F), bool)])),
        # strong gauge prior on frame 0
        frame_prior=jnp.zeros((F, 8), jnp.float32).at[0, :6].set(1e8),
    )
    return state, target_images, poses


def test_linearize_residuals_near_zero_at_truth(rng):
    state, imgs, _ = build_scene(rng)
    lin = energy.linearize(state, imgs, H, W)
    n_valid = int(lin.valid.sum())
    assert n_valid > 200
    r = np.asarray(lin.res)[np.asarray(lin.valid)]
    assert np.abs(r).mean() < 1.0  # small photometric error at truth


def test_assembled_b_matches_autodiff(rng):
    """At delta=0 (FEJ == current), b must equal the gradient of
    0.5*sum(resF^2) wrt (frame deltas, calib delta, idepths).

    Target images are linear ramps so the bilinear sample's autodiff gradient
    coincides exactly with the precomputed gradient channels the analytic
    Jacobian uses — this isolates the adjoint/scatter plumbing from the
    image-sampling convention. The remaining ~1-2% discrepancy is DSO's
    deliberate shared-center geometric Jacobian across the 8-pixel pattern
    (Residuals.cpp computes Jpdxi/Jpdc/Jpdd once at the center), which
    autodiff does not share; tolerance is set just above it."""
    state, imgs, _ = build_scene(rng, F=3, P=64)
    # replace targets with per-frame ramps (I = a x + b y + c, exact grads)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    ramps = []
    for f in range(3):
        a, b, c = rng.uniform(0.5, 2.0, 3)
        I = a * xs + b * ys + 10 * c
        ramps.append(np.stack([I, np.full_like(I, a), np.full_like(I, b)], -1))
    imgs = jnp.asarray(np.stack(ramps))
    lin0 = energy.linearize(state, imgs, H, W)
    asm = energy.assemble(state, lin0)
    assert int(lin0.valid.sum()) > 50

    def E(delta, cdelta, idepth):
        s = state._replace(delta=delta, c_delta=cdelta, p_idepth=idepth)
        lin = energy.linearize(s, imgs, H, W)
        m = jax.lax.stop_gradient(lin0.valid)
        return 0.5 * jnp.sum(jnp.where(m[..., None], lin.res, 0.0) ** 2)

    g_delta, g_c, g_d = jax.grad(E, argnums=(0, 1, 2))(
        state.delta, state.c_delta, state.p_idepth)

    b_frames = np.asarray(asm.b[bs.CPARS:]).reshape(state.num_frames, 8)
    g_frames = np.asarray(g_delta)
    # frame 0 has no residuals hosted elsewhere targeting it? it does (as
    # host of all points). compare all valid frames
    scale = max(np.abs(b_frames).max(), 1e-6)
    np.testing.assert_allclose(g_frames / scale, b_frames / scale, atol=2e-3)
    np.testing.assert_allclose(np.asarray(g_c) / scale,
                               np.asarray(asm.b[:bs.CPARS]) / scale, atol=2e-3)
    # point gradient vs bd (minus prior term which is zero at idepth==zero)
    bd = np.asarray(asm.bd)
    np.testing.assert_allclose(np.asarray(g_d) / scale, bd / scale, atol=2e-3)


def test_ba_converges_from_perturbed_poses(rng):
    state, imgs, poses = build_scene(rng, F=4, P=144)
    # perturb frames 1..3 and idepths
    d = np.zeros((4, 8), np.float32)
    d[1:, :3] = rng.uniform(-0.01, 0.01, (3, 3))
    d[1:, 3:6] = rng.uniform(-0.004, 0.004, (3, 3))
    state_p = state._replace(
        delta=jnp.asarray(d),
        p_idepth=state.p_idepth * (1 + 0.05 * jnp.asarray(
            rng.uniform(-1, 1, state.num_points), jnp.float32)))

    lin_before = energy.linearize(state_p, imgs, H, W)
    e_before = float(lin_before.energy.sum())
    state_opt, e_after, _ = energy.ba_iterate(state_p, imgs, H, W, iterations=6)
    assert float(e_after) < 0.1 * e_before, (e_before, float(e_after))
    # recovered relative pose frame0->frame1 close to truth UP TO the
    # monocular scale gauge (idepth <-> translation scale is unobservable;
    # align the scale from the mean idepth before comparing)
    m = np.asarray(state_opt.p_status) == bs.PT_ACTIVE
    idp = np.asarray(state_opt.p_idepth)[m]
    idp_true = np.asarray(state.p_idepth)[m]   # unperturbed truth
    scale = (idp_true / idp).mean()            # estimated world scale vs truth
    T = state_opt.current_poses()
    T01_est = SE3(T.R[1], T.t[1]).compose(SE3(T.R[0], T.t[0]).inverse())
    T01_true = poses[1].compose(poses[0].inverse())
    rot_err = SE3(T01_true.R, jnp.zeros(3)).inverse().compose(
        SE3(T01_est.R, jnp.zeros(3))).log()[3:]
    assert float(jnp.linalg.norm(rot_err)) < 2e-3, np.asarray(rot_err)
    t_err = np.asarray(T01_est.t) * scale - np.asarray(T01_true.t)
    assert np.linalg.norm(t_err) < 5e-3, t_err
    # idepths consistent (low residual spread once scale-aligned)
    rel = idp * scale / idp_true
    assert np.abs(rel - 1.0).mean() < 0.02


def test_marginalize_point_then_solve(rng):
    state, imgs, _ = build_scene(rng, F=3, P=64)
    lin = energy.linearize(state, imgs, H, W)
    # flag half the points
    st = np.asarray(state.p_status).copy()
    active = np.where(st == bs.PT_ACTIVE)[0]
    st[active[::2]] = bs.PT_MARGINALIZE
    state_m = state._replace(p_status=jnp.asarray(st))
    state_m = energy.marginalize_points(state_m, lin)
    assert float(jnp.abs(state_m.HM).sum()) > 0
    assert int((np.asarray(state_m.p_status) == bs.PT_MARGINALIZE).sum()) == 0
    # prior is PSD-ish: symmetric, nonneg diagonal
    HM = np.asarray(state_m.HM)
    np.testing.assert_allclose(HM, HM.T, atol=1e-3)
    assert (np.diagonal(HM) > -1e-3).all()
    # solve still works
    lin2 = energy.linearize(state_m, imgs, H, W)
    asm = energy.assemble(state_m, lin2)
    sol = energy.solve_delta(state_m, asm)
    assert np.isfinite(np.asarray(sol.x)).all()


def test_marginalize_frame_removes_slot(rng):
    state, imgs, _ = build_scene(rng, F=3, P=64)
    lin = energy.linearize(state, imgs, H, W)
    st = jnp.where(state.p_status == bs.PT_ACTIVE, bs.PT_MARGINALIZE,
                   state.p_status)
    state_m = energy.marginalize_points(state._replace(p_status=st), lin)
    state_f = energy.marginalize_frame(state_m, slot=1)
    assert not bool(state_f.frame_valid[1])
    i0 = bs.CPARS + 8 * 1
    HM = np.asarray(state_f.HM)
    assert np.abs(HM[i0:i0 + 8, :]).max() == 0.0
    assert np.abs(HM[:, i0:i0 + 8]).max() == 0.0
    # information about remaining frames persists
    assert np.abs(HM).sum() > 0


def test_nullspace_orthogonalization(rng):
    state, imgs, _ = build_scene(rng, F=3, P=64)
    N = energy.nullspaces(state)
    x = jnp.asarray(rng.normal(size=state.dim), jnp.float32)
    xo = energy.orthogonalize(x, N)
    # projected x has (near) zero overlap with each nullspace direction
    overlap = np.asarray(N.T @ xo)
    assert np.abs(overlap).max() < 1e-3
