"""Golden numerical parity vs reference semantics (VERDICT r4 #2).

``native/dso_golden.cpp`` is an independent double-precision implementation
of the reference's exact BA math — Residuals.cpp:69-265 linearization,
AccumulatedTopHessian.cpp:39-162 mode-0 accumulation, setAdjointsF with
SCALE_A/SCALE_B, AccumulatedSCHessian Schur complement, the
EnergyFunctional.cpp:775-913 damped scaled solve and :263-317 idepth
back-substitution — plus the EDS event cost of PhotometricError.hpp:124-182.
This test seeds one world, feeds identical numbers to the golden binary and
to ``slam_eds_tpu.ops.energy`` / ``ops.event_tracker``, and asserts
entry-wise agreement within f32 tolerance.

Known, bounded representation differences (asserted-through, not excused):
* SCALE_A=10 / SCALE_B=1000: the reference optimizes scaled affine
  variables; this repo optimizes unscaled ones with SVecI preconditioning.
  The mapping is the exact diagonal similarity H_ref = D H D, b_ref = D b,
  x = D x_ref with D = diag(..., 10, 1000) on the affine rows — applied
  here before comparing.
* idepth steps: the reference back-substitutes with the UNdamped point
  Hessian (resubstituteFPt), this repo with Hdd*(1+lambda) — a 1e-5
  relative difference at the FIX_LAMBDA default, inside tolerance.
"""
import os
import subprocess
import struct

import numpy as np
import pytest
import jax.numpy as jnp

from slam_eds_tpu.models import ba_state as bs
from slam_eds_tpu.ops import energy
from slam_eds_tpu.utils.lie import SE3

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "native", "dso_golden.cpp")
EXE = "/tmp/dso_golden_test"

F, P, K, H, W = 4, 48, 8, 120, 160
CPARS = 4
LAM = 1e-5


@pytest.fixture(scope="module")
def golden_exe():
    try:
        subprocess.run(["g++", "-O2", "-std=c++17", "-o", EXE, SRC],
                       check=True, capture_output=True, timeout=180)
    except Exception as exc:          # pragma: no cover - toolchain missing
        pytest.skip(f"g++ unavailable: {exc}")
    return EXE


def _world(energy_th=1e8, seed=7):
    """Seeded world; returns (BAState, images_jnp, images_np, extras)."""
    rng = np.random.default_rng(seed)
    state = bs.empty_state(F, P, jnp.asarray([90.0, 92.0, W / 2 - 0.5,
                                              H / 2 - 0.5], jnp.float32))
    taus = rng.uniform(-0.04, 0.04, (F, 6)).astype(np.float32)
    T = SE3.exp(jnp.asarray(taus[0]))
    import jax
    Tb = jax.vmap(SE3.exp)(jnp.asarray(taus))
    delta = rng.uniform(-2e-3, 2e-3, (F, 8)).astype(np.float32)
    aff_eval = rng.uniform(-0.05, 0.05, (F, 2)).astype(np.float32)
    aff_eval[:, 1] *= 100.0           # b is in gray levels
    exposure = rng.uniform(0.8, 1.2, F).astype(np.float32)
    prior = np.zeros((F, 8), np.float32)
    prior[0, :6] = 1e8
    prior[0, 6:] = 1e4

    hosts = rng.integers(0, F, P)
    uv = np.stack([rng.uniform(8, W - 8, P), rng.uniform(8, H - 8, P)],
                  -1).astype(np.float32)
    idep0 = rng.uniform(0.5, 1.5, P).astype(np.float32)
    idep = (idep0 + rng.uniform(-0.02, 0.02, P)).astype(np.float32)
    color = rng.uniform(50, 200, (P, K)).astype(np.float32)
    weights = rng.uniform(0.5, 1.0, (P, K)).astype(np.float32)
    pprior = np.where(rng.random(P) < 0.25, 100.0, 0.0).astype(np.float32)
    r_act = np.ones((P, F), bool)
    r_act[np.arange(P), hosts] = False

    state = state._replace(
        T_eval=Tb, delta=jnp.asarray(delta),
        aff_eval=jnp.asarray(aff_eval), exposure=jnp.asarray(exposure),
        frame_prior=jnp.asarray(prior),
        frame_valid=jnp.ones(F, bool),
        frame_energy_th=jnp.full((F,), energy_th, jnp.float32),
        c_delta=jnp.asarray(rng.uniform(-0.2, 0.2, 4), jnp.float32),
        p_host=jnp.asarray(hosts, jnp.int32), p_uv=jnp.asarray(uv),
        p_idepth=jnp.asarray(idep), p_idepth_zero=jnp.asarray(idep0),
        p_prior=jnp.asarray(pprior),
        p_color=jnp.asarray(color), p_weight=jnp.asarray(weights),
        p_status=jnp.full((P,), bs.PT_ACTIVE, jnp.int32),
        r_active=jnp.asarray(r_act))

    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    I = (np.sin(xs * 0.11) * np.cos(ys * 0.13) * 60.0
         + np.sin((xs + ys) * 0.05) * 40.0 + 128.0)
    gx = np.zeros_like(I)
    gy = np.zeros_like(I)
    gx[:, 1:-1] = 0.5 * (I[:, 2:] - I[:, :-2])
    gy[1:-1, :] = 0.5 * (I[2:, :] - I[:-2, :])
    img = np.stack([I, gx, gy], -1).astype(np.float32)
    images = np.broadcast_to(img, (F, H, W, 3)).copy()
    return state, jnp.asarray(images), images


def _dscale():
    d = np.ones(CPARS + 8 * F)
    for f in range(F):
        d[CPARS + 8 * f + 6] = 10.0
        d[CPARS + 8 * f + 7] = 1000.0
    return d


def _write_ba_input(path, state, images_np):
    """Field order mirrors dso_golden.cpp run_ba."""
    import jax
    cur = state.current_poses()
    cur_R = np.asarray(cur.R, np.float64)
    cur_t = np.asarray(cur.t, np.float64)
    R0 = np.asarray(state.T_eval.R, np.float64)
    t0 = np.asarray(state.T_eval.t, np.float64)
    aff0 = np.asarray(state.aff_eval, np.float64)
    affc = np.asarray(state.current_aff(), np.float64)
    calib = np.asarray(state.current_calib(), np.float64)
    with open(path, "wb") as f:
        f.write(struct.pack("<6i", F, P, K, H, W, CPARS))
        f.write(np.asarray(calib, "<f8").tobytes())
        f.write(np.asarray(state.c_delta, "<f8").tobytes())
        f.write(struct.pack("<d", LAM))
        f.write(struct.pack("<dd", 9.0, 2500.0))
        f.write(struct.pack("<i", 1))                      # use_cprior
        delta = np.asarray(state.delta, np.float64)
        prior = np.asarray(state.frame_prior, np.float64)
        dp0 = np.asarray(state.frame_prior_delta0, np.float64)
        eth = np.asarray(state.frame_energy_th, np.float64)
        # the reference's frame prior lives on the SCALED state (FrameHessian
        # ::getPrior is quoted in SCALE_A/SCALE_B coordinates); this repo's
        # frame_prior is on unscaled variables — same physical prior means
        # P_scaled = P * d^2 and delta_scaled = delta / d
        db = np.array([1, 1, 1, 1, 1, 1, 10.0, 1000.0])
        prior = prior * db[None, :] ** 2
        for k in range(F):
            f.write(np.asarray(R0[k], "<f8").tobytes())
            f.write(np.asarray(t0[k], "<f8").tobytes())
            f.write(np.asarray(cur_R[k], "<f8").tobytes())
            f.write(np.asarray(cur_t[k], "<f8").tobytes())
            f.write(np.asarray(aff0[k], "<f8").tobytes())
            f.write(np.asarray(affc[k], "<f8").tobytes())
            f.write(struct.pack("<d", float(state.exposure[k])))
            f.write(np.asarray(prior[k], "<f8").tobytes())
            f.write(np.asarray((delta[k] - dp0[k]) / db, "<f8").tobytes())
            f.write(np.asarray(delta[k], "<f8").tobytes())
            f.write(struct.pack("<d", float(eth[k])))
        uv = np.asarray(state.p_uv, np.float64)
        for p in range(P):
            f.write(struct.pack("<6d", uv[p, 0], uv[p, 1],
                                float(state.p_idepth[p]),
                                float(state.p_idepth_zero[p]),
                                float(state.p_prior[p]),
                                float(state.p_host[p])))
            f.write(np.asarray(state.p_color[p], "<f8").tobytes())
            f.write(np.asarray(state.p_weight[p], "<f8").tobytes())
        f.write(np.asarray(state.r_active, np.uint8).tobytes())
        f.write(np.ascontiguousarray(images_np, "<f4").tobytes())


def _read_ba_output(path):
    with open(path, "rb") as f:
        D, Pn, Fn = struct.unpack("<3i", f.read(12))
        rd = lambda n: np.frombuffer(f.read(8 * n), "<f8").copy()
        out = {
            "HA": rd(D * D).reshape(D, D), "bA": rd(D),
            "Hsc": rd(D * D).reshape(D, D), "bsc": rd(D),
            "HF": rd(D * D).reshape(D, D), "bF": rd(D),
            "x": rd(D), "steps": rd(Pn),
            "Hdd": rd(Pn), "bd": rd(Pn),
            "status": rd(Pn * Fn).reshape(Pn, Fn).astype(int),
            "energy": rd(Pn * Fn).reshape(Pn, Fn),
            "resF": rd(Pn * Fn * K).reshape(Pn, Fn, K),
            "J": rd(Pn * Fn * 38).reshape(Pn, Fn, 38),
        }
    return out


@pytest.fixture(scope="module")
def golden(golden_exe):
    state, images, images_np = _world()
    inp, outp = "/tmp/golden_ba_in.bin", "/tmp/golden_ba_out.bin"
    _write_ba_input(inp, state, images_np)
    subprocess.run([golden_exe, "ba", inp, outp], check=True, timeout=120)
    g = _read_ba_output(outp)
    lin = energy.linearize(state, images, H, W)
    asm = energy.assemble(state, lin)
    sol = energy.solve_delta(state, asm, lam=LAM, use_orth=False)
    return state, g, lin, asm, sol


def test_golden_residual_states_match(golden):
    state, g, lin, asm, sol = golden
    valid = np.asarray(lin.valid)
    oob = np.asarray(lin.oob)
    struct_off = ~np.asarray(state.r_active) | (
        np.arange(F)[None, :] == np.asarray(state.p_host)[:, None])
    assert (g["status"][struct_off] == 3).all()
    live = ~struct_off
    assert (valid[live] == (g["status"][live] == 0)).all()
    assert (oob[live] == (g["status"][live] == 1)).all()
    # at least a healthy share of residuals participates
    assert valid.sum() > 0.5 * live.sum()


def test_golden_linearization_matches(golden):
    state, g, lin, asm, sol = golden
    m = np.asarray(lin.valid)
    res = np.asarray(lin.res)
    J = g["J"]
    np.testing.assert_allclose(res[m], g["resF"][m], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(lin.Jpdxi)[m].reshape(-1, 12),
        J[m][:, :12], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(lin.Jpdc)[m].reshape(-1, 8),
        J[m][:, 12:20], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(lin.Jpdd)[m], J[m][:, 20:22], rtol=2e-3, atol=2e-3)
    JIdx = np.asarray(lin.JIdx)[m]                     # [n, K, 2]
    np.testing.assert_allclose(JIdx[..., 0], J[m][:, 22:30],
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(JIdx[..., 1], J[m][:, 30:38],
                               rtol=2e-3, atol=2e-3)
    e = np.asarray(lin.energy)
    np.testing.assert_allclose(e[m], g["energy"][m], rtol=3e-3, atol=1e-2)


def _rel_h(Ha, Hb):
    s = np.sqrt(np.abs(np.diag(Hb))) + 1.0
    return np.max(np.abs(Ha - Hb) / np.outer(s, s))


def test_golden_assembled_system_matches(golden):
    state, g, lin, asm, sol = golden
    d = _dscale()
    HA_u = g["HA"] / np.outer(d, d)
    bA_u = g["bA"] / d
    assert _rel_h(np.asarray(asm.H), HA_u) < 5e-4
    sb = np.sqrt(np.abs(np.diag(HA_u))) + 1.0
    assert np.max(np.abs(np.asarray(asm.b) - bA_u) / sb) < 5e-4
    # point Schur scalars (repo includes the idepth prior; golden dumps raw)
    pprior = np.asarray(state.p_prior)
    dF = np.asarray(state.p_idepth) - np.asarray(state.p_idepth_zero)
    np.testing.assert_allclose(np.asarray(asm.Hdd) - pprior, g["Hdd"],
                               rtol=2e-3, atol=2e-2)
    np.testing.assert_allclose(np.asarray(asm.bd) - pprior * dF, g["bd"],
                               rtol=2e-3, atol=2e-2)


def test_golden_solve_matches(golden):
    state, g, lin, asm, sol = golden
    d = _dscale()
    HF_u = g["HF"] / np.outer(d, d)
    assert _rel_h(np.asarray(sol.H_final), HF_u) < 5e-4
    sb = np.sqrt(np.abs(np.diag(HF_u))) + 1.0
    assert np.max(np.abs(np.asarray(sol.b_final) - g["bF"] / d) / sb) < 2e-3
    x_u = g["x"] * d
    xr = np.asarray(sol.x)
    scale = np.max(np.abs(x_u)) + 1e-12
    np.testing.assert_allclose(xr, x_u, rtol=5e-3, atol=5e-4 * scale)
    np.testing.assert_allclose(np.asarray(sol.point_step), g["steps"],
                               rtol=5e-3, atol=5e-4)


def test_golden_outlier_gating_matches(golden_exe):
    """Moderate frameEnergyTH so the OUTLIER branch fires in both."""
    state, images, images_np = _world(energy_th=2000.0, seed=11)
    inp, outp = "/tmp/golden_ba_in2.bin", "/tmp/golden_ba_out2.bin"
    _write_ba_input(inp, state, images_np)
    subprocess.run([golden_exe, "ba", inp, outp], check=True, timeout=120)
    g = _read_ba_output(outp)
    lin = energy.linearize(state, images, H, W)
    valid = np.asarray(lin.valid)
    struct_off = ~np.asarray(state.r_active) | (
        np.arange(F)[None, :] == np.asarray(state.p_host)[:, None])
    live = ~struct_off
    assert (g["status"] == 2).any()                 # gating exercised
    assert (valid[live] == (g["status"][live] == 0)).all()


# ---------------------------------------------------------------------------
# Event cost parity (PhotometricError.hpp:124-182 / NC variant)

def _event_world(seed=5):
    rng = np.random.default_rng(seed)
    Pe, He, We = 96, 60, 80
    ys, xs = np.mgrid[0:He, 0:We].astype(np.float64)
    ef = np.sin(xs * 0.3) * np.cos(ys * 0.25) * 0.2
    ncx = rng.uniform(-0.3, 0.3, Pe)
    ncy = rng.uniform(-0.25, 0.25, Pe)
    gx = rng.uniform(-30, 30, Pe)
    gy = rng.uniform(-30, 30, Pe)
    idp = rng.uniform(0.4, 1.6, Pe)
    wts = rng.uniform(0.5, 1.0, Pe)
    px = np.asarray([0.01, -0.02, 0.03])
    ax = rng.normal(size=3) * 0.02
    ang = np.linalg.norm(ax)
    q = np.concatenate([[np.cos(ang / 2)], np.sin(ang / 2) * ax / ang])
    v = rng.normal(size=6)
    v = v / np.linalg.norm(v)
    return Pe, He, We, ef, ncx, ncy, gx, gy, idp, wts, px, q, v


@pytest.mark.parametrize("norm_event", [False, True])
def test_golden_event_cost_matches(golden_exe, norm_event):
    Pe, He, We, ef, ncx, ncy, gx, gy, idp, wts, px, q, v = _event_world()
    inp, outp = "/tmp/golden_ev_in.bin", "/tmp/golden_ev_out.bin"
    with open(inp, "wb") as f:
        f.write(struct.pack("<4i", Pe, He, We, int(norm_event)))
        f.write(struct.pack("<4d", 70.0, 72.0, We / 2 - 0.5, He / 2 - 0.5))
        for a in (px, q, v, ncx, ncy, gx, gy, idp, wts, ef.ravel()):
            f.write(np.asarray(a, "<f8").tobytes())
    subprocess.run([golden_exe, "event", inp, outp], check=True, timeout=60)
    with open(outp, "rb") as f:
        Pn, = struct.unpack("<i", f.read(4))
        r_g = np.frombuffer(f.read(8 * Pn), "<f8")

    from slam_eds_tpu.ops import event_tracker as et
    from slam_eds_tpu.utils.cameras import Pinhole
    cam = Pinhole(jnp.float32(70.0), jnp.float32(72.0),
                  jnp.float32(We / 2 - 0.5), jnp.float32(He / 2 - 0.5),
                  We, He)
    st = et.TrackerState(px=jnp.asarray(px, jnp.float32),
                         qx=jnp.asarray(q, jnp.float32),
                         vx=jnp.asarray(v, jnp.float32))
    r = et.event_residuals(
        st, jnp.asarray(ef, jnp.float32), cam,
        jnp.asarray(np.stack([ncx, ncy], -1), jnp.float32),
        jnp.asarray(np.stack([gx, gy], -1), jnp.float32),
        jnp.asarray(idp, jnp.float32), jnp.asarray(wts, jnp.float32),
        jnp.ones(Pe, bool), norm_event=norm_event)
    np.testing.assert_allclose(np.asarray(r), r_g, rtol=2e-3, atol=2e-4)
