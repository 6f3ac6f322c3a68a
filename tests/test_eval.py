"""Config-4 evaluation surfaces: the vmapped batched event-solve must match
per-lane solves exactly, and the multi-sequence driver must aggregate
ATE/RPE across on-disk sequences in one process."""
import numpy as np
import jax
import jax.numpy as jnp

from slam_eds_tpu.eval import batched_event_solves, evaluate_sequences
from slam_eds_tpu.ops import event_tracker as et
from slam_eds_tpu.utils.cameras import Pinhole

from tests.test_runner import _export, CAM, W, H


def _toy_problem(rng, P=128):
    ys, xs = np.mgrid[0:H, 0:W]
    ef = (np.sin(xs * 0.2 + rng.normal()) * np.cos(ys * 0.15)).astype(np.float32)
    ef = ef / np.linalg.norm(ef)
    nc = np.stack([rng.uniform(-0.4, 0.4, P), rng.uniform(-0.3, 0.3, P)],
                  -1).astype(np.float32)
    grad = rng.normal(size=(P, 2)).astype(np.float32)
    idp = rng.uniform(0.3, 1.0, P).astype(np.float32)
    w = np.ones(P, np.float32)
    mask = rng.uniform(size=P) > 0.1
    return ef, nc, grad, idp, w, mask


def test_batched_solve_matches_single():
    rng = np.random.default_rng(3)
    B = 3
    probs = [_toy_problem(rng) for _ in range(B)]
    stacked = [jnp.asarray(np.stack([p[i] for p in probs]))
               for i in range(6)]
    states = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[et.initial_tracker_state() for _ in range(B)])

    batched = batched_event_solves(
        states, stacked[0], CAM, stacked[1], stacked[2], stacked[3],
        stacked[4], stacked[5], max_iterations=8,
        loss_scale=jnp.full((B,), 0.2, jnp.float32))

    for b in range(B):
        single = et.optimize(et.initial_tracker_state(),
                             jnp.asarray(probs[b][0]), CAM,
                             *[jnp.asarray(probs[b][i]) for i in range(1, 6)],
                             max_iterations=8, loss_scale=0.2)
        # f32 fusion order differs between the vmapped and single programs
        assert np.allclose(batched.state.px[b], single.state.px, atol=2e-4)
        assert np.allclose(batched.state.qx[b], single.state.qx, atol=2e-4)
        assert np.allclose(batched.energy[b], single.energy, rtol=1e-3)


def test_evaluate_sequences_aggregates(tmp_path):
    from slam_eds_tpu.io.dataset import SyntheticSequence
    from slam_eds_tpu.config import load_config

    cfg = load_config({
        "caps": {"max_points_per_kf": 256, "max_immature_per_kf": 256,
                 "max_window_frames": 6, "max_events": 4096},
        "bundles": {"window_size": 4, "min_frames": 3},
        "coarse": {"pyr_levels": 4, "max_iterations": [10, 20, 30, 30]},
        "selector": {"desired_immature_density": 300.0,
                     "desired_point_density": 200.0},
    })
    for i, scale in enumerate([0.3, 0.4]):
        seq = SyntheticSequence(CAM, num_frames=8, events_per_packet=64,
                                motion_scale=scale, seed=i)
        _export(seq, str(tmp_path / f"seq{i}"))

    report = evaluate_sequences([str(tmp_path)], cfg, frame_only=True,
                                verbose=False)
    assert report["num_sequences"] == 2
    assert report["mean_ate_rmse"] is not None
    for name, res in report["sequences"].items():
        assert res["frames"] == 8
        assert "ate_rmse" in res
        assert "rpe_trans" in res


def test_batched_ba_windows_matches_single():
    """vmapped ba_iterate over B windows == per-window solves."""
    from slam_eds_tpu.eval import batched_ba_windows
    from slam_eds_tpu.models import ba_state as bs
    from slam_eds_tpu.ops import energy
    from slam_eds_tpu.utils.lie import SE3

    F, P, Hh, Ww, B = 4, 64, 48, 64, 3
    rng = np.random.default_rng(5)

    def problem(seed):
        r = np.random.default_rng(seed)
        st = bs.empty_state(F, P, jnp.asarray([40.0, 40.0, 31.5, 23.5],
                                              jnp.float32))
        T = jax.vmap(SE3.exp)(jnp.asarray(
            r.uniform(-0.02, 0.02, (F, 6)), jnp.float32))
        uv = jnp.asarray(np.stack([r.uniform(6, Ww - 6, P),
                                   r.uniform(6, Hh - 6, P)], -1), jnp.float32)
        st = st._replace(
            T_eval=T, frame_valid=jnp.ones(F, bool), p_uv=uv,
            p_idepth=jnp.asarray(r.uniform(0.3, 1.0, P), jnp.float32),
            p_idepth_zero=jnp.asarray(r.uniform(0.3, 1.0, P), jnp.float32),
            p_color=jnp.asarray(r.uniform(20, 200, (P, 8)), jnp.float32),
            p_status=jnp.full((P,), bs.PT_ACTIVE, jnp.int32),
            r_active=jnp.asarray(np.tile([False] + [True] * (F - 1), (P, 1))),
            frame_prior=jnp.zeros((F, 8), jnp.float32).at[0, :6].set(1e8))
        ys, xs = np.mgrid[0:Hh, 0:Ww]
        base = (np.sin(xs * 0.2 + seed) * np.cos(ys * 0.15) * 80
                + 120).astype(np.float32)
        imgs = np.stack([np.stack([base, np.gradient(base, axis=1),
                                   np.gradient(base, axis=0)], -1)] * F)
        return st, jnp.asarray(imgs)

    probs = [problem(s) for s in range(B)]
    states = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                    *[p[0] for p in probs])
    images = jnp.stack([p[1] for p in probs])

    # one GN step: batched lanes must match per-window solves (the GN
    # normal systems carry ~1e8 priors, so iterated comparisons amplify
    # f32 LU differences chaotically — energies are the stable observable)
    out_states, energies = batched_ba_windows(states, images, Hh, Ww,
                                              iterations=1)
    assert energies.shape == (B,)
    for b in range(B):
        st_b, e_b, _ = energy.ba_iterate(probs[b][0], probs[b][1], Hh, Ww,
                                         iterations=1)
        assert np.allclose(float(energies[b]), float(e_b), rtol=1e-3)
        # vmapped and single-window LU are different lowerings; with ~1e8
        # priors in the system their f32 solve differences amplify to
        # sub-percent state differences — compare scale-relative
        assert np.allclose(out_states.p_idepth[b], st_b.p_idepth,
                           rtol=2e-2, atol=1e-2)

    # and per-lane energies must decrease over more iterations
    _, e3 = batched_ba_windows(states, images, Hh, Ww, iterations=3)
    assert np.all(np.asarray(e3) < np.asarray(energies) * 1.001)
