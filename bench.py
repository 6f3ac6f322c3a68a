"""Benchmark: keyframe-BA GN rate + end-to-end pipeline rate on one chip.

BASELINE.json's per-chip metric is "keyframe-BA iters/s + frames/s per
chip". The reference publishes no numbers (SURVEY §6) and cannot be built
here (Eigen/Ceres absent), so the comparison anchor is MEASURED at bench
time by compiling and running ``native/dso_baseline.cpp`` — a
dependency-free C++ harness replicating the reference's GN-iteration shape
(2000 pts x 7-KF window x 8-pattern linearize, AccumulatorApprox 13x13
accumulation incl. the shift-register cascade, Schur, 60x60 LDLT,
resubstitution; 6 threads + compiler AVX, a strictly stronger build than
the reference's hand SSE). vs_baseline is measurement/measurement.
NOTE the container exposes 2 CPU cores; the measured baseline is what the
reference-class solver achieves on THIS host, reported as such.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
The headline is the TRUE production-representative rate: a dependent
chain of 6-GN-iteration dispatches, wall-clocked through one host
materialization (see bench_ba's docstring for why undrained timings in
this environment are fiction). The end-to-end pipeline numbers (frames/s,
event solves/s, ATE at the reference operating point 640x480 / 2048 pts /
window 7+1 / 6 iters) ride in "extra".
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from slam_eds_tpu.compile_cache import setup_cache  # noqa: E402

setup_cache(os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


# ---------------------------------------------------------------------------
def measured_cpu_baseline():
    """Compile + run the reference-shape CPU harness; returns its GN
    iters/s, or None when the toolchain is unavailable."""
    src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "native", "dso_baseline.cpp")
    exe = "/tmp/dso_baseline_bench"
    try:
        subprocess.run(["g++", "-O3", "-march=native", "-std=c++17",
                        "-pthread", "-o", exe, src],
                       check=True, capture_output=True, timeout=120)
        out = subprocess.run([exe, "30"], check=True, capture_output=True,
                             timeout=300).stdout.decode()
        return json.loads(out.strip())
    except Exception:
        return None


# ---------------------------------------------------------------------------
def build_ba_problem():
    from slam_eds_tpu.models import ba_state as bs
    from slam_eds_tpu.utils.lie import SE3

    F, P = 8, 2048               # reference operating point (padded)
    H, W = 480, 640
    rng = np.random.default_rng(0)
    state = bs.empty_state(F, P, jnp.asarray([400.0, 400.0, 319.5, 239.5],
                                             jnp.float32))
    taus = jnp.asarray(rng.uniform(-0.05, 0.05, (F, 6)), jnp.float32)
    T = jax.vmap(SE3.exp)(taus)
    uv = jnp.asarray(np.stack([rng.uniform(8, W - 8, P),
                               rng.uniform(8, H - 8, P)], -1), jnp.float32)
    # NOTE: keep this function free of device->host transfers. Through the
    # axon TPU tunnel, a single D2H (np.asarray of a device array) switches
    # the stream into a synchronous mode that slows gather-heavy executables
    # by ~1000x for the rest of the process (measured r2).
    hosts_np = rng.integers(0, 7, P)
    hosts = jnp.asarray(hosts_np, jnp.int32)
    r_act = np.ones((P, F), bool)
    r_act[np.arange(P), hosts_np] = False
    state = state._replace(
        T_eval=T,
        frame_valid=jnp.ones(F, bool),
        p_uv=uv,
        p_host=hosts,
        p_idepth=jnp.asarray(rng.uniform(0.3, 1.0, P), jnp.float32),
        p_idepth_zero=jnp.asarray(rng.uniform(0.3, 1.0, P), jnp.float32),
        p_color=jnp.asarray(rng.uniform(20, 200, (P, 8)), jnp.float32),
        p_status=jnp.full((P,), bs.PT_ACTIVE, jnp.int32),
        r_active=jnp.asarray(r_act),
        frame_prior=jnp.zeros((F, 8), jnp.float32).at[0, :6].set(1e8),
    )
    ys, xs = np.mgrid[0:H, 0:W]
    base = (np.sin(xs * 0.05) * np.cos(ys * 0.07) * 100 + 128).astype(np.float32)
    imgs = np.stack([np.stack([base, np.gradient(base, axis=1),
                               np.gradient(base, axis=0)], -1)] * F)
    return state, jnp.asarray(imgs), H, W


def bench_ba(iters_per_call: int, chain: int = 20):
    """TRUE keyframe-BA rate: wall time of `chain` DEPENDENT dispatches
    (each consuming the previous state) ending in one host materialization
    that forces the whole chain to execute.

    Measurement honesty (round-4 finding): through the axon tunnel,
    ``jax.block_until_ready`` and ``.is_ready()`` report completion
    immediately WITHOUT the work having executed (verified: is_ready
    returned True after 0.05 s on a chain whose materialization then took
    246 s). Every timing that does not drain the result measures enqueue
    fiction — the r2/r3 BENCH numbers (24k-478k iters/s) were exactly
    that. The only honest wall clock is enqueue -> drain, reported here.
    The drain path pays the tunnel's synchronous per-op round-trips
    (~0.7 ms x ~2000 HLO ops for this program), so this is a LOWER bound
    on what the chip itself sustains; it is what a user of this
    environment actually gets. Also returns the enqueue-only rate as the
    documented upper-bound artifact.
    """
    from slam_eds_tpu.ops import energy

    state, images, H, W = build_ba_problem()

    # final_linearize=False: the reference's 6-iteration budget is 6
    # linearize+solve passes (settings.cpp:81) — dso_baseline.cpp counts
    # exactly those, so the compared programs do identical work
    def step(state, images):
        st, e, _ = energy.ba_iterate(state, images, H, W,
                                     iterations=iters_per_call,
                                     final_linearize=False)
        return st, e

    step_j = jax.jit(step)
    st, e = step_j(state, images)   # compile
    jax.block_until_ready(st)

    # enqueue-only (pipelined) timing — fiction through the tunnel, kept
    # for comparability with r2/r3 artifacts
    t0 = time.perf_counter()
    cur = state
    for _ in range(chain):
        cur, e_p = step_j(cur, images)
    t_enqueue = time.perf_counter() - t0

    # true rate: drained chains. The tunnel's sync-replay rate varies by
    # >10x between sessions (measured 1.35 s to 24 s for the same call),
    # so run a few chains and report the best (still a lower bound on the
    # chip; the per-chain list rides along for the variance record).
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        cur = state
        for _ in range(chain):
            cur, e = step_j(cur, images)
        _ = float(e)                # forces the whole chain to execute
        walls.append(time.perf_counter() - t0)
    best = min(walls)
    return {
        "iters_per_s_true": iters_per_call * chain / best,
        "ms_per_call_true": 1e3 * best / chain,
        "ms_per_call_per_chain": [round(1e3 * w / chain, 1) for w in walls],
        "iters_per_s_enqueue_only": iters_per_call * chain
        / max(t_enqueue, 1e-9),
    }


# ---------------------------------------------------------------------------
def bench_ba_batched(batch: int = 8, chain: int = 4):
    """Drained batched-window mode (VERDICT r4 #1c): B independent sliding
    windows advance per dispatch via eval.batched_ba_windows — the fleet
    replay surface. Round-5 finding: with the Pallas sampler the program
    is compute-bound, not dispatch-bound, so batching multiplies work and
    wall together; the per-chip ceiling is the same either way and this
    entry documents it."""
    from slam_eds_tpu.eval import batched_ba_windows

    state, images, H, W = build_ba_problem()
    rng = np.random.default_rng(1)
    rep = lambda x: jnp.broadcast_to(x[None], (batch,) + x.shape)
    bstate = jax.tree.map(rep, state)
    jit_idp = jnp.asarray(
        rng.uniform(0.95, 1.05, (batch,) + state.p_idepth.shape), jnp.float32)
    bstate = bstate._replace(p_idepth=bstate.p_idepth * jit_idp)
    bimages = rep(images)

    def step(st, im):
        st2, es = batched_ba_windows(st, im, H, W, iterations=6)
        return st2, jnp.sum(es)

    fj = jax.jit(step)
    st, e = fj(bstate, bimages)
    _ = float(e)
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        cur = bstate
        for _ in range(chain):
            cur, e = fj(cur, bimages)
        _ = float(e)
        walls.append(time.perf_counter() - t0)
    best = min(walls)
    return {
        "iters_per_s": round(6 * batch * chain / best, 1),
        "ms_per_call": round(1e3 * best / chain, 1),
        "batch": batch,
    }


def bench_e2e(num_frames: int = 24, budget_s: float = 2400.0):
    """End-to-end EDS pipeline at the reference operating point: 640x480
    frames, 2048-point budget, window 7+1, 6 GN iters/KF
    (src/utils/settings.cpp:72-82). Synthetic sequence (io.dataset), data
    pre-generated so the timed loop is pipeline-only. Returns a dict with
    frames/s, event-solves/s and ATE-RMSE, or an {"error": ...} dict."""
    from slam_eds_tpu.config import EDSConfig
    from slam_eds_tpu.io.dataset import SyntheticSequence
    from slam_eds_tpu.models.pipeline import EDSPipeline
    from slam_eds_tpu.utils.alignment import ate_rmse
    from slam_eds_tpu.utils.cameras import Pinhole

    t_start = time.perf_counter()
    W, H = 640, 480
    cam = Pinhole(jnp.float32(400.0), jnp.float32(400.0),
                  jnp.float32(W / 2 - 0.5), jnp.float32(H / 2 - 0.5), W, H)
    # 64k-event packets: a 640x480 sensor produces ~0.5M events per
    # inter-frame interval here; 16k packets were a 3% subsample whose
    # event frames were too sparse for reliable alignment
    cap = 65536
    seq = SyntheticSequence(cam, num_frames=num_frames,
                            events_per_packet=cap, motion_scale=0.22,
                            micro_steps=2)
    frames = [seq.frame(k) for k in range(num_frames)]
    packets = [seq.events_between(k, k + 1) for k in range(num_frames - 1)]

    import dataclasses
    cfg = EDSConfig()      # defaults ARE the reference operating point
    cfg = dataclasses.replace(
        cfg,
        caps=dataclasses.replace(cfg.caps, max_events=cap),
        event_frame=dataclasses.replace(cfg.event_frame,
                                        events_per_frame=cap))
    pipe = EDSPipeline(cam, cfg)

    # warmup pass: first frames compile every program in the loop
    n_solves = 0
    t0 = time.perf_counter()
    frame_times = []
    for k in range(num_frames):
        tf = time.perf_counter()
        t, img, _ = frames[k]
        pipe.process_frame(img, t)
        if k < num_frames - 1 and pipe.kf is not None:
            if pipe.process_events(packets[k]) is not None:
                n_solves += 1
        frame_times.append(time.perf_counter() - tf)
        if time.perf_counter() - t_start > budget_s:
            return {"error": f"budget exceeded at frame {k}"}
    wall = time.perf_counter() - t0

    est = pipe.frame_pipe.positions()
    gt = seq.gt_positions()[: len(est)]
    ate = float(ate_rmse(jnp.asarray(est), jnp.asarray(gt))) \
        if len(est) >= 4 else float("nan")
    # steady-state rate: last half of the run (first frames pay compiles)
    steady = frame_times[num_frames // 2:]
    return {
        "frames": num_frames,
        "event_solves": n_solves,
        "frames_per_s_total": num_frames / wall,
        "frames_per_s_steady": 1.0 / (float(np.median(steady)) + 1e-12),
        "event_solves_per_s": n_solves / wall,
        "ate_rmse": ate,
        "image": f"{W}x{H}",
        "points_budget": cfg.caps.max_points_per_kf,
        "window": cfg.bundles.window_size,
        "gn_iters_per_kf": cfg.bundles.max_opt_iterations,
    }


def main():
    base = measured_cpu_baseline()
    baseline_rate = base["gn_iters_per_s"] if base else 30.0

    # production-representative: ONE dispatch per keyframe BA (6 GN iters,
    # setting_maxOptIterations, settings.cpp:81), drain-inclusive
    ba = bench_ba(6, chain=8)
    try:
        batched = bench_ba_batched()
    except Exception as exc:
        batched = {"error": repr(exc)}

    e2e = {}
    try:
        e2e = bench_e2e()
    except Exception as exc:          # never lose the BA numbers
        e2e = {"error": repr(exc)}

    prod_rate = ba["iters_per_s_true"]
    print(json.dumps({
        "metric": "keyframe_ba_gn_iters_per_s",
        "value": round(prod_rate, 2),
        "unit": "iters/s",
        "vs_baseline": round(prod_rate / baseline_rate, 3),
        "extra": {
            "ba_true_ms_per_6iter_call": round(ba["ms_per_call_true"], 2),
            "ba_ms_per_call_per_chain": ba["ms_per_call_per_chain"],
            "ba_iters_per_s_enqueue_only_UPPER_BOUND": round(
                ba["iters_per_s_enqueue_only"], 1),
            "ba_batched_windows": batched,
            "measurement_note": (
                "true rate = dependent-chain wall incl. one host "
                "materialization (undrained timings through the axon "
                "tunnel are enqueue fiction, round-4 finding). Round-5: "
                "with the Pallas tap sampler + host-grouped assembly the "
                "drained program is compute-bound (~4 ms/GN-iteration + "
                "~4 ms/dispatch), no longer op-count-bound; batched "
                "windows scale work and wall together "
                "(benchmarks/bench_opcount.py has the curve)."),
            "baseline_cpu_measured": base,
            "baseline_note": ("measured via native/dso_baseline.cpp on this "
                              "host's CPU (6 threads, -march=native)"
                              if base else
                              "toolchain missing; 30 iters/s estimate"),
            "e2e": e2e,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
