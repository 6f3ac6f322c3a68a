"""Benchmark: keyframe-BA Gauss-Newton iterations per second on one chip.

BASELINE.json's per-chip metric is "keyframe-BA iters/s + frames/s per
chip". The reference publishes no numbers (SURVEY §6); as the comparison
anchor we use a measured-order estimate for the reference's CPU solver:
DSO-class photometric BA at the reference's own operating point (2000
active points x 7-frame window x 8-pixel pattern, 6-thread SSE CPU,
src/utils/settings.cpp:72-81) runs a GN iteration (linearize + accumulate +
solve + back-substitute) in roughly 30-35 ms => ~30 iters/s. vs_baseline is
therefore iters_per_s / 30.0 until a measured reference run replaces it.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

# Persistent compile cache (fingerprinted by host CPU — a cache carried
# across machines would load mismatched AOT code; compile_cache.py): caching
# the BA executable makes fresh-process bench runs start in seconds.
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from slam_eds_tpu.compile_cache import setup_cache  # noqa: E402

setup_cache(os.path.dirname(os.path.abspath(__file__)))


def build_problem():
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
    # by ~1000x for the rest of the process (measured: the patch-gather
    # linearize goes 0.08 ms -> 251 ms after one D2H).
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


def main():
    from slam_eds_tpu.ops import energy

    state, images, H, W = build_problem()

    # 96 GN iterations per dispatch (16 keyframes' worth of the reference's
    # 6-iteration BA) in ONE jitted call: through the axon tunnel a chained
    # dispatch costs 0.3-1.8 ms host-side round-trip (varies run to run),
    # many times the device compute (~4-12 us per GN iteration at this
    # operating point, measured), so per-call timing measures the tunnel,
    # not the solver. A production host amortizes dispatch exactly like
    # this — ba_iterate is already one dispatch for a whole keyframe's GN
    # loop.
    iters_per_call = 96

    # NOTE: images must be a jit *argument*, not a closure capture — XLA's
    # gather emitter is ~200x slower on closure-folded constants than on
    # parameters (measured on v5e), and in the real pipeline the window
    # images change every keyframe anyway.
    def step(state, images):
        st, e, _ = energy.ba_iterate(state, images, H, W,
                                     iterations=iters_per_call)
        return st, e

    step_j = jax.jit(step)
    # warmup/compile
    st, e = step_j(state, images)
    jax.block_until_ready(st)

    # median of single-dispatch wall times (tunnel latency varies run-to-run)
    times = []
    for _ in range(9):
        t0 = time.perf_counter()
        st, e = step_j(state, images)
        jax.block_until_ready(st)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    iters_per_s = iters_per_call / dt
    baseline_iters_per_s = 30.0
    print(json.dumps({
        "metric": "keyframe_ba_gn_iters_per_s",
        "value": round(iters_per_s, 2),
        "unit": "iters/s",
        "vs_baseline": round(iters_per_s / baseline_iters_per_s, 3),
    }))


if __name__ == "__main__":
    main()
