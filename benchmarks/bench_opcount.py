"""Op-count vs drained-time audit for the keyframe-BA program.

Round-4 PARITY asserted from two data points that the axon tunnel's drain
cost scales with compiled HLO op count, not FLOPs. This produces the
actual curve: for the 6-iteration BA program and its batched/iterated
variants, record

* compiled HLO op count  (jit(...).lower(...).compile() module op total)
* drained wall ms/call   (dependent chain ending in one materialization)

over a grid of (GN iterations per call, windows per call).  The
actionable levers (VERDICT r4 #1): if drain cost is ~flat in batch K and
in scan length, then K windows x I iterations per dispatch multiplies
drained iters/s at ~constant wall.

Run:  python benchmarks/bench_opcount.py [--grid small|full]
Emits one JSON line per grid point.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from slam_eds_tpu.compile_cache import setup_cache  # noqa: E402

setup_cache(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def count_hlo_ops(compiled) -> int:
    """Total instruction count over all computations of the optimized HLO."""
    try:
        mods = compiled.hlo_modules()
        total = 0
        for m in mods:
            txt = m.to_string()
            # count instruction lines: "  %name = ..." / "  ROOT %name = ..."
            for line in txt.splitlines():
                s = line.strip()
                if ("=" in s and (s.startswith("%") or s.startswith("ROOT "))):
                    total += 1
        return total
    except Exception:
        return -1


def build_problem(batch: int):
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench as benchmod
    state, images, H, W = benchmod.build_ba_problem()
    if batch == 1:
        return state, images, H, W
    # replicate the window `batch` times with per-lane idepth jitter so the
    # lanes do not collapse to identical programs/data
    rng = np.random.default_rng(1)

    def rep(x):
        return jnp.broadcast_to(x[None], (batch,) + x.shape)

    bstate = jax.tree.map(rep, state)
    jit_idp = jnp.asarray(
        rng.uniform(0.95, 1.05, (batch,) + state.p_idepth.shape), jnp.float32)
    bstate = bstate._replace(p_idepth=bstate.p_idepth * jit_idp)
    bimages = rep(images)
    return bstate, bimages, H, W


def bench_point(iters: int, batch: int, chain: int = 6, repeats: int = 3):
    from slam_eds_tpu.ops import energy
    from slam_eds_tpu.eval import batched_ba_windows

    state, images, H, W = build_problem(batch)

    if batch == 1:
        def step(st, im):
            st2, e, _ = energy.ba_iterate(st, im, H, W, iterations=iters,
                                          final_linearize=False)
            return st2, e
        step_j = jax.jit(step)
    else:
        def step(st, im):
            st2, es = batched_ba_windows(st, im, H, W, iterations=iters)
            return st2, jnp.sum(es)
        step_j = jax.jit(step)

    lowered = step_j.lower(state, images)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    n_ops = count_hlo_ops(compiled)

    st, e = step_j(state, images)     # warm (also populates tunnel caches)
    _ = float(e)

    walls = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        cur = state
        for _ in range(chain):
            cur, e = step_j(cur, images)
        _ = float(e)                  # drain
        walls.append(time.perf_counter() - t0)
    best = min(walls)
    ms_per_call = 1e3 * best / chain
    iters_per_call = iters * batch
    return {
        "iters": iters, "batch": batch,
        "hlo_ops": n_ops,
        "compile_s": round(t_compile, 2),
        "ms_per_call_drained": round(ms_per_call, 2),
        "ms_per_call_per_chain": [round(1e3 * w / chain, 1) for w in walls],
        "gn_iters_per_s_drained": round(iters_per_call / (best / chain), 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", default="small")
    ap.add_argument("--points", default=None,
                    help="comma list of iters:batch pairs, e.g. 6:1,6:16")
    args = ap.parse_args()
    if args.points:
        grid = [tuple(int(v) for v in p.split(":"))
                for p in args.points.split(",")]
    elif args.grid == "small":
        grid = [(6, 1), (24, 1), (6, 8)]
    else:
        grid = [(2, 1), (6, 1), (24, 1), (96, 1),
                (6, 4), (6, 16), (24, 16)]
    out = []
    for iters, batch in grid:
        r = bench_point(iters, batch)
        out.append(r)
        print(json.dumps(r), flush=True)
    return out


if __name__ == "__main__":
    main()
