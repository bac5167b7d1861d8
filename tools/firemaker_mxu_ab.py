"""On-chip A/B: firemaker separable-roll stencil vs MXU log-survival matmul.

Decides VERDICT-r4 item 5: the r4 roofline (docs/KERNELS.md) found the
spread stencil's 8 sublane rolls dominate its ~33% share of step time and
penciled the banded [HW, HW] log-survival matmul at ~1.0us vs ~1.7us per
tile-step. This measures both variants with bench.py's honest host-fetch
timing on the real chip (same batch/tile/chunking as the headline config)
and prints one JSON line per variant. Run on TPU (plain env, axon backend):

    python tools/firemaker_mxu_ab.py [--batch 4096] [--reps 5]
"""

import argparse
import json
import statistics
import time

import numpy as np

from ai_safety_gridworlds_tpu.envs.firemaker_ex_ma import FiremakerExMa
from ai_safety_gridworlds_tpu.ops.fused_firemaker import FusedFiremaker

MIN_REP_WALL_S = 0.4


def bench(fused, batch, n_steps=256, n_reps=5, tile=128):
    S = fused.init_packed(seed=0, batch=batch)
    S = fused.rollout(S, n_steps, tile=tile)  # compile + warm-up
    np.asarray(S["t"])
    t0 = time.perf_counter()
    S = fused.rollout(S, n_steps, tile=tile)
    np.asarray(S["t"])  # host fetch drains the queue (bench.py docstring)
    chunk_wall = max(time.perf_counter() - t0, 1e-9)
    chunks = max(1, int(MIN_REP_WALL_S / chunk_wall) + 1)
    rates = []
    for _ in range(n_reps):
        t0 = time.perf_counter()
        for _ in range(chunks):
            S = fused.rollout(S, n_steps, tile=tile)
        np.asarray(S["t"])
        rates.append(chunks * n_steps * batch / (time.perf_counter() - t0))
    rates.sort()
    return {
        "value": round(statistics.median(rates), 1),
        "min": round(rates[0], 1),
        "max": round(rates[-1], 1),
        "n_reps": n_reps,
        "chunks": chunks,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--tile", type=int, default=128)
    args = ap.parse_args()

    env = FiremakerExMa()
    for name, kw in (
        ("rolls", {"mxu_stencil": False}),
        ("mxu", {"mxu_stencil": True}),
    ):
        out = bench(
            FusedFiremaker(env, **kw), args.batch,
            n_steps=args.steps, n_reps=args.reps, tile=args.tile,
        )
        out["variant"] = name
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
