"""Firemaker fused-kernel roofline / cost attribution (docs/KERNELS.md).

Run ON THE TPU (axon backend up):

    python tools/firemaker_roofline.py [--batch 4096] [--steps 256]
        [--tiles 128 256 512]

Measures, with the bench's dispatch-amortized methodology:

1. rollout throughput across lane tiles (default {128, 256, 512};
   Mosaic needs the lane dim divisible by 128, and 512 can wedge a
   bad remote-compiler state — pass `--tiles 128 256` to skip it);
2. ablations at the best tile — "prf" (per-cell fire uniform -> const),
   "stencil" (spread product -> trivial), "onehot" (per-agent tile-code
   reductions -> zeros), and combinations — attributing the per-step cost
   to the three heavy [HW, B] op groups;
3. agent-count scaling (amount_agents in {2, 3, 4}): the step loops n
   sub-steps, so per-slot cost should scale ~linearly;
4. XLA cost analysis (FLOPs / bytes) of one compiled rollout chunk for a
   compute-vs-bandwidth roofline position.

Each result prints as one JSON line; paste the numbers into
docs/KERNELS.md ("Firemaker roofline").

The ablations change env semantics (see FusedFiremaker.__init__) — they
exist purely for this attribution and are never used by bench.py.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp

from ai_safety_gridworlds_tpu.envs.firemaker_ex_ma import FiremakerExMa
from ai_safety_gridworlds_tpu.ops.fused_firemaker import FusedFiremaker

MIN_REP_WALL_S = 0.4
N_REPS = 5


def measure(fused, batch, n_steps, tile):
    S = fused.init_packed(seed=0, batch=batch)
    S = fused.rollout(S, n_steps, tile=tile)
    jax.block_until_ready(S["t"])
    t0 = time.perf_counter()
    S = fused.rollout(S, n_steps, tile=tile)
    jax.block_until_ready(S["t"])
    chunk_wall = max(time.perf_counter() - t0, 1e-9)
    chunks = max(1, int(MIN_REP_WALL_S / chunk_wall) + 1)
    rates = []
    for _ in range(N_REPS):
        t0 = time.perf_counter()
        for _ in range(chunks):
            S = fused.rollout(S, n_steps, tile=tile)
        jax.block_until_ready(S["t"])
        rates.append(chunks * n_steps * batch / (time.perf_counter() - t0))
    rates.sort()
    med = rates[len(rates) // 2]
    return {
        "steps_per_sec": round(med, 1),
        "us_per_step_per_lane_tile": round(1e6 * batch / med, 3),
        "min": round(rates[0], 1),
        "max": round(rates[-1], 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument(
        "--tiles", type=int, nargs="+", default=[128, 256, 512],
        help="lane tiles to sweep (512 can wedge the remote compiler "
             "on some service states — pass '--tiles 128 256' to skip)",
    )
    args = ap.parse_args()
    B, T = args.batch, args.steps

    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)

    def safe_measure(label, fused, tile):
        """measure() one config; print {**label, error} and return None
        on failure (an individual ablation can perturb Mosaic's fusion
        enough to overflow scoped VMEM at a tile the real kernel
        compiles fine at — seen r5: prf+stencil at tile 256)."""
        try:
            out = measure(fused, B, T, tile)
        except Exception as e:
            print(json.dumps({**label, "error": str(e)[:160]}), flush=True)
            return None
        print(json.dumps({**label, "tile": tile, **out}), flush=True)
        return out

    # 1. tile sweep (Mosaic requires the lane block dim divisible by 128)
    best_tile, best_rate = None, 0.0
    for tile in args.tiles:
        out = safe_measure(
            {"config": f"tile_{tile}"}, FusedFiremaker(FiremakerExMa()),
            tile,
        )
        if out and out["steps_per_sec"] > best_rate:
            best_tile, best_rate = tile, out["steps_per_sec"]
    print(json.dumps({"best_tile": best_tile}), flush=True)
    if best_tile is None:
        # Don't fall through to tile=None (the kernel default): the
        # later sections would silently measure at a tile the sweep
        # never validated, mislabeled as "the best tile".
        raise SystemExit("no tile in the sweep compiled; aborting")

    # 2. ablations at the best tile.
    for ablate in ((), ("prf",), ("stencil",), ("onehot",),
                   ("prf", "stencil"), ("prf", "stencil", "onehot")):
        safe_measure(
            {"ablate": "+".join(ablate) or "none"},
            FusedFiremaker(FiremakerExMa(), ablate=ablate), best_tile,
        )

    # 3. agent-count scaling
    for n in (2, 3, 4):
        safe_measure(
            {"agents": n}, FusedFiremaker(FiremakerExMa(amount_agents=n)),
            best_tile,
        )

    # 4. XLA cost analysis of one compiled chunk
    fused = FusedFiremaker(FiremakerExMa())
    S = fused.init_packed(seed=0, batch=B)
    statics = fused._statics_jnp()
    lowered = jax.jit(
        lambda s: fused._rollout_pallas_call(
            s, statics, T, best_tile, False
        )
    ).lower(S)
    try:
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = cost.get("flops")
        bytes_ = cost.get("bytes accessed")
        print(json.dumps({
            "cost_analysis": {
                "flops_per_env_step": (
                    round(flops / (T * B), 1) if flops else None
                ),
                "bytes_per_env_step": (
                    round(bytes_ / (T * B), 1) if bytes_ else None
                ),
            }
        }), flush=True)
    except Exception as e:  # cost analysis unsupported on some backends
        print(json.dumps({"cost_analysis_error": str(e)}), flush=True)


if __name__ == "__main__":
    main()
