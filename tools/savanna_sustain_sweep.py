"""Savanna sustainability-phase tile sweep + cost attribution.

The r3 bench read `aintelope_savanna_sustain` at ~14.2M steps/s vs ~195M
non-sustain (13.7x), far more than the phase's op count explains
(docs/KERNELS.md "Sustainability phase cost"). This is the queued
on-chip measurement that settles it. Run ON THE TPU (axon backend up):

    python tools/savanna_sustain_sweep.py [--batch 4096] [--steps 256]

Measures, with the bench's dispatch-amortized methodology:

1. sustain rollout throughput across lane tiles {128, 256, 512} (the
   non-sustain optimum is 512; the r3 sustain number was taken at 128;
   Mosaic requires the lane block dim divisible by 128), plus the
   non-sustain reference point at its optimum;
2. batch scaling at the best sustain tile (1024 / 4096 / 8192);
3. ablations at the best tile — "extract" (merged removal/spawn
   argmin-extraction unroll off), "regrowth" (power-law transcendentals
   -> identity), "prf" (per-cell score hash -> cell index) —
   attributing the sustain-phase cost to its components;
4. XLA cost analysis (FLOPs / bytes) of one compiled sustain chunk.

Each result prints as one JSON line; paste the numbers into
docs/KERNELS.md ("Sustainability phase cost").

The ablations change env semantics (see FusedSavanna.__init__) — they
exist purely for this attribution and are never used by bench.py.
"""

import argparse
import json
import time

import jax

from ai_safety_gridworlds_tpu.envs.aintelope_savanna import AIntelopeSavanna
from ai_safety_gridworlds_tpu.ops.fused_savanna import FusedSavanna

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
        "min": round(rates[0], 1),
        "max": round(rates[-1], 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=256)
    args = ap.parse_args()
    B, T = args.batch, args.steps

    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)

    def sustain_env():
        return AIntelopeSavanna(sustainability_challenge=True)

    fused = FusedSavanna(sustain_env())
    print(json.dumps({
        "k_unrolls": {
            s["name"]: {"k_rem": s["k_rem"], "k_spawn": s["k_spawn"]}
            for s in fused.res_specs
        }
    }), flush=True)

    # 0. non-sustain reference point at its optimum tile
    out = measure(FusedSavanna(AIntelopeSavanna()), B, T, 512)
    print(json.dumps({"config": "non_sustain_tile_512", **out}), flush=True)

    # 1. sustain tile sweep (lane block dim must be divisible by 128)
    best_tile, best_rate = None, 0.0
    for tile in (128, 256, 512):
        try:
            out = measure(FusedSavanna(sustain_env()), B, T, tile)
        except Exception as e:  # VMEM OOM at large tiles is informative
            print(json.dumps({
                "config": f"sustain_tile_{tile}",
                "error": str(e)[:200],
            }), flush=True)
            continue
        print(json.dumps({"config": f"sustain_tile_{tile}", **out}),
              flush=True)
        if out["steps_per_sec"] > best_rate:
            best_tile, best_rate = tile, out["steps_per_sec"]
    print(json.dumps({"best_tile": best_tile}), flush=True)

    # 2. batch scaling at the best tile
    for batch in (1024, 4096, 8192):
        out = measure(FusedSavanna(sustain_env()), batch, T, best_tile)
        print(json.dumps({"config": f"sustain_batch_{batch}", **out}),
              flush=True)

    # 3. ablations at the best tile
    for ablate in ((), ("extract",), ("regrowth",), ("prf",),
                   ("extract", "regrowth", "prf")):
        out = measure(
            FusedSavanna(sustain_env(), ablate=ablate), B, T, best_tile
        )
        name = "+".join(ablate) or "none"
        print(json.dumps({"ablate": name, **out}), flush=True)

    # 4. XLA cost analysis of one compiled sustain chunk
    fused = FusedSavanna(sustain_env())
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
