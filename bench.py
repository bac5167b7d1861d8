"""Throughput benchmark over the contract config set (BASELINE.md).

Prints ONE JSON line per benchmark config:

  boat_race, boat_race_ex, island_navigation, island_navigation_ex
  (default + full challenge-flag matrix), and the three multi-agent
  flagships firemaker_ex_ma, aintelope_savanna, island_navigation_ex_ma
  (fused pallas kernels)

then a final headline line (the one the driver parses) carrying the
firemaker number — the round's perf frontier — with every config's result
embedded under "configs".

Each config steps BATCH auto-resetting environments in lockstep with a
uniform-random policy, including the value-mapped board observation per
step for the scalar/MO envs (the same per-step work surface the reference
exposes through ``SafetyEnvironment.step`` + distiller). The firemaker
config runs the fully-fused pallas kernel (``ops/fused_firemaker.py``) —
whole rollout in one kernel, state resident in VMEM.

vs_baseline divides by the reference's single-stream CPU steps/s measured
on this machine (the reference publishes no numbers, BASELINE.md):

  boat_race 4846, island_navigation 6232, boat_race_ex 1746,
  island_navigation_ex 1376, firemaker_ex_ma 607, aintelope_savanna 1251,
  island_navigation_ex_ma 964.
"""

import json
import time

import jax

BATCH = 4096
REFERENCE_STEPS_PER_SEC = {
    "boat_race": 4.846e3,
    "island_navigation": 6.232e3,
    "boat_race_ex": 1.746e3,
    "island_navigation_ex": 1.376e3,
    "island_navigation_ex_full": 1.376e3,
    "firemaker_ex_ma": 607.0,
    "aintelope_savanna": 1.251e3,
    "island_navigation_ex_ma": 964.0,
}


def bench_scalar(name, env, n_steps=4096, n_reps=3):
    from ai_safety_gridworlds_tpu.utils import profiling

    out = profiling.measure_steps_per_second(
        env,
        batch_size=BATCH,
        n_steps=n_steps,
        n_reps=n_reps,
        include_observation=True,
    )
    return out["steps_per_sec"]


def bench_fused(fused, n_steps=256, n_reps=3):
    S = fused.init_packed(seed=0, batch=BATCH)
    S = fused.rollout(S, n_steps)  # compile + warm-up
    jax.block_until_ready(S["t"])
    t0 = time.perf_counter()
    for _ in range(n_reps):
        S = fused.rollout(S, n_steps)
    jax.block_until_ready(S["t"])
    return n_reps * n_steps * BATCH / (time.perf_counter() - t0)


def bench_firemaker_fused(n_steps=256, n_reps=3):
    from ai_safety_gridworlds_tpu.envs.firemaker_ex_ma import FiremakerExMa
    from ai_safety_gridworlds_tpu.ops.fused_firemaker import FusedFiremaker

    return bench_fused(FusedFiremaker(FiremakerExMa()), n_steps, n_reps)


def bench_savanna_fused(n_steps=256, n_reps=3):
    from ai_safety_gridworlds_tpu.envs.aintelope_savanna import (
        AIntelopeSavanna,
    )
    from ai_safety_gridworlds_tpu.ops.fused_savanna import FusedSavanna

    return bench_fused(FusedSavanna(AIntelopeSavanna()), n_steps, n_reps)


def bench_island_ma_fused(n_steps=256, n_reps=3):
    from ai_safety_gridworlds_tpu.envs.island_navigation_ex_ma import (
        IslandNavigationExMa,
    )
    from ai_safety_gridworlds_tpu.ops.fused_island_ma import FusedIslandMa

    return bench_fused(FusedIslandMa(IslandNavigationExMa()), n_steps, n_reps)


def emit(name, sps, extra=None):
    line = {
        "metric": f"env_steps_per_sec_{name}_b{BATCH}",
        "value": round(sps, 1),
        "unit": "steps/s",
        "vs_baseline": round(sps / REFERENCE_STEPS_PER_SEC[name], 2),
    }
    if extra:
        line.update(extra)
    print(json.dumps(line), flush=True)
    return line


def main():
    from ai_safety_gridworlds_tpu.envs.boat_race import BoatRace
    from ai_safety_gridworlds_tpu.envs.boat_race_ex import BoatRaceEx
    from ai_safety_gridworlds_tpu.envs.island_navigation import (
        IslandNavigation,
    )
    from ai_safety_gridworlds_tpu.envs.island_navigation_ex import (
        IslandNavigationEx,
    )

    # Throwaway warm-up: the first measurement on the remote-TPU (axon)
    # backend absorbs tunnel/runtime warm-up costs that the per-config
    # compile warm-up does not cover (first config otherwise reads ~100x
    # low).
    bench_scalar("warmup", BoatRace(), n_steps=256, n_reps=1)

    results = {}
    configs = [
        ("boat_race", lambda: BoatRace()),
        ("island_navigation", lambda: IslandNavigation()),
        ("boat_race_ex", lambda: BoatRaceEx()),
        ("island_navigation_ex", lambda: IslandNavigationEx()),
        # Representative full flag matrix: every challenge subsystem on.
        (
            "island_navigation_ex_full",
            lambda: IslandNavigationEx(
                level=3,
                sustainability_challenge=True,
                thirst_hunger_death=True,
                penalise_oversatiation=True,
                use_satiation_proportional_reward=True,
            ),
        ),
    ]
    for name, mk in configs:
        sps = bench_scalar(name, mk())
        results[name] = emit(name, sps)["value"]

    sps = bench_savanna_fused()
    results["aintelope_savanna"] = emit(
        "aintelope_savanna", sps, extra={"kernel": "fused_pallas"}
    )["value"]

    sps = bench_island_ma_fused()
    results["island_navigation_ex_ma"] = emit(
        "island_navigation_ex_ma", sps, extra={"kernel": "fused_pallas"}
    )["value"]

    sps = bench_firemaker_fused()
    emit(
        "firemaker_ex_ma",
        sps,
        extra={
            "kernel": "fused_pallas",
            "configs": results,
        },
    )


if __name__ == "__main__":
    main()
