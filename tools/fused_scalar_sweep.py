"""On-chip throughput sweep for the fused scalar kernels.

Measures every `ops/fused_scalar.py` kernel (and optionally a tile /
chunk-length grid) with the same methodology as `bench.py`: calibrated
>= 0.4 s repetitions, each timed region ending in a HOST FETCH (on the
remote-TPU backend `block_until_ready` under-waits until the first
pallas call — BASELINE.md "dispatch mirage").

Usage:
    python tools/fused_scalar_sweep.py            # one row per kernel
    python tools/fused_scalar_sweep.py --grid     # tile x chunk grid on
                                                  # boat_race + island_nav

r4 findings (v5e, batch 4096): tiny per-lane state makes WIDE lane
tiles (1024-2048) and LONG chunks (2048-8192 steps) optimal — dispatch
amortization dominates; the measured optima are pinned in bench.py.
"""

import argparse
import time

import numpy as np


def rate(fused, n_steps, tile, batch=4096, min_rep_wall_s=0.4):
    S = fused.init_packed(seed=0, batch=batch)
    S = fused.rollout(S, n_steps, tile=tile)
    np.asarray(S["t"])  # host fetch: drains the queue
    t0 = time.perf_counter()
    S = fused.rollout(S, n_steps, tile=tile)
    np.asarray(S["t"])
    w = time.perf_counter() - t0
    chunks = max(1, int(min_rep_wall_s / w) + 1)
    t0 = time.perf_counter()
    for _ in range(chunks):
        S = fused.rollout(S, n_steps, tile=tile)
    np.asarray(S["t"])
    return (
        chunks * n_steps * batch / (time.perf_counter() - t0),
        int(np.asarray(S["stats_episodes"]).sum()),
    )


def all_kernels():
    from ai_safety_gridworlds_tpu import ops
    from ai_safety_gridworlds_tpu.envs.absent_supervisor import (
        AbsentSupervisor,
    )
    from ai_safety_gridworlds_tpu.envs.boat_race import BoatRace
    from ai_safety_gridworlds_tpu.envs.boat_race_ex import BoatRaceEx
    from ai_safety_gridworlds_tpu.envs.conveyor_belt import ConveyorBelt
    from ai_safety_gridworlds_tpu.envs.conveyor_belt_ex import ConveyorBeltEx
    from ai_safety_gridworlds_tpu.envs.distributional_shift import (
        DistributionalShift,
    )
    from ai_safety_gridworlds_tpu.envs.friend_foe import FriendFoe
    from ai_safety_gridworlds_tpu.envs.island_navigation import (
        IslandNavigation,
    )
    from ai_safety_gridworlds_tpu.envs.island_navigation_ex import (
        IslandNavigationEx,
    )
    from ai_safety_gridworlds_tpu.envs.rocks_diamonds import RocksDiamonds
    from ai_safety_gridworlds_tpu.envs.safe_interruptibility import (
        SafeInterruptibility,
    )
    from ai_safety_gridworlds_tpu.envs.safe_interruptibility_ex import (
        SafeInterruptibilityEx,
    )
    from ai_safety_gridworlds_tpu.envs.side_effects_sokoban import (
        SideEffectsSokoban,
    )
    from ai_safety_gridworlds_tpu.envs.tomato_watering import TomatoWatering
    from ai_safety_gridworlds_tpu.envs.whisky_gold import WhiskyGold

    envs = [
        BoatRace(), IslandNavigation(), BoatRaceEx(), IslandNavigationEx(),
        SideEffectsSokoban(), SideEffectsSokoban(level=1),
        AbsentSupervisor(), DistributionalShift(is_testing=True),
        SafeInterruptibility(), WhiskyGold(), TomatoWatering(),
        ConveyorBelt(variant="vase"), RocksDiamonds(), FriendFoe(),
        ConveyorBeltEx(variant="vase"), SafeInterruptibilityEx(),
    ]
    return [(e, ops.make_fused(e)) for e in envs]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", action="store_true",
                    help="tile x chunk grid on boat_race + island_nav")
    ap.add_argument("--n-steps", type=int, default=2048)
    ap.add_argument("--tile", type=int, default=1024)
    args = ap.parse_args()

    if args.grid:
        from ai_safety_gridworlds_tpu.envs.boat_race import BoatRace
        from ai_safety_gridworlds_tpu.envs.island_navigation import (
            IslandNavigation,
        )
        from ai_safety_gridworlds_tpu.ops.fused_scalar import (
            FusedBoatRace, FusedIslandNav,
        )

        for name, fused in (
            ("boat_race", FusedBoatRace(BoatRace())),
            ("island_navigation", FusedIslandNav(IslandNavigation())),
        ):
            for tile in (512, 1024, 2048, 4096):
                for n_steps in (1024, 4096, 8192):
                    r, _ = rate(fused, n_steps, tile)
                    print(f"{name:20s} tile={tile:5d} n_steps={n_steps:5d}"
                          f" {r / 1e6:10.1f}M steps/s", flush=True)
        return

    for env, fused in all_kernels():
        r, eps = rate(fused, args.n_steps, args.tile)
        print(f"{env.name:26s} {type(fused).__name__:30s}"
              f" {r / 1e6:9.1f}M steps/s  episodes={eps}", flush=True)


if __name__ == "__main__":
    main()
