"""On-chip endurance soak for the fused kernels.

Runs each flagship fused kernel continuously on the real TPU for a
wall-clock budget, checking invariants between chunks:

* stats stay finite (no NaN/Inf creep across billions of steps);
* episode accounting is monotonic and within the truncation bound;
* frame counters never exceed ``max_iterations + 1``;
* uint32 draw counters advance exactly one per step (PRF site integrity
  across very long streams).

Prints one JSON line per kernel. Run on TPU (axon backend):

    PYTHONPATH=/root/repo python tools/onchip_soak.py [--seconds 120]
"""

import argparse
import json
import time

import numpy as np


def soak(name, fused, batch, n_steps, seconds, tile=None):
    S = fused.init_packed(seed=0, batch=batch)
    S = fused.rollout(S, n_steps, tile=tile)  # compile + warm-up
    np.asarray(S["t"])
    t_end = time.time() + seconds
    steps = 0
    chunks = 0
    last_eps = np.asarray(S["stats_episodes"]).copy()
    last_ctr = np.asarray(S["draw_ctr"]).copy()
    max_iter = int(fused.max_iterations)
    while time.time() < t_end:
        S = fused.rollout(S, n_steps, tile=tile)
        t_arr = np.asarray(S["t"])  # host fetch drains the queue
        steps += n_steps * batch
        chunks += 1
        assert np.isfinite(np.asarray(S["stats_rewards"])).all(), (
            f"{name}: non-finite stats at chunk {chunks}"
        )
        eps = np.asarray(S["stats_episodes"])
        assert (eps >= last_eps).all(), f"{name}: episode count regressed"
        # Frames per episode are bounded by truncation (+1 for the reset
        # frame emitted the following step).
        assert t_arr.max() <= max_iter + 1, (
            f"{name}: frame counter {t_arr.max()} > {max_iter + 1}"
        )
        ctr = np.asarray(S["draw_ctr"])
        # uint32 arithmetic wraps natively, so the per-chunk delta is
        # exact even across counter wraparound.
        delta = (ctr - last_ctr).astype(np.uint32)
        assert (delta == np.uint32(n_steps)).all(), (
            f"{name}: draw counter skipped"
        )
        last_eps, last_ctr = eps.copy(), ctr.copy()
    return {
        "kernel": name,
        "env_steps": steps,
        "chunks": chunks,
        "episodes_min": int(last_eps.min()),
        "episodes_max": int(last_eps.max()),
        "ok": True,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=int, default=120,
                    help="wall budget per kernel")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=256)
    args = ap.parse_args()

    from ai_safety_gridworlds_tpu.envs.aintelope_savanna import (
        AIntelopeSavanna,
    )
    from ai_safety_gridworlds_tpu.envs.boat_race import BoatRace
    from ai_safety_gridworlds_tpu.envs.firemaker_ex_ma import FiremakerExMa
    from ai_safety_gridworlds_tpu.envs.island_navigation_ex_ma import (
        IslandNavigationExMa,
    )
    from ai_safety_gridworlds_tpu import ops

    for name, env in (
        ("firemaker_ex_ma", FiremakerExMa()),
        ("aintelope_savanna", AIntelopeSavanna()),
        ("aintelope_savanna_sustain",
         AIntelopeSavanna(sustainability_challenge=True)),
        ("island_navigation_ex_ma", IslandNavigationExMa()),
        ("boat_race", BoatRace()),
    ):
        fused = ops.make_fused(env)
        out = soak(name, fused, args.batch, args.steps, args.seconds)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
