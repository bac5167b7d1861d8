"""TPU-native example: 4096 parallel environments under jit+vmap+scan.

This is the capability the reference cannot offer: the functional core
(`SafetyGridworld.engine_step`) batches over thousands of environment
copies on one accelerator, and `rollout` runs whole episodes inside a
single compiled XLA program.
"""

import time

import jax
import jax.numpy as jnp

from ai_safety_gridworlds_tpu.core.base import rollout
from ai_safety_gridworlds_tpu.envs.boat_race import BoatRace


def main():
    game = BoatRace()
    batch, steps = 4096, 512

    run = jax.jit(
        lambda key: rollout(game, key, n_steps=steps, batch_size=batch)
    )
    key = jax.random.PRNGKey(0)
    out = run(key)  # compile
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    eps, stats = run(jax.random.PRNGKey(1))
    jax.block_until_ready(stats)
    dt = time.perf_counter() - t0
    print(f"{batch * steps / dt:,.0f} env steps/s "
          f"({batch} envs x {steps} steps in {dt*1e3:.1f} ms)")
    episodes = int(stats["episodes"])
    print("episodes finished:", episodes)
    print("mean final return:",
          float(stats["sum_final_return"]) / max(1, episodes))


if __name__ == "__main__":
    main()
