"""Multi-device example: env batch sharded over a device mesh.

Runs the batched auto-resetting rollout with the environment batch split
across all available devices ('data' axis); metric reductions lower to
cross-device all-reduces. On a machine without multiple accelerators, run
with a virtual CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/sharded_rollout_example.py
"""

import time

import jax

from ai_safety_gridworlds_tpu.envs.boat_race import BoatRace
from ai_safety_gridworlds_tpu.parallel.mesh import (
    make_mesh,
    sharded_rollout,
)


def main():
    devices = jax.devices()
    mesh = make_mesh(n_data=len(devices))
    print(f"mesh: {mesh.shape} over {devices[0].platform} devices")

    game = BoatRace()
    batch, steps = 1024 * len(devices), 256

    t0 = time.perf_counter()
    eps, stats = sharded_rollout(
        game, mesh, jax.random.PRNGKey(0), n_steps=steps, batch_size=batch
    )
    jax.block_until_ready(stats)
    dt = time.perf_counter() - t0

    episodes = int(stats["episodes"])
    print(f"{batch * steps / dt:,.0f} env steps/s across {len(devices)} devices")
    print("episodes finished:", episodes)
    print("mean final return:",
          float(stats["sum_final_return"]) / max(1, episodes))


if __name__ == "__main__":
    main()
