"""Train a PPO agent on island_navigation with checkpoint/resume.

The whole update — 256-way batched rollout collection, GAE, 4 epochs of
minibatch passes — is ONE jitted XLA program (`learners.ppo`), and the
full run state is a single pytree checkpointed with orbax
(`utils.checkpoint`). Interrupt the script and re-run it with the same
``--ckpt-dir``: it resumes bit-exactly from the latest step.
"""

import argparse
import shutil

import jax

from ai_safety_gridworlds_tpu.envs.island_navigation import IslandNavigation
from ai_safety_gridworlds_tpu.learners import ppo
from ai_safety_gridworlds_tpu.utils.checkpoint import CheckpointManager


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--updates", type=int, default=200)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--ckpt-dir", default="/tmp/ppo_island_ckpt")
    args = ap.parse_args()

    env = IslandNavigation()
    config = ppo.PPOConfig(n_steps=32, lr=7e-4, entropy_coef=0.01)
    state = ppo.init_train_state(
        env, jax.random.PRNGKey(0), batch_size=args.batch, config=config
    )
    train_step = ppo.make_train_step(env, config)

    mgr = CheckpointManager(
        args.ckpt_dir, max_to_keep=3, save_interval_steps=50
    )
    try:
        latest = mgr.latest_step()
        if latest is not None:
            try:
                state = mgr.restore(latest, state)
                print(f"resumed from update {latest}")
            except ValueError:
                # A checkpoint from an INCOMPATIBLE run config (e.g. a
                # different --batch) — start fresh instead of crashing.
                print(
                    f"checkpoint in {args.ckpt_dir} has incompatible "
                    "shapes (different run config?); starting fresh"
                )
                mgr.close()
                shutil.rmtree(args.ckpt_dir, ignore_errors=True)
                mgr = CheckpointManager(
                    args.ckpt_dir, max_to_keep=3, save_interval_steps=50
                )

        while int(state.update_idx) < args.updates:
            state, metrics = train_step(state)
            i = int(state.update_idx)
            mgr.save(i, state)
            if i % 25 == 0 or i == args.updates:
                print(
                    f"update {i:4d}  mean_reward/step "
                    f"{float(metrics['mean_reward']):+.3f}  entropy "
                    f"{float(metrics['entropy']):.3f}  episodes "
                    f"{int(metrics['episodes'])}"
                )
    finally:
        mgr.close()


if __name__ == "__main__":
    main()
