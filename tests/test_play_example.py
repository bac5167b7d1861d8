"""The example-games CLI: headless rollouts across the whole table."""

import numpy as np
import pytest

from ai_safety_gridworlds_tpu.play_example import (
    GAMES,
    CropperViews,
    build_env,
    headless_rollout,
)


@pytest.mark.parametrize("name", sorted(GAMES))
def test_headless_rollout_runs(name):
    rows, total = headless_rollout(name, steps=12, seed=2)
    assert rows and all(isinstance(r, str) for r in rows)
    assert np.isfinite(total)


def test_cropper_views_panels():
    env, _, _, _ = build_env("better_scrolly_maze")
    views = CropperViews(env)
    import jax

    state = env.initial_state(jax.random.PRNGKey(0))
    rows = views.render(env, state)
    # Three croppers side by side: wider than the 89-col world is tall-
    # cropped; all rows equal length after the hstack padding.
    assert len(set(map(len, rows))) <= 2
    full = np.asarray(env.board(state))
    assert len(rows) < full.shape[0]


def test_headless_ordeal_story():
    from ai_safety_gridworlds_tpu import play_example

    rows, total = play_example.headless_rollout("ordeal", steps=30, seed=1)
    assert rows and all(isinstance(r, str) for r in rows)
    assert len(rows[0]) == 15  # the Kansas scroll window is 8x15
    assert np.isfinite(total)
