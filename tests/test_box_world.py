"""Box-World demo tests: key/lock chains, gem, distractors, generation."""

import jax
import jax.numpy as jnp
import numpy as np

from ai_safety_gridworlds_tpu.envs.box_world import (
    BoxWorld,
    _GEM_CODE,
    _LOCK_BASE,
    generate_box_world,
)
from ai_safety_gridworlds_tpu.helpers.safety_env import SafetyEnvironment


def hand_built():
    """items: key 'a' free at (2,2); gem at (4,2) locked by 'A' at (4,3);
    distractor lock 'B' at (6,6) with key 'b' at (6,5)... wait b locked by B.
    Layout for tests: simple solution chain + one distractor lock."""
    game = BoxWorld(grid_size=8)
    h = w = 10
    items = np.zeros((h, w), np.uint8)
    distract = np.zeros((h, w), bool)
    items[2, 2] = 1  # key a (free)
    items[4, 2] = _GEM_CODE  # gem
    items[4, 3] = _LOCK_BASE + 1  # lock A guards the gem
    items[6, 5] = 2  # key b
    items[6, 6] = _LOCK_BASE + 1  # distractor lock A guards key b
    distract[6, 6] = True
    player = np.array([8, 8], np.int32)
    options = {"items": items, "distract": distract, "player": player}
    return game, options


def step_path(env, actions):
    total = 0.0
    ts = None
    for a in actions:
        ts = env.step(a)
        total += float(ts.reward)
        if ts.step_type.last():
            break
    return total, ts


class FixedEnv(SafetyEnvironment):
    def __init__(self, game, options):
        self._fixed_options = options
        game.host_reset_options = lambda: self._fixed_options
        super().__init__(game)


def test_locked_gem_requires_key():
    game, options = hand_built()
    env = FixedEnv(game, options)
    env.reset()
    # Path straight to the gem is blocked by lock A: approach from the east.
    # Player (8,8) -> move to (4,4) then west into lock A at (4,3): blocked
    # without the key.
    total, ts = step_path(env, [0, 0, 0, 0, 2, 2, 2, 2])
    pos = tuple(np.asarray(env._state.pos))
    assert pos == (4, 4)  # stuck next to the lock
    # Fetch key a at (2,2): up 2, west 2, then back down and open the lock.
    total, ts = step_path(env, [0, 0, 2, 2])
    assert int(np.asarray(env._state.inventory)) == 1  # holding key a
    # Board shows the inventory key in the top-left corner.
    board = np.asarray(env._game.board(env._state))
    assert chr(board[0, 0]) == "a"
    # Around to the lock's north side, open it (+1), then take the gem.
    total, ts = step_path(env, [3, 1, 1])  # (2,3)->(3,3)->(4,3) lock A
    assert total == 1.0
    assert int(np.asarray(env._state.inventory)) == 0  # key consumed
    total, ts = step_path(env, [2])
    assert total == 10.0 and ts.step_type.last()


def test_distractor_lock_ends_episode():
    game, options = hand_built()
    env = FixedEnv(game, options)
    env.reset()
    # Grab key a, then open the DISTRACTOR lock at (6,6): -1 and done.
    step_path(env, [0, 0, 0, 0, 0, 0, 2, 2, 2, 2, 2, 2])  # to (2,2) via top
    assert int(np.asarray(env._state.inventory)) == 1
    # Approach the distractor lock (6,6) from the north and open it.
    total, ts = step_path(env, [3, 3, 1, 1, 1, 3, 3, 1])
    assert total == -1.0 and ts.step_type.last()


def test_generation_properties():
    rand = np.random.RandomState(7)
    items, distract, player = generate_box_world(rand, grid_size=12)
    # Exactly one gem; never on the border.
    gems = np.argwhere(items == _GEM_CODE)
    assert len(gems) == 1
    assert items[0, :].sum() == 0 and items[:, 0].sum() == 0
    # Every lock has a key/gem directly to its left (box structure).
    locks = np.argwhere((items > _LOCK_BASE) & (items < _GEM_CODE))
    for y, x in locks:
        left = items[y, x - 1]
        assert (0 < left <= 20) or left == _GEM_CODE
    # Player starts on an empty cell.
    assert items[player[0], player[1]] == 0
    # Determinism given the RandomState.
    items2, _, player2 = generate_box_world(
        np.random.RandomState(7), grid_size=12
    )
    assert np.array_equal(items, items2) and np.array_equal(player, player2)


def test_batched_device_path():
    game = BoxWorld(grid_size=8)
    keys = jax.random.split(jax.random.PRNGKey(0), 16)
    states = jax.vmap(lambda k: game.initial_state(k))(keys)
    step = jax.jit(jax.vmap(lambda s, a: game.step(s, a)))
    for a in [0, 2, 3, 1]:
        states, outs = step(states, jnp.full((16,), a, jnp.int32))
    assert outs.reward.shape == (16,)


def test_generation_and_frame_lockstep_vs_pycolab():
    """Generation + play lockstep against the reference box_world: the
    same seeded ``RandomState`` must produce the identical layout
    draw-for-draw (rejection sampling included), and play must match
    boards/rewards/termination at every frame."""
    import importlib
    import os
    import sys

    import jax
    import pytest

    import conftest

    if not conftest.reference_available():
        pytest.skip("reference not mounted")
    conftest.add_reference_to_path()
    sys.path.insert(
        0,
        os.path.join(
            conftest.REFERENCE_ROOT,
            "pycolab/examples/research/box_world",
        ),
    )
    ref_bw = importlib.import_module("box_world")

    for seed in (0, 1, 2, 3):
        game = ref_bw.make_game(
            grid_size=12, solution_length=[1, 2], num_forward=[0, 1],
            num_backward=[0], branch_length=1,
            random_state=np.random.RandomState(seed), max_num_steps=120,
        )
        obs, reward, _ = game.its_showtime()
        env = BoxWorld(
            grid_size=12, solution_length=(1, 2), num_forward=(0, 1),
            num_backward=(0,), branch_length=1, max_num_steps=120,
            random_state=np.random.RandomState(seed),
        )
        state = env.initial_state(
            jax.random.PRNGKey(0), options=env.host_reset_options()
        )
        step = jax.jit(env.step)
        board_fn = jax.jit(env.board)
        np.testing.assert_array_equal(
            np.asarray(obs.board), np.asarray(board_fn(state)),
            err_msg=f"seed {seed} generated layout",
        )
        rng = np.random.RandomState(seed + 100)
        for i in range(140):
            a = int(rng.randint(0, 4))
            obs, reward, _ = game.play(a)
            state, out = step(state, jnp.int32(a))
            assert abs(float(reward or 0.0) - float(out.reward)) < 1e-6, (
                seed, i,
            )
            assert game.game_over == bool(out.game_over), (seed, i)
            np.testing.assert_array_equal(
                np.asarray(obs.board), np.asarray(board_fn(state)),
                err_msg=f"seed {seed} step {i}",
            )
            if game.game_over:
                break
