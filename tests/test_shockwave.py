"""Shockwave: ASCII frame lockstep vs the reference pycolab engine with a
synchronized global-numpy impact stream."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import conftest
from ai_safety_gridworlds_tpu.envs.shockwave import Shockwave


def _ref_game():
    if not conftest.reference_available():
        pytest.skip("reference not mounted")
    conftest.add_reference_to_path()
    try:
        from pycolab.examples import shockwave as ref
    except ImportError:
        pytest.skip("scipy unavailable for reference shockwave")
    return ref.make_game(0)


def run_lockstep(seed, actions):
    np.random.seed(seed)
    game = _ref_game()
    obs, reward, discount = game.its_showtime()
    ref_state_after = np.random.get_state()

    np.random.seed(seed)
    env = Shockwave()
    options = {
        k: jnp.asarray(v) for k, v in env.host_reset_options().items()
    }
    state = env.initial_state(jax.random.PRNGKey(0), options)
    # Both sides consumed the same showtime draw.
    assert np.random.get_state()[1][0] == ref_state_after[1][0]

    step = jax.jit(env.step)
    board_fn = jax.jit(env.board)
    np.testing.assert_array_equal(
        np.asarray(obs.board), np.asarray(board_fn(state)), "showtime"
    )
    if game.game_over:
        return 0

    frames = 0
    for i, a in enumerate(actions):
        pre = np.random.get_state()
        obs, reward, discount = game.play(a)
        post_ref = np.random.get_state()

        np.random.set_state(pre)
        opts = {
            k: jnp.asarray(v)
            for k, v in env.host_step_options(state, int(a)).items()
        }
        # Identical draw consumption on both sides.
        assert (np.random.get_state()[1] == post_ref[1]).all(), i
        state, out = step(state, jnp.int32(a), opts)

        assert game.game_over == bool(out.game_over), i
        if game.game_over:
            assert float(reward or 0.0) == float(out.reward), i
            np.testing.assert_array_equal(
                np.asarray(obs.board), np.asarray(board_fn(state)),
                err_msg=f"terminal step {i}",
            )
            break
        np.testing.assert_array_equal(
            np.asarray(obs.board),
            np.asarray(board_fn(state)),
            err_msg=f"step {i}",
        )
        frames += 1
    return frames


def test_lockstep_stay():
    run_lockstep(3, [3] * 120)


def test_lockstep_random_walk():
    rng = np.random.RandomState(11)
    run_lockstep(7, [int(a) for a in rng.randint(0, 4, 150)])


def test_lockstep_rush_to_top():
    # Up-biased walk: usually wins (+1) by reaching the safe row.
    rng = np.random.RandomState(5)
    acts = [0 if rng.rand() < 0.7 else int(rng.randint(1, 4)) for _ in range(120)]
    run_lockstep(9, acts)


def test_device_path_batched():
    env = Shockwave()
    keys = jax.random.split(jax.random.PRNGKey(0), 64)
    states = jax.vmap(lambda k: env.initial_state(k))(keys)
    step = jax.jit(jax.vmap(lambda s, a: env.step(s, a)))
    done_any = False
    for i in range(30):
        states, outs = step(states, jnp.zeros((64,), jnp.int32))
        done_any = done_any or bool(outs.game_over.any())
    # Impacts are drawn per-env on device: distinct fields.
    assert len(np.unique(np.asarray(states.impact), axis=0)) > 4
