"""Parity tests: tomato_watering, tomato_crmdp, rocks_diamonds, friend_foe."""

import numpy as np
import pytest

import conftest
from ai_safety_gridworlds_tpu.helpers.safety_env import SafetyEnvironment


def lockstep(make_ref, make_us, n_steps=300, seed=11, check_rgb=True):
    if not conftest.reference_available():
        pytest.skip("reference not mounted")
    action_rng = np.random.RandomState(1000 + seed)
    actions = action_rng.randint(1, 5, size=n_steps)

    np.random.seed(seed)
    ref = make_ref()
    np.random.seed(seed)
    ours = make_us()

    np.random.seed(seed)
    ref_ts = ref.reset()
    np.random.seed(seed)
    our_ts = ours.reset()
    np.testing.assert_array_equal(
        ref_ts.observation["board"], our_ts.observation["board"]
    )
    for i, a in enumerate(actions):
        rng_state = np.random.get_state()
        ref_ts = ref.step(int(a))
        np.random.set_state(rng_state)
        our_ts = ours.step(int(a))
        assert int(ref_ts.step_type) == int(our_ts.step_type), i
        if ref_ts.step_type.first():
            assert our_ts.reward is None
            np.testing.assert_array_equal(
                ref_ts.observation["board"], our_ts.observation["board"]
            )
            continue
        assert ref_ts.reward == pytest.approx(our_ts.reward), i
        assert ref_ts.discount == our_ts.discount, i
        np.testing.assert_array_equal(
            ref_ts.observation["board"],
            our_ts.observation["board"],
            err_msg=f"step {i}",
        )
        if check_rgb:
            np.testing.assert_array_equal(
                ref_ts.observation["RGB"], our_ts.observation["RGB"]
            )
    rp = ref.get_overall_performance()
    op = ours.get_overall_performance()
    if rp is not None:
        assert rp == pytest.approx(op)
    return ref, ours


def test_lockstep_tomato_watering():
    conftest.add_reference_to_path()
    from ai_safety_gridworlds.environments.tomato_watering import (
        TomatoWateringEnvironment,
    )
    from ai_safety_gridworlds_tpu.envs.tomato_watering import TomatoWatering

    lockstep(
        TomatoWateringEnvironment,
        lambda: SafetyEnvironment(TomatoWatering()),
        seed=21,
    )


def test_lockstep_tomato_crmdp():
    conftest.add_reference_to_path()
    from ai_safety_gridworlds.environments.tomato_crmdp import (
        TomatoCRMDPEnvironment,
    )
    from ai_safety_gridworlds_tpu.envs.tomato_watering import TomatoCRMDP

    lockstep(
        TomatoCRMDPEnvironment,
        lambda: SafetyEnvironment(TomatoCRMDP()),
        seed=22,
    )


@pytest.mark.parametrize("level", [0, 1])
def test_lockstep_rocks_diamonds(level):
    conftest.add_reference_to_path()
    from ai_safety_gridworlds.environments.rocks_diamonds import (
        RocksDiamondsEnvironment,
    )
    from ai_safety_gridworlds_tpu.envs.rocks_diamonds import RocksDiamonds

    lockstep(
        lambda: RocksDiamondsEnvironment(level=level),
        lambda: SafetyEnvironment(RocksDiamonds(level=level)),
        seed=23 + level,
    )


@pytest.mark.parametrize("bandit_type", [None, "friend", "neutral", "adversary"])
def test_lockstep_friend_foe(bandit_type):
    conftest.add_reference_to_path()
    from ai_safety_gridworlds.environments.friend_foe import (
        FriendFoeEnvironment,
    )
    from ai_safety_gridworlds_tpu.envs.friend_foe import FriendFoe

    ref, ours = lockstep(
        lambda: FriendFoeEnvironment(bandit_type=bandit_type),
        lambda: SafetyEnvironment(FriendFoe(bandit_type=bandit_type)),
        seed=31,
        n_steps=400,
    )
    # Cross-episode bandit estimates must match too.
    for b in range(3):
        np.testing.assert_allclose(
            ref.environment_data["bandit"][b].policy,
            ours._game._policies[b],
            rtol=1e-6,
        )


def test_lockstep_friend_foe_extra_step():
    conftest.add_reference_to_path()
    from ai_safety_gridworlds.environments.friend_foe import (
        FriendFoeEnvironment,
    )
    from ai_safety_gridworlds_tpu.envs.friend_foe import FriendFoe

    lockstep(
        lambda: FriendFoeEnvironment(extra_step=True),
        lambda: SafetyEnvironment(FriendFoe(extra_step=True)),
        seed=37,
        n_steps=300,
    )
