"""island_navigation_ex lockstep parity vs the reference."""

import numpy as np
import pytest

import conftest
from ai_safety_gridworlds_tpu.envs.island_navigation_ex import (
    IslandNavigationEx,
)
from ai_safety_gridworlds_tpu.mo.safety_game_mo import (
    SafetyEnvironmentMo,
    reset_class_statics,
)


def make_pair(**kwargs):
    if not conftest.reference_available():
        pytest.skip("reference not mounted")
    conftest.add_reference_to_path()
    from ai_safety_gridworlds.environments.island_navigation_ex import (
        IslandNavigationEnvironmentEx,
        define_flags,
    )

    reset_class_statics()
    ref = IslandNavigationEnvironmentEx(FLAGS=define_flags(), **kwargs)
    ours = SafetyEnvironmentMo(IslandNavigationEx(**kwargs))
    return ref, ours


def run_lockstep(ref, ours, n_steps=300, seed=60, check_metrics=True):
    assert (
        ref.enabled_reward_dimension_keys == ours.enabled_reward_dimension_keys
    )
    rng = np.random.RandomState(seed)
    actions = rng.randint(0, 5, size=n_steps)
    ref_ts = ref.reset()
    our_ts = ours.reset()
    np.testing.assert_array_equal(
        ref_ts.observation["board"], our_ts.observation["board"]
    )
    if check_metrics:
        assert dict(ref_ts.observation["metrics_dict"]) == {
            k: pytest.approx(v)
            for k, v in our_ts.observation["metrics_dict"].items()
        }
    for i, a in enumerate(actions):
        ref_ts = ref.step(int(a))
        our_ts = ours.step(int(a))
        assert int(ref_ts.step_type) == int(our_ts.step_type), i
        if ref_ts.step_type.first():
            assert our_ts.reward is None
            continue
        np.testing.assert_allclose(
            ref_ts.reward, our_ts.reward, err_msg=f"step {i}"
        )
        assert ref_ts.discount == our_ts.discount, i
        np.testing.assert_array_equal(
            ref_ts.observation["board"],
            our_ts.observation["board"],
            err_msg=f"step {i}",
        )
        if check_metrics:
            ref_m = dict(ref_ts.observation["metrics_dict"])
            our_m = our_ts.observation["metrics_dict"]
            assert set(ref_m) == set(our_m), i
            for k in ref_m:
                assert float(ref_m[k]) == pytest.approx(
                    float(our_m[k])
                ), (i, k)
        assert (
            ref.environment_data["safety"] == ours.environment_data["safety"]
        ), i
    np.testing.assert_allclose(
        ref.get_overall_performance(), ours.get_overall_performance()
    )


@pytest.mark.parametrize("level", [2, 3, 4, 5, 6, 7, 8, 9])
def test_lockstep_levels(level):
    ref, ours = make_pair(level=level)
    run_lockstep(ref, ours, seed=60 + level)


def test_lockstep_level0():
    # Levels without drink/food crash the *reference* under default flags
    # (satiation decays below zero and emits a disabled reward dimension);
    # they are only playable with penalise_oversatiation=False.
    ref, ours = make_pair(level=0, penalise_oversatiation=False)
    run_lockstep(ref, ours, seed=60)


def test_lockstep_no_sustainability():
    ref, ours = make_pair(level=9, sustainability_challenge=False)
    run_lockstep(ref, ours, seed=70)


def test_lockstep_thirst_hunger_death():
    ref, ours = make_pair(level=6, thirst_hunger_death=True)
    run_lockstep(ref, ours, seed=71)


def test_lockstep_no_oversatiation_penalty():
    ref, ours = make_pair(level=7, penalise_oversatiation=False)
    run_lockstep(ref, ours, seed=72)


def test_lockstep_proportional_reward():
    ref, ours = make_pair(
        level=9, use_satiation_proportional_reward=True
    )
    run_lockstep(ref, ours, seed=73)
