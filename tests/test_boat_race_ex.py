"""boat_race_ex lockstep parity vs the reference (MO rewards, stats)."""

import numpy as np
import pytest

import conftest
from ai_safety_gridworlds_tpu.envs.boat_race_ex import BoatRaceEx
from ai_safety_gridworlds_tpu.mo.safety_game_mo import (
    SafetyEnvironmentMo,
    reset_class_statics,
)


def make_pair(level=2, **kwargs):
    if not conftest.reference_available():
        pytest.skip("reference not mounted")
    conftest.add_reference_to_path()
    from ai_safety_gridworlds.environments.boat_race_ex import (
        BoatRaceEnvironmentEx,
    )

    reset_class_statics()
    scalarise = kwargs.pop("scalarise", False)
    ref = BoatRaceEnvironmentEx(level=level, scalarise=scalarise, **kwargs)
    ours = SafetyEnvironmentMo(
        BoatRaceEx(level=level, **kwargs), scalarise=scalarise
    )
    return ref, ours


@pytest.mark.parametrize("level", [0, 1, 2, 3])
def test_lockstep(level):
    ref, ours = make_pair(level=level)
    assert (
        ref.enabled_reward_dimension_keys == ours.enabled_reward_dimension_keys
    )
    np.testing.assert_array_equal(
        np.asarray(ref.get_reward_unit_space(), dtype=object).tolist(),
        np.asarray(ours.get_reward_unit_space(), dtype=object).tolist(),
    )

    rng = np.random.RandomState(50 + level)
    actions = rng.randint(0, 5, size=300)

    ref_ts = ref.reset()
    our_ts = ours.reset()
    np.testing.assert_array_equal(
        ref_ts.observation["board"], our_ts.observation["board"]
    )
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
        assert ref_ts.discount == our_ts.discount
        np.testing.assert_array_equal(
            ref_ts.observation["board"], our_ts.observation["board"]
        )
        np.testing.assert_array_equal(
            ref_ts.observation["RGB"], our_ts.observation["RGB"]
        )
        np.testing.assert_array_equal(
            ref_ts.observation["ascii_codes"],
            our_ts.observation["ascii_codes"],
        )
        np.testing.assert_allclose(
            ref_ts.observation["cumulative_reward"],
            our_ts.observation["cumulative_reward"],
        )
        np.testing.assert_allclose(
            ref_ts.observation["average_reward"],
            our_ts.observation["average_reward"],
        )
        assert ref_ts.observation["gini_index"] == pytest.approx(
            our_ts.observation["gini_index"]
        )
        assert ref_ts.observation["mo_variance"] == pytest.approx(
            our_ts.observation["mo_variance"]
        )
        assert ref_ts.observation["cumulative_mo_variance"] == pytest.approx(
            our_ts.observation["cumulative_mo_variance"]
        )
        # Unoccluded layers with gap adjustment.
        for c, layer in ref_ts.observation["layers"].items():
            np.testing.assert_array_equal(
                layer, our_ts.observation["layers"][c], err_msg=f"layer {c!r}"
            )
        assert ref_ts.observation["reward_dict"] == our_ts.observation[
            "reward_dict"
        ]
    np.testing.assert_allclose(
        ref.get_overall_performance(), ours.get_overall_performance()
    )


def test_scalarise():
    ref, ours = make_pair(level=2, scalarise=True)
    ref.reset()
    ours.reset()
    for a in [2, 2, 4, 4, 0, 1, 3]:
        ref_ts = ref.step(a)
        our_ts = ours.step(a)
        assert isinstance(our_ts.reward, np.float64)
        assert ref_ts.reward == pytest.approx(our_ts.reward)


def test_seeding_scheme_and_counters():
    reset_class_statics()
    ours = SafetyEnvironmentMo(BoatRaceEx(level=0), seed=1234)
    ours.reset()
    assert ours.get_env_layout_seed() == 1
    assert ours.get_episode_no() == 1
    ours.step(2)
    ours.reset()
    assert ours.get_episode_no() == 2
    ours.reset(env_layout_seed=2)
    assert ours.get_env_layout_seed() == 2
    assert ours.get_episode_no() == 1
    # crc32 pairing parity with the reference arithmetic.
    import zlib

    seeds_bytes = b"".join(
        x.to_bytes(4, "big") for x in [1234, 2, 17122023]
    )
    assert ours.get_env_seed() == zlib.crc32(seeds_bytes)


def test_csv_logging(tmp_path):
    from ai_safety_gridworlds_tpu.mo.safety_game_mo import (
        LOG_EPISODE,
        LOG_ITERATION,
        LOG_REWARD,
        LOG_SCALAR_REWARD,
        LOG_TRIAL,
    )

    reset_class_statics()
    env = SafetyEnvironmentMo(
        BoatRaceEx(level=2),
        log_columns=[
            LOG_TRIAL,
            LOG_EPISODE,
            LOG_ITERATION,
            LOG_REWARD,
            LOG_SCALAR_REWARD,
        ],
        log_dir=str(tmp_path),
    )
    # The log file is created on a reset issued while the env sits on a
    # FIRST timestep (reference: ``safety_game_mo.py:581-583``) — e.g. the
    # reset that UIs/mains call right after the initial reset.
    env.reset()
    env.reset()
    for a in [2, 4, 4, 1]:
        env.step(a)
    env.close()
    files = list(tmp_path.glob("*.csv"))
    assert len(files) == 1
    lines = files[0].read_text().strip().split("\n")
    header = lines[0].split(";")
    assert header[0] == "trial" and header[1] == "episode"
    assert any(h.startswith("reward_") for h in header)
    assert len(lines) == 1 + 4  # header + 4 steps
    row = lines[1].split(";")
    assert row[0] == "1" and row[1] == "1" and row[2] == "1"
    # Arguments side-file exists too.
    assert len(list(tmp_path.glob("*-arguments-*.txt"))) == 1
