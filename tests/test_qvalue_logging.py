"""Q-value-per-tile-type logging and MoMa CSV logging tests.

Mirrors the reference's agent-supplied Q-vector logging
(``safety_game_mo.py:810-857,1257``; ``safety_game_moma.py:984-1047``): the
env simulates each action's destination tile and aggregates mean Q per tile
type, persisted across steps and written to the CSV when the
``tiletype_qvalue`` column is enabled.
"""

import glob

import numpy as np

from ai_safety_gridworlds_tpu.envs.aintelope_savanna import AIntelopeSavanna
from ai_safety_gridworlds_tpu.envs.island_navigation_ex import (
    IslandNavigationEx,
)
from ai_safety_gridworlds_tpu.ma.safety_game_moma import SafetyEnvironmentMoMa
from ai_safety_gridworlds_tpu.mo.safety_game_mo import (
    LOG_CUMULATIVE_REWARD,
    LOG_GINI_INDEX,
    LOG_ITERATION,
    LOG_METRICS,
    LOG_QVALUES_PER_TILETYPE,
    LOG_REWARD,
    LOG_SCALAR_REWARD,
    SafetyEnvironmentMo,
    TILE_TYPES,
    reset_class_statics,
)


def test_mo_qvalue_logging(tmp_path):
    reset_class_statics()
    env = SafetyEnvironmentMo(
        IslandNavigationEx(),
        log_columns=[
            LOG_ITERATION,
            LOG_REWARD,
            LOG_METRICS,
            LOG_QVALUES_PER_TILETYPE,
        ],
        log_dir=str(tmp_path),
    )
    env.reset()
    env.reset()
    # Passable tile types exclude walls and the agent char, include gap.
    tile_types = env._environment_data[TILE_TYPES]
    assert " " in tile_types and "#" not in tile_types
    n = len(env.enabled_reward_dimension_keys)
    env.set_current_q_value_per_action(
        np.arange(5 * n, dtype=np.float32).reshape(5, n)
    )
    for a in [1, 2, 3, 4, 0]:
        env.step(a)
    # Q estimates persist and are keyed by destination tile char.
    assert env.q_value_per_tiletype
    assert all(len(v) == n for v in env.q_value_per_tiletype.values())
    env.close()
    f = glob.glob(str(tmp_path) + "/*.csv")[0]
    lines = open(f).read().splitlines()
    header, row = lines[0].split(";"), lines[1].split(";")
    assert len(header) == len(row)
    assert any(c.startswith("tiletype_qvalue_") for c in header)


def test_moma_csv_and_qvalue_logging(tmp_path):
    reset_class_statics()
    env = SafetyEnvironmentMoMa(
        AIntelopeSavanna(amount_agents=2, level=13),
        log_columns=[
            LOG_ITERATION,
            LOG_REWARD,
            LOG_CUMULATIVE_REWARD,
            LOG_SCALAR_REWARD,
            LOG_GINI_INDEX,
            LOG_METRICS,
            LOG_QVALUES_PER_TILETYPE,
        ],
        log_dir=str(tmp_path),
    )
    env.reset()
    env.reset()
    dims = env.enabled_agents_reward_dimensions
    env.set_current_q_value_per_action(
        {a: np.ones((5, len(dims[a])), np.float32) for a in env.agent_names}
    )
    rng = np.random.RandomState(3)
    for _ in range(5):
        env.step({a: int(rng.randint(0, 5)) for a in env.agent_names})
    assert set(env.q_value_per_tiletype) == set(env.agent_names)
    env.close()
    f = glob.glob(str(tmp_path) + "/*.csv")[0]
    lines = open(f).read().splitlines()
    header, row = lines[0].split(";"), lines[1].split(";")
    assert len(header) == len(row)
    assert len(lines) == 1 + 5  # header + 5 steps
    # Per-agent columns for both agents.
    assert any(c.startswith("reward_0_") for c in header)
    assert any(c.startswith("reward_1_") for c in header)
    assert any(c.startswith("tiletype_qvalue_1_") for c in header)


def test_format_float_matches_reference_decimal_semantics():
    """CSV float normalization: prec-10 ROUND_HALF_UP with trailing-zero
    normalization, differentially checked against the reference's
    formatter semantics (``safety_game_mo.py:400,1218-1227``) over random
    magnitudes and edge cases."""
    import decimal
    import numbers

    import numpy as np

    from ai_safety_gridworlds_tpu.mo.safety_game_mo import (
        SafetyEnvironmentMo,
    )

    ctx = decimal.Context(
        prec=10, rounding=decimal.ROUND_HALF_UP, capitals=0
    )

    def ref_format(value):
        if isinstance(value, numbers.Number):
            d = ctx.create_decimal_from_float(float(value))
            integral = d.to_integral()
            return integral if d == integral else d.normalize()
        return str(value)

    class Shim:
        decimal_context = ctx

    rng = np.random.RandomState(0)
    vals = list(rng.randn(200) * 10.0 ** rng.randint(-8, 8, 200)) + [
        0.0, -0.0, 1.0, -1.0, 0.1, 1 / 3, 2 / 3, 100.0, 1e16, -1e16,
        123456789.123456789, np.float32(0.30000001), np.int64(7),
        np.float64(5e-324), 1e9 + 0.5, "label",
    ]
    for v in vals:
        assert str(ref_format(v)) == str(
            SafetyEnvironmentMo.format_float(Shim(), v)
        ), v


def test_reference_py_number_fractional_provenance():
    """The upstream MoMa writer accumulates plain Python numbers, so a dim
    that ever received a fractional contribution stays a FLOAT even when
    later steps cancel it back to exactly 0 ("0.0", not "0").
    ``_reference_py_number`` + the per-episode ``_episode_float_touched``
    bit must reproduce that typing. Differential: random per-step
    contribution sequences accumulated two ways — as Python numbers (the
    upstream semantics) and as f64 + provenance bit (ours) — must repr
    identically at every prefix.

    Residual (documented in PARITY.md): contributions that cancel to an
    integer WITHIN one step lose their float provenance before the shell
    sees the per-step sum; no shipped env has opposite-signed fractional
    constants on one dim, so the case is unreachable without adversarial
    flag overrides."""
    from ai_safety_gridworlds_tpu.ma.safety_game_moma import (
        SafetyEnvironmentMoMa,
    )

    conv = SafetyEnvironmentMoMa._reference_py_number
    rng = np.random.RandomState(7)
    pool = [1, -1, 2, 5, -3, 0.5, -0.5, 2.5, -2.5, 0.25, -0.25]
    for _ in range(300):
        n_steps = rng.randint(1, 12)
        # One contribution per step (per-step sums can't cancel
        # intra-step, matching the shipped envs' reward structures).
        seq = [pool[rng.randint(len(pool))] for _ in range(n_steps)]

        py_sum = 0  # upstream: starts as int, float contributions poison
        f64_sum = np.float64(0.0)
        touched = False
        for c in seq:
            py_sum = py_sum + c
            step_value = np.float64(c)  # per-step sum (one contribution)
            f64_sum = f64_sum + step_value
            # The shell's rule (safety_game_moma.step): flag when the
            # per-step sum is non-integer.
            touched = touched or (float(np.mod(step_value, 1.0)) != 0.0)
            ours = conv(f64_sum, float_touched=touched)
            assert repr(ours) == repr(py_sum), (seq, c, ours, py_sum)

    # The exact VERDICT corner: +0.5 then -0.5 cancels to float 0.0.
    assert repr(conv(np.float64(0.0), float_touched=True)) == "0.0"
    assert repr(conv(np.float64(0.0), float_touched=False)) == "0"


def test_episode_float_touched_bookkeeping(tmp_path):
    """The shell flips the provenance bit exactly when a dim's per-step
    sum goes non-integer, and clears it on reset."""
    import importlib
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ai_safety_gridworlds_tpu.envs.aintelope_savanna import (
        AIntelopeSavanna,
    )
    from ai_safety_gridworlds_tpu.ma.safety_game_moma import (
        SafetyEnvironmentMoMa,
    )

    env = SafetyEnvironmentMoMa(
        AIntelopeSavanna(
            amount_agents=1, level=13, amount_small_drink_holes=1,
            max_iterations=20,
        )
    )
    env.reset()
    assert not env._episode_float_touched.any()
    rng = np.random.RandomState(3)
    saw_touch = False
    for _ in range(3):
        for _ in range(20):
            ts = env.step({a: int(rng.randint(0, 5))
                           for a in env.agent_names})
            frac = np.mod(env._episode_returns, 1.0) != 0.0
            # Any currently-fractional cumulative must be flagged.
            assert (env._episode_float_touched | ~frac).all()
            saw_touch = saw_touch or env._episode_float_touched.any()
            types = ts.step_type
            if all(int(t) != 2 for t in types.values()):
                continue
        env.reset()
        assert not env._episode_float_touched.any()


def test_gini_coefficient_matches_reference():
    import numpy as np
    import pytest

    import conftest

    if not conftest.reference_available():
        pytest.skip("reference not mounted")
    conftest.add_reference_to_path()
    from ai_safety_gridworlds.environments.shared.safety_game_mo import (
        gini_coefficient as ref_gini,
    )

    from ai_safety_gridworlds_tpu.mo.safety_game_mo import gini_coefficient

    rng = np.random.RandomState(1)
    cases = [
        [], [0.0], [5.0], [-3.0, -3.0], [1.0, 0.0], [-10.0, 10.0],
        [0.0, 0.0, 0.0], list(range(10)),
    ] + [list(rng.randn(rng.randint(1, 8)) * 10) for _ in range(60)]
    for v in cases:
        assert float(ref_gini(v)) == pytest.approx(
            float(gini_coefficient(v)), abs=1e-12
        ), v


@__import__("pytest").mark.parametrize(
    "family,env_kwargs",
    [
        ("savanna", dict(amount_agents=2, level=13)),
        # Fractional 0.5 SMALL extraction rates: float-typed dims must
        # print as Python floats in the dict-repr cells, int dims as ints.
        ("savanna", dict(amount_agents=2, level=13,
                         amount_small_food_patches=2,
                         amount_small_drink_holes=1)),
        # Different init-metric ordering (sprite-ctor visit metrics) and
        # richer per-agent dims.
        ("island", dict(level=3)),
        # Quirkiest per-agent column set: heterogeneous worker/supervisor
        # reward dims and expression/visit metrics.
        ("firemaker", dict()),
        # Satiation-proportional rewards: float products flow through the
        # dict-repr cells, exercising the runtime fractional-provenance
        # bit against the upstream Python-number accumulation.
        ("island", dict(level=3, use_satiation_proportional_reward=True,
                        penalise_oversatiation=True)),
    ],
)
def test_moma_reference_csv_format_byte_differential(
    tmp_path, family, env_kwargs
):
    """reference_csv_format=True reproduces the upstream MoMa CSV writer
    BYTE-FOR-BYTE on a lockstepped run (PARITY.md "MoMa per-agent CSV
    columns" made opt-in): agent-name cells for dict-iterated reward
    columns, str(dict) cells for scalar/gini/variance columns, and the
    all-zero tiletype-qvalue quirk. Timestamp/environment/arguments
    columns are excluded (machine-dependent by design)."""
    import importlib
    import os
    import sys

    import conftest

    if not conftest.reference_available():
        import pytest

        pytest.skip("reference not mounted")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    # Reference CSV state is per-CLASS: an identical-flags env built by an
    # earlier test leaves create_new_log_file=False and a handle into that
    # test's tmp dir, so this run would write no CSV under ref_dir.
    conftest.scrub_reference_log_state()
    t = importlib.import_module("test_aintelope_savanna")

    from ai_safety_gridworlds_tpu.mo.safety_game_mo import (
        LOG_AVERAGE_MO_VARIANCE,
        LOG_AVERAGE_REWARD,
        LOG_CUMULATIVE_GINI_INDEX,
        LOG_CUMULATIVE_MO_VARIANCE,
        LOG_EPISODE,
        LOG_MO_VARIANCE,
        LOG_SCALAR_AVERAGE_REWARD,
        LOG_SCALAR_CUMULATIVE_REWARD,
    )

    columns = [
        LOG_EPISODE,
        LOG_ITERATION,
        LOG_REWARD,
        LOG_SCALAR_REWARD,
        LOG_CUMULATIVE_REWARD,
        "average_reward",
        LOG_SCALAR_CUMULATIVE_REWARD,
        LOG_SCALAR_AVERAGE_REWARD,
        LOG_GINI_INDEX,
        LOG_CUMULATIVE_GINI_INDEX,
        LOG_MO_VARIANCE,
        LOG_CUMULATIVE_MO_VARIANCE,
        LOG_AVERAGE_MO_VARIANCE,
        LOG_METRICS,
        LOG_QVALUES_PER_TILETYPE,
    ]
    assert LOG_AVERAGE_REWARD == "average_reward"
    ref_dir = tmp_path / "ref"
    our_dir = tmp_path / "ours"
    ref_dir.mkdir()
    our_dir.mkdir()
    wrapper_kwargs = dict(
        log_columns=list(columns),
        log_arguments_to_separate_file=True,
        reference_csv_format=True,
    )
    if family == "island":
        t = importlib.import_module("test_island_navigation_ex_ma")
    elif family == "firemaker":
        t = importlib.import_module("test_firemaker_ex_ma")
    ref, ours = t.make_pair(
        wrapper_kwargs=wrapper_kwargs,
        ref_overrides=dict(log_dir=str(ref_dir)),
        our_overrides=dict(log_dir=str(our_dir)),
        **env_kwargs,
    )

    # Log files open on reset-while-FIRST on both sides: one priming
    # reset, then the lockstep run (which resets again internally).
    ref.reset()
    ours.reset()
    t.run_lockstep(ref, ours, n_steps=40, seed=214)
    if hasattr(ref, "close"):
        ref.close()
    ours.close()

    ref_csv = sorted(glob.glob(str(ref_dir) + "/**/*.csv", recursive=True))
    our_csv = sorted(glob.glob(str(our_dir) + "/**/*.csv", recursive=True))
    assert ref_csv and our_csv, (ref_csv, our_csv)
    ref_lines = open(ref_csv[0]).read().splitlines()
    our_lines = open(our_csv[0]).read().splitlines()
    assert len(ref_lines) == len(our_lines) > 5
    for i, (rl, ol) in enumerate(zip(ref_lines, our_lines)):
        assert rl == ol, f"line {i}:\nref : {rl}\nours: {ol}"

