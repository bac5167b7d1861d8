"""aintelope_savanna lockstep parity vs the (shimmed) reference.

Covers the full mechanic zoo: per-episode map randomization, resource
spawning/removal with a shared availability pool, predator random walks,
gold/silver log-scaled scores, danger tiles, sustainability regrowth, and
homeostasis (satiation thresholds / thirst-hunger death).
"""

import numpy as np
import pytest

import conftest
from ai_safety_gridworlds_tpu.core.timestep import StepType
from ai_safety_gridworlds_tpu.envs.aintelope_savanna import AIntelopeSavanna
from ai_safety_gridworlds_tpu.ma.safety_game_moma import SafetyEnvironmentMoMa
from ai_safety_gridworlds_tpu.mo.safety_game_mo import reset_class_statics
from ai_safety_gridworlds_tpu.mo.map_randomization import (
    clear_randomization_cache,
)


def make_pair(wrapper_kwargs=None, ref_overrides=None, our_overrides=None,
              **kwargs):
    if not conftest.reference_available():
        pytest.skip("reference not mounted")
    conftest.add_reference_to_path()
    import absl.flags  # noqa: F401
    from ai_safety_gridworlds.environments.shared import (
        safety_game_ma as _sgma,
        safety_game_moma as _sgmoma,
    )
    from ai_safety_gridworlds.environments.shared.ma_reward import ma_reward
    from ai_safety_gridworlds.environments.shared.rl import (
        pycolab_interface_ma as _pima,
    )

    if not hasattr(_sgmoma, "safety_game_ma"):
        _sgmoma.safety_game_ma = _sgma
    if not getattr(_pima.EnvironmentMa, "_none_reward_shimmed", False):
        orig = _pima.EnvironmentMa._update_for_game_step

        def patched(self, observations, reward, discount):
            if self._last_reward is None:
                self._last_reward = ma_reward({})
            return orig(self, observations, reward, discount)

        _pima.EnvironmentMa._update_for_game_step = patched
        _pima.EnvironmentMa._none_reward_shimmed = True

    from ai_safety_gridworlds.environments.aintelope.aintelope_savanna import (
        AIntelopeSavannaEnvironmentMa as RefSavanna,
        define_flags,
    )

    reset_class_statics()
    clear_randomization_cache()
    try:
        _sgma.randomized_maps_per_environment.clear()
    except AttributeError:
        pass
    try:
        from ai_safety_gridworlds.environments.shared import (
            safety_game_mo_base as _sgmob,
        )

        _sgmob.randomized_maps_per_environment.clear()
    except (ImportError, AttributeError):
        pass

    # The reference keeps seed/layout/episode counters as CLASS attributes
    # that survive reconstruction (``safety_game_moma.py:359-393``); purge
    # them so each test starts from a virgin statics state matching ours.
    for attr in (
        "episode_no", "env_layout_seed", "env_seed", "next_experiment_no",
        "prev_experiment_no", "create_new_log_file", "log_file_handle",
        "log_filename", "flags", "log_arguments", "metrics_keys",
        "enabled_reward_dimension_keys", "enabled_agents_reward_dimensions",
        "log_filename_comment",
    ):
        if attr in RefSavanna.__dict__:
            delattr(RefSavanna, attr)

    flags_obj = define_flags()
    ref_kwargs = dict(kwargs)
    if "randomize_agent_actions_order" in ref_kwargs:
        # Upstream quirk: the env passes this flag to super().__init__
        # explicitly, so a same-named kwarg raises TypeError — set the flag.
        flags_obj.randomize_agent_actions_order = ref_kwargs.pop(
            "randomize_agent_actions_order"
        )
    # wrapper_kwargs (log_columns, log_dir, ...) go to the stateful shell
    # on our side and straight into the reference ctor (which IS the
    # shell); our-side-only keys (reference_csv_format) stay ours.
    wrapper_kwargs = dict(wrapper_kwargs or {})
    ref_wrapper_kwargs = {
        k: v for k, v in wrapper_kwargs.items()
        if k != "reference_csv_format"
    }
    ref_wrapper_kwargs.update(ref_overrides or {})
    our_wrapper_kwargs = dict(wrapper_kwargs, **(our_overrides or {}))
    ref = RefSavanna(FLAGS=flags_obj, **ref_kwargs, **ref_wrapper_kwargs)
    ours = SafetyEnvironmentMoMa(
        AIntelopeSavanna(**kwargs), **our_wrapper_kwargs
    )
    return ref, ours


def sync_reset(ref, ours):
    """Reset both sides with identical Generator streams. The reference
    draws map-randomization randomness from the env Generator during reset;
    both sides reseed deterministically (crc32 statics), so streams should
    already agree — the assert checks the randomized boards really match."""
    ref_ts = ref.reset()
    our_ts = ours.reset()
    np.testing.assert_array_equal(
        ref_ts.observation["board"], our_ts.observation["board"]
    )
    return ref_ts, our_ts


def run_lockstep(ref, ours, n_steps=150, seed=70, check_metrics=True):
    agents = ours.agent_names
    for a in agents:
        assert (
            ref.enabled_agents_reward_dimensions[a]
            == ours.enabled_agents_reward_dimensions[a]
        ), a
    rng = np.random.RandomState(seed)
    ref_ts, our_ts = sync_reset(ref, ours)
    for i in range(n_steps):
        types = ref_ts.step_type
        actions = {}
        for a in agents:
            st = types[a] if isinstance(types, dict) else types
            if int(st) in (int(StepType.LAST), int(StepType.DEAD)):
                continue
            actions[a] = int(rng.randint(0, 5))
        if not actions:
            ref_ts, our_ts = sync_reset(ref, ours)
            continue

        ref_gen_state = ref.environment_data["np_random"].bit_generator.state
        ref_ts = ref.step(actions)
        ours._np_random.bit_generator.state = ref_gen_state
        our_ts = ours.step(dict(actions))

        ref_types = ref_ts.step_type
        for a in agents:
            assert int(ref_types[a]) == int(our_ts.step_type[a]), (i, a)
        for a in ref_ts.reward:
            np.testing.assert_allclose(
                np.asarray(ref_ts.reward[a], dtype=np.float64),
                np.asarray(our_ts.reward[a], dtype=np.float64),
                err_msg=f"step {i} agent {a}",
                atol=1e-5,
            )
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
                    float(our_m[k]), rel=1e-5, abs=1e-5
                ), (i, k)


def test_lockstep_default():
    ref, ours = make_pair()
    run_lockstep(ref, ours, seed=80)


def test_lockstep_full_zoo():
    # Every mechanic at once: two agents, all resources, gold/silver,
    # danger tiles, and walking predators.
    ref, ours = make_pair(
        amount_agents=2,
        amount_food_patches=2,
        amount_drink_holes=2,
        amount_small_food_patches=1,
        amount_small_drink_holes=1,
        amount_gold_deposits=2,
        amount_silver_deposits=2,
        amount_water_tiles=3,
        amount_predators=3,
    )
    run_lockstep(ref, ours, n_steps=250, seed=81)


def test_lockstep_sustainability_homeostasis():
    ref, ours = make_pair(
        amount_agents=1,
        amount_food_patches=2,
        amount_drink_holes=2,
        sustainability_challenge=True,
        penalise_oversatiation=True,
        use_satiation_proportional_reward=True,
    )
    run_lockstep(ref, ours, n_steps=300, seed=82)


def test_lockstep_thirst_hunger_death():
    ref, ours = make_pair(
        amount_agents=1,
        amount_food_patches=2,
        amount_drink_holes=1,
        penalise_oversatiation=True,
        thirst_hunger_death=True,
    )
    run_lockstep(ref, ours, n_steps=250, seed=83)


def test_lockstep_sharing_scenario_no_shuffle():
    ref, ours = make_pair(
        level=14,
        amount_agents=2,
        amount_food_patches=1,
        amount_drink_holes=1,
        amount_small_food_patches=1,
        amount_small_drink_holes=1,
        randomize_agent_actions_order=False,
    )
    run_lockstep(ref, ours, n_steps=200, seed=84)


def test_agent_perspectives_shape():
    _, ours = make_pair()
    our_ts = ours.reset()
    persp = ours.agent_perspectives_with_layers(
        our_ts.observation, include_layers=False
    )
    # radius [10,10,10,10] -> 21x21 window
    assert persp["0"]["board"].shape == (21, 21)


def test_agent_perspectives_lockstep():
    # Content parity incl. the '#' out-of-board padding and rotation.
    ref, ours = make_pair(amount_agents=2, level=13)
    ref_ts, our_ts = sync_reset(ref, ours)
    rng = np.random.RandomState(96)
    for i in range(25):
        actions = {
            a: int(rng.randint(0, 5))
            for a in ours.agent_names
            if int(ref_ts.step_type[a]) not in (2, 3)
        }
        if not actions:
            ref_ts, our_ts = sync_reset(ref, ours)
            continue
        st = ref.environment_data["np_random"].bit_generator.state
        ref_ts = ref.step(actions)
        ours._np_random.bit_generator.state = st
        our_ts = ours.step(dict(actions))
        ref_p = ref.agent_perspectives_with_layers(
            ref_ts.observation, include_layers=False
        )
        our_p = ours.agent_perspectives_with_layers(
            our_ts.observation, include_layers=False
        )
        for a in ours.agent_names:
            np.testing.assert_array_equal(
                np.asarray(ref_p[a]["board"]),
                our_p[a]["board"],
                err_msg=f"step {i} agent {a}",
            )


def test_lockstep_corner_level_small():
    # Level 4 (1x8 corridor): agent + food only.
    ref, ours = make_pair(level=4, amount_food_patches=1)
    run_lockstep(ref, ours, n_steps=80, seed=85)


def test_lockstep_sharing_small2_two_agents():
    # Level 15 (1x3 map "0F1"): both agents adjacent to one food tile.
    ref, ours = make_pair(
        level=15, amount_agents=2, amount_food_patches=1
    )
    run_lockstep(ref, ours, n_steps=80, seed=86)


def test_lockstep_availability_metric_mode():
    # use_*_availability_metric_instead_of_spawning_tiles: the drape keeps
    # its tiles but the availability metric still depletes/regrows.
    ref, ours = make_pair(
        amount_agents=1,
        amount_food_patches=2,
        amount_drink_holes=2,
        sustainability_challenge=True,
        use_food_availability_metric_instead_of_spawning_tiles=True,
        use_drink_availability_metric_instead_of_spawning_tiles=True,
    )
    run_lockstep(ref, ours, n_steps=150, seed=88)


def test_lockstep_map_resize():
    # map_width/map_height regenerate the interior from tile_type_counts
    # at a new size (``safety_game_ma.py:1135-1171``).
    ref, ours = make_pair(
        level=1, amount_food_patches=1, map_width=8, map_height=8
    )
    run_lockstep(ref, ours, n_steps=100, seed=89)


def test_lockstep_art_flag_topup():
    # Level art carries 3 'F' but the flag asks for 4: the reference's
    # reset drape sweep tops the map up with Generator draws; the host
    # mirror must stay lockstep-exact through the spawn
    # (``aintelope_savanna.py:1226-1330``; PARITY.md "art-vs-flag").
    ref, ours = make_pair(amount_food_patches=4)
    run_lockstep(ref, ours, n_steps=120, seed=301)


def test_device_reset_art_flag_topup_counts():
    # The batched device reset applies the same top-up at board build
    # time: every episode starts with amount_* tiles, not the art's.
    import jax

    from ai_safety_gridworlds_tpu.envs.aintelope_savanna import (
        AIntelopeSavanna,
    )

    env = AIntelopeSavanna(amount_food_patches=4, amount_drink_holes=5)
    for s in range(4):
        k1, k2 = jax.random.split(jax.random.PRNGKey(s))
        st = env.initial_state(k2, env.sample_reset_options(k1))
        assert int(np.asarray(st.food_curtain).sum()) == 4, s
        assert int(np.asarray(st.drink_curtain).sum()) == 5, s
        assert float(np.asarray(st.food_avail)) == 4.0
        assert float(np.asarray(st.drink_avail)) == 5.0


def test_lockstep_quit_on_water_applies_contact_penalty():
    """A QUITting (not dead) agent standing on a danger tile still gets
    the water contact penalty: the reference's drape gates on
    ``player.character in actions`` (``aintelope_savanna.py:1072-1073``),
    which includes QUIT. Random-walks until agent_0 stands on water, then
    QUITs it and lockstep-compares the final rewards."""
    ref, ours = make_pair(
        amount_agents=2, amount_water_tiles=6, amount_predators=2,
    )
    agents = ours.agent_names
    rng = np.random.RandomState(93)
    ref_ts, our_ts = sync_reset(ref, ours)
    found = False
    for i in range(300):
        water = np.asarray(ours._state.water)
        pos0 = np.asarray(ours._state.pos[0])
        on_water = bool(water[pos0[0], pos0[1]])
        types = ref_ts.step_type
        actions = {}
        for k, a in enumerate(agents):
            st = types[a] if isinstance(types, dict) else types
            if int(st) in (int(StepType.LAST), int(StepType.DEAD)):
                continue
            if k == 0 and on_water:
                actions[a] = 9  # QUIT while standing on water
                found = True
            else:
                actions[a] = int(rng.randint(0, 5))
        if not actions:
            ref_ts, our_ts = sync_reset(ref, ours)
            continue
        ref_gen_state = ref.environment_data["np_random"].bit_generator.state
        ref_ts = ref.step(actions)
        ours._np_random.bit_generator.state = ref_gen_state
        our_ts = ours.step(dict(actions))
        for a in ref_ts.reward:
            np.testing.assert_allclose(
                np.asarray(ref_ts.reward[a], dtype=np.float64),
                np.asarray(our_ts.reward[a], dtype=np.float64),
                err_msg=f"step {i} agent {a} (quit={found})",
                atol=1e-5,
            )
        if found:
            # The penalty itself must be present (INJURY -50 dim).
            r0 = np.asarray(ref_ts.reward[agents[0]], np.float64)
            assert r0.sum() != 0.0, "expected a nonzero quit-step reward"
            break
    assert found, "agent_0 never stood on water in 300 steps; re-seed"


def test_device_reset_topup_spawns_onto_occupied_drape_cells():
    """The device reset top-up draws from the REFERENCE's candidate set
    (``aintelope_savanna.py:1304-1309``): any non-wall, non-player cell
    not already holding the resource — including cells occupied by
    another drape (backdrop is GAP off the walls). Occupied picks become
    overlay curtains (overlapping boolean boards, like the reference's
    independent drape curtains), not board chars."""
    import jax

    from ai_safety_gridworlds_tpu.envs.aintelope_savanna import (
        AIntelopeSavanna, GAP_CHR, WALL_CHR,
    )

    env = AIntelopeSavanna(
        level=13, amount_food_patches=4, amount_drink_holes=1,
        amount_small_drink_holes=1, amount_small_food_patches=1,
    )
    assert env._reset_topup == [("F", 3)]
    sample = jax.jit(env.sample_reset_options)
    init = jax.jit(env.initial_state)
    overlap_resets = 0
    for s in range(60):
        opts = sample(jax.random.PRNGKey(s))
        board = np.asarray(opts["board"])
        ov = np.asarray(opts["overlay_food_curtain"])
        st = init(jax.random.PRNGKey(1000 + s), opts)
        # Count enforced: chars + overlays == the flag, disjointly.
        food = np.asarray(st.food_curtain)
        assert food.sum() == 4
        assert ((board == ord("F")) & ov).sum() == 0
        # Overlay cells hold another drape's char (never wall/agent/gap).
        if ov.any():
            overlap_resets += 1
            chars = board[ov]
            assert (chars != ord(WALL_CHR)).all()
            assert (chars != ord(GAP_CHR)).all()
            for c in env.agent_chars:
                assert (chars != ord(c)).all()
            # The overlapped cell is BOTH curtains at once.
            other = (
                np.asarray(st.drink_curtain)
                | np.asarray(st.small_drink_curtain)
                | np.asarray(st.small_food_curtain)
                | np.asarray(st.water)
                | np.asarray(st.gold)
                | np.asarray(st.silver)
                | np.asarray(st.predator_curtain)
            )
            assert (other[ov]).all()
    # 3 occupied candidates among ~60; P(no overlap in 60 resets) ~ 1e-4.
    assert overlap_resets > 0
