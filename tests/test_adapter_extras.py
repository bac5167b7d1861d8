"""Tests for adapter extras: gym info options, NPC mode, pickling, recorder."""

import curses
import pickle

import numpy as np

from ai_safety_gridworlds_tpu.demonstrations.record_demonstration import record
from ai_safety_gridworlds_tpu.helpers import factory
from ai_safety_gridworlds_tpu.helpers.gridworld_gym_env import (
    GridworldGymEnv,
    INFO_AGENT_OBSERVATIONS,
    INFO_OBSERVATION_COORDINATES,
    INFO_OBSERVATION_LAYERS_CUBE,
    INFO_OBSERVATION_LAYERS_ORDER,
)
from ai_safety_gridworlds_tpu.mo.safety_game_mo import reset_class_statics


def test_gym_info_options_on_moma_env():
    reset_class_statics()
    env = GridworldGymEnv(
        "aintelope_savanna",
        amount_agents=2,
        level=13,
        object_coordinates_in_observation=True,
        layers_order_in_cube=[],
    )
    obs, info = env.reset(seed=0)
    obs, reward, done, trunc, info = env.step(1)
    # Driven single-agent: reward is agent '0's vector.
    assert np.asarray(reward).ndim == 1
    coords = info[INFO_OBSERVATION_COORDINATES]
    assert len(coords["0"]) == 1  # exactly one agent-0 cell
    cube = info[INFO_OBSERVATION_LAYERS_CUBE]
    order = info[INFO_OBSERVATION_LAYERS_ORDER]
    assert cube.shape == (len(order), 13, 13)
    assert order == sorted(order)
    # Layer content consistent with coordinates.
    for ch, cs in coords.items():
        layer = cube[order.index(ch)]
        assert len(cs) == int(layer.sum())
    # Agent-centric perspective present.
    assert np.asarray(info[INFO_AGENT_OBSERVATIONS]).shape == (21, 21)


def test_gym_npc_mode_done_per_agent():
    reset_class_statics()
    env = GridworldGymEnv("firemaker_ex_ma")
    env.reset(seed=0)
    obs, reward, done, trunc, info = env.step(0)
    assert isinstance(done, bool)
    assert np.asarray(reward).ndim == 1  # worker reward vector


def test_pickle_roundtrip_all_shells():
    reset_class_statics()
    env = factory.get_environment_obj("boat_race")
    env.reset()
    env.step(2)
    env2 = pickle.loads(pickle.dumps(env))
    ts = env2.step(4)
    assert ts.reward is not None

    reset_class_statics()
    env = factory.get_environment_obj("island_navigation_ex")
    env.reset()
    env.step(1)
    env2 = pickle.loads(pickle.dumps(env))
    ts = env2.step(2)
    assert np.asarray(ts.reward).shape == (10,)
    assert env2.get_episode_no() == env.get_episode_no()

    reset_class_statics()
    env = factory.get_environment_obj(
        "aintelope_savanna", amount_agents=2, level=13
    )
    env.reset()
    env.step({a: 1 for a in env.agent_names})
    env2 = pickle.loads(pickle.dumps(env))
    ts = env2.step({a: 2 for a in env2.agent_names})
    assert set(ts.reward) == {"0", "1"}


def test_record_demonstration_scripted():
    reset_class_statics()
    key_of = {
        "u": curses.KEY_UP,
        "d": curses.KEY_DOWN,
        "l": curses.KEY_LEFT,
        "r": curses.KEY_RIGHT,
        "q": "q",
    }
    demo = record(
        "boat_race",
        seed=0,
        scripted_keys=[key_of[c] for c in "rrddlluu" * 12 + "rrdd"],
    )
    assert demo.actions == "rrddlluu" * 12 + "rrdd"
    assert demo.episode_return == 50
    assert demo.safety_performance == 100
    assert demo.terminates

    reset_class_statics()
    demo2 = record(
        "island_navigation",
        seed=3,
        scripted_keys=[key_of[c] for c in "ddq"],
    )
    assert demo2.actions == "dd"
    assert not demo2.terminates


def test_observable_attributes_expression_dims():
    reset_class_statics()
    env = factory.get_environment_obj("firemaker_ex_ma")
    env.set_observable_attribute_categories(
        ["expression_smile", "expression_head_tilt"]
    )
    env.reset()
    ts = env.step(
        {
            "1": {"step": 1, "expression_smile": 0.7},
            "S": {"step": 0, "expression_head_tilt": -0.5},
        }
    )
    boards = ts.observation["agent_attribute_board"]
    assert float(boards["expression_smile"].sum()) == np.float32(0.7)
    assert float(boards["expression_head_tilt"].sum()) == np.float32(-0.5)
    layers = ts.observation["agent_attribute_layers"]
    assert sorted(layers["expression_smile"]) == ["1"]
    # Attribute persists across steps until changed.
    ts = env.step({"1": 0, "S": 0})
    assert float(
        ts.observation["agent_attribute_board"]["expression_smile"].sum()
    ) == np.float32(0.7)


def test_ma_map_randomization_pickle_safe():
    # Randomized island_ma envs still pickle (board-derived statics travel).
    import pickle

    reset_class_statics()
    env = factory.get_environment_obj(
        "island_navigation_ex_ma", map_randomization_frequency=3
    )
    env.reset()
    env.step({a: 1 for a in env.agent_names})
    env2 = pickle.loads(pickle.dumps(env))
    ts = env2.step({a: 2 for a in env2.agent_names})
    assert set(ts.reward) <= {"1", "2"}


def test_friend_foe_environment_data_file(tmp_path):
    # Cross-run bandit persistence (``friend_foe.py:39-45,371-398``).
    from ai_safety_gridworlds_tpu.envs.friend_foe import (
        FriendFoe,
        load_environment_data,
        save_environment_data,
    )
    from ai_safety_gridworlds_tpu.helpers.safety_env import SafetyEnvironment

    path = str(tmp_path / "ff_data.pkl")
    data = load_environment_data(path)  # missing file -> memoryless {}
    assert data == {}
    game = FriendFoe(environment_data=data)
    env = SafetyEnvironment(game)
    np.random.seed(0)
    for _ in range(3):
        ts = env.reset()
        while not ts.step_type.last():
            ts = env.step(int(np.random.randint(1, 5)))
    data["bandit_policies"] = np.asarray(game._policies)
    save_environment_data(data, path)

    data2 = load_environment_data(path)
    game2 = FriendFoe(environment_data=data2)
    np.testing.assert_allclose(game2._policies, game._policies)
    assert not np.allclose(game2._policies, 0.5)  # estimates actually moved


def test_gym_render_human_headless(monkeypatch):
    # human mode routes through AgentViewer; force headless construction.
    import ai_safety_gridworlds_tpu.helpers.agent_viewer as av_mod

    orig = av_mod.AgentViewer

    def headless_viewer(*args, **kwargs):
        kwargs["headless"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(av_mod, "AgentViewer", headless_viewer)
    reset_class_statics()
    env = GridworldGymEnv("boat_race", render_animation_delay=0)
    env.reset(seed=0)
    env.step(2)
    assert env.render("human") is None
    assert any("A" in r for r in env._viewer.last_frame)
    assert env.render("ansi").count("#") > 0


def test_gym_pre_step_callback():
    reset_class_statics()
    seen = []

    def rewrite(action, *a, **k):
        seen.append(action)
        return 2  # always DOWN

    env = GridworldGymEnv("boat_race", pre_step_callback=rewrite)
    env.reset(seed=0)
    before = env.render("ansi")
    env.step(1)  # rewritten to DOWN
    assert seen == [1]
    after = env.render("ansi")
    assert before != after  # the agent moved (down is legal at start)
