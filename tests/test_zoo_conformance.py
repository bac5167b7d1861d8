"""Official PettingZoo conformance suites over the MA adapters.

Runs ``pettingzoo.test.api_test`` (AEC protocol: agent_selection after
reset, rewards clearing, dead-step handling) and ``parallel_api_test``
over the three multi-agent environments, pinning the hand-rolled protocol
details to the upstream spec (VERDICT r02 #8). Deliberate deviations are
documented in PARITY.md.
"""

import numpy as np
import pytest

pettingzoo_test = pytest.importorskip("pettingzoo.test")

from ai_safety_gridworlds_tpu.helpers.gridworld_zoo_aec_env import (
    GridworldZooAecEnv,
)
from ai_safety_gridworlds_tpu.helpers.gridworld_zoo_parallel_env import (
    GridworldZooParallelEnv,
)
from ai_safety_gridworlds_tpu.mo.safety_game_mo import reset_class_statics

MA_ENVS = [
    ("island_navigation_ex_ma", dict(level=9, amount_agents=2)),
    ("firemaker_ex_ma", dict(amount_agents=2)),
    ("aintelope_savanna", dict(level=13, amount_agents=2)),
]


@pytest.mark.parametrize("name,kwargs", MA_ENVS)
def test_parallel_api_conformance(name, kwargs):
    reset_class_statics()
    env = GridworldZooParallelEnv(env_name=name, **kwargs)
    pettingzoo_test.parallel_api_test(env, num_cycles=30)


@pytest.mark.parametrize("name,kwargs", MA_ENVS)
def test_aec_api_conformance(name, kwargs):
    # scalarise=True: the PettingZoo contract is scalar rewards; the
    # default vector (multi-objective) rewards are a deliberate extension
    # shared with the reference adapter (PARITY.md).
    reset_class_statics()
    env = GridworldZooAecEnv(env_name=name, scalarise=True, **kwargs)
    pettingzoo_test.api_test(env, num_cycles=30)


def test_aec_seed_determinism():
    """Same seed -> identical observation/reward streams (the suite's
    seed_test needs a seed kwarg on reset, which both adapters support)."""
    reset_class_statics()

    def stream(seed):
        # Trial/episode counters are cross-episode CLASS state (reference
        # semantics) — pin them so same-seed constructions are identical.
        reset_class_statics()
        env = GridworldZooAecEnv(
            env_name="island_navigation_ex_ma", level=9, amount_agents=2,
            scalarise=True,
        )
        env.reset(seed=seed)
        out = []
        for agent in env.agent_iter(max_iter=40):
            obs, reward, term, trunc, info = env.last()
            out.append((np.asarray(obs).tobytes(), float(reward)))
            env.step(None if term or trunc else 0)
        return out

    assert stream(7) == stream(7)
    # (seed inequality is not asserted: this env's dynamics are
    # deterministic under a fixed action script, so different seeds can
    # legitimately coincide.)
