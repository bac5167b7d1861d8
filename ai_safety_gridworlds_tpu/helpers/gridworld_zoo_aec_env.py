"""PettingZoo AEC (turn-based) adapter.

Mirrors ``ai_safety_gridworlds/helpers/gridworld_zoo_aec_env.py``: the same
capabilities as the Parallel adapter through the Agent-Environment-Cycle
protocol — ``agent_selection`` cycling, ``observe(agent)``
(``gridworld_zoo_aec_env.py:380``), per-current-agent ``step(action)``
(``gridworld_zoo_aec_env.py:607``), and ``last()``.

Implementation note: actions are collected per cycle and dispatched to the
underlying MoMa shell once every live agent has acted, preserving the
randomized sequential sub-step semantics of the core.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

try:
    from pettingzoo.utils.env import AECEnv
except ImportError:  # pragma: no cover
    class AECEnv:
        pass

from ai_safety_gridworlds_tpu.helpers.gridworld_zoo_parallel_env import (
    GridworldZooParallelEnv,
)


class GridworldZooAecEnv(AECEnv):
    """AEC adapter built over the Parallel adapter
    (``gridworld_zoo_aec_env.py:67-1235``)."""

    metadata = {"render_modes": ["human", "ansi", "rgb_array"]}

    def __init__(self, env_name: str, **kwargs):
        self._parallel = GridworldZooParallelEnv(env_name, **kwargs)
        self.possible_agents = list(self._parallel.possible_agents)
        self.agent_name_mapping = dict(self._parallel.agent_name_mapping)
        self.agents = []
        self.agent_selection = None
        self.rewards = {}
        self._cumulative_rewards = {}
        self.terminations = {}
        self.truncations = {}
        self.infos = {}
        self._observations = {}
        self._pending_actions = {}

    # ------------------------------------------------------------------ api

    def action_space(self, agent):
        return self._parallel.action_space(agent)

    def observation_space(self, agent):
        return self._parallel.observation_space(agent)

    def reset(self, seed=None, options=None):
        observations, infos = self._parallel.reset(seed=seed, options=options)
        self.agents = list(self.possible_agents)
        self.agent_selection = self.agents[0]
        self.rewards = {a: 0.0 for a in self.agents}
        self._cumulative_rewards = {a: 0.0 for a in self.agents}
        self.terminations = {a: False for a in self.agents}
        self.truncations = {a: False for a in self.agents}
        self.infos = infos
        self._observations = observations
        self._pending_actions = {}

    def observe(self, agent):
        return self._observations.get(agent)

    def observe_info(self, agent):
        """Info dict for ``agent`` from the latest step regardless of whose
        turn it is (``gridworld_zoo_aec_env.py:415-420``)."""
        return self.infos.get(agent, {})

    def last(self, observe=True):
        agent = self.agent_selection
        return (
            self.observe(agent) if observe else None,
            self._cumulative_rewards.get(agent, 0.0),
            self.terminations.get(agent, False),
            self.truncations.get(agent, False),
            self.infos.get(agent, {}),
        )

    def step(self, action):
        agent = self.agent_selection
        if self.terminations.get(agent) or self.truncations.get(agent):
            # Dead-step convention: remove the agent and advance.
            self.agents = [a for a in self.agents if a != agent]
            self._advance_selection()
            return
        self._pending_actions[agent] = action
        self._cumulative_rewards[agent] = 0.0

        live = [
            a
            for a in self.agents
            if not (self.terminations.get(a) or self.truncations.get(a))
        ]
        if all(a in self._pending_actions for a in live):
            (
                observations,
                rewards,
                terminations,
                truncations,
                infos,
            ) = self._parallel.step(self._pending_actions)
            self._pending_actions = {}
            self._observations.update(observations)
            for a, r in rewards.items():
                self.rewards[a] = r
                self._cumulative_rewards[a] = (
                    self._cumulative_rewards.get(a, 0.0) + np.sum(r)
                )
            self.terminations.update(terminations)
            self.truncations.update(truncations)
            self.infos.update(infos)
        self._advance_selection()

    def _advance_selection(self):
        if not self.agents:
            self.agent_selection = None
            return
        if self.agent_selection not in self.agents:
            self.agent_selection = self.agents[0]
            return
        idx = self.agents.index(self.agent_selection)
        self.agent_selection = self.agents[(idx + 1) % len(self.agents)]

    def render(self, mode=None):
        return self._parallel.render(mode)

    def close(self):
        self._parallel.close()

    # Counterfactual read-only observation from an alternate location
    # (``gridworld_zoo_aec_env.py:424``).
    def observe_infos_from_location(self, agent_coordinates: dict):
        env = self._parallel._env
        ts_obs = env.last_observation()
        persp = env.agent_perspectives_with_layers(
            ts_obs,
            include_layers=False,
            observe_from_agent_coordinates={
                self.agent_name_mapping[a]: coord
                for a, coord in agent_coordinates.items()
            },
        )
        return {
            self._parallel.agent_name_reverse_mapping[c]: v
            for c, v in persp.items()
        }
