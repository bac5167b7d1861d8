"""Stateful, reference-API-compatible environment shell.

Wraps a functional :class:`~ai_safety_gridworlds_tpu.core.base.SafetyGridworld`
in the mutable single-environment API of the reference
``SafetyEnvironment`` (``safety_game.py:82-316``) +
``pycolab_interface.Environment`` (``rl/pycolab_interface.py:32-312``):
``reset()/step()/observation_spec()/action_spec()``, episode return, hidden
reward, episodic performances, ``environment_data`` extras.

This shell is the compatibility/interactive path (adapters, tests,
demonstration replay, human UI). The performance path is the batched
functional core (``core.base.rollout``) — this class just drives the same
jitted kernels with batch size 1.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ai_safety_gridworlds_tpu.core.base import SafetyGridworld
from ai_safety_gridworlds_tpu.core.timestep import (
    ArraySpec,
    BoundedArraySpec,
    StepType,
    TerminationReason,
)

# Keys mirroring ``safety_game.py:72-79``.
ACTUAL_ACTIONS = "actual_actions"
TERMINATION_REASON = "termination_reason"
HIDDEN_REWARD = "hidden_reward"
EXTRA_OBSERVATIONS = "extra_observations"


class TimeStep(NamedTuple):
    """Host-side timestep matching ``rl/environment.py:29-59``."""

    step_type: StepType
    reward: Any
    discount: Any
    observation: dict

    def first(self):
        return self.step_type == StepType.FIRST

    def mid(self):
        return self.step_type == StepType.MID

    def last(self):
        return self.step_type == StepType.LAST


class SafetyEnvironment:
    """Mutable shell over a functional gridworld game."""

    def __init__(
        self,
        game: SafetyGridworld,
        seed: Optional[int] = None,
    ):
        self._game = game
        # Back-pointer so games can read wrapper counters (seed, layout seed,
        # episode number) for per-episode randomization cache keys.
        game._wrapper = self
        self._environment_data: dict = {}
        self._episodic_performances: list = []
        self._episode_return = 0.0
        self._hidden_return = 0.0
        self._seed = 0 if seed is None else seed
        self._episode_count = 0

        self._jit_reset = jax.jit(self._reset_impl)
        self._jit_step = jax.jit(self._step_impl)

        self._state = None
        self._last_step_type: Optional[StepType] = None
        self._last_observation_dict: Optional[dict] = None
        # Plot log protocol (``pycolab/protocols/logging.py:33,51``): games
        # and users append messages; the UI console drains them.
        self._log_messages: list = []

        # Probe episode to compute the observation spec, then drop it
        # (mirrors ``pycolab_interface.py:270-290`` / ``safety_game.py:179``).
        timestep = self.reset()
        self._observation_spec = self._compute_observation_spec(timestep)
        self._drop_last_episode()

    def _compute_observation_spec(self, timestep):
        spec = {
            k: ArraySpec(np.asarray(v).shape, np.asarray(v).dtype, name=k)
            for k, v in timestep.observation.items()
            if k != EXTRA_OBSERVATIONS
        }
        spec[EXTRA_OBSERVATIONS] = dict()
        return spec

    # --- log protocol -------------------------------------------------------

    def log(self, message: str):
        """Append a message for the game console
        (``protocols/logging.py:33``)."""
        self._log_messages.append(str(message))

    def consume_log_messages(self) -> list:
        """Drain pending messages (``protocols/logging.py:51``)."""
        messages, self._log_messages = self._log_messages, []
        return messages

    # --- pickling -----------------------------------------------------------
    # Mirrors the reference's environment pickling support
    # (``safety_game_moma.py:405-428``): jitted callables are rebuilt on
    # load, device arrays round-trip through numpy.

    _UNPICKLABLE = (
        "_jit_reset", "_jit_step", "_jit_substep", "_jit_finalize",
        "_jit_observe_fn", "_jit_board_fn",
    )

    def _jit_observe(self):
        """Cached jitted ``game.observe`` (a fresh ``jax.jit`` wrapper per
        call would re-trace every step)."""
        fn = getattr(self, "_jit_observe_fn", None)
        if fn is None:
            fn = jax.jit(self._game.observe)
            self._jit_observe_fn = fn
        return fn

    def _jit_board(self):
        """Cached jitted ``game.board`` (see :meth:`_jit_observe`)."""
        fn = getattr(self, "_jit_board_fn", None)
        if fn is None:
            fn = jax.jit(self._game.board)
            self._jit_board_fn = fn
        return fn

    def __getstate__(self):
        state = {
            k: v
            for k, v in self.__dict__.items()
            if k not in self._UNPICKLABLE
        }
        state["_state"] = (
            None
            if self._state is None
            else jax.tree.map(np.asarray, self._state)
        )
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._rebuild_jit_caches()

    def _rebuild_jit_caches(self):
        """Drop and recreate jitted kernels. Needed when board-derived
        closure constants change (per-episode map randomization)."""
        self._jit_reset = jax.jit(self._reset_impl)
        self._jit_step = jax.jit(self._step_impl)
        for attr in (
            "_jit_substep", "_jit_finalize",
            "_jit_observe_fn", "_jit_board_fn",
        ):
            if hasattr(self, attr):
                delattr(self, attr)

    # --- jitted internals ---------------------------------------------------

    def _reset_impl(self, key, options):
        state = self._game.initial_state(key, options)
        return state, self._game.observe(state)

    def _step_impl(self, state, action, options):
        state, out = self._game.step(state, action, options)
        return state, out, self._game.observe(state)

    # --- reference API ------------------------------------------------------

    @property
    def environment_data(self):
        return self._environment_data

    @property
    def episode_return(self):
        return self._episode_return

    def observation_spec(self):
        return self._observation_spec

    def action_spec(self):
        return BoundedArraySpec(
            shape=(1,),
            dtype="int32",
            minimum=self._game.action_min,
            maximum=self._game.action_max,
            name="discrete",
        )

    def reset(self) -> TimeStep:
        key = jax.random.PRNGKey(
            np.uint32(self._seed) + np.uint32(self._episode_count)
        )
        self._episode_count += 1
        # Host-side per-episode randomization consumes numpy's global RNG in
        # the same order as the reference's game factory would.
        options = {
            k: jnp.asarray(v)
            for k, v in self._game.host_reset_options().items()
        }
        self._state, obs = self._jit_reset(key, options)
        self._last_step_type = StepType.FIRST
        self._episode_return = 0.0
        self._hidden_return = 0.0
        self._hidden_written = False
        for key_ in (TERMINATION_REASON, ACTUAL_ACTIONS):
            self._environment_data.pop(key_, None)
        self._refresh_host_extras()
        observation = self._to_host_obs(obs)
        observation[EXTRA_OBSERVATIONS] = {}
        self._last_observation_dict = observation
        return TimeStep(StepType.FIRST, None, None, observation)

    def step(self, action) -> TimeStep:
        if self._last_step_type == StepType.LAST:
            self._drop_last_episode()
        if self._state is None:
            return self.reset()

        action_int = int(np.asarray(action).item())
        # Per-step host randomness (same numpy draws as the reference's
        # entity updates would consume this frame).
        options = {
            k: jnp.asarray(v)
            for k, v in self._game.host_step_options(
                self._state, action_int
            ).items()
        }
        self._state, out, obs = self._jit_step(
            self._state, jnp.int32(action_int), options
        )
        step_type = StepType(int(out.step_type))
        reward = self._to_host_reward(out.reward)
        discount = float(out.discount)
        self._last_step_type = step_type

        # Bookkeeping mirroring ``safety_game.py:280-304``.
        if reward is not None:
            self._episode_return = self._episode_return + reward
        self._hidden_return += float(out.hidden_reward)
        self._hidden_written = self._hidden_written or bool(out.hidden_written)
        self._refresh_host_extras()

        extra = dict(self._get_agent_extra_observations())
        actual = int(out.actual_action)
        if actual >= 0:
            self._environment_data[ACTUAL_ACTIONS] = actual
            extra[ACTUAL_ACTIONS] = actual
        if step_type == StepType.LAST:
            reason = TerminationReason(int(out.termination_reason))
            self._environment_data[TERMINATION_REASON] = reason
            extra[TERMINATION_REASON] = reason
            self._episodic_performances.append(
                float(
                    self._game.episode_performance(
                        self._episode_return, self._hidden_return
                    )
                )
            )

        observation = self._to_host_obs(obs)
        observation[EXTRA_OBSERVATIONS] = extra
        self._last_observation_dict = observation
        return TimeStep(step_type, reward, discount, observation)

    def get_overall_performance(self, default=None):
        if len(self._episodic_performances) < 1:
            return default
        return float(self._calculate_overall_performance())

    def get_last_performance(self, default=None):
        if len(self._episodic_performances) < 1:
            return default
        return float(self._episodic_performances[-1])

    def _calculate_overall_performance(self):
        return sum(self._episodic_performances) / len(
            self._episodic_performances
        )

    def _get_hidden_reward(self, default_reward=0):
        # The plot's HIDDEN_REWARD entry exists only once some entity has
        # called add_hidden_reward this episode (``safety_game.py:598-606``).
        if not getattr(self, "_hidden_written", False):
            return default_reward
        return self._hidden_return

    def _get_agent_extra_observations(self):
        """Env-specific extra observations (mirrors
        ``SafetyEnvironment._get_agent_extra_observations``,
        ``safety_game.py:306-308``); games expose them via a
        ``host_extra_observations(state)`` hook."""
        if hasattr(self._game, "host_extra_observations"):
            return self._game.host_extra_observations(self._state)
        return {}

    # --- helpers ------------------------------------------------------------

    def char_board(self) -> np.ndarray:
        """Current board as uint8 char codes (for ansi rendering)."""
        if self._state is None:
            raise RuntimeError("Environment has no live episode.")
        return np.asarray(self._jit_board()(self._state))

    def last_observation(self) -> dict:
        """The most recent observation dict (board/RGB/...)."""
        if self._last_observation_dict is None:
            raise RuntimeError("Environment has no live episode.")
        return self._last_observation_dict

    def _refresh_host_extras(self):
        if hasattr(self._game, "host_sync") and self._state is not None:
            self._game.host_sync(self._state)
        extras = self._game.host_extras(self._state) if hasattr(
            self._game, "host_extras"
        ) else {}
        for k, v in extras.items():
            self._environment_data[k] = np.asarray(v).item() if np.ndim(v) == 0 else np.asarray(v)

    def _to_host_reward(self, reward):
        arr = np.asarray(reward)
        if arr.ndim == 0:
            return float(arr)
        return arr.astype(np.float64)

    def _to_host_obs(self, obs):
        return {k: np.asarray(v) for k, v in obs.items()}

    def _drop_last_episode(self):
        self._state = None
        self._last_step_type = None
