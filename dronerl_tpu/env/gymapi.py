"""Imperative gym-style façade over the functional env.

For users migrating from the reference's torch stack (a gym ``Env`` with
dict observations, reference: torch_impl/env/env.py:18-310 +
torch_impl/env/wrappers.py): the same reset/step surface, backed by the
jitted array kernels. No gym dependency — the API shape is self-contained.

Config accepts either an explicit ``grid_size`` or the torch-style
``drone_density`` (grid side derived as ``ceil(sqrt(n/density))``,
reference: torch_impl/env/env.py:75).

Both observation wrappers exist: ``windowed_view`` (egocentric crops — the
torch ``WindowedGridView``) and ``grid_view`` (full-board view — the torch
``GridView``, which the reference's JAX stack never implemented).
"""

import math
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from dronerl_tpu.constants import NUM_ACTIONS
from dronerl_tpu.env import core as env_core
from dronerl_tpu.env.types import EnvParams

DEFAULT_CONFIG = {
    "drone_density": 0.05,
    "n_drones": 3,
    "pickup_reward": 0.0,
    "delivery_reward": 1.0,
    "crash_reward": -1.0,
    "charge_reward": -0.1,
    "discharge": 10,
    "charge": 20,
    "packets_factor": 3,
    "dropzones_factor": 2,
    "stations_factor": 2,
    "skyscrapers_factor": 3,
}


class DeliveryDronesEnv:
    """Single-world imperative env with dict-based multi-agent IO."""

    NUM_ACTIONS = NUM_ACTIONS

    def __init__(self, env_params: Optional[dict] = None,
                 wrapper: str = "window", radius: int = 3):
        config = dict(DEFAULT_CONFIG)
        config.update(env_params or {})
        n = config["n_drones"]
        grid_size = config.get("grid_size")
        if grid_size is None:
            grid_size = int(math.ceil(
                math.sqrt(n / config["drone_density"])))
        self.params = EnvParams(
            grid_size=grid_size,
            n_drones=n,
            pickup_reward=config["pickup_reward"],
            delivery_reward=config["delivery_reward"],
            crash_reward=config["crash_reward"],
            charge_reward=config["charge_reward"],
            discharge=config["discharge"],
            charge=config["charge"],
            packets_factor=config["packets_factor"],
            dropzones_factor=config["dropzones_factor"],
            stations_factor=config["stations_factor"],
            skyscrapers_factor=config["skyscrapers_factor"],
            wrapper="global" if wrapper in ("global", "grid") else "window",
            window_radius=radius,
        )
        self.n_drones = n
        self.side_size = grid_size
        self._reset_fn = jax.jit(env_core.reset, static_argnames=("params",))
        self._step_fn = jax.jit(env_core.step, static_argnames=("params",))
        self._obs_fn = jax.jit(env_core.observe, static_argnames=("params", "limit"))
        self._state = None
        self._rng = None

    @property
    def observation_shape(self) -> Tuple[int, int, int]:
        return self.params.obs_shape

    def reset(self, seed: int = 0) -> Tuple[Dict[int, np.ndarray], None]:
        self._rng = jax.random.PRNGKey(seed)
        self._rng, key = jax.random.split(self._rng)
        self._state = self._reset_fn(key, params=self.params)
        return self._observations(), None

    def step(self, actions: Dict[int, int]):
        """gym 0.26-style step: (obs, rewards, dones, truncated, info)."""
        if self._state is None:
            raise RuntimeError("call reset() before step()")
        acts = np.full((self.n_drones,), 4, dtype=np.int32)  # default STAY
        for idx, a in actions.items():
            acts[int(idx)] = int(a)
        self._rng, key = jax.random.split(self._rng)
        self._state, rewards, dones = self._step_fn(
            key, self._state, acts, params=self.params)
        rewards = np.asarray(jax.device_get(rewards))
        dones = np.asarray(jax.device_get(dones))
        return (
            self._observations(),
            {i: float(rewards[i]) for i in range(self.n_drones)},
            {i: bool(dones[i]) for i in range(self.n_drones)},
            False,
            {},
        )

    def _observations(self) -> Dict[int, np.ndarray]:
        obs = np.asarray(jax.device_get(self._obs_fn(
            self._state, params=self.params)))
        return {i: obs[i] for i in range(self.n_drones)}

    @property
    def state(self):
        """The underlying functional EnvState (device array pytree)."""
        return self._state

    def render(self, mode: str = "ansi") -> str:
        from dronerl_tpu.env.debug import board_string

        return board_string(self._state)

    def format_actions(self, actions: Dict[int, int]) -> Dict[int, str]:
        from dronerl_tpu.env.debug import ACTION_GLYPHS

        return {d: ACTION_GLYPHS[i] for d, i in actions.items()}
