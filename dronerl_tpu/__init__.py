"""dronerl-tpu: a TPU-native multi-agent drone-delivery RL framework.

A from-scratch JAX/XLA rebuild of the capabilities of nyx-ai/droneRL
(reference layout documented in SURVEY.md), designed TPU-first:

- The environment is a pure-functional, fully vectorizable array program
  (``dronerl_tpu.env``): reset/step/observe are jittable single-env kernels
  that batch with ``jax.vmap`` and shard over a ``jax.sharding.Mesh``.
- The DQN actor-learner (``dronerl_tpu.agents.dqn``), replay buffer
  (``dronerl_tpu.replay``) and environment fuse into a single ``lax.scan``
  training program that lives entirely on-chip (``dronerl_tpu.train``).
- Multi-chip / multi-host scaling goes through ``dronerl_tpu.parallel``:
  envs are sharded over a device mesh with ``shard_map`` and gradients are
  synchronized with ``psum`` over ICI.

Environment semantics intentionally match the reference JAX implementation
bit-for-bit at fixed PRNG seed (see tests/test_reference_parity.py).
"""

from dronerl_tpu.constants import Action, Object
from dronerl_tpu.env import EnvParams, EnvState
from dronerl_tpu.env import core as env_core

__version__ = "0.1.0"

__all__ = [
    "Action",
    "Object",
    "EnvParams",
    "EnvState",
    "env_core",
    "__version__",
]
