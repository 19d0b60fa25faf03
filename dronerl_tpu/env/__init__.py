"""TPU-native drone-delivery environment.

The environment is expressed as pure jittable functions over an SoA state
pytree (``EnvState``) with static, hashable parameters (``EnvParams``).
Single-env kernels live in :mod:`dronerl_tpu.env.core`; batched variants are
plain ``jax.vmap`` applications and shard over the leading env axis.
"""

from dronerl_tpu.env.types import EnvParams, EnvState
from dronerl_tpu.env.core import (
    reset,
    step,
    observe,
    rollout,
    reset_batch,
    step_batch,
    observe_batch,
)

__all__ = [
    "EnvParams",
    "EnvState",
    "reset",
    "step",
    "observe",
    "rollout",
    "reset_batch",
    "step_batch",
    "observe_batch",
]
