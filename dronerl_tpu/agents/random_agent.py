"""Uniform-random policy (baseline opponent and exploration source)."""

import jax

from dronerl_tpu.constants import NUM_ACTIONS


def random_actions(key: jax.Array, shape=()) -> jax.Array:
    """Uniform random actions of the given shape."""
    return jax.random.randint(key, shape, minval=0, maxval=NUM_ACTIONS)
