"""Device-resident ring replay buffer.

The buffer is a pytree of preallocated ``(capacity, *field_shape)`` arrays
that never leaves the device: writes are scatters at a rolling cursor,
reads are uniform gathers (sampling WITH replacement, matching the
reference semantics, reference: jax_impl/buffers.py:79-90). All operations
are jittable and live inside the fused training scan.

Unlike the reference, the buffer is a pure module with static geometry
(capacity/batch baked into the jitted program) and supports an arbitrary
experience pytree, not just a flat dict.
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax.struct import dataclass


@dataclass
class ReplayState:
    """Ring storage plus cursor/size scalars (all device-resident)."""

    storage: Any  # pytree of (capacity, ...) arrays
    cursor: jax.Array  # int32 next write position
    size: jax.Array  # int32 number of valid entries (≤ capacity)


def init(template: Any, capacity: int) -> ReplayState:
    """Allocate storage shaped like ``template`` with a leading capacity axis."""
    storage = jax.tree.map(
        lambda leaf: jnp.zeros((capacity, *jnp.shape(leaf)), jnp.asarray(leaf).dtype),
        template,
    )
    return ReplayState(
        storage=storage,
        cursor=jnp.zeros((), dtype=jnp.int32),
        size=jnp.zeros((), dtype=jnp.int32),
    )


def push(state: ReplayState, experience: Any, capacity: int) -> ReplayState:
    """Write one experience at the cursor."""
    storage = jax.tree.map(
        lambda buf, item: buf.at[state.cursor].set(item),
        state.storage,
        experience,
    )
    return ReplayState(
        storage=storage,
        cursor=(state.cursor + 1) % capacity,
        size=jnp.minimum(state.size + 1, capacity),
    )


def push_many(state: ReplayState, batch: Any, capacity: int) -> ReplayState:
    """Write a leading-axis batch of experiences, wrapping around the ring.

    Non-wrapping writes (the overwhelmingly common case — trainers round
    capacity up to a multiple of the per-step push size, making every
    write contiguous) use ``dynamic_update_slice``, which is dramatically
    cheaper than a scatter on TPU; a runtime ``lax.cond`` falls back to
    the general wrapping scatter otherwise, so arbitrary push patterns
    stay correct.
    """
    n = jax.tree.leaves(batch)[0].shape[0]

    def contiguous(operand):
        storage, items = operand
        return jax.tree.map(
            lambda buf, item: jax.lax.dynamic_update_slice(
                buf, item.astype(buf.dtype),
                (state.cursor,) + (0,) * (buf.ndim - 1)),
            storage, items)

    def wrapping(operand):
        storage, items = operand
        slots = (state.cursor + jnp.arange(n)) % capacity
        return jax.tree.map(
            lambda buf, item: buf.at[slots].set(item), storage, items)

    storage = jax.lax.cond(
        state.cursor + n <= capacity, contiguous, wrapping,
        (state.storage, batch))
    return ReplayState(
        storage=storage,
        cursor=(state.cursor + n) % capacity,
        size=jnp.minimum(state.size + n, capacity),
    )


def sample(key: jax.Array, state: ReplayState, batch_size: int) -> Any:
    """Uniform sample with replacement over the valid prefix."""
    idx = jax.random.randint(key, (batch_size,), minval=0, maxval=state.size)
    return jax.tree.map(lambda buf: jnp.take(buf, idx, axis=0), state.storage)


def can_sample(state: ReplayState, batch_size: int) -> jax.Array:
    return state.size >= batch_size


def init_t(template: Any, capacity: int) -> ReplayState:
    """Feature-major storage: slots on the LAST axis (lanes on TPU).

    ``template`` leaves are per-slot shapes; a leaf of shape (D,) becomes
    (D, capacity) storage and a scalar leaf becomes (capacity,).
    """
    storage = jax.tree.map(
        lambda leaf: jnp.zeros(
            (*jnp.shape(leaf), capacity), jnp.asarray(leaf).dtype),
        template,
    )
    return ReplayState(
        storage=storage,
        cursor=jnp.zeros((), dtype=jnp.int32),
        size=jnp.zeros((), dtype=jnp.int32),
    )


def push_many_t(state: ReplayState, batch: Any, capacity: int) -> ReplayState:
    """Write a last-axis batch of slots at the cursor (feature-major).

    Contiguous writes use ``dynamic_update_slice`` along the lane axis —
    the cheap path on TPU; a runtime cond falls back to a scatter when the
    write wraps the ring.
    """
    n = jax.tree.leaves(batch)[0].shape[-1]

    def contiguous(operand):
        storage, items = operand
        return jax.tree.map(
            lambda buf, item: jax.lax.dynamic_update_slice(
                buf, item.astype(buf.dtype),
                (0,) * (buf.ndim - 1) + (state.cursor,)),
            storage, items)

    def wrapping(operand):
        storage, items = operand
        slots = (state.cursor + jnp.arange(n)) % capacity
        return jax.tree.map(
            lambda buf, item: buf.at[..., slots].set(item.astype(buf.dtype)),
            storage, items)

    storage = jax.lax.cond(
        state.cursor + n <= capacity, contiguous, wrapping,
        (state.storage, batch))
    return ReplayState(
        storage=storage,
        cursor=(state.cursor + n) % capacity,
        size=jnp.minimum(state.size + n, capacity),
    )


def sample_t(key: jax.Array, state: ReplayState, batch_size: int) -> Any:
    """Uniform with-replacement sample of slot columns (feature-major)."""
    idx = jax.random.randint(key, (batch_size,), minval=0, maxval=state.size)
    return jax.tree.map(
        lambda buf: jnp.take(buf, idx, axis=buf.ndim - 1), state.storage)


class FeatureMajorReplay:
    """Ring replay with slots on the lane axis (see ops/fused_tick.py).

    Same semantics as :class:`ReplayBuffer` (ring writes, uniform
    with-replacement sampling); the layout keeps pushes and gathers in the
    TPU-friendly feature-major orientation used by the fused trainer.
    """

    def __init__(self, capacity: int = 10_000, batch_size: int = 64):
        self.capacity = capacity
        self.batch_size = batch_size

    def init(self, template: Any) -> ReplayState:
        return init_t(template, self.capacity)

    def push_many(self, state: ReplayState, batch: Any) -> ReplayState:
        return push_many_t(state, batch, self.capacity)

    def sample(self, key: jax.Array, state: ReplayState) -> Any:
        return sample_t(key, state, self.batch_size)

    def can_sample(self, state: ReplayState) -> jax.Array:
        return can_sample(state, self.batch_size)


class ReplayBuffer:
    """Convenience facade binding static geometry to the pure functions."""

    def __init__(self, capacity: int = 10_000, batch_size: int = 64):
        self.capacity = capacity
        self.batch_size = batch_size

    def init(self, template: Any) -> ReplayState:
        return init(template, self.capacity)

    def push(self, state: ReplayState, experience: Any) -> ReplayState:
        return push(state, experience, self.capacity)

    def push_many(self, state: ReplayState, batch: Any) -> ReplayState:
        return push_many(state, batch, self.capacity)

    def sample(self, key: jax.Array, state: ReplayState) -> Any:
        return sample(key, state, self.batch_size)

    def can_sample(self, state: ReplayState) -> jax.Array:
        return can_sample(state, self.batch_size)
