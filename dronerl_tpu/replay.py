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

from typing import Any, Optional

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


def push_many(state: ReplayState, batch: Any, capacity: int,
              aligned: bool = False) -> ReplayState:
    """Write a leading-axis batch of experiences, wrapping around the ring.

    Non-wrapping writes (the overwhelmingly common case — trainers round
    capacity up to a multiple of the per-step push size, making every
    write contiguous) use ``dynamic_update_slice``, which is dramatically
    cheaper than a scatter on TPU; a runtime ``lax.cond`` falls back to
    the general wrapping scatter otherwise, so arbitrary push patterns
    stay correct.

    ``aligned=True`` is the caller's PROMISE that every push into this
    buffer has this same size and the capacity divides evenly, so no
    write ever wraps. It removes the runtime cond — load-bearing for
    performance, because a cond's branch outputs cannot alias the loop
    carry and XLA would otherwise copy the entire ring every step.
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

    if aligned and capacity % n == 0:
        storage = contiguous((state.storage, batch))
    else:
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


def push_many_t(state: ReplayState, batch: Any, capacity: int,
                aligned: bool = False) -> ReplayState:
    """Write a last-axis batch of slots at the cursor (feature-major).

    Contiguous writes use ``dynamic_update_slice`` along the lane axis —
    the cheap path on TPU; a runtime cond falls back to a scatter when the
    write wraps the ring. ``aligned``: see :func:`push_many`.
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

    if aligned and capacity % n == 0:
        storage = contiguous((state.storage, batch))
    else:
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

    def __init__(self, capacity: int = 10_000, batch_size: int = 64,
                 uniform_pushes: bool = False):
        self.capacity = capacity
        self.batch_size = batch_size
        self.uniform_pushes = uniform_pushes

    def init(self, template: Any) -> ReplayState:
        return init_t(template, self.capacity)

    def push_many(self, state: ReplayState, batch: Any) -> ReplayState:
        return push_many_t(
            state, batch, self.capacity, aligned=self.uniform_pushes)

    def sample(self, key: jax.Array, state: ReplayState) -> Any:
        return sample_t(key, state, self.batch_size)

    def can_sample(self, state: ReplayState) -> jax.Array:
        return can_sample(state, self.batch_size)


class StreamReplay:
    """Single-stream feature-major replay: next_obs by ring offset.

    Stores each observation ONCE. With contiguous per-step pushes of
    ``stride`` slots (one per env×collected-drone), the successor
    observation of slot p is simply slot ``p + stride`` in ring order —
    so ``next_obs`` needs no storage and no second 19-MB-per-step write.
    Sampling is uniform over every stored transition whose successor has
    been pushed, i.e. everything except the newest ``stride`` slots (the
    classic two-copy buffer samples the newest step too; at
    capacity ≫ stride the distributions are indistinguishable).

    Known approximation at periodic-reset boundaries: a transition
    recorded on the tick a trainer resets its envs pairs with the
    POST-reset observation (``done`` stays False), so its TD target
    bootstraps from a fresh, unrelated env state. This affects 1 in
    ``reset_env_every`` stored transitions (1% at the trainer default of
    100) and is the price of storing each observation once; the two-copy
    :class:`ReplayBuffer` used by the jnp engine stores the true
    pre-reset next_obs. Quantified (round 3): the corrupted-tuple count
    is locked by tests/test_replay.py::
    test_stream_replay_reset_corruption_count, and a paired-seed
    controlled experiment (scripts/stream_reset_experiment.py) shows
    eval quality unchanged even at 10x corruption stress while
    final-chunk TD loss inflates ~3% (R=100) to ~45% (R=10) — see
    PERF.md "The StreamReplay reset-tick approximation, quantified".
    Use the jnp engine if exact reset-boundary bootstrapping matters.

    Capacity must be a multiple of ``stride`` (keeps every push
    contiguous and the successor offset exact across the wrap).
    """

    def __init__(self, capacity: int, batch_size: int, stride: int):
        if capacity % stride != 0:
            raise ValueError("capacity must be a multiple of stride")
        if capacity < 2 * stride:
            raise ValueError("capacity must hold at least two steps")
        self.capacity = capacity
        self.batch_size = batch_size
        self.stride = stride

    def init(self, template: Any) -> ReplayState:
        """template: dict with 'obs' (D,) plus scalar leaves (actions,
        rewards, dones) — no 'next_obs' entry."""
        return init_t(template, self.capacity)

    def push_many(self, state: ReplayState, batch: Any) -> ReplayState:
        n = jax.tree.leaves(batch)[0].shape[-1]
        if n != self.stride:
            raise ValueError(
                f"StreamReplay pushes must be stride-sized ({self.stride}); "
                f"got {n} — the successor-offset arithmetic depends on it")
        return push_many_t(state, batch, self.capacity, aligned=True)

    def sample(self, key: jax.Array, state: ReplayState) -> Any:
        """Uniform with-replacement over slots with a stored successor.

        Safe to call on a cold buffer (clamped index range) — callers gate
        the USE of the sample on :meth:`can_sample`, which lets them keep
        the gather outside their cond.
        """
        valid = jnp.maximum(state.size - self.stride, 1)
        raw = jax.random.randint(
            key, (self.batch_size,), minval=0, maxval=valid)
        # When full, the oldest slot sits at the cursor; otherwise slot 0.
        base = jnp.where(state.size == self.capacity, state.cursor, 0)
        phys = (base + raw) % self.capacity
        nxt = (phys + self.stride) % self.capacity
        batch = jax.tree.map(
            lambda buf: jnp.take(buf, phys, axis=buf.ndim - 1), state.storage)
        batch["next_obs"] = jnp.take(
            state.storage["obs"], nxt, axis=state.storage["obs"].ndim - 1)
        return batch

    def can_sample(self, state: ReplayState) -> jax.Array:
        return state.size - self.stride >= self.batch_size


def inspect_memory(state: ReplayState, top_n: int = 10, max_col: int = 80,
                   plot: bool = False, printer=print,
                   slot_axis: Optional[int] = None) -> dict:
    """Buffer introspection: distributions + most-common states.

    Capability mirror of the reference's ``DQNAgent.inspect_memory``
    (reference: torch_impl/agents/dqn.py:427-494) for device-resident
    buffers: fetches the valid slots to host once, then reports action /
    reward counters, the done proportion, and the ``top_n`` most frequent
    (next_)observations. Works on both row-major (slots leading) and
    feature-major (slots on the last axis) storage: pass ``slot_axis``
    when you know the layout (0 for ``ReplayBuffer``, -1 for
    ``StreamReplay``); when omitted it is inferred from which axis has
    the slot count, raising if the shape is ambiguous (e.g. a feature
    dimension that equals the capacity). ``plot=True`` draws the
    reference's reward/action bar charts via matplotlib (lazy import).

    Returns the counters for programmatic use; diagnostics only — runs on
    host, never inside jit.
    """
    import collections

    import numpy as np

    storage = jax.device_get(state.storage)
    size = int(state.size)
    actions = np.asarray(storage["actions"]).reshape(-1)
    slots = actions.shape[0]

    def valid(arr):
        arr = np.asarray(arr)
        if arr.ndim == 1:
            return arr[:size]
        if slot_axis is not None:
            axis = slot_axis % arr.ndim
        else:
            candidates = [i for i, s in enumerate(arr.shape) if s == slots]
            if not candidates:
                raise ValueError(
                    f"no axis of shape {arr.shape} matches the slot count "
                    f"{slots}; pass slot_axis= explicitly")
            if len(candidates) > 1:
                raise ValueError(
                    f"slot axis of shape {arr.shape} is ambiguous (several "
                    f"axes have length {slots}); pass slot_axis= explicitly "
                    f"(0 for ReplayBuffer, -1 for StreamReplay)")
            axis = candidates[0]
        return np.moveaxis(arr, axis, 0)[:size]

    counters = collections.defaultdict(collections.Counter)
    counters["action"].update(valid(actions).tolist())
    counters["reward"].update(
        np.round(valid(storage["rewards"]), 6).tolist())
    dones = valid(storage["dones"]).astype(bool)
    counters["done"].update(dones.tolist())
    for field, key in (("obs", "state"), ("next_obs", "next_state")):
        if field in storage:
            rows = valid(storage[field])
            counters[key].update(
                tuple(np.round(row, 6).tolist()) for row in rows)

    def top_states(counter):
        for i, (obs, count) in enumerate(counter.most_common(top_n), 1):
            label = str(np.asarray(obs)).replace("\n", " ")
            if len(label) > max_col:
                label = label[:max_col] + ".."
            printer(f"{i:>2}) Count: {count} state: {label}")

    printer(f"Replay memory: {size}/{slots} slots filled")
    printer(f"Actions: {dict(counters['action'].most_common())}")
    printer(f"Rewards: {dict(counters['reward'].most_common(top_n))}")
    if "state" in counters:
        printer("Top state:")
        top_states(counters["state"])
        printer("Top next_state:")
        top_states(counters["next_state"])
    done_frac = counters["done"][True] / max(1, size)
    printer(f"Proportion of done: {100 * done_frac:.2f}%")

    if plot:
        import matplotlib.pyplot as plt

        fig, (ax1, ax2) = plt.subplots(nrows=1, ncols=2, figsize=(12, 4))
        for counter, ax, label in ((counters["reward"], ax1, "rewards"),
                                   (counters["action"], ax2, "actions")):
            pairs = counter.most_common()
            total = sum(c for _, c in pairs) or 1
            ax.bar(range(len(pairs)), [c / total for _, c in pairs])
            ax.set_xticks(range(len(pairs)))
            ax.set_xticklabels([str(k) for k, _ in pairs])
            ax.set_ylabel("proportion")
            ax.set_xlabel(label)
            ax.set_title("Replay Memory")
        plt.show()

    return dict(counters)


class ReplayBuffer:
    """Convenience facade binding static geometry to the pure functions."""

    def __init__(self, capacity: int = 10_000, batch_size: int = 64,
                 uniform_pushes: bool = False):
        self.capacity = capacity
        self.batch_size = batch_size
        self.uniform_pushes = uniform_pushes

    def init(self, template: Any) -> ReplayState:
        return init(template, self.capacity)

    def push(self, state: ReplayState, experience: Any) -> ReplayState:
        return push(state, experience, self.capacity)

    def push_many(self, state: ReplayState, batch: Any) -> ReplayState:
        return push_many(
            state, batch, self.capacity, aligned=self.uniform_pushes)

    def sample(self, key: jax.Array, state: ReplayState) -> Any:
        return sample(key, state, self.batch_size)

    def can_sample(self, state: ReplayState) -> jax.Array:
        return can_sample(state, self.batch_size)
