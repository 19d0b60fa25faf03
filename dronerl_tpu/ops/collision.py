"""Same-destination-cell conflict detection.

The reference resolves drone-drone collisions with a per-step
``jnp.unique(..., return_inverse, return_counts)`` (reference:
jax_impl/env/env.py:159-167), which lowers to a sort and is the main
throughput sink of its step kernel.

We compute the identical predicate — "does any other drone target my exact
cell" — with a vectorized pairwise coordinate comparison (O(N²) VPU ops,
no sort, no gather/scatter units), falling back to a scatter-add occupancy
histogram for very large drone counts where N² would dominate.

Coordinates may be one step off-board (in ``[-1, G]``); both forms treat
every distinct coordinate pair as its own cell, exactly like ``unique`` on
raw coordinate pairs — two drones leaving the board to the same phantom
cell count as a conflict, and they are crashed either way.
"""

import jax
import jax.numpy as jnp

# Above this drone count the O(N²) comparison loses to the histogram.
PAIRWISE_MAX_DRONES = 1024


def same_cell_conflicts(
    xs: jax.Array, ys: jax.Array, grid_size: int
) -> jax.Array:
    """Boolean (N,) mask: True where ≥2 drones target the same cell.

    Args:
      xs, ys: int32 (N,) target coordinates, each in ``[-1, grid_size]``.
      grid_size: board side length G (static).
    """
    n = xs.shape[0]
    if n <= PAIRWISE_MAX_DRONES:
        same = (xs[:, None] == xs[None, :]) & (ys[:, None] == ys[None, :])
        return same.sum(axis=1) > 1
    side = grid_size + 2
    flat = (xs + 1) * side + (ys + 1)
    counts = jnp.zeros((side * side,), dtype=jnp.int32).at[flat].add(1)
    return counts[flat] > 1
