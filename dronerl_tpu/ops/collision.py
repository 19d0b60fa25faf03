"""Same-destination-cell conflict detection via scatter-add occupancy.

The reference resolves drone-drone collisions with a per-step
``jnp.unique(..., return_inverse, return_counts)`` (reference:
jax_impl/env/env.py:159-167), which lowers to a sort and is the main
throughput sink of its step kernel, especially under ``vmap``.

We compute the identical predicate — "does any other drone target my exact
cell" — with a scatter-add occupancy histogram followed by a gather, which
is O(N) VPU work, batches natively, and needs no sort:

  counts[cell] = sum_j [drone j targets cell]
  conflict_i   = counts[cell_i] > 1

Coordinates arriving here may be one step off-board (in ``[-1, G]``), so the
histogram is laid out on a ``(G+2)²`` halo grid. Two drones leaving the board
to the same phantom cell count as a conflict exactly as ``jnp.unique`` on raw
coordinate pairs does — they are all crashed either way.
"""

import jax
import jax.numpy as jnp


def same_cell_conflicts(
    xs: jax.Array, ys: jax.Array, grid_size: int
) -> jax.Array:
    """Boolean (N,) mask: True where ≥2 drones target the same cell.

    Args:
      xs, ys: int32 (N,) target coordinates, each in ``[-1, grid_size]``.
      grid_size: board side length G (static).
    """
    side = grid_size + 2
    flat = (xs + 1) * side + (ys + 1)
    counts = jnp.zeros((side * side,), dtype=jnp.int32).at[flat].add(1)
    return counts[flat] > 1
