"""Per-drone window cropping as one-hot selection matmuls.

A naive crop (`padded[rows[:, :, None], cols[:, None, :]]`, the reference
formulation, reference: jax_impl/env/env.py:285-288) lowers to an XLA
gather of N·(2r+1)² scalar elements — on TPU that serializes and dominates
the entire training step (measured ~5.7 ms/step at 1024 envs vs ~0.1 ms
for all the physics).

Windows are instead computed as ``window = R @ padded @ Cᵀ`` where R and C
are per-drone one-hot row/column selector matrices built from vectorized
iota comparisons. This moves the crop onto the MXU: ~N·w·P² MACs, trivial
at any realistic grid size, and bit-exact for the small-integer grids we
crop (selection by multiplication with exact 0/1 weights in float32).
"""

import jax
import jax.numpy as jnp


def crop_windows(
    padded: jax.Array,
    center_x: jax.Array,
    center_y: jax.Array,
    radius: int,
) -> jax.Array:
    """Extract (N, 2r+1, 2r+1) windows from a pre-padded (P, P) grid.

    Args:
      padded: 2-D grid already padded by ``radius`` on every side; integer
        valued (codes / small counts), any dtype exactly representable in
        float32.
      center_x: int32 (N,) column centers, in padded coordinates.
      center_y: int32 (N,) row centers, in padded coordinates.
      radius: static window radius r. Window indices must be in-bounds
        (guaranteed when centers come from on-board drone coordinates).
    """
    side = padded.shape[-1]
    span = jnp.arange(-radius, radius + 1, dtype=jnp.int32)
    rows = center_y[:, None] + span[None, :]  # (N, w)
    cols = center_x[:, None] + span[None, :]  # (N, w)
    grid_idx = jnp.arange(side, dtype=jnp.int32)
    row_sel = (rows[:, :, None] == grid_idx).astype(jnp.float32)  # (N, w, P)
    col_sel = (cols[:, :, None] == grid_idx).astype(jnp.float32)  # (N, w, P)
    grid_f = padded.astype(jnp.float32)
    # (N, w, P) @ (P, P) → (N, w, P), then contract columns → (N, w, w)
    picked_rows = jnp.einsum(
        "nwp,pq->nwq", row_sel, grid_f,
        preferred_element_type=jnp.float32)
    windows = jnp.einsum(
        "nwq,nvq->nwv", picked_rows, col_sel,
        preferred_element_type=jnp.float32)
    return windows.astype(padded.dtype)
