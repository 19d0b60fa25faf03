"""Point gathers/scatters as one-hot compare + einsum (TPU-friendly).

XLA point gathers and scatters over per-drone coordinates lower to
serialized memory ops on TPU; for the small boards and drone counts here
the same results are computed exactly with vectorized iota comparisons and
tiny matmuls (VPU/MXU work, no gather/scatter units touched).

Every op here is bit-exact versus its gather/scatter counterpart:
selection weights are exact 0/1 floats and the summed contributions are
provably free of colliding writes (asserted in the docstrings of each op).

jnp indexing semantics being emulated: negative indices wrap (``idx + n``)
and the result is then clamped into range — see :func:`wrap_clamp`.
"""

import jax
import jax.numpy as jnp


def wrap_clamp(idx: jax.Array, size: int) -> jax.Array:
    """jnp gather index normalization: negatives wrap, then clamp."""
    idx = jnp.where(idx < 0, idx + size, idx)
    return jnp.clip(idx, 0, size - 1)


def point_lookup(grid: jax.Array, rows: jax.Array, cols: jax.Array) -> jax.Array:
    """``grid[rows, cols]`` for (N,) in-range index vectors, via einsum.

    Duplicate reads are inherently safe. Values must be exactly
    representable in float32 (int8 codes / bools / small counts are).
    """
    h, w = grid.shape
    row_sel = (rows[:, None] == jnp.arange(h, dtype=rows.dtype)).astype(
        jnp.float32)
    col_sel = (cols[:, None] == jnp.arange(w, dtype=cols.dtype)).astype(
        jnp.float32)
    vals = jnp.einsum(
        "nh,hw,nw->n", row_sel, grid.astype(jnp.float32), col_sel,
        preferred_element_type=jnp.float32)
    return vals.astype(grid.dtype)


def flag_mask(
    rows: jax.Array, cols: jax.Array, flags: jax.Array, h: int, w: int
) -> jax.Array:
    """(h, w) bool mask: True at cell (rows[i], cols[i]) where flags[i].

    Equivalent to ``zeros.at[rows, cols].set(flags)`` whenever no True and
    False writer share a cell (duplicate writers with equal flags are fine:
    the einsum sums contributions and tests ``> 0``, i.e. logical OR).
    One einsum — far cheaper than a TPU scatter.
    """
    row_sel = rows[:, None] == jnp.arange(h, dtype=rows.dtype)  # (N, h)
    col_sel = cols[:, None] == jnp.arange(w, dtype=cols.dtype)  # (N, w)
    return jnp.einsum(
        "nh,nw,n->hw", row_sel.astype(jnp.float32),
        col_sel.astype(jnp.float32), flags.astype(jnp.float32),
        preferred_element_type=jnp.float32) > 0


def flag_mask_scatter_order(
    rows: jax.Array, cols: jax.Array, flags: jax.Array, h: int, w: int
) -> jax.Array:
    """Exact emulation of ``zeros.at[rows, cols].set(flags)`` incl. its
    index-normalization and duplicate semantics.

    jnp boolean scatter-set semantics being reproduced: negative indices
    wrap once (numpy-style), still-out-of-bounds writers are dropped, and
    when several writers target one cell the LAST one wins. The emulation
    keeps, per writer, only those not overridden by a later valid writer to
    the same cell (O(N²) fused elementwise compares — no scatter unit),
    then ORs the surviving True flags into the grid with one einsum.
    """
    rows = jnp.where(rows < 0, rows + h, rows)
    cols = jnp.where(cols < 0, cols + w, cols)
    valid = (rows >= 0) & (rows < h) & (cols >= 0) & (cols < w)
    same = (rows[:, None] == rows[None, :]) & (cols[:, None] == cols[None, :])
    n = rows.shape[0]
    later = jnp.arange(n)[None, :] > jnp.arange(n)[:, None]
    overridden = (same & later & valid[None, :]).any(axis=1)
    effective = flags & valid & ~overridden
    return flag_mask(
        jnp.clip(rows, 0, h - 1), jnp.clip(cols, 0, w - 1), effective, h, w)


def cell_mask(rows: jax.Array, cols: jax.Array, h: int, w: int) -> jax.Array:
    """(h, w) bool mask marking the cells named by in-range (rows, cols).

    Equivalent to ``zeros.at[rows, cols].set(True)`` — all writers write
    True, so duplicate targets are harmless.
    """
    row_sel = rows[:, None] == jnp.arange(h, dtype=rows.dtype)  # (N, h)
    col_sel = cols[:, None] == jnp.arange(w, dtype=cols.dtype)  # (N, w)
    return jnp.einsum(
        "nh,nw->hw", row_sel.astype(jnp.float32),
        col_sel.astype(jnp.float32),
        preferred_element_type=jnp.float32) > 0


# Added to every placed value so a zero fill still marks its cell as
# selected (placed_aug > 0 ⇔ cell written). Must exceed |min value| AND
# keep values + offset exactly representable in bfloat16: TPU matmuls at
# default precision round f32 inputs to bf16, which is exact only for
# integers of magnitude ≤ 256. With offset 128 any value in (-128, 128]
# stays exact end-to-end (int8 inputs always qualify).
_PLACE_OFFSET = 128.0


def place_values(
    grid: jax.Array, rows: jax.Array, cols: jax.Array, values: jax.Array
) -> jax.Array:
    """``grid.at[rows, cols].set(values)`` for DISTINCT in-range cells.

    Exact only when (rows, cols) pairs are pairwise distinct — which holds
    for top-k spawn targets. Overwrite semantics: selected cells take the
    new value even if previously non-zero.

    One einsum: values are shifted by ``_PLACE_OFFSET`` so written cells
    (including value-0 writes) are distinguishable from untouched cells in
    a single weighted placement, then recovered with an elementwise select.
    """
    h, w = grid.shape
    row_sel = (rows[:, None] == jnp.arange(h, dtype=rows.dtype)).astype(
        jnp.float32)
    col_sel = (cols[:, None] == jnp.arange(w, dtype=cols.dtype)).astype(
        jnp.float32)
    placed_aug = jnp.einsum(
        "nh,nw,n->hw", row_sel, col_sel,
        values.astype(jnp.float32) + _PLACE_OFFSET,
        preferred_element_type=jnp.float32)
    out = jnp.where(
        placed_aug > 0, placed_aug - _PLACE_OFFSET, grid.astype(jnp.float32))
    return out.astype(grid.dtype)
