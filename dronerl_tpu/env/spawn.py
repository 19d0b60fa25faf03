"""Fixed-shape random placement via the Gumbel-top-k trick.

Sampling k distinct empty cells with rejection loops is data-dependent and
does not compile; instead we draw one uniform score per cell, mask occupied
cells to -inf (``log(False)``), and take the top-k scores. Per-slot no-op
respawns are encoded by writing fill value 0 ("empty") to the chosen cell.

The score construction, PRNG consumption and top-k tie-breaking here are a
bit-exact contract with the reference env (reference: jax_impl/env/env.py:40-86),
including two deliberate quirks that fixed-seed parity forces us to keep:

* ``occupy_cells`` marks occupancy at ``[x, y]`` (transposed relative to the
  grid's ``[row=y, col=x]`` convention) and dead-drone sentinels of ``-1``
  wrap to the last row/column (reference: jax_impl/env/env.py:71-72).
* Cell index ``c`` decodes as ``row = c // G, col = c % G``.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from dronerl_tpu.env.types import EnvParams
from dronerl_tpu.ops.pointops import cell_mask, place_values, wrap_clamp

# Above this cell count the O(C²) rank matmul loses to sort-based top_k.
PAIRWISE_MAX_CELLS = 256


def place_on_ground(
    key: jax.Array,
    ground: jax.Array,
    fill_values: jax.Array,
    params: EnvParams,
    exclude: Optional[jax.Array] = None,
) -> jax.Array:
    """Scatter ``fill_values`` onto distinct empty cells of ``ground``.

    Slots whose fill value is 0 still consume a top-k cell but leave the
    grid unchanged (the chosen cell is empty, and 0 means empty) — this is
    how a variable number of respawns is expressed with fixed shapes.
    """
    vacant = ground == 0
    if exclude is not None:
        vacant &= ~exclude
    scores = jnp.log(vacant.ravel()) + jax.random.uniform(
        key, shape=(params.num_cells,)
    )
    _, cells = jax.lax.top_k(scores, k=fill_values.shape[0])
    rows = cells // params.grid_size
    cols = cells % params.grid_size
    # top_k cells are distinct, so the einsum placement is scatter-exact
    # (and avoids TPU scatter units entirely).
    return place_values(ground, rows, cols, fill_values)


def _beats_matrix(u: jax.Array) -> jax.Array:
    """(C, C) bool: entry [j, c] means cell j precedes cell c in the
    descending stable order used by ``jax.lax.top_k`` (strictly larger
    value, or equal value with lower index)."""
    n = u.shape[0]
    idx = jnp.arange(n)
    return (u[:, None] > u[None, :]) | (
        (u[:, None] == u[None, :]) & (idx[:, None] < idx[None, :]))


def _topk_ranks(beats: jax.Array, valid: jax.Array) -> jax.Array:
    """Rank of every cell in ``top_k(where(valid, u, -inf), C)`` order.

    Exact emulation of the stable top_k the reference spawner relies on:
    valid cells rank by descending score (ties broken by ascending index —
    precomputed in ``beats``); invalid cells all score -inf and follow in
    ascending index order. One (C,)·(C,C) matmul instead of a sort, so the
    ranking rides the MXU and, unlike a sort, the comparison matrix can be
    computed as soon as the PRNG key is known.
    """
    validf = valid.astype(jnp.float32)
    rank_valid = jnp.einsum(
        "j,jc->c", validf, beats.astype(jnp.float32),
        preferred_element_type=jnp.float32)
    n_valid = validf.sum()
    invalid = 1.0 - validf
    inv_before = jnp.cumsum(invalid) - invalid
    rank = jnp.where(valid, rank_valid, n_valid + inv_before)
    return rank  # float32, exact small integers


def _write_fill(
    g_flat: jax.Array, rank: jax.Array, fill_values: jax.Array
) -> jax.Array:
    """Write ``fill_values[rank[c]]`` to every cell with rank < k.

    Overwrite semantics identical to the reference's scatter of top-k
    slots (value-0 fills still claim their cell).
    """
    k = fill_values.shape[0]
    slot_sel = (rank[:, None] == jnp.arange(k, dtype=jnp.float32)).astype(
        jnp.float32)
    from dronerl_tpu.ops.pointops import _PLACE_OFFSET

    value_aug = jnp.einsum(
        "ck,k->c", slot_sel, fill_values.astype(jnp.float32) + _PLACE_OFFSET,
        preferred_element_type=jnp.float32)
    out = jnp.where(value_aug > 0, value_aug - _PLACE_OFFSET,
                    g_flat.astype(jnp.float32))
    return out.astype(g_flat.dtype)


def respawn_ground_pair(
    key: jax.Array,
    ground: jax.Array,
    fill_packets: jax.Array,
    fill_dropzones: jax.Array,
    consumed: jax.Array,
    params: EnvParams,
) -> jax.Array:
    """The step kernel's packet + dropzone respawn as one fused program.

    Bit-exact with the sequential pair of ``place_on_ground`` calls the
    reference makes (reference: jax_impl/env/env.py:197-212) — including
    the quirk that both spawns draw from the SAME key: the shared uniform
    field is sampled once and one beats-matrix serves both rankings, so the
    whole respawn costs four small matmuls instead of two serialized
    sort-select-scatter chains. ``consumed`` is the delivered-dropzone
    clear applied between the two spawns.
    """
    if params.num_cells > PAIRWISE_MAX_CELLS:
        ground = place_on_ground(key, ground, fill_packets, params)
        ground = ground * ~consumed
        return place_on_ground(key, ground, fill_dropzones, params)

    u = jax.random.uniform(key, shape=(params.num_cells,))
    beats = _beats_matrix(u)
    g_flat = ground.ravel()

    rank_p = _topk_ranks(beats, g_flat == 0)
    g1 = _write_fill(g_flat, rank_p, fill_packets)
    g2 = jnp.where(consumed.ravel(), 0, g1).astype(g1.dtype)
    rank_d = _topk_ranks(beats, g2 == 0)
    g3 = _write_fill(g2, rank_d, fill_dropzones)
    return g3.reshape(ground.shape)


def place_in_air(
    key: jax.Array,
    air_x: jax.Array,
    air_y: jax.Array,
    params: EnvParams,
    exclude: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Assign fresh cells to drones whose coordinates are the -1 sentinel.

    Draws ``n_drones`` candidate cells that avoid (a) cells claimed via the
    transposed ``[x, y]`` occupancy write (see module docstring) and (b) the
    ``exclude`` mask (skyscrapers). Live drones keep their coordinates.
    """
    g = params.grid_size
    c = params.num_cells
    # Quirk kept for parity: occupancy is marked transposed, and -1 wraps
    # (scatter negative-index normalization → last row/column).
    rows = wrap_clamp(air_x, g)
    cols = wrap_clamp(air_y, g)
    if c <= PAIRWISE_MAX_CELLS:
        # Flat-compare occupancy + rank matmul (see respawn_ground_pair).
        cell_r = jnp.arange(c, dtype=jnp.int32) // g
        cell_c = jnp.arange(c, dtype=jnp.int32) % g
        occupied = (
            (rows[:, None] == cell_r) & (cols[:, None] == cell_c)
        ).any(axis=0)
        open_cells = ~occupied
        if exclude is not None:
            open_cells &= ~exclude.ravel()
        u = jax.random.uniform(key, shape=(c,))
        rank = _topk_ranks(_beats_matrix(u), open_cells)
        slot_sel = (
            rank[:, None] == jnp.arange(params.n_drones, dtype=jnp.float32)
        ).astype(jnp.float32)
        cells = jnp.einsum(
            "cn,c->n", slot_sel, jnp.arange(c, dtype=jnp.float32),
            preferred_element_type=jnp.float32).astype(jnp.int32)
    else:
        occupied = cell_mask(rows, cols, g, g)
        open_cells = ~occupied
        if exclude is not None:
            open_cells &= ~exclude
        scores = jnp.log(open_cells.ravel()) + jax.random.uniform(
            key, shape=(c,)
        )
        _, cells = jax.lax.top_k(scores, k=params.n_drones)
    cand_x = cells // params.grid_size
    cand_y = cells % params.grid_size
    new_x = jnp.where(air_x == -1, cand_x, air_x)
    new_y = jnp.where(air_y == -1, cand_y, air_y)
    return new_x, new_y
