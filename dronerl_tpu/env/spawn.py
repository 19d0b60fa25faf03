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
    # Quirk kept for parity: occupancy is marked transposed, and -1 wraps
    # (scatter negative-index normalization → last row/column).
    occupied = cell_mask(wrap_clamp(air_x, g), wrap_clamp(air_y, g), g, g)
    open_cells = ~occupied
    if exclude is not None:
        open_cells &= ~exclude
    scores = jnp.log(open_cells.ravel()) + jax.random.uniform(
        key, shape=(params.num_cells,)
    )
    _, cells = jax.lax.top_k(scores, k=params.n_drones)
    cand_x = cells // params.grid_size
    cand_y = cells % params.grid_size
    new_x = jnp.where(air_x == -1, cand_x, air_x)
    new_y = jnp.where(air_y == -1, cand_y, air_y)
    return new_x, new_y
