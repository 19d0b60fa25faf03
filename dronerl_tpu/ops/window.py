"""Per-drone window cropping as one broadcasted gather.

Rather than slicing one window per drone (N dynamic slices), all N windows
are materialized with a single gather using broadcasted index grids — the
layout XLA tiles well on TPU (reference behavior: jax_impl/env/env.py:285-288).
"""

import jax
import jax.numpy as jnp


def crop_windows(
    padded: jax.Array,
    center_x: jax.Array,
    center_y: jax.Array,
    radius: int,
) -> jax.Array:
    """Gather (N, 2r+1, 2r+1) windows from a pre-padded (H, W) grid.

    Args:
      padded: 2-D grid already padded by ``radius`` on every side.
      center_x: int32 (N,) column centers, in padded coordinates.
      center_y: int32 (N,) row centers, in padded coordinates.
      radius: static window radius r.
    """
    span = jnp.arange(-radius, radius + 1, dtype=jnp.int32)
    cols = center_x[:, None] + span[None, :]  # (N, 2r+1)
    rows = center_y[:, None] + span[None, :]  # (N, 2r+1)
    return padded[rows[:, :, None], cols[:, None, :]]  # (N, 2r+1, 2r+1)
