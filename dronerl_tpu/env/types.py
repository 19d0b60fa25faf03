"""Environment parameter and state containers.

``EnvParams`` is a frozen flax.struct dataclass: hashable, so it can be a
static argument to ``jax.jit`` — every field participates in the compile
cache key, which keeps all shapes static inside the compiled program.

``EnvState`` is a structure-of-arrays pytree. All leaves are fixed-shape
device arrays, so a batch of environments is simply the same pytree with a
leading env axis, ready to be sharded over a device mesh.

Field vocabulary matches the reference (reference: jax_impl/env/env.py:11-36)
because rollout bit-parity requires identical dtypes and layouts.
"""

from typing import Literal

import jax
import jax.numpy as jnp
from flax.struct import dataclass


@dataclass
class EnvParams:
    """Static environment configuration.

    Object counts are expressed as per-drone factors, e.g. the grid holds
    ``packets_factor * n_drones`` packets at all times.
    """

    grid_size: int = 8
    n_drones: int = 3
    pickup_reward: float = 0.0
    delivery_reward: float = 1.0
    crash_reward: float = -1.0
    charge_reward: float = -0.1
    discharge: int = 10
    charge: int = 20
    packets_factor: int = 3
    dropzones_factor: int = 2
    stations_factor: int = 2
    skyscrapers_factor: int = 3
    wrapper: Literal["window", "global", "compass"] = "window"
    window_radius: int = 3

    @property
    def num_packets(self) -> int:
        return self.packets_factor * self.n_drones

    @property
    def num_dropzones(self) -> int:
        return self.dropzones_factor * self.n_drones

    @property
    def num_stations(self) -> int:
        return self.stations_factor * self.n_drones

    @property
    def num_skyscrapers(self) -> int:
        return self.skyscrapers_factor * self.n_drones

    @property
    def num_cells(self) -> int:
        return self.grid_size * self.grid_size

    @property
    def window_size(self) -> int:
        return 2 * self.window_radius + 1

    @property
    def obs_shape(self):
        from dronerl_tpu.constants import NUM_OBS_CHANNELS

        if self.wrapper == "global":
            return (self.grid_size, self.grid_size, NUM_OBS_CHANNELS)
        return (self.window_size, self.window_size, NUM_OBS_CHANNELS)

    def validate(self) -> None:
        """Raise if the configured objects cannot fit on the grid."""
        total = (
            self.num_packets
            + self.num_dropzones
            + self.num_stations
            + self.num_skyscrapers
        )
        if total > self.num_cells:
            raise ValueError(
                f"Grid has {self.num_cells:,} cells but {total:,} ground objects "
                f"({self.num_packets:,} packets, {self.num_dropzones:,} dropzones, "
                f"{self.num_stations:,} stations, {self.num_skyscrapers:,} skyscrapers) "
                "were requested."
            )
        if self.n_drones > self.num_cells:
            raise ValueError(
                f"Grid has {self.num_cells:,} cells but {self.n_drones:,} drones "
                "were requested."
            )


@dataclass
class EnvState:
    """Structure-of-arrays environment state.

    Attributes:
      ground: int8 (G, G) grid of :class:`~dronerl_tpu.constants.Object`
        codes; 0 is an empty cell. Indexed ``ground[row, col]`` i.e.
        ``ground[y, x]``.
      air_x: int32 (N,) drone column coordinates.
      air_y: int32 (N,) drone row coordinates.
      carrying_package: bool (N,) whether each drone holds a packet.
      charge: float32 (N,) battery level in [0, 100].
    """

    ground: jax.Array
    air_x: jax.Array
    air_y: jax.Array
    carrying_package: jax.Array
    charge: jax.Array

    @property
    def n_drones(self) -> int:
        return self.air_x.shape[-1]

    @property
    def grid_size(self) -> int:
        return self.ground.shape[-1]


def empty_state(params: EnvParams) -> EnvState:
    """An all-zeros state with the correct shapes/dtypes (for buffer init)."""
    g, n = params.grid_size, params.n_drones
    return EnvState(
        ground=jnp.zeros((g, g), dtype=jnp.int8),
        air_x=jnp.zeros((n,), dtype=jnp.int32),
        air_y=jnp.zeros((n,), dtype=jnp.int32),
        carrying_package=jnp.zeros((n,), dtype=jnp.bool_),
        charge=jnp.zeros((n,), dtype=jnp.float32),
    )
