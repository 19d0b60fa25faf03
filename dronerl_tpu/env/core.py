"""Pure-functional environment kernels: reset / step / observe.

Everything here is a fixed-shape array program: a single drone-delivery
world advances with one fused XLA computation per step, and a batch of
worlds is the identical program under ``jax.vmap`` (see ``*_batch``).
There is no data-dependent control flow, so the whole training loop can
live inside one compiled ``lax.scan``.

Bit-parity contract
-------------------
At a fixed PRNG key these kernels reproduce the reference JAX environment
exactly (reference: jax_impl/env/env.py:89-309), including its documented
quirks, which are load-bearing for fixed-seed trajectory equality:

* the dropzone respawn draws ``packets_factor * n_drones`` slots (not
  ``dropzones_factor``) and reuses the packet-respawn PRNG key
  (reference: jax_impl/env/env.py:197-212);
* post-respawn package pickup indexes the package mask ``[x, y]`` —
  transposed relative to the grid's ``[y, x]`` convention (reference:
  jax_impl/env/env.py:233-241);
* charge/pickup/delivery reads use unclipped coordinates and rely on XLA
  gather clamping for drones that stepped off-board (reference:
  jax_impl/env/env.py:170);
* ``place_in_air`` occupancy marking is transposed and wraps -1 sentinels
  (see :mod:`dronerl_tpu.env.spawn`).

The one deliberate departure is the drone-drone collision resolver: the
reference sorts positions with ``jnp.unique``; we compute the identical
predicate with a scatter-add occupancy histogram
(:func:`dronerl_tpu.ops.same_cell_conflicts`), which is far cheaper and
batches natively. Parity is asserted in tests/test_reference_parity.py.
"""

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from dronerl_tpu.constants import Action, Object, NUM_OBS_CHANNELS
from dronerl_tpu.env.spawn import (
    place_on_ground, place_in_air, respawn_ground_pair)
from dronerl_tpu.env.types import EnvParams, EnvState
from dronerl_tpu.ops.collision import same_cell_conflicts
from dronerl_tpu.ops.pointops import (
    flag_mask, flag_mask_scatter_order, place_values, point_lookup,
    wrap_clamp)
from dronerl_tpu.ops.window import crop_windows


def reset(key: jax.Array, params: EnvParams) -> EnvState:
    """Spawn a fresh world: ground objects, then drones, then auto-pickup.

    Drones may spawn anywhere except skyscrapers; a drone spawning on a
    packet picks it up immediately without reward.
    """
    params.validate()
    grid = jnp.zeros((params.grid_size, params.grid_size), dtype=jnp.int8)
    for count, code in (
        (params.num_packets, Object.PACKET),
        (params.num_dropzones, Object.DROPZONE),
        (params.num_stations, Object.STATION),
        (params.num_skyscrapers, Object.SKYSCRAPER),
    ):
        key, placement_key = jax.random.split(key)
        fill = jnp.full((count,), code.value, dtype=jnp.int8)
        grid = place_on_ground(placement_key, grid, fill, params)

    sentinel = jnp.full((params.n_drones,), -1, dtype=jnp.int32)
    key, placement_key = jax.random.split(key)
    air_x, air_y = place_in_air(
        placement_key, sentinel, sentinel, params,
        exclude=(grid == Object.SKYSCRAPER),
    )

    carrying = point_lookup(grid, air_y, air_x) == Object.PACKET
    lifted = flag_mask(air_y, air_x, carrying, *grid.shape)
    grid = grid * ~lifted

    return EnvState(
        ground=grid,
        air_x=air_x,
        air_y=air_y,
        carrying_package=carrying,
        charge=jnp.full((params.n_drones,), 100.0, dtype=jnp.float32),
    )


def step(
    key: jax.Array,
    state: EnvState,
    actions: jax.Array,
    params: EnvParams,
) -> Tuple[EnvState, jax.Array, jax.Array]:
    """Advance the world one tick.

    Phases (fused into one XLA program): move → crash detection (off-board,
    skyscraper, same-cell) → battery charge/drain → pickup → delivery →
    packet/dropzone respawn → rewards → dead-drone respawn with auto-pickup.

    Returns ``(state, rewards (N,) float32, dones (N,) bool)``.
    """
    g = params.grid_size

    # --- move ---------------------------------------------------------
    dy = jnp.where(actions == Action.UP, -1, jnp.where(actions == Action.DOWN, 1, 0))
    dx = jnp.where(actions == Action.LEFT, -1, jnp.where(actions == Action.RIGHT, 1, 0))
    new_y = state.air_y + dy
    new_x = state.air_x + dx

    # --- crashes ------------------------------------------------------
    off_board = (new_y < 0) | (new_y >= g) | (new_x < 0) | (new_x >= g)
    in_y = jnp.clip(new_y, 0, g - 1)
    in_x = jnp.clip(new_x, 0, g - 1)
    hit_drone = same_cell_conflicts(new_x, new_y, g)

    # Two reads of the same grid batched into one lookup: the clipped
    # coordinates (skyscraper test) and the wrap-then-clamp coordinates
    # (landing cell; the reference reads `ground[new_y, new_x]` unclipped —
    # those drones are all `collided`, so normalizing the read never
    # changes behavior).
    n = new_y.shape[0]
    both = point_lookup(
        state.ground,
        jnp.concatenate([in_y, wrap_clamp(new_y, g)]),
        jnp.concatenate([in_x, wrap_clamp(new_x, g)]))
    hit_skyscraper = (both[:n] == Object.SKYSCRAPER) & ~off_board
    collided = off_board | hit_skyscraper | hit_drone
    target_cell = both[n:]

    # --- battery ------------------------------------------------------
    is_charging = (target_cell == Object.STATION) & ~collided
    is_discharging = ~is_charging & ~collided
    charge = (state.charge + is_charging * params.charge).clip(0, 100)
    charge = (charge - is_discharging * params.discharge).clip(0, 100)
    out_of_charge = charge == 0

    dones = collided | out_of_charge
    survivors = ~dones
    charge = jnp.where(dones, 100, charge)  # respawned drones start full

    # --- pickup -------------------------------------------------------
    picked_up = (
        (target_cell == Object.PACKET) & survivors & ~state.carrying_package
    )
    # Scatter-order emulation: an off-board drone's wrapped coordinate can
    # alias a survivor's cell, and the reference's boolean scatter lets the
    # later (False) writer win — plain OR would diverge there.
    lifted = flag_mask_scatter_order(new_y, new_x, picked_up, g, g)
    ground = state.ground * ~lifted
    carrying = state.carrying_package & survivors  # dead drones drop cargo
    carrying |= picked_up

    # --- delivery -----------------------------------------------------
    at_dropzone = (target_cell == Object.DROPZONE) & survivors
    delivered = at_dropzone & state.carrying_package
    carrying &= ~delivered

    # --- respawn packets + dropzones (one fused fixed-k spawn pair;
    # 0-fill slots are no-ops). Parity quirks preserved: the dropzone
    # spawn's slot count uses packets_factor and the packet respawn key is
    # reused (reference: jax_impl/env/env.py:197-212).
    key, respawn_key = jax.random.split(key)
    needs_packet = delivered | (dones & state.carrying_package)
    packet_fill = jnp.zeros((params.num_packets,), dtype=jnp.int8)
    packet_fill = packet_fill.at[: params.n_drones].set(
        needs_packet * Object.PACKET.value
    )
    dropzone_fill = jnp.zeros((params.num_packets,), dtype=jnp.int8)
    dropzone_fill = dropzone_fill.at[: params.n_drones].set(
        delivered * Object.DROPZONE.value
    )
    consumed = flag_mask_scatter_order(new_y, new_x, delivered, g, g)
    ground = respawn_ground_pair(
        respawn_key, ground, packet_fill, dropzone_fill, consumed, params)

    # --- rewards ------------------------------------------------------
    rewards = (
        params.crash_reward * dones
        + params.pickup_reward * picked_up
        + params.delivery_reward * delivered
        + params.charge_reward * is_charging
    ).astype(jnp.float32)

    # --- respawn dead drones ------------------------------------------
    new_x = jnp.where(dones, -1, new_x)
    new_y = jnp.where(dones, -1, new_y)
    key, respawn_key = jax.random.split(key)
    new_x, new_y = place_in_air(
        respawn_key, new_x, new_y, params,
        exclude=(state.ground == Object.SKYSCRAPER),
    )

    # Respawned drones auto-pick packets under them (no reward). Parity
    # quirk: the mask is indexed/written transposed ([x, y]).
    packet_here = ground == Object.PACKET
    respawn_pickup = point_lookup(
        packet_here, wrap_clamp(new_x, g), wrap_clamp(new_y, g)) & dones
    carrying |= respawn_pickup
    lifted = flag_mask(new_x, new_y, respawn_pickup, g, g)
    ground = ground * ~lifted

    next_state = state.replace(
        air_x=new_x,
        air_y=new_y,
        ground=ground,
        charge=charge,
        carrying_package=carrying,
    )
    return next_state, rewards, dones


def observe(state: EnvState, params: EnvParams, limit: Optional[int] = None) -> jax.Array:
    """Per-drone observations.

    ``wrapper='window'``: (N, 2r+1, 2r+1, 6) float32 egocentric crops, the
    board padded with walls. ``wrapper='global'``: (N, G, G, 6) full-board
    view shared by all drones (capability of the reference torch-only
    ``GridView``, reference: torch_impl/env/wrappers.py:34-43).

    Channels: 0 drone, 1 packet (center cell also reflects carried cargo),
    2 dropzone, 3 station, 4 charge fraction, 5 skyscraper/wall.

    ``limit``: compute windows only for the first ``limit`` drones (all
    drones still appear inside those windows). The training loop sets this
    to the number of learner slots so no crop work is wasted on opponents.
    """
    if params.wrapper == "window":
        return _observe_window(state, params, limit)
    if params.wrapper == "global":
        obs = _observe_global(state, params)
        return obs if limit is None else obs[:limit]
    raise NotImplementedError(f"wrapper={params.wrapper!r} is not implemented")


def _observe_window(
    state: EnvState, params: EnvParams, limit: Optional[int] = None
) -> jax.Array:
    r = params.window_radius
    padded = jnp.pad(
        state.ground, r, mode="constant", constant_values=Object.SKYSCRAPER
    )
    cx = state.air_x + r
    cy = state.air_y + r

    # +1 so that a present drone with zero charge is still distinguishable.
    # Drones occupy distinct cells in any reachable state, so the einsum
    # placement is scatter-exact (behavior for hand-built states with
    # overlapping drones is undefined, as it is for scatter).
    charge_grid = place_values(
        jnp.zeros_like(padded, dtype=jnp.int8), cy, cx,
        state.charge.astype(jnp.int8) + 1)

    carrying = state.carrying_package
    if limit is not None:
        cx, cy, carrying = cx[:limit], cy[:limit], carrying[:limit]

    win_ground = crop_windows(padded, cx, cy, r)
    win_charge = crop_windows(charge_grid, cx, cy, r)

    # Remap ground codes onto one-hot channel ids; empty maps to a value
    # outside [0, 6) so it one-hot-encodes to all-zeros.
    codes = jnp.where(
        win_ground == Object.PACKET, 1,
        jnp.where(
            win_ground == Object.SKYSCRAPER, 5,
            jnp.where(
                win_ground == Object.DROPZONE, 2,
                jnp.where(win_ground == 0, 10, win_ground),
            ),
        ),
    )
    obs = jax.nn.one_hot(codes, NUM_OBS_CHANNELS, dtype=jnp.bool_)
    obs = obs.at[:, :, :, 0].set(win_charge > 0)
    obs = obs.at[:, r, r, 1].set(obs[:, r, r, 1] | carrying)
    obs = obs.astype(jnp.float32)
    obs = obs.at[:, :, :, 4].set((win_charge - 1).clip(0, 100) / 100.0)
    return obs


def _observe_global(state: EnvState, params: EnvParams) -> jax.Array:
    grid = jnp.zeros(
        (params.grid_size, params.grid_size, NUM_OBS_CHANNELS), dtype=jnp.float32
    )
    grid = grid.at[:, :, 1].set(state.ground == Object.PACKET)
    grid = grid.at[:, :, 2].set(state.ground == Object.DROPZONE)
    grid = grid.at[:, :, 3].set(state.ground == Object.STATION)
    grid = grid.at[:, :, 5].set(state.ground == Object.SKYSCRAPER)
    grid = grid.at[state.air_y, state.air_x, 0].set(1.0)
    grid = grid.at[state.air_y, state.air_x, 1].add(
        state.carrying_package.astype(jnp.float32)
    )
    grid = grid.at[:, :, 1].set(jnp.minimum(grid[:, :, 1], 1.0))
    grid = grid.at[state.air_y, state.air_x, 4].set(state.charge / 100.0)
    return jnp.broadcast_to(grid, (params.n_drones, *grid.shape))


def rollout(
    key: jax.Array,
    state: EnvState,
    params: EnvParams,
    num_steps: int,
    policy: Callable[[jax.Array, EnvState], jax.Array],
) -> Tuple[EnvState, jax.Array, jax.Array]:
    """On-device multi-step rollout under ``lax.scan``.

    ``policy(key, state) -> (N,) actions``. Returns the final state plus
    stacked per-step rewards and dones of shape (num_steps, N).
    """

    def tick(carry, _):
        rng, st = carry
        rng, policy_key, step_key = jax.random.split(rng, 3)
        acts = policy(policy_key, st)
        st, rew, done = step(step_key, st, acts, params)
        return (rng, st), (rew, done)

    (key, state), (rewards, dones) = jax.lax.scan(
        tick, (key, state), length=num_steps
    )
    return state, rewards, dones


# --- batched variants: the same kernels over a leading env axis ---------

def reset_batch(key: jax.Array, params: EnvParams, num_envs: int) -> EnvState:
    keys = jax.random.split(key, num_envs)
    return jax.vmap(reset, in_axes=(0, None))(keys, params)


def step_batch(
    keys: jax.Array, states: EnvState, actions: jax.Array, params: EnvParams
) -> Tuple[EnvState, jax.Array, jax.Array]:
    return jax.vmap(step, in_axes=(0, 0, 0, None))(keys, states, actions, params)


def observe_batch(
    states: EnvState, params: EnvParams, limit: Optional[int] = None
) -> jax.Array:
    return jax.vmap(observe, in_axes=(0, None, None))(states, params, limit)
