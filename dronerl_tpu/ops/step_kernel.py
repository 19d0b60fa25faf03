"""Fused Pallas TPU kernel: the ENTIRE batched env step in one dispatch.

Why
---
The pure-jnp step (dronerl_tpu/env/core.py) compiles to ~80 XLA kernels
per scan iteration (fusions, sorts, tiny matmuls, copies). Measured on the
target TPU, per-kernel dispatch dominates: the whole physics is ~µs of
VPU work buried under ~4µs/kernel of launch cost. This module collapses
the full step — per-env PRNG key derivation, movement, collision,
battery, pickup/delivery, packet/dropzone/drone respawns and rewards —
into ONE `pl.pallas_call`, with every intermediate living in VMEM.

Bit-exactness contract
----------------------
`step_batch_fused(step_key, states, actions, params)` returns bit-identical
results to::

    keys = jax.random.split(step_key, num_envs)
    jax.vmap(core.step, in_axes=(0, 0, 0, None))(keys, states, actions, params)

which is itself bit-exact with the reference env (reference:
jax_impl/env/env.py:137-250). The pieces that make this exact:

* **threefry2x32** is reimplemented in-kernel (same 20-round schedule and
  key injections as jax._src.prng._threefry2x32_lowering) and composed
  into `split` / `uniform` following jax's *partitionable* layout
  (counts1 = hi32(iota64) = 0, counts2 = lo32(iota64); bits = b1 ^ b2;
  f32 = bitcast(bits >> 9 | 0x3f800000) - 1). Asserted bit-equal to
  jax.random in tests/test_step_kernel.py.
* **top_k emulation**: the reference spawner takes top-k of
  `where(vacant, u, -inf)` with stable index tie-breaks. The kernel runs k
  argmax-and-retire rounds over a *sentinel ladder*: invalid cells score
  `-1 - cell_index` (below every u ∈ [0,1), totally ordered among
  themselves by ascending index — exactly top_k's -inf tail order);
  retired cells drop to -inf. Argmax resolves equal scores to the lowest
  index (max reduce, then min-index-of-max), matching top_k stability.
* **boolean scatter emulation**: `zeros.at[ys, xs].set(flags)` with
  possibly off-board coordinates wraps negatives, drops out-of-bounds and
  lets the LAST writer win. The kernel writes drone masks in drone order
  with `where`, reproducing all three semantics by construction.

Use
---
Gated by `supports(params, num_envs)` (cell/drone counts must fit
comfortably in VMEM); callers fall back to the jnp path otherwise.
`interpret=True` runs the kernel in the Pallas interpreter so the
equivalence tests execute on CPU.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dronerl_tpu.constants import Action, Object
from dronerl_tpu.env.types import EnvParams, EnvState

# VMEM sizing gate: (block, cells) f32 temporaries must fit on-chip.
MAX_CELLS = 512
MAX_DRONES = 64
_ENV_BLOCK = 128

_U32 = jnp.uint32
_ROT0 = (13, 15, 26, 6)
_ROT1 = (17, 29, 16, 24)


def _rotl(x, d):
    return (x << _U32(d)) | (x >> _U32(32 - d))


def threefry2x32(k1, k2, x0, x1, rounds=20):
    """The jax threefry2x32 primitive, elementwise over broadcast args.

    Identical round/injection schedule to jax._src.prng's unrolled
    lowering; all operands uint32. ``rounds`` must be a multiple of 4 in
    [4, 20]; the default 20 is bit-exact with ``jax.random``. Lower
    values are the standard reduced-round Threefry-2x32-R family (the
    fused engines' opt-in fast-RNG mode — NOT parity-locked; Salmon et
    al. report R>=13 passes BigCrush, so 8 trades a measurable amount of
    statistical headroom for throughput on spawn/exploration noise).
    """
    assert rounds % 4 == 0 and 4 <= rounds <= 20, rounds
    ks0, ks1 = k1, k2
    ks2 = k1 ^ k2 ^ _U32(0x1BD11BDA)
    x0 = x0 + ks0
    x1 = x1 + ks1
    schedule = ((_ROT0, ks1, ks2, 1), (_ROT1, ks2, ks0, 2),
                (_ROT0, ks0, ks1, 3), (_ROT1, ks1, ks2, 4),
                (_ROT0, ks2, ks0, 5))[: rounds // 4]
    for rots, inj0, inj1, i in schedule:
        for r in rots:
            x0 = x0 + x1
            x1 = _rotl(x1, r)
            x1 = x1 ^ x0
        x0 = x0 + inj0
        x1 = x1 + inj1 + _U32(i)
    return x0, x1


def _split_one(k1, k2):
    """jax.random.split(key) for per-lane (B, 1) keys: child rows 0 and 1
    of the foldlike split (counts (0,0) and (0,1))."""
    zeros = jnp.zeros_like(k1)
    ones = jnp.ones_like(k1)
    a1, a2 = threefry2x32(k1, k2, zeros, zeros)
    b1, b2 = threefry2x32(k1, k2, zeros, ones)
    return (a1, a2), (b1, b2)


def _uniform_field(k1, k2, num_cells):
    """jax.random.uniform(key, (C,)) for (B, 1) keys → (B, C) float32."""
    counts = jax.lax.broadcasted_iota(_U32, (1, num_cells), 1)
    b1, b2 = threefry2x32(k1, k2, jnp.zeros_like(counts), counts)
    bits = b1 ^ b2
    fbits = (bits >> _U32(9)) | _U32(0x3F800000)
    return jax.lax.bitcast_convert_type(fbits, jnp.float32) - 1.0


def _point_read(values, flat_idx, num_cells):
    """values (B, C) gathered at flat_idx (B, N) → (B, N), via compares."""
    cell = jax.lax.broadcasted_iota(jnp.int32, (1, 1, num_cells), 2)
    sel = flat_idx[:, :, None] == cell                       # (B, N, C)
    return jnp.sum(jnp.where(sel, values[:, None, :], 0.0), axis=2)


def _last_writer_mask(rows, cols, flags, grid_size, num_cells):
    """Emulate ``zeros.at[rows, cols].set(flags)`` (wrap, drop, last-wins).

    rows/cols (B, N) int32, possibly one step off-board. Returns (B, C)
    bool. Sequential `where` writes in drone order reproduce scatter
    update ordering exactly.
    """
    g = grid_size
    rows = jnp.where(rows < 0, rows + g, rows)
    cols = jnp.where(cols < 0, cols + g, cols)
    valid = (rows >= 0) & (rows < g) & (cols >= 0) & (cols < g)
    flat = rows * g + cols
    cell = jax.lax.broadcasted_iota(jnp.int32, (1, num_cells), 1)
    # Start from drone 0's write (avoids materializing boolean zeros,
    # which Mosaic cannot lower), then apply later writers in order.
    writes = (flat[:, :1] == cell) & valid[:, :1]
    mask = writes & flags[:, :1]
    for i in range(1, rows.shape[1]):
        writes = (flat[:, i : i + 1] == cell) & valid[:, i : i + 1]
        # where(writes, flag_i, mask) in boolean algebra — Mosaic cannot
        # lower select_n over broadcast i1 operands.
        mask = (writes & flags[:, i : i + 1]) | (~writes & mask)
    return mask


def _sentinel_scores(u, valid, num_cells):
    """where(valid, u, -inf) with the tail totally ordered by cell index:
    invalid cells score -1 - index, below every u ∈ [0, 1)."""
    cell = jax.lax.broadcasted_iota(
        jnp.int32, (1, num_cells), 1).astype(jnp.float32)
    return jnp.where(valid, u, -1.0 - cell)


def _argmax_lowest_index(scores, cell, num_cells):
    """(B, 1) index of the max score, ties → lowest index (top_k order)."""
    best = jnp.max(scores, axis=1, keepdims=True)
    return jnp.min(
        jnp.where(scores == best, cell, num_cells), axis=1, keepdims=True)


def _spawn_rounds(scores, ground, fill_values, cell, num_cells):
    """k argmax-and-retire rounds == stable top_k select + slot writes.

    fill_values: list of k (B, 1) f32 per-slot fill codes (0 writes
    empty). Every chosen cell is overwritten with its slot's fill, exactly
    like the reference's scatter of top-k cells.
    """
    neg_inf = jnp.float32(-jnp.inf)
    for fill in fill_values:
        chosen_idx = _argmax_lowest_index(scores, cell, num_cells)
        chosen = cell == chosen_idx
        ground = jnp.where(chosen, fill, ground)
        scores = jnp.where(chosen, neg_inf, scores)
    return ground, scores


def _step_kernel(key_ref, ground_ref, ax_ref, ay_ref, carry_ref, charge_ref,
                 act_ref, out_ground, out_ax, out_ay, out_carry, out_charge,
                 out_rew, out_done, *, params: EnvParams, block: int):
    g = params.grid_size
    c = params.num_cells
    n = params.n_drones
    k_spawn = params.num_packets  # dropzone respawn shares this count (quirk)
    cell = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)

    # --- per-env PRNG keys: rows of jax.random.split(step_key, E) --------
    env0 = pl.program_id(0) * block
    lane = jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
    counts = (env0 + lane).astype(_U32)
    sk1 = key_ref[0].astype(_U32)
    sk2 = key_ref[1].astype(_U32)
    ek1, ek2 = threefry2x32(
        jnp.full((block, 1), sk1, _U32), jnp.full((block, 1), sk2, _U32),
        jnp.zeros_like(counts), counts)

    # key, respawn_key = split(key); key, air_key = split(key)
    (nk1, nk2), (rk1, rk2) = _split_one(ek1, ek2)
    (_, _), (ak1, ak2) = _split_one(nk1, nk2)
    u_ground = _uniform_field(rk1, rk2, c)   # shared by packet+dropzone
    u_air = _uniform_field(ak1, ak2, c)

    orig_ground = ground_ref[:].astype(jnp.float32)    # (B, C)
    air_x = ax_ref[:]                                   # (B, N) int32
    air_y = ay_ref[:]
    orig_carrying = carry_ref[:] != 0                   # (B, N) bool
    charge = charge_ref[:]                              # (B, N) f32
    actions = act_ref[:]

    # --- move -------------------------------------------------------------
    dy = jnp.where(actions == Action.UP.value, -1,
                   jnp.where(actions == Action.DOWN.value, 1, 0))
    dx = jnp.where(actions == Action.LEFT.value, -1,
                   jnp.where(actions == Action.RIGHT.value, 1, 0))
    new_y = air_y + dy
    new_x = air_x + dx

    # --- crashes ------------------------------------------------------------
    off_board = (new_y < 0) | (new_y >= g) | (new_x < 0) | (new_x >= g)
    in_y = jnp.clip(new_y, 0, g - 1)
    in_x = jnp.clip(new_x, 0, g - 1)

    def wrap_clamp(i):
        return jnp.clip(jnp.where(i < 0, i + g, i), 0, g - 1)

    sky_cell = _point_read(orig_ground, in_y * g + in_x, c)
    hit_sky = (sky_cell == Object.SKYSCRAPER.value) & ~off_board
    same = (new_x[:, :, None] == new_x[:, None, :]) & (
        new_y[:, :, None] == new_y[:, None, :])
    hit_drone = jnp.sum(same.astype(jnp.float32), axis=2) > 1
    collided = off_board | hit_sky | hit_drone

    target_cell = _point_read(
        orig_ground, wrap_clamp(new_y) * g + wrap_clamp(new_x), c)

    # --- battery -------------------------------------------------------------
    is_charging = (target_cell == Object.STATION.value) & ~collided
    is_discharging = ~is_charging & ~collided
    charge = jnp.clip(charge + is_charging * params.charge, 0, 100)
    charge = jnp.clip(charge - is_discharging * params.discharge, 0, 100)
    out_of_charge = charge == 0
    dones = collided | out_of_charge
    survivors = ~dones
    charge = jnp.where(dones, 100.0, charge)

    # --- pickup ----------------------------------------------------------------
    picked_up = (
        (target_cell == Object.PACKET.value) & survivors & ~orig_carrying)
    lifted = _last_writer_mask(new_y, new_x, picked_up, g, c)
    ground = jnp.where(lifted, 0.0, orig_ground)
    carrying = (orig_carrying & survivors) | picked_up

    # --- delivery -----------------------------------------------------------
    at_dropzone = (target_cell == Object.DROPZONE.value) & survivors
    delivered = at_dropzone & orig_carrying
    carrying = carrying & ~delivered

    # --- respawn packets (k rounds; 0-fill slots are no-ops) -----------------
    needs_packet = delivered | (dones & orig_carrying)
    zero_fill = jnp.zeros((block, 1), jnp.float32)
    scores = _sentinel_scores(u_ground, ground == 0, c)
    fills_p = [
        (needs_packet[:, s : s + 1] * float(Object.PACKET.value)
         if s < n else zero_fill)
        for s in range(k_spawn)
    ]
    ground, _ = _spawn_rounds(scores, ground, fills_p, cell, c)

    # --- respawn dropzones (same uniform field — key-reuse quirk) -------------
    consumed = _last_writer_mask(new_y, new_x, delivered, g, c)
    ground = jnp.where(consumed, 0.0, ground)
    scores_d = _sentinel_scores(u_ground, ground == 0, c)
    fills_d = [
        (delivered[:, s : s + 1] * float(Object.DROPZONE.value)
         if s < n else zero_fill)
        for s in range(k_spawn)
    ]
    ground, _ = _spawn_rounds(scores_d, ground, fills_d, cell, c)

    # --- rewards ---------------------------------------------------------------
    rewards = (params.crash_reward * dones
               + params.pickup_reward * picked_up
               + params.delivery_reward * delivered
               + params.charge_reward * is_charging).astype(jnp.float32)

    # --- respawn dead drones ------------------------------------------------
    new_x = jnp.where(dones, -1, new_x)
    new_y = jnp.where(dones, -1, new_y)
    # occupancy marked transposed ([x, y]) with -1 wrapping (parity quirk)
    rows = wrap_clamp(new_x)
    cols = wrap_clamp(new_y)
    cell_r = cell // g
    cell_c = cell % g
    occupied = (rows[:, :1] == cell_r) & (cols[:, :1] == cell_c)
    for i in range(1, n):
        occupied = occupied | (
            (rows[:, i : i + 1] == cell_r) & (cols[:, i : i + 1] == cell_c))
    open_cells = ~occupied & (orig_ground != Object.SKYSCRAPER.value)
    scores_a = _sentinel_scores(u_air, open_cells, c)
    neg_inf = jnp.float32(-jnp.inf)
    cand_cols = []
    for i in range(n):
        chosen_idx = _argmax_lowest_index(scores_a, cell, c)
        cand_cols.append(chosen_idx)
        scores_a = jnp.where(cell == chosen_idx, neg_inf, scores_a)
    cand = jnp.concatenate(cand_cols, axis=1)            # (B, N) flat cells
    cand_x = cand // g
    cand_y = cand % g
    new_x = jnp.where(new_x == -1, cand_x, new_x)
    new_y = jnp.where(new_y == -1, cand_y, new_y)

    # --- respawned drones auto-pickup (transposed [x, y] index quirk) --------
    packet_here = (ground == Object.PACKET.value).astype(jnp.float32)
    respawn_pickup = (
        _point_read(packet_here, wrap_clamp(new_x) * g + wrap_clamp(new_y), c)
        > 0
    ) & dones
    carrying = carrying | respawn_pickup
    lifted2 = _last_writer_mask(new_x, new_y, respawn_pickup, g, c)
    ground = jnp.where(lifted2, 0.0, ground)

    out_ground[:] = ground.astype(jnp.int8)
    out_ax[:] = new_x
    out_ay[:] = new_y
    out_carry[:] = carrying.astype(jnp.int8)
    out_charge[:] = charge.astype(jnp.float32)
    out_rew[:] = rewards
    out_done[:] = dones.astype(jnp.int8)


def _block_for(num_envs: int) -> int:
    for b in (_ENV_BLOCK, 128, 64, 32, 16, 8):
        if num_envs % b == 0 and num_envs >= b:
            return b
    return num_envs


def supports(params: EnvParams, num_envs: int) -> bool:
    """Whether the fused kernel covers this configuration."""
    return (
        params.num_cells <= MAX_CELLS
        and params.n_drones <= MAX_DRONES
        and params.num_packets >= params.n_drones
        and num_envs >= 8
    )


@functools.partial(jax.jit, static_argnames=("params", "interpret"))
def step_batch_fused(
    step_key: jax.Array,
    states: EnvState,
    actions: jax.Array,
    params: EnvParams,
    interpret: bool = False,
) -> Tuple[EnvState, jax.Array, jax.Array]:
    """One fused dispatch ==
    ``vmap(step)(jax.random.split(step_key, E), states, actions)``."""
    num_envs = states.charge.shape[0]
    c = params.num_cells
    n = params.n_drones
    block = _block_for(num_envs)
    grid = (num_envs // block,)

    kernel = functools.partial(_step_kernel, params=params, block=block)

    def espec(width):
        # index_map receives (grid_idx, scalar_prefetch_ref)
        return pl.BlockSpec(
            (block, width), lambda i, _key: (i, 0), memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((num_envs, c), jnp.int8),      # ground
        jax.ShapeDtypeStruct((num_envs, n), jnp.int32),     # air_x
        jax.ShapeDtypeStruct((num_envs, n), jnp.int32),     # air_y
        jax.ShapeDtypeStruct((num_envs, n), jnp.int8),      # carrying
        jax.ShapeDtypeStruct((num_envs, n), jnp.float32),   # charge
        jax.ShapeDtypeStruct((num_envs, n), jnp.float32),   # rewards
        jax.ShapeDtypeStruct((num_envs, n), jnp.int8),      # dones
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            espec(c), espec(n), espec(n), espec(n), espec(n), espec(n),
        ],
        out_specs=tuple(
            espec(c) if j == 0 else espec(n) for j in range(7)),
    )

    key_i32 = jax.lax.bitcast_convert_type(
        step_key.astype(jnp.uint32), jnp.int32)

    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(
        key_i32,
        states.ground.reshape(num_envs, c),
        states.air_x,
        states.air_y,
        states.carrying_package.astype(jnp.int8),
        states.charge,
        actions.astype(jnp.int32),
    )
    ground, air_x, air_y, carrying, charge, rewards, dones = outs
    next_state = states.replace(
        ground=ground.reshape(num_envs, params.grid_size, params.grid_size),
        air_x=air_x,
        air_y=air_y,
        carrying_package=carrying != 0,
        charge=charge,
    )
    return next_state, rewards, dones != 0
