"""Transposed (feature-major) fused env step + observation Pallas kernel.

The second-generation fused kernel. Layout: **cells/drones on sublanes,
envs on lanes** — `ground_t` is (C, E) int8, drone fields are (N, E).
This is the natural TPU register layout for this workload: per-drone
scalars occupy one (8, 128) tile per op instead of sixteen, threefry runs
on (1, E) row vectors, and spawn-rank reductions run across sublanes.
Measured against the row-major kernel (ops/step_kernel.py) this cuts VPU
tile traffic ~10x.

Beyond the relayout, two structural wins over step_kernel.py:

* **Observation fusion**: the egocentric window encoder (core.observe,
  `wrapper='window'`) runs inside the same kernel and writes the
  flattened (k·7·7·6, E) learner observation directly — the training
  loop never touches the board grid outside the kernel.
* **Reduced spawn rounds**: only the first `n_drones` respawn slots can
  carry a non-zero fill, so the kernel runs n argmax-and-retire rounds
  (not packets_factor·n) and reproduces the remaining slots' only
  observable effect — zero-fills landing on occupied cells when the
  board has fewer vacant cells than slots — with one strictly-lower-
  triangular matmul that ranks occupied cells by index (the top_k -inf
  tail order) and erases exactly those ranked in [n, k).

Bit-exactness: same contract as step_kernel.py — equal to
``vmap(core.step)(jax.random.split(step_key, E), ...)`` plus
``core.observe_batch(next_state, params, k)`` — asserted in
tests/test_fused_tick.py on CPU (interpret) and exercised compiled on TPU.
One caveat: the observation's charge-fraction channel (``charge / 100``)
may differ from the jnp encoder by 1 ULP — XLA rewrites the divide to a
reciprocal multiply in some fusion contexts but not others, so even two
compilations of the *same* jnp source can disagree there. State, rewards,
dones and every other observation channel are exact.
"""

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dronerl_tpu.constants import Action, Object, NUM_OBS_CHANNELS
from dronerl_tpu.env.types import EnvParams, EnvState
from dronerl_tpu.ops.step_kernel import threefry2x32

MAX_CELLS = 256
MAX_DRONES = 32
_LANE_BLOCK = 1024

_U32 = jnp.uint32


class TState(NamedTuple):
    """EnvState in feature-major layout (leading axis = field, lanes = envs)."""

    ground: jax.Array      # (C, E) int8
    air_x: jax.Array       # (N, E) int32
    air_y: jax.Array       # (N, E) int32
    carrying: jax.Array    # (N, E) int8
    charge: jax.Array      # (N, E) float32


def to_tstate(state: EnvState) -> TState:
    num_envs, g, _ = state.ground.shape
    return TState(
        ground=state.ground.reshape(num_envs, g * g).T,
        air_x=state.air_x.T,
        air_y=state.air_y.T,
        carrying=state.carrying_package.astype(jnp.int8).T,
        charge=state.charge.T,
    )


def from_tstate(tstate: TState, params: EnvParams) -> EnvState:
    g = params.grid_size
    num_envs = tstate.ground.shape[1]
    return EnvState(
        ground=tstate.ground.T.reshape(num_envs, g, g),
        air_x=tstate.air_x.T,
        air_y=tstate.air_y.T,
        carrying_package=tstate.carrying.T != 0,
        charge=tstate.charge.T,
    )


def _split_rows(k1, k2):
    """jax.random.split(key) rows for (1, E) key vectors.

    One threefry pass over a (2, E) count block — the per-hash op count
    is the cost driver in-kernel, not the element count.
    """
    counts = jax.lax.broadcasted_iota(_U32, (2, 1), 0)
    b1, b2 = threefry2x32(k1, k2, jnp.zeros_like(counts), counts)
    return (b1[:1], b2[:1]), (b1[1:], b2[1:])


def _uniform_cells_pair(ka1, ka2, kb1, kb2, num_cells):
    """Two uniform(key, (C,)) fields in ONE threefry pass.

    Equals ``(uniform(ka, (C,)), uniform(kb, (C,)))``: the per-lane keys
    are stacked along sublanes so one 20-round hash covers both fields.
    """
    counts = jax.lax.broadcasted_iota(
        _U32, (2 * num_cells, 1), 0) % _U32(num_cells)
    k1 = jnp.concatenate(
        [jnp.broadcast_to(ka1, (num_cells, ka1.shape[1])),
         jnp.broadcast_to(kb1, (num_cells, kb1.shape[1]))], axis=0)
    k2 = jnp.concatenate(
        [jnp.broadcast_to(ka2, (num_cells, ka2.shape[1])),
         jnp.broadcast_to(kb2, (num_cells, kb2.shape[1]))], axis=0)
    b1, b2 = threefry2x32(k1, k2, jnp.zeros_like(counts), counts)
    bits = b1 ^ b2
    fbits = (bits >> _U32(9)) | _U32(0x3F800000)
    u = jax.lax.bitcast_convert_type(fbits, jnp.float32) - 1.0
    return u[:num_cells], u[num_cells:]


def _tick_kernel(key_ref, ground_ref, ax_ref, ay_ref, carry_ref, charge_ref,
                 act_ref, out_ground, out_ax, out_ay, out_carry, out_charge,
                 out_rew, out_done, out_obs, *, params: EnvParams,
                 collect: int, block: int):
    g = params.grid_size
    c = params.num_cells
    n = params.n_drones
    k_spawn = params.num_packets
    r = params.window_radius
    w = 2 * r + 1
    cell = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)
    cell_f = cell.astype(jnp.float32)
    neg_inf = jnp.float32(-jnp.inf)

    def wrap_clamp(i):
        return jnp.clip(jnp.where(i < 0, i + g, i), 0, g - 1)

    def row(x, i):
        return x[i : i + 1, :]

    def point_read(field, flat_idx_row):
        """field (C, E) read at (1, E) indices → (1, E)."""
        sel = cell == flat_idx_row
        return jnp.sum(jnp.where(sel, field, 0.0), axis=0, keepdims=True)

    def argmax_lowest(scores):
        best = jnp.max(scores, axis=0, keepdims=True)
        return jnp.min(
            jnp.where(scores == best, cell, c), axis=0, keepdims=True)

    def last_writer_mask(rows_d, cols_d, flags):
        """zeros.at[rows, cols].set(flags): wrap, drop OOB, last wins."""
        rows_w = jnp.where(rows_d < 0, rows_d + g, rows_d)
        cols_w = jnp.where(cols_d < 0, cols_d + g, cols_d)
        valid = (rows_w >= 0) & (rows_w < g) & (cols_w >= 0) & (cols_w < g)
        flat = rows_w * g + cols_w
        writes = (cell == row(flat, 0)) & row(valid, 0)
        mask = writes & row(flags, 0)
        for i in range(1, n):
            writes = (cell == row(flat, i)) & row(valid, i)
            mask = (writes & row(flags, i)) | (~writes & mask)
        return mask

    def sentinel(u, valid):
        return jnp.where(valid, u, -1.0 - cell_f)

    # Strictly-lower-triangular ones: rank-by-index among a mask via matmul.
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
        < jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    ).astype(jnp.float32)

    def ground_respawn(ground, u, fill_rows):
        """n argmax rounds + tail-erase == the reference's k-slot spawn."""
        vac = ground == 0
        n_vacant = jnp.sum(vac.astype(jnp.float32), axis=0, keepdims=True)
        occ = (~vac).astype(jnp.float32)
        rank_occ = jax.lax.dot_general(
            tri, occ, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        overall = rank_occ + n_vacant  # occupied cell's top_k rank
        erase = (~vac) & (overall >= float(n)) & (overall < float(k_spawn))
        scores = sentinel(u, vac)
        for fill in fill_rows:
            chosen = cell == argmax_lowest(scores)
            ground = jnp.where(chosen, fill, ground)
            scores = jnp.where(chosen, neg_inf, scores)
        return jnp.where(erase, 0.0, ground)

    # --- per-env PRNG keys: rows of jax.random.split(step_key, E) ----------
    env0 = pl.program_id(0) * block
    counts = (env0 + jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)).astype(
        _U32)
    sk1 = key_ref[0].astype(_U32)
    sk2 = key_ref[1].astype(_U32)
    ek1, ek2 = threefry2x32(
        jnp.full((1, block), sk1, _U32), jnp.full((1, block), sk2, _U32),
        jnp.zeros_like(counts), counts)
    (nk1, nk2), (rk1, rk2) = _split_rows(ek1, ek2)
    (_, _), (ak1, ak2) = _split_rows(nk1, nk2)
    # u_ground is shared by the packet AND dropzone respawns (key quirk).
    u_ground, u_air = _uniform_cells_pair(rk1, rk2, ak1, ak2, c)

    orig_ground = ground_ref[:].astype(jnp.float32)     # (C, B)
    air_x = ax_ref[:]                                    # (N, B)
    air_y = ay_ref[:]
    orig_carrying = carry_ref[:] != 0
    charge = charge_ref[:]
    actions = act_ref[:]

    # --- move ----------------------------------------------------------------
    dy = jnp.where(actions == Action.UP.value, -1,
                   jnp.where(actions == Action.DOWN.value, 1, 0))
    dx = jnp.where(actions == Action.LEFT.value, -1,
                   jnp.where(actions == Action.RIGHT.value, 1, 0))
    new_y = air_y + dy
    new_x = air_x + dx

    # --- crashes -----------------------------------------------------------
    off_board = (new_y < 0) | (new_y >= g) | (new_x < 0) | (new_x >= g)
    flat_in = jnp.clip(new_y, 0, g - 1) * g + jnp.clip(new_x, 0, g - 1)
    flat_wc = wrap_clamp(new_y) * g + wrap_clamp(new_x)
    sky_rows = []
    tgt_rows = []
    for i in range(n):
        sky_rows.append(point_read(orig_ground, row(flat_in, i)))
        tgt_rows.append(point_read(orig_ground, row(flat_wc, i)))
    sky_cell = jnp.concatenate(sky_rows, axis=0)          # (N, B)
    target_cell = jnp.concatenate(tgt_rows, axis=0)
    hit_sky = (sky_cell == Object.SKYSCRAPER.value) & ~off_board
    conflicts = []
    for i in range(n):
        same_i = None
        for j in range(n):
            if j == i:
                continue
            s = (row(new_x, i) == row(new_x, j)) & (
                row(new_y, i) == row(new_y, j))
            same_i = s if same_i is None else (same_i | s)
        conflicts.append(same_i.astype(jnp.float32))
    # concat in f32: Mosaic cannot concatenate i1 vectors along sublanes
    hit_drone = jnp.concatenate(conflicts, axis=0) > 0
    collided = off_board | hit_sky | hit_drone

    # --- battery ---------------------------------------------------------------
    is_charging = (target_cell == Object.STATION.value) & ~collided
    is_discharging = ~is_charging & ~collided
    charge = jnp.clip(charge + is_charging * params.charge, 0, 100)
    charge = jnp.clip(charge - is_discharging * params.discharge, 0, 100)
    dones = collided | (charge == 0)
    survivors = ~dones
    charge = jnp.where(dones, 100.0, charge)

    # --- pickup / delivery ------------------------------------------------------
    picked_up = (
        (target_cell == Object.PACKET.value) & survivors & ~orig_carrying)
    lifted = last_writer_mask(new_y, new_x, picked_up)
    ground = jnp.where(lifted, 0.0, orig_ground)
    carrying = (orig_carrying & survivors) | picked_up
    at_dropzone = (target_cell == Object.DROPZONE.value) & survivors
    delivered = at_dropzone & orig_carrying
    carrying = carrying & ~delivered

    # --- packet + dropzone respawns (shared uniform field — key quirk) ----------
    needs_packet = delivered | (dones & orig_carrying)
    fills_p = [
        row(needs_packet, s) * float(Object.PACKET.value) for s in range(n)]
    ground = ground_respawn(ground, u_ground, fills_p)
    consumed = last_writer_mask(new_y, new_x, delivered)
    ground = jnp.where(consumed, 0.0, ground)
    fills_d = [
        row(delivered, s) * float(Object.DROPZONE.value) for s in range(n)]
    ground = ground_respawn(ground, u_ground, fills_d)

    # --- rewards ------------------------------------------------------------------
    rewards = (params.crash_reward * dones
               + params.pickup_reward * picked_up
               + params.delivery_reward * delivered
               + params.charge_reward * is_charging).astype(jnp.float32)

    # --- respawn dead drones (occupancy marked transposed; -1 wraps) -------------
    new_x = jnp.where(dones, -1, new_x)
    new_y = jnp.where(dones, -1, new_y)
    occ_flat = wrap_clamp(new_x) * g + wrap_clamp(new_y)
    occupied = cell == row(occ_flat, 0)
    for i in range(1, n):
        occupied = occupied | (cell == row(occ_flat, i))
    open_cells = ~occupied & (orig_ground != Object.SKYSCRAPER.value)
    scores_a = sentinel(u_air, open_cells)
    cand_rows = []
    for i in range(n):
        chosen_idx = argmax_lowest(scores_a)
        cand_rows.append(chosen_idx)
        scores_a = jnp.where(cell == chosen_idx, neg_inf, scores_a)
    cand = jnp.concatenate(cand_rows, axis=0)              # (N, B)
    new_x = jnp.where(new_x == -1, cand // g, new_x)
    new_y = jnp.where(new_y == -1, cand % g, new_y)

    # --- respawned drones auto-pickup (transposed [x, y] quirk) -------------------
    packet_here = (ground == Object.PACKET.value).astype(jnp.float32)
    flat_t = wrap_clamp(new_x) * g + wrap_clamp(new_y)
    rp_rows = [point_read(packet_here, row(flat_t, i)) for i in range(n)]
    respawn_pickup = (jnp.concatenate(rp_rows, axis=0) > 0) & dones
    carrying = carrying | respawn_pickup
    lifted2 = last_writer_mask(new_x, new_y, respawn_pickup)
    ground = jnp.where(lifted2, 0.0, ground)

    # --- observation encoder (core._observe_window, fused) ------------------------
    # Per-cell charge field: drones sit on distinct cells; charge + 1 marks
    # presence (reference: jax_impl/env/env.py:282-283).
    charge_cells = jnp.where(cell == row(new_y, 0) * g + row(new_x, 0),
                             row(charge, 0) + 1.0, 0.0)
    for i in range(1, n):
        charge_cells = jnp.where(
            cell == row(new_y, i) * g + row(new_x, i),
            row(charge, i) + 1.0, charge_cells)
    # Pack ground code and per-cell charge into one field (code·128 + chg,
    # both small non-negative integers) so every window position costs a
    # single point-read over the cell axis instead of two.
    packed = ground * 128.0 + charge_cells
    for i in range(collect):
        cy = row(new_y, i)
        cx = row(new_x, i)
        carrying_i = row(carrying, i)
        for p in range(w * w):
            dy_p = p // w - r
            dx_p = p % w - r
            wy = cy + dy_p
            wx = cx + dx_p
            inside = (wy >= 0) & (wy < g) & (wx >= 0) & (wx < g)
            flat = jnp.clip(wy, 0, g - 1) * g + jnp.clip(wx, 0, g - 1)
            val = point_read(packed, flat)
            code = jnp.floor(val * (1.0 / 128.0))
            chg = val - code * 128.0
            code = jnp.where(inside, code, float(Object.SKYSCRAPER.value))
            chg = jnp.where(inside, chg, 0.0)
            base = (i * w * w + p) * NUM_OBS_CHANNELS
            is_packet = code == Object.PACKET.value
            if dy_p == 0 and dx_p == 0:
                is_packet = is_packet | carrying_i
            out_obs[base + 0 : base + 1, :] = (chg > 0).astype(jnp.float32)
            out_obs[base + 1 : base + 2, :] = is_packet.astype(jnp.float32)
            out_obs[base + 2 : base + 3, :] = (
                code == Object.DROPZONE.value).astype(jnp.float32)
            out_obs[base + 3 : base + 4, :] = (
                code == Object.STATION.value).astype(jnp.float32)
            out_obs[base + 4 : base + 5, :] = (
                jnp.clip(chg - 1.0, 0, 100) / 100.0)
            out_obs[base + 5 : base + 6, :] = (
                code == Object.SKYSCRAPER.value).astype(jnp.float32)

    out_ground[:] = ground.astype(jnp.int8)
    out_ax[:] = new_x
    out_ay[:] = new_y
    out_carry[:] = carrying.astype(jnp.int8)
    out_charge[:] = charge
    out_rew[:] = rewards
    out_done[:] = dones.astype(jnp.int8)


def _block_for(num_envs: int) -> int:
    for b in (_LANE_BLOCK, 512, 256, 128):
        if num_envs % b == 0 and num_envs >= b:
            return b
    return num_envs


def supports(params: EnvParams, num_envs: int) -> bool:
    return (
        params.wrapper == "window"
        and params.num_cells <= MAX_CELLS
        and params.n_drones <= MAX_DRONES
        and params.num_packets >= params.n_drones
        and num_envs >= 128
    )


@functools.partial(
    jax.jit, static_argnames=("params", "collect", "interpret", "vma"))
def tick_fused(
    step_key: jax.Array,
    tstate: TState,
    actions_t: jax.Array,
    params: EnvParams,
    collect: int = 1,
    interpret: bool = False,
    vma: Tuple[str, ...] = (),
) -> Tuple[TState, jax.Array, jax.Array, jax.Array]:
    """Fused step + observe on transposed state.

    Returns ``(tstate', rewards (N, E) f32, dones (N, E) bool,
    obs_t (collect·w·w·6, E) f32)`` — bit-identical to the jnp
    step_batch + observe_batch pipeline.
    """
    c = params.num_cells
    n = params.n_drones
    num_envs = tstate.ground.shape[1]
    obs_rows = collect * params.obs_shape[0] * params.obs_shape[1] * (
        NUM_OBS_CHANNELS)
    block = _block_for(num_envs)
    grid = (num_envs // block,)

    kernel = functools.partial(
        _tick_kernel, params=params, collect=collect, block=block)

    def spec(rows):
        return pl.BlockSpec(
            (rows, block), lambda i, _key: (0, i), memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[spec(c), spec(n), spec(n), spec(n), spec(n), spec(n)],
        out_specs=(
            spec(c), spec(n), spec(n), spec(n), spec(n), spec(n), spec(n),
            spec(obs_rows),
        ),
    )
    # Inside shard_map, pallas outputs must declare how they vary over
    # mesh axes (vma) — the caller passes its mesh axis names.
    kw = {"vma": frozenset(vma)} if vma else {}
    out_shapes = (
        jax.ShapeDtypeStruct((c, num_envs), jnp.int8, **kw),
        jax.ShapeDtypeStruct((n, num_envs), jnp.int32, **kw),
        jax.ShapeDtypeStruct((n, num_envs), jnp.int32, **kw),
        jax.ShapeDtypeStruct((n, num_envs), jnp.int8, **kw),
        jax.ShapeDtypeStruct((n, num_envs), jnp.float32, **kw),
        jax.ShapeDtypeStruct((n, num_envs), jnp.float32, **kw),
        jax.ShapeDtypeStruct((n, num_envs), jnp.int8, **kw),
        jax.ShapeDtypeStruct((obs_rows, num_envs), jnp.float32, **kw),
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
        tstate.ground, tstate.air_x, tstate.air_y, tstate.carrying,
        tstate.charge, actions_t.astype(jnp.int32),
    )
    ground, air_x, air_y, carrying, charge, rewards, dones, obs_t = outs
    return (
        TState(ground, air_x, air_y, carrying, charge),
        rewards,
        dones != 0,
        obs_t,
    )
