"""Transposed (feature-major) fused env step + observation Pallas kernels.

The second-generation fused engine. Layout: **cells/drones on sublanes,
envs on lanes** — `ground_t` is (C, E) int8, drone fields are (N, E).
This is the natural TPU register layout for this workload: per-drone
scalars occupy one (8, 128) tile per op instead of sixteen, threefry runs
on (1, E) row vectors, and spawn-rank reductions run across sublanes.
Measured against the row-major kernel (ops/step_kernel.py) this cuts VPU
tile traffic ~10x.

Two kernels share one physics/observation body:

* :func:`tick_fused` — step + observe; actions come from the caller.
* :func:`full_tick_fused` — the ENTIRE training tick's environment side
  in one dispatch: in-kernel ε-greedy actor (dense Q-network forward on
  the MXU + opponent sampling), step physics, respawns, observation
  encoding, and the periodic env reset under a predicated `pl.when`
  branch. Optionally writes observations straight into the replay ring
  (aliased in/out buffer, cursor-indexed block maps) so the trainer never
  materializes or copies an observation tensor.

Structural wins over the row-major kernel:

* **Observation fusion**: the egocentric window encoder (core.observe,
  `wrapper='window'`) runs in-kernel and emits the flattened
  (k·7·7·6, E) learner observation.
* **Reduced spawn rounds**: only the first `n_drones` respawn slots can
  carry a non-zero fill, so the kernel runs n argmax-and-retire rounds
  (not packets_factor·n) and reproduces the remaining slots' only
  observable effect — zero-fills landing on occupied cells when the
  board has fewer vacant cells than slots — with one strictly-lower-
  triangular matmul that ranks occupied cells by index (the top_k -inf
  tail order) and erases exactly those ranked in [n, k).
* **Single-reduce spawn rounds** (≤128-cell boards): each round's
  argmax-with-index-tie-break is ONE max-reduce over an int32 composite
  of the uniform's raw mantissa bits and the cell index (see _Picker) —
  selection order provably identical to the float path.
* **Separable window encoder**: each of the 2r+1 window rows is
  extracted once (masked sum over the g grid-row slices of the packed
  code+charge field), then every window column is a g-term select —
  ~5× less VPU work than per-position full-grid point reads, with
  bit-identical outputs (every sum has at most one non-zero term).

Bit-exactness: the env-side contract equals
``vmap(core.step)(jax.random.split(step_key, E), ...)`` plus
``core.observe_batch(next_state, params, k)`` — asserted in
tests/test_fused_tick.py on CPU (interpret) and exercised compiled on TPU.
The in-kernel reset equals ``core.reset_batch(reset_key, params, E)``.
One caveat: the observation's charge-fraction channel (``charge / 100``)
may differ from the jnp encoder by 1 ULP — XLA rewrites the divide to a
reciprocal multiply in some fusion contexts but not others, so even two
compilations of the *same* jnp source can disagree there. State, rewards,
dones and every other observation channel are exact.

Trainer-level RNG contract of :func:`full_tick_fused` (NOT parity-locked;
the reference locks only the env's own key consumption): with
``S = jax.random.split(step_key, E + 2)``, env e steps with key ``S[e]``
(identical to the jnp trainer), the actor draws its (N+1, E) uniform
field from key ``S[E]`` (row 0 gates exploration, rows 1..N are
per-drone random actions via ``floor(u * NUM_ACTIONS)``), and the
periodic reset uses ``core.reset_batch`` semantics with base key
``S[E+1]``.
"""

import functools
import math
import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dronerl_tpu.constants import (
    Action, Object, NUM_ACTIONS, NUM_OBS_CHANNELS)
from dronerl_tpu.env.types import EnvParams, EnvState
from dronerl_tpu.ops.step_kernel import threefry2x32

MAX_CELLS = 256
MAX_DRONES = 32
_LANE_BLOCK = 1024
# Lane-block cap for the all-in-one kernels (actor + physics + obs [+
# ring]). Ablation showed the step is pipeline-bound, not compute-bound:
# per-grid-step overhead dominates, so fewer/bigger blocks win as long
# as the block fits VMEM (see PERF.md "Kernel ablation").
_FULL_KERNEL_MAX_BLOCK = 512

# The default Mosaic scoped-VMEM budget (~16MB) caps the full kernels at
# 512-lane blocks; the chip has far more VMEM, and the step is pipeline-
# bound (fewer, bigger blocks win), so the full/ring kernels request a
# higher cap. Tuned on v5e — override with DRONERL_VMEM_LIMIT_BYTES on
# chip generations with less scoped VMEM (0 = keep the Mosaic default).
_VMEM_LIMIT = 100 * 1024 * 1024

def _compiler_params(raise_vmem: bool = True):
    limit = int(os.environ.get("DRONERL_VMEM_LIMIT_BYTES",
                               _VMEM_LIMIT if raise_vmem else 0))
    if limit <= 0:
        return pltpu.CompilerParams()
    return pltpu.CompilerParams(vmem_limit_bytes=limit)


def _net_weight_vmem_budget() -> int:
    """Fail-fast cap for the actor weight chain (dense widths or im2col
    conv matrices): it must leave at least half the kernel's *effective*
    VMEM limit free for the obs blocks and env state also pinned in
    VMEM. Tracks the DRONERL_VMEM_LIMIT_BYTES override so the guard and
    the actual Mosaic budget cannot disagree (0/unset-to-default = the
    ~16MB Mosaic default when the raised cap is disabled)."""
    limit = int(os.environ.get("DRONERL_VMEM_LIMIT_BYTES", _VMEM_LIMIT))
    if limit <= 0:
        limit = 16 * 1024 * 1024
    return limit // 2

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


def _split_rows(k1, k2, rounds=20):
    """jax.random.split(key) rows for (1, E) key vectors.

    One threefry pass over a (2, E) count block — the per-hash op count
    is the cost driver in-kernel, not the element count.
    """
    counts = jax.lax.broadcasted_iota(_U32, (2, 1), 0)
    b1, b2 = threefry2x32(k1, k2, jnp.zeros_like(counts), counts, rounds)
    return (b1[:1], b2[:1]), (b1[1:], b2[1:])


def _bits_to_unit_float(bits):
    fbits = (bits >> _U32(9)) | _U32(0x3F800000)
    return jax.lax.bitcast_convert_type(fbits, jnp.float32) - 1.0


def _uniform_cells_multi(key_pairs, num_cells, rounds=20, as_bits=False):
    """k uniform(key_i, (C,)) fields in ONE threefry pass.

    ``key_pairs``: sequence of ((1,E),(1,E)) uint32 word pairs. Equals
    ``[jax.random.uniform(key_i, (C,)) for i]`` per lane.

    ``as_bits=True`` returns the raw 23-bit mantissa integers (int32)
    instead of floats. The float is ``bitcast(bits|0x3f800000) - 1`` —
    strictly monotone in the bits — so any selection by score order is
    identical on either representation, and the integer form composites
    with the cell index for single-reduce argmax rounds (_GridOps).
    """
    m = len(key_pairs)
    counts = jax.lax.broadcasted_iota(
        _U32, (m * num_cells, 1), 0) % _U32(num_cells)
    width = key_pairs[0][0].shape[1]
    k1 = jnp.concatenate(
        [jnp.broadcast_to(ka, (num_cells, width)) for ka, _ in key_pairs],
        axis=0)
    k2 = jnp.concatenate(
        [jnp.broadcast_to(kb, (num_cells, width)) for _, kb in key_pairs],
        axis=0)
    b1, b2 = threefry2x32(k1, k2, jnp.zeros_like(counts), counts, rounds)
    bits = b1 ^ b2
    if as_bits:
        u = (bits >> _U32(9)).astype(jnp.int32)
    else:
        u = _bits_to_unit_float(bits)
    return [u[i * num_cells : (i + 1) * num_cells] for i in range(m)]


class _GridOps:
    """Per-kernel helper closures over the static geometry."""

    def __init__(self, params: EnvParams, block: int, rounds: int = 20):
        self.params = params
        self.rounds = rounds
        self.g = params.grid_size
        self.c = params.num_cells
        self.n = params.n_drones
        self.block = block
        self.cell = jax.lax.broadcasted_iota(jnp.int32, (self.c, 1), 0)
        self.cell_f = self.cell.astype(jnp.float32)
        self.neg_inf = jnp.float32(-jnp.inf)
        # Integer-composite spawn selection (boards ≤ 128 cells): score
        # and index tie-break packed into one int32 so each argmax-and-
        # retire round is ONE max-reduce (see _Picker). Larger boards
        # fall back to the float two-reduce path.
        self.int_spawn = self.c <= 128
        self.idx_tag = 127 - self.cell  # (c, 1) int32, low 7 bits
        # Strictly-lower-triangular ones: index-rank among a mask via matmul.
        self.tri = (
            jax.lax.broadcasted_iota(jnp.int32, (self.c, self.c), 1)
            < jax.lax.broadcasted_iota(jnp.int32, (self.c, self.c), 0)
        ).astype(jnp.float32)

    def wrap_clamp(self, i):
        g = self.g
        return jnp.clip(jnp.where(i < 0, i + g, i), 0, g - 1)

    @staticmethod
    def row(x, i):
        return x[i : i + 1, :]

    def point_read(self, field, flat_idx_row):
        """field (C, E) read at (1, E) indices → (1, E).

        Deliberately ONE compare+select+reduce over the full cell axis: a
        two-stage row-extract/column-select variant (like the window
        encoder's) was measured 19% SLOWER end-to-end — for a single
        read the 7× op-count increase outweighs the 3× tile savings
        (per-op overhead dominates small-shape Mosaic code). The window
        encoder's version wins only because 2r+1 columns share each
        extracted row.
        """
        sel = self.cell == flat_idx_row
        return jnp.sum(jnp.where(sel, field, 0.0), axis=0, keepdims=True)

    def argmax_lowest(self, scores):
        best = jnp.max(scores, axis=0, keepdims=True)
        return jnp.min(
            jnp.where(scores == best, self.cell, self.c),
            axis=0, keepdims=True)

    def last_writer_mask(self, rows_d, cols_d, flags):
        """zeros.at[rows, cols].set(flags): wrap, drop OOB, last wins."""
        return self.last_writer_masks(rows_d, cols_d, (flags,))[0]

    def last_writer_masks(self, rows_d, cols_d, flags_list):
        """Several .at[rows, cols].set(flags_k) masks sharing ONE set of
        per-drone cell compares (the compares dominate the cost)."""
        g = self.g
        rows_w = jnp.where(rows_d < 0, rows_d + g, rows_d)
        cols_w = jnp.where(cols_d < 0, cols_d + g, cols_d)
        valid = (rows_w >= 0) & (rows_w < g) & (cols_w >= 0) & (cols_w < g)
        flat = rows_w * g + cols_w
        writes = (self.cell == self.row(flat, 0)) & self.row(valid, 0)
        masks = [writes & self.row(flags, 0) for flags in flags_list]
        for i in range(1, self.n):
            writes = (self.cell == self.row(flat, i)) & self.row(valid, i)
            masks = [
                (writes & self.row(flags, i)) | (~writes & mask)
                for flags, mask in zip(flags_list, masks)
            ]
        return masks

    def shared_cells(self, rows_d, cols_d):
        """The n per-drone cell-axis compare masks for one (rows, cols)
        coordinate set, computed ONCE and shared by every point read and
        last-writer scatter at those coordinates (the (C, B) compares
        dominate both costs; round-5 measured ~halving the physics
        read/scatter budget)."""
        return _SharedCells(self, rows_d, cols_d)

    def sentinel(self, u, valid):
        """where(valid, u, -inf) with the tail totally ordered by index:
        invalid cells score -1 - index, below every u ∈ [0, 1)."""
        return jnp.where(valid, u, -1.0 - self.cell_f)

    def picker(self, u, valid):
        return _Picker(self, u, valid)

    def ground_respawn(self, ground, u, fill_rows):
        """n argmax rounds + tail-erase == the reference's k-slot spawn."""
        n = self.n
        k_spawn = self.params.num_packets
        vac = ground == 0
        n_vacant = jnp.sum(vac.astype(jnp.float32), axis=0, keepdims=True)
        occ = (~vac).astype(jnp.float32)
        rank_occ = jax.lax.dot_general(
            self.tri, occ, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        overall = rank_occ + n_vacant  # occupied cell's top_k rank
        erase = (~vac) & (overall >= float(n)) & (overall < float(k_spawn))
        pick = self.picker(u, vac)
        for fill in fill_rows:
            chosen, _ = pick.next()
            ground = jnp.where(chosen, fill, ground)
        return jnp.where(erase, 0.0, ground)

    def constant_fill_spawn(self, ground, u, code, count):
        """k rounds with one constant non-zero fill (the reset spawns)."""
        pick = self.picker(u, ground == 0)
        for _ in range(count):
            chosen, _ = pick.next()
            ground = jnp.where(chosen, float(code), ground)
        return ground

    def air_spawn(self, u, air_x, air_y, exclude_ground):
        """place_in_air: candidates for -1-sentinel drones (transposed
        occupancy quirk); returns updated (air_x, air_y)."""
        g = self.g
        occ_flat = self.wrap_clamp(air_x) * g + self.wrap_clamp(air_y)
        occupied = self.cell == self.row(occ_flat, 0)
        for i in range(1, self.n):
            occupied = occupied | (self.cell == self.row(occ_flat, i))
        open_cells = ~occupied & (
            exclude_ground != Object.SKYSCRAPER.value)
        pick = self.picker(u, open_cells)
        cand_rows = []
        for _ in range(self.n):
            _, chosen_idx = pick.next()
            cand_rows.append(chosen_idx)
        cand = jnp.concatenate(cand_rows, axis=0)          # (N, B)
        new_x = jnp.where(air_x == -1, cand // g, air_x)
        new_y = jnp.where(air_y == -1, cand % g, air_y)
        return new_x, new_y


class _Picker:
    """Iterated argmax-and-retire over spawn scores.

    Integer mode (≤128-cell boards): the score is the uniform's raw
    23-bit mantissa composited with an index tag, ``(u23 << 7) |
    (127 - idx)`` — score order is identical to the float order (the
    float is a strictly monotone map of the bits) and the tag makes
    every cell's composite unique, so one max-reduce both selects the
    winner and breaks ties toward the LOWEST index exactly like
    ``top_k``'s stable order. Invalid cells sit in a
    ``-(1<<30) + tag`` band (ordered by index, below all valid);
    retired cells drop to an ``INT32_MIN + tag`` band below that —
    reproducing the reference's -inf ladder semantics. Float mode is
    the original two-reduce path (kept for big boards).
    """

    def __init__(self, ops: "_GridOps", u, valid):
        self.ops = ops
        if ops.int_spawn:
            self.comp = jnp.where(
                valid, (u << 7) | ops.idx_tag,
                ops.idx_tag - jnp.int32(1 << 30))
        else:
            self.scores = ops.sentinel(u, valid)

    def next(self):
        ops = self.ops
        if ops.int_spawn:
            best = jnp.max(self.comp, axis=0, keepdims=True)
            chosen = self.comp == best  # composites are unique per cell
            # bands are multiples of 128, so the tag survives the & 127
            idx = 127 - (best & 127)
            self.comp = jnp.where(
                chosen, ops.idx_tag + jnp.int32(-(1 << 31)), self.comp)
        else:
            idx = ops.argmax_lowest(self.scores)
            chosen = ops.cell == idx
            self.scores = jnp.where(chosen, ops.neg_inf, self.scores)
        return chosen, idx


class _SharedCells:
    """Shared per-drone cell compares for one coordinate set.

    ``sels[i]`` is ``cell == wrap_clamp(rows_i) * g + wrap_clamp(cols_i)``
    — exactly the compare both :meth:`_GridOps.point_read` (at the
    wrap-clamped flat index) and :meth:`_GridOps.last_writer_masks`
    perform per drone. Reads re-use it as the select mask; scatters AND
    it with ``valid`` (out-of-range coordinates must read the clamped
    cell but never write), which reproduces the unclamped-compare-AND-
    valid mask bit-exactly: when valid the clamp is the identity, when
    invalid both forms are all-False.
    """

    def __init__(self, ops: _GridOps, rows_d, cols_d):
        g = ops.g
        rows_w = jnp.where(rows_d < 0, rows_d + g, rows_d)
        cols_w = jnp.where(cols_d < 0, cols_d + g, cols_d)
        self.ops = ops
        self.valid = (rows_w >= 0) & (rows_w < g) & (cols_w >= 0) & (
            cols_w < g)
        flat = (jnp.clip(rows_w, 0, g - 1) * g
                + jnp.clip(cols_w, 0, g - 1))
        self.sels = [ops.cell == ops.row(flat, i) for i in range(ops.n)]

    def read(self, field):
        """point_read(field, wrap_clamped flat) for every drone → (N, B)."""
        rows = [
            jnp.sum(jnp.where(sel, field, 0.0), axis=0, keepdims=True)
            for sel in self.sels]
        return jnp.concatenate(rows, axis=0)

    def scatter_masks(self, flags_list):
        """last_writer_masks(rows, cols, flags_list) on the shared sels."""
        ops = self.ops
        writes = self.sels[0] & ops.row(self.valid, 0)
        masks = [writes & ops.row(flags, 0) for flags in flags_list]
        for i in range(1, ops.n):
            writes = self.sels[i] & ops.row(self.valid, i)
            masks = [
                (writes & ops.row(flags, i)) | (~writes & mask)
                for flags, mask in zip(flags_list, masks)
            ]
        return masks


def _physics_and_observe(ops: _GridOps, collect: int, u_ground, u_air,
                         orig_ground, air_x, air_y, orig_carrying, charge,
                         actions):
    """One env step + window observations on (rows, B) blocks.

    Returns ``(ground, new_x, new_y, carrying, charge, rewards, dones,
    obs_rows)`` where obs_rows is a list of collect·w·w·6 (1, B) f32 rows
    in the flattened observation order.
    """
    params = ops.params
    g, c, n = ops.g, ops.c, ops.n
    row = ops.row
    cell = ops.cell

    # --- move ----------------------------------------------------------
    dy = jnp.where(actions == Action.UP.value, -1,
                   jnp.where(actions == Action.DOWN.value, 1, 0))
    dx = jnp.where(actions == Action.LEFT.value, -1,
                   jnp.where(actions == Action.RIGHT.value, 1, 0))
    new_y = air_y + dy
    new_x = air_x + dx

    # --- crashes ---------------------------------------------------------
    off_board = (new_y < 0) | (new_y >= g) | (new_x < 0) | (new_x >= g)
    # ONE set of per-drone cell compares serves the target reads here AND
    # the pickup/delivery scatter masks below (identical coordinates).
    tgt = ops.shared_cells(new_y, new_x)
    target_cell = tgt.read(orig_ground)                   # (N, B)
    # The skyscraper check is the target read masked on-board: the
    # reference reads ground at the CLIPPED coordinates but only counts
    # a hit when the move stayed on the board, where clip == wrap_clamp
    # == identity — so the separate clipped read is redundant.
    hit_sky = (target_cell == Object.SKYSCRAPER.value) & ~off_board
    # Same-cell conflicts on a composite position key: 256 > any
    # coordinate spread, so key equality == coordinate-pair equality
    # (raw/unwrapped coordinates, matching the reference's pairwise
    # compare). Each sublane roll compares all n (i, i+s mod n) pairs in
    # one (N, B) op — n-1 ops instead of n(n-1) row-pair compares.
    pos_key = new_x * 256 + new_y                         # (N, B) int32
    hit_drone = None
    for s in range(1, n):
        rolled = jnp.concatenate([pos_key[s:], pos_key[:s]], axis=0)
        same = pos_key == rolled
        hit_drone = same if hit_drone is None else (hit_drone | same)
    if hit_drone is None:                                 # n == 1
        hit_drone = jnp.zeros_like(off_board)
    collided = off_board | hit_sky | hit_drone

    # --- battery ------------------------------------------------------------
    is_charging = (target_cell == Object.STATION.value) & ~collided
    is_discharging = ~is_charging & ~collided
    charge = jnp.clip(charge + is_charging * params.charge, 0, 100)
    charge = jnp.clip(charge - is_discharging * params.discharge, 0, 100)
    dones = collided | (charge == 0)
    survivors = ~dones
    charge = jnp.where(dones, 100.0, charge)

    # --- pickup / delivery ---------------------------------------------------
    picked_up = (
        (target_cell == Object.PACKET.value) & survivors & ~orig_carrying)
    carrying = (orig_carrying & survivors) | picked_up
    at_dropzone = (target_cell == Object.DROPZONE.value) & survivors
    delivered = at_dropzone & orig_carrying
    # Scatter masks on the compares already paid for by the target read.
    lifted, consumed = tgt.scatter_masks((picked_up, delivered))
    ground = jnp.where(lifted, 0.0, orig_ground)
    carrying = carrying & ~delivered

    # --- packet + dropzone respawns (shared uniform field — key quirk) --------
    needs_packet = delivered | (dones & orig_carrying)
    fills_p = [
        row(needs_packet, s) * float(Object.PACKET.value) for s in range(n)]
    ground = ops.ground_respawn(ground, u_ground, fills_p)
    ground = jnp.where(consumed, 0.0, ground)
    fills_d = [
        row(delivered, s) * float(Object.DROPZONE.value) for s in range(n)]
    ground = ops.ground_respawn(ground, u_ground, fills_d)

    # --- rewards ----------------------------------------------------------------
    rewards = (params.crash_reward * dones
               + params.pickup_reward * picked_up
               + params.delivery_reward * delivered
               + params.charge_reward * is_charging).astype(jnp.float32)

    # --- respawn dead drones (occupancy marked transposed; -1 wraps) -----------
    new_x = jnp.where(dones, -1, new_x)
    new_y = jnp.where(dones, -1, new_y)
    new_x, new_y = ops.air_spawn(u_air, new_x, new_y, orig_ground)

    # --- respawned drones auto-pickup (transposed [x, y] quirk) -----------------
    # One compare set again serves both the packet read and the lift
    # scatter; reading the ground code directly and comparing == PACKET
    # equals reading a precomputed 0/1 packet field (integer codes are
    # exact in f32), skipping the full-grid packet_here compare too.
    rp = ops.shared_cells(new_x, new_y)
    respawn_pickup = (rp.read(ground) == Object.PACKET.value) & dones
    carrying = carrying | respawn_pickup
    (lifted2,) = rp.scatter_masks((respawn_pickup,))
    ground = jnp.where(lifted2, 0.0, ground)

    obs_rows = _encode_obs(ops, collect, ground, new_x, new_y, carrying,
                           charge)
    return ground, new_x, new_y, carrying, charge, rewards, dones, obs_rows


def _encode_obs(ops: _GridOps, collect: int, ground, air_x, air_y, carrying,
                charge):
    """core.observe fused: collect·obs rows of (1, B) f32 (window/global)."""
    if ops.params.wrapper == "global":
        return _encode_obs_global(
            ops, collect, ground, air_x, air_y, carrying, charge)
    return _encode_obs_window(
        ops, collect, ground, air_x, air_y, carrying, charge)


def _encode_obs_global(ops: _GridOps, collect: int, ground, air_x, air_y,
                       carrying, charge):
    """core._observe_global fused: the full-grid 6-channel view.

    Every drone sees the same grid (reference GridView semantics,
    reference: torch_impl/env/wrappers.py:34-43); flattened row order is
    (y, x, channel) with channel fastest, matching
    ``observe_batch(...).reshape(E, -1)`` bit-exactly (drone scatters are
    sequential per-drone writes; drones occupy distinct cells in any
    reachable state).
    """
    g, n = ops.g, ops.n
    row = ops.row
    cell = ops.cell

    pos = row(air_y, 0) * g + row(air_x, 0)
    drone_here = cell == pos
    carry_here = drone_here & (row(carrying, 0) > 0)
    charge_here = jnp.where(drone_here, row(charge, 0) * (1.0 / 100.0), 0.0)
    for i in range(1, n):
        pos = row(air_y, i) * g + row(air_x, i)
        here = cell == pos
        drone_here = drone_here | here
        carry_here = carry_here | (here & (row(carrying, i) > 0))
        charge_here = jnp.where(here, row(charge, i) * (1.0 / 100.0),
                                charge_here)

    channels = [
        drone_here.astype(jnp.float32),
        ((ground == Object.PACKET.value) | carry_here).astype(jnp.float32),
        (ground == Object.DROPZONE.value).astype(jnp.float32),
        (ground == Object.STATION.value).astype(jnp.float32),
        charge_here,
        (ground == Object.SKYSCRAPER.value).astype(jnp.float32),
    ]
    cell_rows = []
    for j in range(ops.c):
        for ch in channels:
            cell_rows.append(ch[j : j + 1, :])
    return cell_rows * collect  # identical view per collected drone


def _encode_obs_window(ops: _GridOps, collect: int, ground, air_x, air_y,
                       carrying, charge):
    """core._observe_window fused: collect·w·w·6 rows of (1, B) f32."""
    params = ops.params
    g, n = ops.g, ops.n
    r = params.window_radius
    w = 2 * r + 1
    row = ops.row
    cell = ops.cell

    # Per-cell charge field: drones sit on distinct cells; charge + 1 marks
    # presence (reference: jax_impl/env/env.py:282-283).
    charge_cells = jnp.where(cell == row(air_y, 0) * g + row(air_x, 0),
                             row(charge, 0) + 1.0, 0.0)
    for i in range(1, n):
        charge_cells = jnp.where(
            cell == row(air_y, i) * g + row(air_x, i),
            row(charge, i) + 1.0, charge_cells)
    # Pack ground code and per-cell charge into one field (code·128 + chg,
    # both small non-negative integers) so every window position costs a
    # single point-read over the cell axis instead of two.
    packed = ground * 128.0 + charge_cells
    # Column iota (g, 1): within-row cell x coordinate.
    col = jax.lax.broadcasted_iota(jnp.int32, (g, 1), 0)
    obs_rows = []
    for i in range(collect):
        cy = row(air_y, i)
        cx = row(air_x, i)
        carrying_i = row(carrying, i)
        for p in range(w * w):
            dy_p = p // w - r
            dx_p = p % w - r
            if dx_p == -r:
                # Separable window extraction: materialize grid row
                # (cy+dy) once as (g, B) — a masked sum over the g row
                # slices — then every window column is a g-term select
                # instead of a full c-cell point_read (≈5× less VPU work
                # for the 2r+1 positions sharing this dy).
                wy = cy + dy_p
                grid_row = jnp.zeros((g, 1), jnp.float32) * jnp.zeros(
                    (1, ops.block), jnp.float32)
                for gy in range(g):
                    grid_row = grid_row + jnp.where(
                        wy == gy, packed[gy * g : (gy + 1) * g, :], 0.0)
            wy = cy + dy_p
            wx = cx + dx_p
            inside = (wy >= 0) & (wy < g) & (wx >= 0) & (wx < g)
            # ≤1 nonzero term: the sums reproduce point_read bit-exactly.
            val = jnp.sum(
                jnp.where(col == wx, grid_row, 0.0), axis=0, keepdims=True)
            code = jnp.floor(val * (1.0 / 128.0))
            chg = val - code * 128.0
            code = jnp.where(inside, code, float(Object.SKYSCRAPER.value))
            chg = jnp.where(inside, chg, 0.0)
            is_packet = code == Object.PACKET.value
            if dy_p == 0 and dx_p == 0:
                is_packet = is_packet | carrying_i
            obs_rows.extend([
                (chg > 0).astype(jnp.float32),
                is_packet.astype(jnp.float32),
                (code == Object.DROPZONE.value).astype(jnp.float32),
                (code == Object.STATION.value).astype(jnp.float32),
                jnp.clip(chg - 1.0, 0, 100) / 100.0,
                (code == Object.SKYSCRAPER.value).astype(jnp.float32),
            ])
    return obs_rows


def _reset_envs(ops: _GridOps, rk1, rk2):
    """core.reset for every lane, given per-env reset keys (1, B) words.

    Matches core.reset's key-consumption order exactly: four chained
    splits for the ground spawns, one more for the air spawn.
    """
    params = ops.params
    g, c, n = ops.g, ops.c, ops.n
    block = ops.block
    k1, k2 = rk1, rk2
    placement_pairs = []
    for _ in range(5):
        (k1, k2), (p1, p2) = _split_rows_wide(k1, k2, ops.rounds)
        placement_pairs.append((p1, p2))
    us = _uniform_cells_multi(
        placement_pairs, c, ops.rounds, as_bits=ops.int_spawn)

    ground = jnp.zeros((c, 1), jnp.float32) * jnp.zeros((1, block), jnp.float32)
    for (count, code), u in zip(
        ((params.num_packets, Object.PACKET.value),
         (params.num_dropzones, Object.DROPZONE.value),
         (params.num_stations, Object.STATION.value),
         (params.num_skyscrapers, Object.SKYSCRAPER.value)),
        us[:4],
    ):
        ground = ops.constant_fill_spawn(ground, u, code, count)

    sentinel_coords = jnp.full((n, block), -1, jnp.int32)
    air_x, air_y = ops.air_spawn(
        us[4], sentinel_coords, sentinel_coords, ground)

    # auto-pickup without reward ([y, x] — NOT transposed at reset).
    # Fresh spawns are always in-range, so the shared wrap-clamped
    # compares equal the raw flat-index reads; one compare set serves
    # both the packet reads and the lift scatter.
    sc = ops.shared_cells(air_y, air_x)
    carrying = sc.read(ground) == Object.PACKET.value
    (lifted,) = sc.scatter_masks((carrying,))
    ground = jnp.where(lifted, 0.0, ground)
    charge = jnp.full((n, block), 100.0, jnp.float32)
    return ground, air_x, air_y, carrying, charge


def _split_rows_wide(k1, k2, rounds=20):
    """_split_rows for (1, B) per-lane DISTINCT keys (reset chains)."""
    zeros = jnp.zeros_like(k1)
    counts0 = zeros
    counts1 = jnp.ones_like(k1)
    b1, b2 = threefry2x32(
        jnp.concatenate([k1, k1], axis=0),
        jnp.concatenate([k2, k2], axis=0),
        jnp.concatenate([counts0, counts0], axis=0).astype(_U32),
        jnp.concatenate([counts0, counts1], axis=0).astype(_U32), rounds)
    return (b1[:1], b2[:1]), (b1[1:], b2[1:])


def _tick_kernel(key_ref, ground_ref, ax_ref, ay_ref, carry_ref, charge_ref,
                 act_ref, out_ground, out_ax, out_ay, out_carry, out_charge,
                 out_rew, out_done, out_obs, *, params: EnvParams,
                 collect: int, block: int, rng_rounds: int = 20):
    ops = _GridOps(params, block, rng_rounds)
    c = params.num_cells

    # --- per-env PRNG keys: rows of jax.random.split(step_key, E) --------
    env0 = pl.program_id(0) * block
    counts = (env0 + jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)).astype(
        _U32)
    sk1 = key_ref[0].astype(_U32)
    sk2 = key_ref[1].astype(_U32)
    ek1, ek2 = threefry2x32(
        jnp.full((1, block), sk1, _U32), jnp.full((1, block), sk2, _U32),
        jnp.zeros_like(counts), counts, rng_rounds)
    (nk1, nk2), (rk1, rk2) = _split_rows(ek1, ek2, rng_rounds)
    (_, _), (ak1, ak2) = _split_rows(nk1, nk2, rng_rounds)
    # u_ground is shared by the packet AND dropzone respawns (key quirk).
    u_ground, u_air = _uniform_cells_multi(
        [(rk1, rk2), (ak1, ak2)], c, rng_rounds, as_bits=ops.int_spawn)

    results = _physics_and_observe(
        ops, collect, u_ground, u_air,
        ground_ref[:].astype(jnp.float32),
        ax_ref[:], ay_ref[:], carry_ref[:] != 0, charge_ref[:], act_ref[:])
    ground, new_x, new_y, carrying, charge, rewards, dones, obs_rows = results

    out_ground[:] = ground.astype(jnp.int8)
    out_ax[:] = new_x
    out_ay[:] = new_y
    out_carry[:] = carrying.astype(jnp.int8)
    out_charge[:] = charge
    out_rew[:] = rewards
    out_done[:] = dones.astype(jnp.int8)
    out_obs[:] = jnp.concatenate(obs_rows, axis=0).astype(out_obs.dtype)


def _q_forward(obs, weight_refs):
    """Dense Q forward on a (D, B) block → (A, B). weight_refs: list of
    (kernel_ref (in,out), bias_ref (out,1)) pairs, flax parameter layout."""
    x = obs
    n_layers = len(weight_refs)
    for idx, (w_ref, b_ref) in enumerate(weight_refs):
        x = jax.lax.dot_general(
            w_ref[:], x, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        x = x + b_ref[:]
        if idx < n_layers - 1:
            x = jnp.maximum(x, 0.0)
    return x


def _full_kernel(sp_ref, obs_in_ref, ground_ref, ax_ref, ay_ref, carry_ref,
                 charge_ref, eps_ref, *rest, params: EnvParams, collect: int,
                 block: int, num_envs: int, n_layers: int,
                 rng_rounds: int = 20, actor_rng_rounds=None,
                 td_hparams=None):
    # rest = [W_0, b_0, ..., W_{L-1}, b_{L-1}],
    #        with td_hparams also [Wt, bt]*L, [mu]*2L, [nu]*2L,
    #        batch obs/next_obs/actions/rewards/dones,
    #        then the outputs:
    #        [out_ground, out_ax, out_ay, out_carry, out_charge,
    #         out_rew, out_done, out_actions, out_obs]
    #        (+ td: [p_out]*2L, [mu_out]*2L, [nu_out]*2L, out_loss)
    td = td_hparams is not None
    weight_refs = [
        (rest[2 * i], rest[2 * i + 1]) for i in range(n_layers)]
    pos = 2 * n_layers
    if td:
        tgt_flat = rest[pos:pos + 2 * n_layers]
        mu_flat = rest[pos + 2 * n_layers:pos + 4 * n_layers]
        nu_flat = rest[pos + 4 * n_layers:pos + 6 * n_layers]
        pos += 6 * n_layers
        bobs_ref, bnext_ref, bact_ref, brew_ref, bdone_ref = (
            rest[pos:pos + 5])
        pos += 5
    outs = rest[pos:]
    (out_ground, out_ax, out_ay, out_carry, out_charge, out_rew, out_done,
     out_actions, out_obs) = outs[:9]
    if td:
        p_out_flat = outs[9:9 + 2 * n_layers]
        mu_out_flat = outs[9 + 2 * n_layers:9 + 4 * n_layers]
        nu_out_flat = outs[9 + 4 * n_layers:9 + 6 * n_layers]
        out_loss = outs[9 + 6 * n_layers]

    ops = _GridOps(params, block, rng_rounds)
    c = params.num_cells
    n = params.n_drones
    obs_dim = params.obs_shape[0] * params.obs_shape[1] * NUM_OBS_CHANNELS

    env0 = pl.program_id(0) * block
    lane_counts = (
        env0 + jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)).astype(_U32)
    sk1 = sp_ref[0].astype(_U32)
    sk2 = sp_ref[1].astype(_U32)
    sk1_b = jnp.full((1, block), sk1, _U32)
    sk2_b = jnp.full((1, block), sk2, _U32)
    ek1, ek2 = threefry2x32(
        sk1_b, sk2_b, jnp.zeros_like(lane_counts), lane_counts, rng_rounds)
    # rows E (actor) and E+1 (reset base) of split(step_key, E + 2)
    extra_counts = (
        jax.lax.broadcasted_iota(jnp.int32, (2, 1), 0) + num_envs
    ).astype(_U32)
    x1, x2 = threefry2x32(
        jnp.full((2, 1), sk1, _U32), jnp.full((2, 1), sk2, _U32),
        jnp.zeros_like(extra_counts), extra_counts, rng_rounds)
    actor_k = (x1[0:1], x2[0:1])
    reset_base = (x1[1:2], x2[1:2])

    (nk1, nk2), (rk1, rk2) = _split_rows(ek1, ek2, rng_rounds)
    (_, _), (ak1, ak2) = _split_rows(nk1, nk2, rng_rounds)
    u_ground, u_air = _uniform_cells_multi(
        [(rk1, rk2), (ak1, ak2)], c, rng_rounds, as_bits=ops.int_spawn)

    # --- in-kernel ε-greedy actor + random opponents ----------------------
    # (N+1, B) uniforms from the actor key: row 0 gates exploration, rows
    # 1..N are per-drone random actions floor(u * A).
    act_counts = (
        jax.lax.broadcasted_iota(jnp.int32, (n + 1, block), 0) * num_envs
        + env0
        + jax.lax.broadcasted_iota(jnp.int32, (n + 1, block), 1)
    ).astype(_U32)
    # The actor/opponent uniform field is trainer-level noise, not part
    # of the env parity contract (module docstring): it may run fewer
    # threefry rounds than the env's contractual 20 (hybrid RNG,
    # VERDICT-r3 item 6). Everything upstream (per-env step keys, spawn
    # uniforms, the reset chain) stays at ``rng_rounds``.
    ab1, ab2 = threefry2x32(
        actor_k[0], actor_k[1], jnp.zeros_like(act_counts), act_counts,
        rng_rounds if actor_rng_rounds is None else actor_rng_rounds)
    u_act = _bits_to_unit_float(ab1 ^ ab2)
    rand_actions = jnp.floor(u_act[1:] * float(NUM_ACTIONS)).astype(jnp.int32)
    rand_actions = jnp.clip(rand_actions, 0, NUM_ACTIONS - 1)

    # Cast covers bf16 rings: the actor always computes in f32 (the MXU
    # rounds f32 operands to bf16 internally anyway, so a bf16-stored
    # observation loses nothing here).
    q = _q_forward(
        obs_in_ref[0:obs_dim, :].astype(jnp.float32), weight_refs)  # (A, B)
    best = jnp.max(q, axis=0, keepdims=True)
    arow = jax.lax.broadcasted_iota(jnp.int32, (NUM_ACTIONS, 1), 0)
    greedy = jnp.min(
        jnp.where(q == best, arow, NUM_ACTIONS), axis=0, keepdims=True)
    epsilon = eps_ref[0, 0]
    explore = u_act[0:1] < epsilon
    a0 = jnp.where(explore, rand_actions[0:1], greedy)
    actions = jnp.concatenate([a0, rand_actions[1:]], axis=0)  # (N, B)

    results = _physics_and_observe(
        ops, collect, u_ground, u_air,
        ground_ref[:].astype(jnp.float32),
        ax_ref[:], ay_ref[:], carry_ref[:] != 0, charge_ref[:], actions)
    ground, new_x, new_y, carrying, charge, rewards, dones, obs_rows = results

    out_rew[:] = rewards
    out_done[:] = dones.astype(jnp.int8)
    out_actions[:] = actions

    do_reset = sp_ref[5] != 0

    @pl.when(jnp.logical_not(do_reset))
    def _():
        out_ground[:] = ground.astype(jnp.int8)
        out_ax[:] = new_x
        out_ay[:] = new_y
        out_carry[:] = carrying.astype(jnp.int8)
        out_charge[:] = charge
        # One full-block store (cast to the ring dtype — bf16 rings halve
        # the per-step HBM write, see build_train_step_ring's obs_dtype).
        out_obs[:] = jnp.concatenate(obs_rows, axis=0).astype(out_obs.dtype)

    @pl.when(do_reset)
    def _():
        # per-env reset keys: rows of split(reset_base, E)
        rb1, rb2 = threefry2x32(
            jnp.broadcast_to(reset_base[0], (1, block)),
            jnp.broadcast_to(reset_base[1], (1, block)),
            jnp.zeros_like(lane_counts), lane_counts, rng_rounds)
        f_ground, f_x, f_y, f_carry, f_charge = _reset_envs(ops, rb1, rb2)
        fresh_obs = _encode_obs(
            ops, collect, f_ground, f_x, f_y, f_carry, f_charge)
        out_ground[:] = f_ground.astype(jnp.int8)
        out_ax[:] = f_x
        out_ay[:] = f_y
        out_carry[:] = f_carry.astype(jnp.int8)
        out_charge[:] = f_charge
        out_obs[:] = jnp.concatenate(fresh_obs, axis=0).astype(out_obs.dtype)

    if td:
        # --- in-kernel TD(0) + Adam (round-5) --------------------------
        # The XLA-side learner is tiny math spread over ~40 fusions —
        # measured 128 µs/step of pure sequencing (PERF.md round-5
        # budget). Here it rides grid step 0 of the env kernel, whose
        # per-block critical path it barely extends. Math mirrors
        # ops/learner_kernel.py (numerics-tested vs DQN.train_step_t);
        # the batch is sampled BEFORE the dispatch (the documented
        # sample_before_kernel semantics), and sp[4] gates the update:
        # when 0 every state array passes through unchanged and the loss
        # is the no-train sentinel (train.NO_TRAIN_LOSS == -1.0).
        if os.environ.get("DRONERL_TD_PASSTHROUGH") == "1":
            # Measurement-only ablation: keep every TD operand and output
            # but skip the learner compute — isolates the operand/
            # write-back overhead from the math (scripts usage only).
            @pl.when(pl.program_id(0) == 0)
            def _():
                for i in range(2 * n_layers):
                    p_out_flat[i][:] = weight_refs[i // 2][i % 2][:]
                    mu_out_flat[i][:] = mu_flat[i][:]
                    nu_out_flat[i][:] = nu_flat[i][:]
                out_loss[:] = jnp.zeros((1, 1), jnp.float32)
            return

        @pl.when(pl.program_id(0) == 0)
        def _():
            gamma, lr, b1, b2, adam_eps = td_hparams
            target_refs = [
                (tgt_flat[2 * i], tgt_flat[2 * i + 1])
                for i in range(n_layers)]
            can_train = sp_ref[4] != 0

            def forward(x, weights):
                acts = [x]
                h = x
                for idx, (w_ref, b_ref) in enumerate(weights):
                    h = jax.lax.dot_general(
                        w_ref[:], h, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32) + b_ref[:]
                    if idx < n_layers - 1:
                        h = jnp.maximum(h, 0.0)
                    acts.append(h)
                return acts

            bsz = bobs_ref.shape[1]
            acts = forward(bobs_ref[:], weight_refs)      # [x, h1, .., q]
            q_b = acts[-1]                                # (A, Bt)
            next_q = forward(bnext_ref[:], target_refs)[-1]
            arow_b = jax.lax.broadcasted_iota(
                jnp.int32, (NUM_ACTIONS, 1), 0)
            onehot_a = (arow_b == bact_ref[:]).astype(jnp.float32)
            taken = jnp.sum(q_b * onehot_a, axis=0, keepdims=True)
            bootstrap = jnp.max(next_q, axis=0, keepdims=True)
            tgt = brew_ref[:] + gamma * bootstrap * (1.0 - bdone_ref[:])
            delta = taken - tgt
            loss = jnp.sum(delta * delta, axis=1, keepdims=True) * (
                1.0 / bsz)

            # d(mean(delta²))/dq = onehot · 2·delta/Bt (exact: Bt is a
            # power of two), then standard dense backprop.
            gout = onehot_a * (delta * (2.0 / bsz))
            grads = [None] * n_layers
            for idx in range(n_layers - 1, -1, -1):
                a_prev = acts[idx]
                dw = jax.lax.dot_general(
                    a_prev, gout, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)   # (in, out)
                db = jnp.sum(gout, axis=1, keepdims=True)  # (out, 1)
                grads[idx] = (dw, db)
                if idx > 0:
                    gin = jax.lax.dot_general(
                        weight_refs[idx][0][:], gout,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    gout = gin * (a_prev > 0)

            # Adam (optax scale_by_adam formulas; bias-correction powers
            # via exp/log like ops/learner_kernel.py — count rides sp[6]).
            cf = (sp_ref[6] + 1).astype(jnp.float32)
            bc1 = 1.0 - jnp.exp(cf * jnp.log(jnp.float32(b1)))
            bc2 = 1.0 - jnp.exp(cf * jnp.log(jnp.float32(b2)))
            for idx in range(n_layers):
                for j in range(2):
                    g = grads[idx][j]
                    p_ref = weight_refs[idx][j]
                    m_ref = mu_flat[2 * idx + j]
                    v_ref = nu_flat[2 * idx + j]
                    m = b1 * m_ref[:] + (1 - b1) * g
                    v = b2 * v_ref[:] + (1 - b2) * g * g
                    upd = (m / bc1) / (jnp.sqrt(v / bc2) + adam_eps)
                    p_out_flat[2 * idx + j][:] = jnp.where(
                        can_train, p_ref[:] - lr * upd, p_ref[:])
                    mu_out_flat[2 * idx + j][:] = jnp.where(
                        can_train, m, m_ref[:])
                    nu_out_flat[2 * idx + j][:] = jnp.where(
                        can_train, v, v_ref[:])
            out_loss[:] = jnp.where(can_train, loss, -1.0)


def _block_for(num_envs: int, max_block: int = _LANE_BLOCK) -> int:
    for b in (max_block, 512, 256, 128):
        if b <= max_block and num_envs % b == 0 and num_envs >= b:
            return b
    return num_envs


def supports(params: EnvParams, num_envs: int) -> bool:
    return (
        params.wrapper in ("window", "global")
        and params.num_cells <= MAX_CELLS
        and params.n_drones <= MAX_DRONES
        and params.num_packets >= params.n_drones
        and num_envs >= 128
    )


@functools.partial(
    jax.jit,
    static_argnames=("params", "collect", "interpret", "vma", "rng_rounds"))
def tick_fused(
    step_key: jax.Array,
    tstate: TState,
    actions_t: jax.Array,
    params: EnvParams,
    collect: int = 1,
    interpret: bool = False,
    vma: Tuple[str, ...] = (),
    rng_rounds: int = 20,
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
        _tick_kernel, params=params, collect=collect, block=block,
        rng_rounds=rng_rounds)

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
        # The env-only tick fits the default scoped-VMEM budget; only the
        # full/ring kernels need the raised cap (ADVICE r2: keep other
        # chip generations on the default where it sufficed).
        compiler_params=_compiler_params(raise_vmem=False),
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


def _flatten_dense_params(net_params) -> Tuple[list, int]:
    """flax dense param pytree → [W0, b0(out,1), W1, b1, ...], n_layers."""
    layers = net_params["params"]
    n_layers = len(layers)
    flat = []
    for idx in range(n_layers):
        layer = layers[f"Dense_{idx}"]
        flat.append(layer["kernel"].astype(jnp.float32))
        flat.append(layer["bias"].astype(jnp.float32)[:, None])
    return flat, n_layers


def _flatten_net_params(net_params, net_spec) -> Tuple[list, int]:
    """Network params → the kernel's [W0, b0, W1, b1, ...] matmul chain.

    ``net_spec`` is the static layer descriptor from
    ``conv2mat.net_layer_specs`` (None = all-dense). Conv layers lower to
    im2col weight matrices OUTSIDE the kernel (one small scatter per
    tick); the in-kernel actor then runs the identical dense path for
    every network type.
    """
    if net_spec is None:
        return _flatten_dense_params(net_params)
    from dronerl_tpu.ops import conv2mat

    # The whole weight chain sits in VMEM per grid block; an oversized
    # im2col lowering (large grids / global obs / deep stacks) must fail
    # readably here — before the matrices are even built, covering every
    # engine call site — instead of dying inside Mosaic with an opaque
    # allocation error. eval_shape keeps the size check free.
    shapes = jax.eval_shape(
        lambda p: conv2mat.effective_dense_params(p, net_spec), net_params)
    weight_bytes = sum(
        4 * (math.prod(w.shape) + math.prod(b.shape)) for w, b in shapes)
    budget = _net_weight_vmem_budget()
    if weight_bytes > budget:
        raise ValueError(
            f"conv_matmul weight chain is {weight_bytes / 2**20:.1f} MB "
            f"(f32) > {budget / 2**20:.0f} MB in-kernel "
            f"budget — the im2col matrices for this conv config don't fit "
            f"scoped VMEM next to the obs blocks; use the fused engine "
            f"without --conv_matmul (conv actor in XLA) instead")
    chain = conv2mat.effective_dense_params(net_params, net_spec)
    flat = []
    for w, b in chain:
        flat.append(w)
        flat.append(b)
    return flat, len(chain)


@functools.partial(
    jax.jit,
    static_argnames=("params", "collect", "interpret", "vma", "rng_rounds",
                     "net_spec", "actor_rng_rounds"))
def full_tick_fused(
    step_key: jax.Array,
    tstate: TState,
    obs_t: jax.Array,
    net_params,
    epsilon: jax.Array,
    do_reset: jax.Array,
    params: EnvParams,
    collect: int = 1,
    interpret: bool = False,
    vma: Tuple[str, ...] = (),
    rng_rounds: int = 20,
    net_spec=None,
    actor_rng_rounds=None,
):
    """The whole env side of a training tick in one dispatch.

    In-kernel: ε-greedy actor (dense nets), random opponents, step
    physics, respawns, observation encoding, and — when ``do_reset`` —
    a full env reset (``core.reset_batch(S[E+1], params, E)``) replacing
    the stepped state and observations.

    Returns ``(tstate', rewards (N, E), dones (N, E) bool,
    actions (N, E) int32, obs_t' (collect·w·w·6, E))``.
    """
    c = params.num_cells
    n = params.n_drones
    num_envs = tstate.ground.shape[1]
    obs_rows = collect * params.obs_shape[0] * params.obs_shape[1] * (
        NUM_OBS_CHANNELS)
    # The predicated reset branch adds ~5 uniform fields + a second obs
    # encoding to the kernel's live set; halve the lane block to stay
    # under the 16MB scoped-VMEM limit.
    block = _block_for(num_envs, max_block=_FULL_KERNEL_MAX_BLOCK)
    grid = (num_envs // block,)
    flat_params, n_layers = _flatten_net_params(net_params, net_spec)

    kernel = functools.partial(
        _full_kernel, params=params, collect=collect, block=block,
        num_envs=num_envs, n_layers=n_layers, rng_rounds=rng_rounds,
        actor_rng_rounds=actor_rng_rounds)

    def spec(rows):
        return pl.BlockSpec(
            (rows, block), lambda i, _sp: (0, i), memory_space=pltpu.VMEM)

    def wspec(arr):
        return pl.BlockSpec(
            arr.shape, lambda i, _sp: (0, 0), memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[spec(obs_rows), spec(c), spec(n), spec(n), spec(n),
                  spec(n),
                  pl.BlockSpec((1, 1), lambda i, _sp: (0, 0),
                               memory_space=pltpu.VMEM)]
                 + [wspec(a) for a in flat_params],
        out_specs=(
            spec(c), spec(n), spec(n), spec(n), spec(n), spec(n), spec(n),
            spec(n), spec(obs_rows),
        ),
    )
    kw = {"vma": frozenset(vma)} if vma else {}
    out_shapes = (
        jax.ShapeDtypeStruct((c, num_envs), jnp.int8, **kw),
        jax.ShapeDtypeStruct((n, num_envs), jnp.int32, **kw),
        jax.ShapeDtypeStruct((n, num_envs), jnp.int32, **kw),
        jax.ShapeDtypeStruct((n, num_envs), jnp.int8, **kw),
        jax.ShapeDtypeStruct((n, num_envs), jnp.float32, **kw),
        jax.ShapeDtypeStruct((n, num_envs), jnp.float32, **kw),
        jax.ShapeDtypeStruct((n, num_envs), jnp.int8, **kw),
        jax.ShapeDtypeStruct((n, num_envs), jnp.int32, **kw),
        jax.ShapeDtypeStruct((obs_rows, num_envs), jnp.float32, **kw),
    )
    key_u32 = step_key.astype(jnp.uint32)
    sp = jnp.stack([
        jax.lax.bitcast_convert_type(key_u32[0], jnp.int32),
        jax.lax.bitcast_convert_type(key_u32[1], jnp.int32),
        jnp.int32(0),
        jnp.int32(0),
        jnp.int32(0),
        do_reset.astype(jnp.int32),
    ])
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(
        sp,
        obs_t, tstate.ground, tstate.air_x, tstate.air_y, tstate.carrying,
        tstate.charge,
        epsilon.astype(jnp.float32).reshape(1, 1), *flat_params,
    )
    (ground, air_x, air_y, carrying, charge, rewards, dones, actions,
     obs_next) = outs
    return (
        TState(ground, air_x, air_y, carrying, charge),
        rewards,
        dones != 0,
        actions,
        obs_next,
    )


def _unflatten_dense(flat) -> dict:
    """[W0, b0(out,1), W1, b1, ...] → flax dense param pytree."""
    out = {}
    for idx in range(len(flat) // 2):
        out[f"Dense_{idx}"] = {
            "kernel": flat[2 * idx],
            "bias": flat[2 * idx + 1][:, 0],
        }
    return {"params": out}


@functools.partial(
    jax.jit,
    static_argnames=("params", "collect", "interpret", "rng_rounds",
                     "net_spec", "actor_rng_rounds", "td_hparams"))
def full_tick_fused_ring(
    step_key: jax.Array,
    tstate: TState,
    obs_ring: jax.Array,
    read_slot: jax.Array,
    write_slot: jax.Array,
    net_params,
    epsilon: jax.Array,
    do_reset: jax.Array,
    params: EnvParams,
    collect: int = 1,
    interpret: bool = False,
    rng_rounds: int = 20,
    net_spec=None,
    actor_rng_rounds=None,
    td_hparams=None,
    td_batch=None,
    td_aux=None,
):
    """:func:`full_tick_fused` writing observations straight into the
    replay ring.

    ``obs_ring`` is the (obs_rows, capacity) replay storage; the kernel
    reads this tick's input observation from the lane slice starting at
    ``read_slot`` and writes the next observation at ``write_slot``
    (both multiples of num_envs; the buffer is aliased in/out so nothing
    is copied). Returns ``(tstate', rewards, dones, actions, obs_ring')``.

    With ``td_hparams`` (static ``(gamma, lr, b1, b2, eps)``) the TD(0)
    + Adam learner ALSO runs in-kernel on grid step 0 (dense nets only):
    ``td_batch`` is the pre-sampled replay batch (obs/next_obs
    (obs_dim·k?, Bt) feature-major, actions/rewards/dones (Bt,)) and
    ``td_aux = (target_params, mu, nu, can_train, count)`` the learner
    state. The return gains ``(new_params, new_mu, new_nu, loss)`` —
    selected through unchanged when ``can_train`` is false (loss is the
    no-train sentinel). Math mirrors ops/learner_kernel.py /
    DQN.train_step_t; see the kernel comment for the measured rationale.
    """
    c = params.num_cells
    n = params.n_drones
    num_envs = tstate.ground.shape[1]
    obs_rows = collect * params.obs_shape[0] * params.obs_shape[1] * (
        NUM_OBS_CHANNELS)
    capacity = obs_ring.shape[1]
    block = _block_for(num_envs, max_block=_FULL_KERNEL_MAX_BLOCK)
    grid = (num_envs // block,)
    flat_params, n_layers = _flatten_net_params(net_params, net_spec)
    td = td_hparams is not None
    if td and net_spec is not None:
        raise ValueError("in-kernel TD supports dense networks only")

    kernel = functools.partial(
        _full_kernel, params=params, collect=collect, block=block,
        num_envs=num_envs, n_layers=n_layers, rng_rounds=rng_rounds,
        actor_rng_rounds=actor_rng_rounds, td_hparams=td_hparams)

    def spec(rows):
        return pl.BlockSpec(
            (rows, block), lambda i, _sp: (0, i), memory_space=pltpu.VMEM)

    def wspec(arr):
        return pl.BlockSpec(
            arr.shape, lambda i, _sp: (0, 0), memory_space=pltpu.VMEM)

    td_inputs = []
    td_in_specs = []
    td_out_specs = ()
    td_out_shapes = ()
    can_train = count = None
    if td:
        target_params, mu_tree, nu_tree, can_train, count = td_aux
        flat_target, _ = _flatten_net_params(target_params, None)
        flat_mu, _ = _flatten_net_params(mu_tree, None)
        flat_nu, _ = _flatten_net_params(nu_tree, None)
        batch_ops = [
            td_batch["obs"].astype(jnp.float32),
            td_batch["next_obs"].astype(jnp.float32),
            td_batch["actions"].astype(jnp.int32).reshape(1, -1),
            td_batch["rewards"].astype(jnp.float32).reshape(1, -1),
            td_batch["dones"].astype(jnp.float32).reshape(1, -1),
        ]
        td_inputs = flat_target + flat_mu + flat_nu + batch_ops
        td_in_specs = [wspec(a) for a in td_inputs]
        td_out_specs = tuple(wspec(a) for a in flat_params * 3) + (
            pl.BlockSpec((1, 1), lambda i, _sp: (0, 0),
                         memory_space=pltpu.VMEM),)
        td_out_shapes = tuple(
            jax.ShapeDtypeStruct(a.shape, jnp.float32)
            for a in flat_params * 3) + (
            jax.ShapeDtypeStruct((1, 1), jnp.float32),)

    # The ring's lane-block offsets ride the scalar-prefetch args: sp[2]
    # is the read block, sp[3] the write block (in lane-block units).
    ring_in_spec = pl.BlockSpec(
        (obs_rows, block), lambda i, sp: (0, sp[2] + i),
        memory_space=pltpu.VMEM)
    ring_out_spec = pl.BlockSpec(
        (obs_rows, block), lambda i, sp: (0, sp[3] + i),
        memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[ring_in_spec, spec(c), spec(n), spec(n), spec(n),
                  spec(n),
                  pl.BlockSpec((1, 1), lambda i, _sp: (0, 0),
                               memory_space=pltpu.VMEM)]
                 + [wspec(a) for a in flat_params] + td_in_specs,
        out_specs=(
            spec(c), spec(n), spec(n), spec(n), spec(n), spec(n), spec(n),
            spec(n), ring_out_spec,
        ) + td_out_specs,
    )
    out_shapes = (
        jax.ShapeDtypeStruct((c, num_envs), jnp.int8),
        jax.ShapeDtypeStruct((n, num_envs), jnp.int32),
        jax.ShapeDtypeStruct((n, num_envs), jnp.int32),
        jax.ShapeDtypeStruct((n, num_envs), jnp.int8),
        jax.ShapeDtypeStruct((n, num_envs), jnp.float32),
        jax.ShapeDtypeStruct((n, num_envs), jnp.float32),
        jax.ShapeDtypeStruct((n, num_envs), jnp.int8),
        jax.ShapeDtypeStruct((n, num_envs), jnp.int32),
        jax.ShapeDtypeStruct((obs_rows, capacity), obs_ring.dtype),
    ) + td_out_shapes
    key_u32 = step_key.astype(jnp.uint32)
    sp = jnp.stack([
        jax.lax.bitcast_convert_type(key_u32[0], jnp.int32),
        jax.lax.bitcast_convert_type(key_u32[1], jnp.int32),
        (read_slot // block).astype(jnp.int32),
        (write_slot // block).astype(jnp.int32),
        can_train.astype(jnp.int32) if td else jnp.int32(0),
        do_reset.astype(jnp.int32),
        count.astype(jnp.int32) if td else jnp.int32(0),
        jnp.int32(0),
    ])
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        # The ring is donated: input 1 (after the scalar-prefetch arg)
        # becomes output 8. Unvisited blocks keep their contents.
        input_output_aliases={1: 8},
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(
        sp,
        obs_ring, tstate.ground, tstate.air_x, tstate.air_y,
        tstate.carrying, tstate.charge,
        epsilon.astype(jnp.float32).reshape(1, 1), *flat_params,
        *td_inputs,
    )
    (ground, air_x, air_y, carrying, charge, rewards, dones, actions,
     ring_out) = outs[:9]
    result = (
        TState(ground, air_x, air_y, carrying, charge),
        rewards,
        dones != 0,
        actions,
        ring_out,
    )
    if not td:
        return result
    td_outs = outs[9:]
    l2 = 2 * n_layers
    new_params = _unflatten_dense(td_outs[:l2])
    new_mu = _unflatten_dense(td_outs[l2:2 * l2])
    new_nu = _unflatten_dense(td_outs[2 * l2:3 * l2])
    loss = td_outs[3 * l2][0, 0]
    return result + (new_params, new_mu, new_nu, loss)


# --- XLA-side companions of the ring kernel --------------------------------
# The single-chip trainer (train.build_train_step_ring) and the sharded
# trainer (parallel.distributed, per-shard under shard_map) drive the ring
# kernel with identical slot arithmetic; these two helpers are that shared
# logic, so the engines cannot silently diverge.

def ring_scalar_writes(a_ring, r_ring, d_ring, actions_t, rewards_t,
                       dones_t, read_slot, collect: int):
    """Record this tick's scalars at the slot of its input observation.

    ``collect`` == 1 keeps the historical flat (capacity,) ring shapes;
    k > 1 rings carry a leading k axis and store all k drones'
    transitions per column.
    """
    if collect == 1:
        a_ring = jax.lax.dynamic_update_slice(
            a_ring, actions_t[0], (read_slot,))
        r_ring = jax.lax.dynamic_update_slice(
            r_ring, rewards_t[0], (read_slot,))
        d_ring = jax.lax.dynamic_update_slice(
            d_ring, dones_t[0].astype(jnp.int8), (read_slot,))
    else:
        k = collect
        a_ring = jax.lax.dynamic_update_slice(
            a_ring, actions_t[:k], (0, read_slot))
        r_ring = jax.lax.dynamic_update_slice(
            r_ring, rewards_t[:k], (0, read_slot))
        d_ring = jax.lax.dynamic_update_slice(
            d_ring, dones_t[:k].astype(jnp.int8), (0, read_slot))
    return a_ring, r_ring, d_ring


def ring_gather_batch(sample_key, ring, a_ring, r_ring, d_ring, valid,
                      base_step, *, num_envs: int, capacity: int,
                      batch_size: int, collect: int, obs_dim: int):
    """Uniform replay sample straight off the aliased ring buffers.

    Draws over ``valid`` complete columns starting at ``base_step``'s
    slot; next_obs is the following slot (the kernel wrote it this tick).
    ``collect`` = k > 1 samples batch_size//k column indices per drone
    row-group so every obs gather keeps a static row slice (no dynamic
    rows inside jit).
    """
    k = collect
    nb = capacity // num_envs
    base_slot = (base_step % nb) * num_envs
    if k == 1:
        raw = jax.random.randint(
            sample_key, (batch_size,), 0, jnp.maximum(valid, 1))
        phys = (base_slot + raw) % capacity
        nxt = (phys + num_envs) % capacity
        # Round-5 gather attack: the replay gather was the ring tail's
        # dominant cost (≈143 µs/step measured by stubbing it — PERF.md
        # "Round-5 budget revision"). TPU gathers serialize per index;
        # UNROLLED dynamic slices pipeline instead — measured
        # 1,177 → 1,079 µs/step (+9.1% obs/s) with bitwise-identical
        # batch values. (Two measured negative results on the way:
        # stacking the 3 scalar rings into one f32 take cost +47 µs —
        # the stack materializes 3×capacity every step — and a single
        # combined obs+next take was throughput-neutral.)
        idx = jnp.concatenate([phys, nxt])
        cols = [
            jax.lax.dynamic_slice_in_dim(ring, idx[i], 1, axis=1)
            for i in range(2 * batch_size)]
        both = jnp.concatenate(cols, axis=1).astype(jnp.float32)
        return {
            "obs": both[:, :batch_size],
            "next_obs": both[:, batch_size:],
            "actions": jnp.concatenate([
                jax.lax.dynamic_slice_in_dim(a_ring, phys[i], 1)
                for i in range(batch_size)]),
            "rewards": jnp.concatenate([
                jax.lax.dynamic_slice_in_dim(r_ring, phys[i], 1)
                for i in range(batch_size)]),
            "dones": jnp.concatenate([
                jax.lax.dynamic_slice_in_dim(d_ring, phys[i], 1)
                for i in range(batch_size)]).astype(jnp.float32),
        }
    raw = jax.random.randint(
        sample_key, (k, batch_size // k), 0, jnp.maximum(valid, 1))
    # Same dynamic-slice gather as k == 1, per drone row-group.
    parts = {key: [] for key in
             ("obs", "next_obs", "actions", "rewards", "dones")}
    per = batch_size // k
    for j in range(k):
        phys = (base_slot + raw[j]) % capacity
        nxt = (phys + num_envs) % capacity
        rows = ring[j * obs_dim:(j + 1) * obs_dim]
        idx = jnp.concatenate([phys, nxt])
        both = jnp.concatenate([
            jax.lax.dynamic_slice_in_dim(rows, idx[i], 1, axis=1)
            for i in range(2 * per)], axis=1).astype(jnp.float32)
        parts["obs"].append(both[:, :per])
        parts["next_obs"].append(both[:, per:])
        parts["actions"].append(jnp.concatenate([
            jax.lax.dynamic_slice_in_dim(a_ring[j], phys[i], 1)
            for i in range(per)]))
        parts["rewards"].append(jnp.concatenate([
            jax.lax.dynamic_slice_in_dim(r_ring[j], phys[i], 1)
            for i in range(per)]))
        parts["dones"].append(jnp.concatenate([
            jax.lax.dynamic_slice_in_dim(d_ring[j], phys[i], 1)
            for i in range(per)]).astype(jnp.float32))
    return {key: jnp.concatenate(vals, axis=-1)
            for key, vals in parts.items()}
