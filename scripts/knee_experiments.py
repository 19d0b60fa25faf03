"""Root-causing the ring engine's 131,072-env knee (VERDICT r2 item 4).

Known (PERF.md): at 131,072 envs the ring engine measures ~12% fewer
obs/s than at 65,536, the gap survived every round-2 optimization, and
it is NOT a donation-copy artifact (sampling-order experiment).

Competing hypotheses, separated by this grid:

H1 (env-count-driven): some per-env cost turns superlinear at 131k —
    then the knee appears at 131k regardless of observation width.
H2 (ring-bytes-driven): the obs ring (nb=2 columns x obs_dim rows; bf16)
    crosses a memory threshold — 154 MB at 131k x radius-3 (294 rows) vs
    77 MB at 65k — then shrinking rows (radius 2 -> 150 rows, 79 MB at
    131k) removes the knee, and doubling envs again (262k x radius-2,
    158 MB) restores it.
H3 (grid-length-driven): 256 Mosaic grid steps at 131k (512-lane blocks)
    vs 128 at 65k — then forcing 1024-lane blocks at 131k (128 steps)
    removes it.

Protocol per point: same robust timing as bench.py (warmup excluded,
per-repeat host-synced, median). Run on the chip:
    python scripts/knee_experiments.py
Frozen record: scripts/knee_results.json; conclusion in PERF.md.
"""

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root: dronerl_tpu
sys.path.insert(0, _HERE)                   # scripts dir: _timing

import _timing
from dronerl_tpu.agents.dqn import DQN, DQNConfig
from dronerl_tpu.env.types import EnvParams
from dronerl_tpu.train import (
    build_train_step_ring, init_ring_carry, setup_compilation_cache)


def measure(num_envs: int, window_radius: int, steps: int, repeats: int,
            calls: int, max_block=None) -> dict:
    from dronerl_tpu.ops import fused_tick

    env_params = EnvParams(grid_size=9, n_drones=4,
                           window_radius=window_radius)
    config = DQNConfig(
        network_type="dense", hidden_layers=(16, 16),
        epsilon_decay_every=5, target_update_interval=10, gamma=0.9)
    agent = DQN(config, env_params)
    capacity = max(-(-100_000 // num_envs) * num_envs, 2 * num_envs)
    rng = jax.random.PRNGKey(0)

    old_block = fused_tick._FULL_KERNEL_MAX_BLOCK
    if max_block is not None:
        fused_tick._FULL_KERNEL_MAX_BLOCK = max_block
    # full_tick_fused_ring is module-level-jitted; a same-shape point
    # (the H3 131k/radius-3 row differs from the baseline ONLY in
    # max_block, which is not a jit key) would silently reuse the cached
    # 512-lane trace. Drop all traces so _block_for re-runs per point.
    jax.clear_caches()
    try:
        tick = build_train_step_ring(
            agent, env_params, num_envs, capacity, batch_size=8,
            reset_env_every=100)
        carry = init_ring_carry(agent, env_params, num_envs, capacity, rng,
                                obs_dtype=jnp.bfloat16, batch_size=8)

        @jax.jit
        def run(carry, dummy):
            return jax.lax.scan(tick, carry, dummy)

        dummy = jnp.zeros((steps,))
        med, warm_s, times = _timing.timed_median(run, carry, dummy,
                                                  repeats, calls)
    finally:
        fused_tick._FULL_KERNEL_MAX_BLOCK = old_block
    ring_mb = agent.obs_dim * capacity * 2 / 2**20
    return {
        "num_envs": num_envs, "window_radius": window_radius,
        "max_block": max_block or 512,
        "ring_mb": round(ring_mb, 1),
        "obs_per_sec": round(num_envs * steps * calls / med, 1),
        "us_per_step": round(1e6 * med / (steps * calls), 1),
        "warmup_s": round(warm_s, 1),
        "repeat_s": [round(t, 4) for t in times],
    }


POINTS = [
    # (envs, radius, max_block)
    (65536, 3, None),    # baseline (77 MB ring)
    (131072, 3, None),   # the knee (154 MB ring)
    (65536, 2, None),    # narrow obs control (40 MB)
    (131072, 2, None),   # H2: knee should vanish if bytes-driven (79 MB)
    (262144, 2, None),   # H2: knee should reappear (158 MB)
    (131072, 3, 1024),   # H3: halve the Mosaic grid length
    (65536, 3, 1024),    # H3 control + headline probe: if bigger blocks
                         # win at 131k they may also beat the 512-lane
                         # flagship bench point
]


def analyze(path: str) -> None:
    """Turn the measured grid into per-hypothesis verdicts."""
    with open(path) as f:
        rows = json.load(f)

    def find(envs, radius, block):
        for r in rows:
            if (r["num_envs"] == envs and r["window_radius"] == radius
                    and r["max_block"] == block):
                return r
        return None

    base = find(65536, 3, 512)
    knee = find(131072, 3, 512)
    if not (base and knee):
        print("analyze: baseline/knee points missing — run the grid first")
        return
    ratio = knee["obs_per_sec"] / base["obs_per_sec"]
    print(f"knee at 131k/radius-3: {ratio:.3f}x of 65k "
          f"({knee['obs_per_sec']:.3g} vs {base['obs_per_sec']:.3g} obs/s)")

    r2_base, r2_knee, r2_double = (find(65536, 2, 512),
                                   find(131072, 2, 512),
                                   find(262144, 2, 512))
    if r2_base and r2_knee:
        r2_ratio = r2_knee["obs_per_sec"] / r2_base["obs_per_sec"]
        print(f"H1 (env-count-driven): 131k/radius-2 is {r2_ratio:.3f}x of "
              f"65k/radius-2 — {'SUPPORTED' if r2_ratio < 0.95 else 'REFUTED'}"
              f" (knee {'re' if r2_ratio < 0.95 else 'not re'}produced at "
              f"halved ring bytes)")
        if r2_double:
            d_ratio = r2_double["obs_per_sec"] / r2_knee["obs_per_sec"]
            print(f"H2 (ring-bytes-driven): 262k/radius-2 "
                  f"({r2_double['ring_mb']} MB ring) is {d_ratio:.3f}x of "
                  f"131k/radius-2 ({r2_knee['ring_mb']} MB) — "
                  f"{'SUPPORTED' if r2_ratio >= 0.95 and d_ratio < 0.95 else 'REFUTED/MIXED'}")
    h3 = find(131072, 3, 1024)
    if h3:
        h3_ratio = h3["obs_per_sec"] / knee["obs_per_sec"]
        print(f"H3 (grid-length-driven): 1024-lane blocks at 131k give "
              f"{h3_ratio:.3f}x of the 512-lane knee point — "
              f"{'SUPPORTED (and the fix)' if h3_ratio > 1.05 else 'REFUTED'}")
    h3c = find(65536, 3, 1024)
    if h3c:
        c_ratio = h3c["obs_per_sec"] / base["obs_per_sec"]
        print(f"headline probe: 1024-lane blocks at the 65k flagship give "
              f"{c_ratio:.3f}x of the shipped 512-lane config"
              + (" — consider raising _FULL_KERNEL_MAX_BLOCK"
                 if c_ratio > 1.02 else ""))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--repeats", type=int, default=6)
    p.add_argument("--calls", type=int, default=4)
    p.add_argument("--points", type=int, nargs="+", default=None,
                   help="indices into POINTS (default: all)")
    p.add_argument("--analyze", action="store_true",
                   help="print hypothesis verdicts from the frozen record "
                        "instead of measuring")
    args = p.parse_args()

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "knee_results.json")
    if args.analyze:
        analyze(path)
        return
    setup_compilation_cache("/root/repo/jax_cache")

    idxs = args.points if args.points is not None else range(len(POINTS))
    for i in idxs:
        envs, radius, block = POINTS[i]
        row = measure(envs, radius, args.steps, args.repeats, args.calls,
                      max_block=block)
        print(json.dumps(row), flush=True)
        _timing.append_row(path, row)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
