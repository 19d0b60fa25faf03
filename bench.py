"""Headline benchmark: fused DQN training throughput (obs/s).

Workload matches the reference README benchmark row "(16,16) dense DQN"
(grid 9, 4 drones, window radius 3, full actor-learner loop: env step +
ε-greedy act + replay write/read + TD update + target sync), measured as
``obs_per_sec = num_envs * num_steps / wall_time`` — the identical metric
definition (reference: train_jax.py:234-236).

Baseline: 3,843 obs/s on TPU v3-8 (reference README.md:78, measured at
num_envs=1). This benchmark runs the same loop at num_envs=65536 on one
chip through the fused-Pallas ring engine (the entire environment tick —
PRNG, physics, respawns, window observations, ε-greedy actor, replay-ring
write — is one kernel dispatch; see dronerl_tpu/ops/fused_tick.py).
Scaling throughput with the env batch is the point of the TPU-native
rebuild; the reference README makes the same argument with its
--num_envs plot.

Robustness (the round-2 lesson — see PERF.md "The round-2 benchmark
incident"): compilation is timed separately and explicitly (AOT
``.lower().compile()``), never inside the measured region; each repeat is
timed individually with a hard host-sync readback and the reported number
is the MEDIAN of repeats, so one compilation-contaminated or contended
iteration cannot destroy the result; the scan length is 200 steps (cold
compile ≈ 3.5 min vs ≈ 12 min at 2000 steps, identical steady-state
throughput); and the repo ships a pre-warmed persistent compilation cache
(.jax_cache_bench/, committed) keyed to this exact program — re-warm it
(just run bench.py once) whenever the program changes; a drift guard
lives in tests/test_bench_program.py.

Prints exactly one JSON line (extra keys carry provenance: compile
seconds, per-repeat seconds, program hash).
"""

import hashlib
import json
import os
import statistics
import sys
import time

import jax
import jax.numpy as jnp

_T0 = time.perf_counter()


def _stage(msg):
    # Stage progress on stderr (stdout stays one JSON line).
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)

from dronerl_tpu.agents.dqn import DQN, DQNConfig
from dronerl_tpu.env.types import EnvParams
from dronerl_tpu.train import (
    build_train_step_ring, init_ring_carry, setup_compilation_cache)

BASELINE_OBS_PER_SEC = 3843.0  # reference TPU v3-8, (16,16) dense
NUM_ENVS = int(os.environ.get("DRONERL_BENCH_ENVS", 65536))
TIMED_STEPS = int(os.environ.get("DRONERL_BENCH_STEPS", 200))
# Each repeat chains several scan calls through the carry and ends with
# one scalar readback, so per-repeat sync latency stays <1% of the
# repeat; the median over repeats is the reported statistic.
CALLS_PER_REPEAT = int(os.environ.get("DRONERL_BENCH_CALLS", 4))
REPEATS = int(os.environ.get("DRONERL_BENCH_REPEATS", 10))
WARMUP_CALLS = 2
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache_bench")


def build():
    """The benchmark program: (jitted run fn, example (carry, dummy))."""
    env_params = EnvParams(grid_size=9, n_drones=4, window_radius=3)
    config = DQNConfig(
        network_type="dense", hidden_layers=(16, 16),
        epsilon_decay_every=5, target_update_interval=10, gamma=0.9)
    agent = DQN(config, env_params)
    # capacity rounded to the push size → contiguous replay writes
    capacity = max(-(-100_000 // NUM_ENVS) * NUM_ENVS, 2 * NUM_ENVS)

    rng = jax.random.PRNGKey(0)
    tick = build_train_step_ring(
        agent, env_params, NUM_ENVS, capacity, batch_size=8,
        reset_env_every=100)

    def make_carry():
        # bf16 ring storage (the trainer default): halves the kernel's
        # per-step obs write; env transitions stay bit-exact — the ring
        # only feeds actor/learner matmuls, which round to bf16 on the
        # MXU anyway.
        return init_ring_carry(agent, env_params, NUM_ENVS, capacity, rng,
                               obs_dtype=jnp.bfloat16)

    @jax.jit
    def run(carry, dummy):
        return jax.lax.scan(tick, carry, dummy)

    dummy = jnp.zeros((TIMED_STEPS,))
    return run, make_carry, dummy


def program_hash() -> str:
    """Backend-independent sha256 of the benchmark program's jaxpr.

    Used by tests/test_bench_program.py to detect that a code change
    altered the program whose compiled form is cached in
    .jax_cache_bench/ (a cache miss costs ~3.5 min of cold compile in the
    driver's bench run — re-warm and re-commit the cache when this
    changes).
    """
    run, make_carry, dummy = build()
    carry_struct = jax.eval_shape(make_carry)
    jaxpr = jax.make_jaxpr(run)(carry_struct, dummy)
    return hashlib.sha256(str(jaxpr).encode()).hexdigest()


def _probe_backend(timeout_s: int = 420) -> str:
    """Bounded backend-reachability check in a subprocess.

    ``jax.devices()`` blocks indefinitely in native code when the
    tunneled TPU backend is down (observed: multi-hour outages), and a
    hung benchmark is a worse official record than an explicit error.
    The probe pays one interpreter startup (~10-20 s with the plugin);
    returns an empty string when reachable, else the failure reason.
    The bound is generous (7 min) because a recovering backend's first
    device grant can take minutes — a false "unreachable" verdict would
    turn a healthy run into an official zero, which is far worse than a
    slow exit when the backend is genuinely down.
    """
    import subprocess
    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); "
             "assert d[0].platform != 'cpu', d; print(d[0].device_kind)"],
            capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return f"backend probe timed out after {timeout_s}s"
    if proc.returncode != 0:
        lines = (proc.stderr or proc.stdout).strip().splitlines()
        return lines[-1] if lines else "backend probe failed"
    return ""


def main():
    if os.environ.get("DRONERL_BENCH_SKIP_PROBE") != "1":
        _stage("probing backend reachability")
        err = _probe_backend()
        if err:
            print(json.dumps({
                "metric": "train_obs_per_sec_dense16_65536envs",
                "value": 0.0, "unit": "obs/s", "vs_baseline": 0.0,
                "error": f"TPU backend unreachable: {err}",
            }))
            sys.exit(1)
    setup_compilation_cache(CACHE_DIR)
    _stage("building program")
    run, make_carry, dummy = build()
    _stage("initializing carry (env reset + ring alloc)")
    carry = make_carry()
    carry = jax.block_until_ready(carry)

    # Compile ahead-of-time so compilation can never leak into the timed
    # region, and report its cost explicitly. With the committed warm
    # cache this takes seconds; cold it is ~3.5 min at 200 steps.
    _stage("AOT compile (lower + compile)")
    t0 = time.perf_counter()
    try:
        compiled = run.lower(carry, dummy).compile()
    except Exception:  # AOT unavailable on some backends — jit fallback
        compiled = run
        compiled(carry, dummy)[1][0].block_until_ready()
    compile_s = time.perf_counter() - t0
    _stage(f"compile done in {compile_s:.1f}s; warming up")

    # Warm up: fill the replay ring and absorb first-dispatch costs.
    # Host-sync via scalar readback (block_until_ready can return early
    # on tunneled backends; a host transfer cannot).
    t0 = time.perf_counter()
    for _ in range(WARMUP_CALLS):
        carry, (rewards, *_aux) = compiled(carry, dummy)
    float(rewards.sum())
    warmup_s = time.perf_counter() - t0
    _stage(f"warmup done in {warmup_s:.1f}s; timing {REPEATS} repeats")

    # Timed region: each repeat chains CALLS_PER_REPEAT scans through the
    # carry (every iteration is data-dependent on the last) and ends with
    # a hard host sync. Median over repeats is robust to a contended or
    # otherwise-contaminated iteration.
    repeat_s = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(CALLS_PER_REPEAT):
            carry, (rewards, *_aux) = compiled(carry, dummy)
        float(rewards.sum())
        repeat_s.append(time.perf_counter() - t0)

    median_s = statistics.median(repeat_s)
    obs_per_sec = NUM_ENVS * TIMED_STEPS * CALLS_PER_REPEAT / median_s
    print(json.dumps({
        "metric": "train_obs_per_sec_dense16_65536envs",
        "value": round(obs_per_sec, 1),
        "unit": "obs/s",
        "vs_baseline": round(obs_per_sec / BASELINE_OBS_PER_SEC, 2),
        "compile_s": round(compile_s, 1),
        "warmup_s": round(warmup_s, 1),
        "repeat_s": [round(t, 4) for t in repeat_s],
        "steps_per_repeat": TIMED_STEPS * CALLS_PER_REPEAT,
        "num_envs": NUM_ENVS,
    }))


if __name__ == "__main__":
    main()
