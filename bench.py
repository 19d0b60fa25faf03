"""Headline benchmark: fused DQN training throughput (obs/s).

Workload matches the reference README benchmark rows (grid 9, 4 drones,
window radius 3, full actor-learner loop: env step + ε-greedy act +
replay write/read + TD update + target sync), measured as
``obs_per_sec = num_envs * num_steps / wall_time`` — the identical metric
definition (reference: train_jax.py:234-236).

Two metrics, matching the reference's two published workloads
(reference README.md:78, TPU v3-8):
  - (16,16) dense DQN — baseline 3,843 obs/s — the headline line.
  - (128,64) dense DQN — baseline 3,641 obs/s — carried in the headline
    JSON object under ``extra_metrics`` (stdout stays ONE JSON line).
Both run at num_envs=65536 on one chip through the fused-Pallas ring
engine (the entire environment tick — PRNG, physics, respawns, window
observations, ε-greedy actor, replay-ring write — is one kernel
dispatch; see dronerl_tpu/ops/fused_tick.py). Scaling throughput with
the env batch is the point of the TPU-native rebuild; the reference
README makes the same argument with its --num_envs plot.

Robustness (the round-2 and round-3 lessons — see PERF.md "The round-2
benchmark incident" and the round-3 outage note): compilation is timed
separately and explicitly (AOT ``.lower().compile()``), never inside the
measured region; each repeat is timed individually with a hard host-sync
readback and the reported number is the MEDIAN of repeats, so one
compilation-contaminated or contended iteration cannot destroy the
result; the scan length is 200 steps (cold compile ≈ 3.5 min vs ≈ 12 min
at 2000 steps, identical steady-state throughput); the repo ships a
pre-warmed persistent compilation cache (.jax_cache_bench/, committed)
keyed to these exact programs — re-warm it (just run bench.py once)
whenever a program changes; a drift guard lives in
tests/test_bench_program.py and also pins the jax/jaxlib versions the
cache was warmed under (a version bump silently invalidates the cache).

Backend-outage policy (round-3 lesson: a single 7-minute probe recorded
an official zero for a transient outage): reachability is probed in
bounded subprocess attempts inside a RETRY WINDOW — by default up to
45 minutes (``DRONERL_BENCH_PROBE_BUDGET`` seconds) of probe-sleep
cycles — and the explicit zero record is emitted only after the whole
budget is exhausted, with ``probe_attempts``/``probe_waited_s``
provenance so the record says how hard it tried.

Prints exactly one JSON line (extra keys carry provenance: compile
seconds, per-repeat seconds, probe attempts, the second metric).
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

HEADLINE_METRIC = "train_obs_per_sec_dense16_65536envs"
BASELINE_OBS_PER_SEC = 3843.0   # reference TPU v3-8, (16,16) dense
BASELINE_OBS_PER_SEC_BIG = 3641.0  # reference TPU v3-8, (128,64) dense
NUM_ENVS = int(os.environ.get("DRONERL_BENCH_ENVS", 65536))
TIMED_STEPS = int(os.environ.get("DRONERL_BENCH_STEPS", 200))
# Each repeat chains several scan calls through the carry and ends with
# one scalar readback, so per-repeat sync latency stays <1% of the
# repeat; the median over repeats is the reported statistic.
CALLS_PER_REPEAT = int(os.environ.get("DRONERL_BENCH_CALLS", 4))
REPEATS = int(os.environ.get("DRONERL_BENCH_REPEATS", 10))
# The second net shares the process (plugin init amortized) but pays its
# own first-execution stall; fewer repeats keep the total bounded.
REPEATS_BIG = int(os.environ.get("DRONERL_BENCH_REPEATS_BIG", 6))
WARMUP_CALLS = 2
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache_bench")
# Serialized loaded executables (skip the per-process remote device-
# program build entirely — see _measure). Committed next to the
# compilation cache; bench.py re-warms both on a miss.
AOT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       ".jax_aot_bench")

NETS = {
    "dense16": (16, 16),
    "dense128x64": (128, 64),
}


def build(net: str = "dense16"):
    """A benchmark program: (jitted run fn, make_carry, dummy)."""
    env_params = EnvParams(grid_size=9, n_drones=4, window_radius=3)
    config = DQNConfig(
        network_type="dense", hidden_layers=NETS[net],
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
                               obs_dtype=jnp.bfloat16, batch_size=8)

    @jax.jit
    def run(carry, dummy):
        return jax.lax.scan(tick, carry, dummy)

    dummy = jnp.zeros((TIMED_STEPS,))
    return run, make_carry, dummy


def program_hash(net: str = "dense16") -> str:
    """Backend-independent sha256 of a benchmark program's jaxpr.

    Used by tests/test_bench_program.py to detect that a code change
    altered a program whose compiled form is cached in .jax_cache_bench/
    (a cache miss costs ~3.5 min of cold compile in the driver's bench
    run — re-warm and re-commit the cache when this changes).
    """
    run, make_carry, dummy = build(net)
    carry_struct = jax.eval_shape(make_carry)
    jaxpr = jax.make_jaxpr(run)(carry_struct, dummy)
    return hashlib.sha256(str(jaxpr).encode()).hexdigest()


def _probe_backend_once(timeout_s: int) -> str:
    """One bounded backend-reachability check in a subprocess.

    ``jax.devices()`` blocks indefinitely in native code when the
    tunneled TPU backend is down (observed: multi-hour outages), and a
    hung benchmark is a worse official record than an explicit error.
    The probe pays one interpreter startup (~10-20 s with the plugin);
    returns an empty string when reachable, else the failure reason.
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


def _probe_backend_with_retry():
    """Probe inside a bounded retry window (round-3 lesson).

    A transient outage at capture time must not become a permanent
    official zero: retry probe-sleep cycles until the budget
    (``DRONERL_BENCH_PROBE_BUDGET`` seconds, default 45 min — the
    observed outages recover on the hour scale, and an official record
    that waited 45 minutes beats one that gave up in 7) is exhausted.
    Returns (err, attempts, waited_s): err == "" means reachable.
    """
    budget_s = float(os.environ.get("DRONERL_BENCH_PROBE_BUDGET", 2700))
    attempt_timeout = float(os.environ.get("DRONERL_BENCH_PROBE_TIMEOUT", 240))
    sleep_s = float(os.environ.get("DRONERL_BENCH_PROBE_SLEEP", 60))
    start = time.perf_counter()
    attempts = 0
    err = "probe budget is zero"
    while True:
        attempts += 1
        _stage(f"probing backend reachability (attempt {attempts})")
        err = _probe_backend_once(int(attempt_timeout))
        waited = time.perf_counter() - start
        if not err:
            return "", attempts, waited
        _stage(f"probe attempt {attempts} failed: {err} "
               f"({waited:.0f}s of {budget_s:.0f}s budget used)")
        if waited + sleep_s + attempt_timeout > budget_s:
            return err, attempts, waited
        time.sleep(sleep_s)


def _measure(net: str, repeats: int) -> dict:
    """Build, AOT-compile, warm up and time one net's program."""
    _stage(f"[{net}] building program")
    run, make_carry, dummy = build(net)
    _stage(f"[{net}] initializing carry (env reset + ring alloc)")
    carry = make_carry()
    carry = jax.block_until_ready(carry)

    # Fast path: a committed serialized EXECUTABLE (.jax_aot_bench/).
    # The persistent compilation cache only covers XLA's host compile;
    # a fresh process on the tunneled backend still pays the remote
    # device-program build (measured 102-501 s — PERF.md). Deserializing
    # the loaded executable skips both. The loader hash/version-checks
    # the file (utils/aot_cache) so it can never serve a stale program.
    from dronerl_tpu.utils import aot_cache

    aot_path = os.path.join(AOT_DIR, f"{net}.jaxexe")
    sha = program_hash(net)
    compiled = None
    compile_s = 0.0
    t0 = time.perf_counter()
    try:
        compiled = aot_cache.load(aot_path, sha)
        _stage(f"[{net}] loaded serialized executable "
               f"({time.perf_counter() - t0:.1f}s)")
    except (OSError, Exception) as e:  # noqa: BLE001 — any miss → compile
        _stage(f"[{net}] AOT executable miss ({type(e).__name__}: {e}); "
               f"lower + compile")

    if compiled is None:
        # Compile ahead-of-time so compilation can never leak into the
        # timed region, and report its cost explicitly. With the warm
        # compilation cache this takes seconds; cold it is ~3.5 min.
        t0 = time.perf_counter()
        try:
            compiled = run.lower(carry, dummy).compile()
        except Exception:  # AOT unavailable on some backends — jit fallback
            compiled = run
            compiled(carry, dummy)[1][0].block_until_ready()
        compile_s = time.perf_counter() - t0
        if compiled is not run:
            try:  # re-warm the executable cache for the next fresh process
                aot_cache.save(compiled, aot_path, sha)
                _stage(f"[{net}] serialized executable -> {aot_path}")
            except Exception as e:  # noqa: BLE001 — cache write is optional
                _stage(f"[{net}] executable serialization failed: {e!r}")
    _stage(f"[{net}] compile done in {compile_s:.1f}s; warming up")

    # Warm up: fill the replay ring and absorb first-dispatch costs
    # (incl. the per-process first-execution stall on tunneled backends).
    # Host-sync via scalar readback (block_until_ready can return early
    # on tunneled backends; a host transfer cannot).
    t0 = time.perf_counter()
    for _ in range(WARMUP_CALLS):
        carry, (rewards, *_aux) = compiled(carry, dummy)
    float(rewards.sum())
    warmup_s = time.perf_counter() - t0
    _stage(f"[{net}] warmup done in {warmup_s:.1f}s; "
           f"timing {repeats} repeats")

    # Timed region: each repeat chains CALLS_PER_REPEAT scans through the
    # carry (every iteration is data-dependent on the last) and ends with
    # a hard host sync. Median over repeats is robust to a contended or
    # otherwise-contaminated iteration.
    repeat_s = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(CALLS_PER_REPEAT):
            carry, (rewards, *_aux) = compiled(carry, dummy)
        float(rewards.sum())
        repeat_s.append(time.perf_counter() - t0)

    median_s = statistics.median(repeat_s)
    obs_per_sec = NUM_ENVS * TIMED_STEPS * CALLS_PER_REPEAT / median_s
    return {
        "value": round(obs_per_sec, 1),
        "compile_s": round(compile_s, 1),
        "warmup_s": round(warmup_s, 1),
        "repeat_s": [round(t, 4) for t in repeat_s],
    }


def _cache_staleness() -> dict:
    """Detect a stale warm cache and make it loud IN THE OFFICIAL RECORD.

    Compares this process's traced program hashes (and jax/jaxlib
    versions) against the frozen BENCH_PROGRAM.json. A mismatch means the
    committed .jax_cache_bench/ will miss and the run pays the cold
    compile — the round-2/round-4 failure mode. Besides the stderr
    warning, the returned keys are merged into the headline JSON so a
    stale freeze is visible in BENCH_r{N}.json itself, not only in CI
    (tests/test_bench_program.py remains the pre-commit guard)."""
    record_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_PROGRAM.json")
    try:
        with open(record_path) as f:
            rec = json.load(f)
    except OSError:
        _stage("WARNING: BENCH_PROGRAM.json missing — cache freshness "
               "unknown; run the freeze recipe in tests/test_bench_program.py")
        return {"cache_stale": True, "cache_stale_reason": "no-record"}
    stale = []
    if rec.get("sha256") != program_hash("dense16"):
        stale.append("dense16")
    if rec.get("sha256_dense128x64") != program_hash("dense128x64"):
        stale.append("dense128x64")
    import jaxlib
    warmed = rec.get("versions", {})
    current = {"jax": jax.__version__, "jaxlib": jaxlib.__version__}
    if warmed and warmed != current:
        stale.append(f"versions({warmed}->{current})")
    if stale:
        _stage(f"WARNING: .jax_cache_bench/ is STALE for {stale} — this "
               f"run pays the cold compile (~3.5 min per program). "
               f"Re-warm (run bench.py on the TPU) and refresh "
               f"BENCH_PROGRAM.json (recipe: tests/test_bench_program.py).")
        return {"cache_stale": True, "cache_stale_programs": stale}
    return {}


def main():
    if os.environ.get("DRONERL_BENCH_SKIP_PROBE") != "1":
        err, attempts, waited = _probe_backend_with_retry()
        if err:
            # Exhausted the whole retry budget: emit the explicit zero
            # record WITH provenance (attempts/waited) so a parsed zero
            # is unambiguously "backend down for the full window", never
            # "engine is slow". Exit nonzero so drivers that check the
            # exit code can distinguish failure from a slow engine.
            print(json.dumps({
                "metric": HEADLINE_METRIC,
                "value": 0.0, "unit": "obs/s", "vs_baseline": 0.0,
                "error": f"TPU backend unreachable: {err}",
                "probe_attempts": attempts,
                "probe_waited_s": round(waited, 1),
            }))
            sys.exit(1)
        _stage(f"backend reachable after {attempts} attempt(s)")
    setup_compilation_cache(CACHE_DIR)
    staleness = _cache_staleness()

    headline = _measure("dense16", REPEATS)
    result = {
        "metric": HEADLINE_METRIC,
        "value": headline["value"],
        "unit": "obs/s",
        "vs_baseline": round(headline["value"] / BASELINE_OBS_PER_SEC, 2),
        "compile_s": headline["compile_s"],
        "warmup_s": headline["warmup_s"],
        "repeat_s": headline["repeat_s"],
        "steps_per_repeat": TIMED_STEPS * CALLS_PER_REPEAT,
        "num_envs": NUM_ENVS,
        **staleness,
    }

    if os.environ.get("DRONERL_BENCH_SECOND_NET", "1") != "0":
        try:
            big = _measure("dense128x64", REPEATS_BIG)
            result["extra_metrics"] = [{
                "metric": "train_obs_per_sec_dense128x64_65536envs",
                "value": big["value"],
                "unit": "obs/s",
                "vs_baseline": round(
                    big["value"] / BASELINE_OBS_PER_SEC_BIG, 2),
                "compile_s": big["compile_s"],
                "warmup_s": big["warmup_s"],
                "repeat_s": big["repeat_s"],
            }]
        except Exception as e:  # never lose the headline to the second net
            _stage(f"second net failed: {e!r}")
            result["extra_metrics"] = [{
                "metric": "train_obs_per_sec_dense128x64_65536envs",
                "value": 0.0, "unit": "obs/s", "vs_baseline": 0.0,
                "error": repr(e),
            }]

    print(json.dumps(result))


if __name__ == "__main__":
    main()
