"""Drift guard for the headline benchmark program.

The repo ships a pre-warmed persistent compilation cache
(.jax_cache_bench/) for the exact program bench.py times; a cache miss
costs ~3.5 minutes of cold XLA/Mosaic compile in the driver's benchmark
run (round-2 incident: a stale cache turned a 55M obs/s engine into an
official 2.2M record — see PERF.md). This test compares the program's
backend-independent jaxpr hash against the frozen record so any code
change that silently invalidates the cache fails CI with instructions.

To refresh after an intentional change:
    python bench.py            # re-warms .jax_cache_bench/ on the TPU
    python -c "import jax; jax.config.update('jax_platforms', 'cpu'); \
import json, bench; json.dump({'sha256': bench.program_hash(), \
'num_envs': bench.NUM_ENVS, 'timed_steps': bench.TIMED_STEPS}, \
open('BENCH_PROGRAM.json', 'w'), indent=1)"
    git add BENCH_PROGRAM.json .jax_cache_bench/
(the hash is traced on the CPU backend — the tests' environment — so the
record is comparable in CI; the jaxpr is backend-independent anyway.)
"""

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RECORD = os.path.join(REPO, "BENCH_PROGRAM.json")


def test_bench_program_matches_warmed_cache():
    # Deliberately in the FAST lane (runs in ~6 s on CPU): this guard
    # exists to catch cache-invalidating drift before a commit, and the
    # fast lane is what developers actually run (round-2 incident).
    import bench

    assert os.path.exists(RECORD), (
        "BENCH_PROGRAM.json missing — run bench.py once and freeze the "
        "program hash (see this test's module docstring)")
    with open(RECORD) as f:
        record = json.load(f)
    assert record["num_envs"] == bench.NUM_ENVS
    assert record["timed_steps"] == bench.TIMED_STEPS
    assert record["sha256"] == bench.program_hash(), (
        "bench.py's program drifted from the committed warm compilation "
        "cache (.jax_cache_bench/): the driver's benchmark run would pay "
        "a ~3.5 min cold compile. Re-warm the cache on the TPU and "
        "refresh BENCH_PROGRAM.json (module docstring has the recipe).")
