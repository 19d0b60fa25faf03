"""Drift guard for the headline benchmark programs.

The repo ships a pre-warmed persistent compilation cache
(.jax_cache_bench/) for the exact programs bench.py times ((16,16) and
(128,64) dense nets); a cache miss costs ~3.5 minutes of cold XLA/Mosaic
compile per program in the driver's benchmark run (round-2 incident: a
stale cache turned a 55M obs/s engine into an official 2.2M record — see
PERF.md). This test compares each program's backend-independent jaxpr
hash against the frozen record so any code change that silently
invalidates the cache fails CI with instructions. It also pins the
jax/jaxlib versions the cache was warmed under — the compiled blobs are
version-keyed, so a quiet jax upgrade invalidates the cache without
changing any jaxpr hash (ADVICE r3).

To refresh after an intentional change:
    python bench.py            # re-warms .jax_cache_bench/ on the TPU
    python -c "import jax; jax.config.update('jax_platforms', 'cpu'); \
import json, bench, jaxlib; json.dump({'sha256': bench.program_hash(), \
'sha256_dense128x64': bench.program_hash('dense128x64'), \
'num_envs': bench.NUM_ENVS, 'timed_steps': bench.TIMED_STEPS, \
'versions': {'jax': jax.__version__, 'jaxlib': jaxlib.__version__}}, \
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


def _record():
    assert os.path.exists(RECORD), (
        "BENCH_PROGRAM.json missing — run bench.py once and freeze the "
        "program hashes (see this test's module docstring)")
    with open(RECORD) as f:
        return json.load(f)


def test_bench_program_matches_warmed_cache():
    # Deliberately in the FAST lane (runs in ~6 s on CPU): this guard
    # exists to catch cache-invalidating drift before a commit, and the
    # fast lane is what developers actually run (round-2 incident).
    import bench

    record = _record()
    assert record["num_envs"] == bench.NUM_ENVS
    assert record["timed_steps"] == bench.TIMED_STEPS
    drift_msg = (
        "bench.py's {net} program drifted from the committed warm "
        "compilation cache (.jax_cache_bench/): the driver's benchmark "
        "run would pay a ~3.5 min cold compile. Re-warm the cache on the "
        "TPU and refresh BENCH_PROGRAM.json (module docstring has the "
        "recipe).")
    assert record["sha256"] == bench.program_hash("dense16"), (
        drift_msg.format(net="(16,16)"))
    assert record["sha256_dense128x64"] == bench.program_hash(
        "dense128x64"), drift_msg.format(net="(128,64)")


def test_bench_cache_version_stamp_matches_environment():
    """The compiled cache blobs are keyed to jax/jaxlib versions; a
    version bump invalidates .jax_cache_bench/ with no jaxpr change.
    This guard makes that skew loud (ADVICE r3, low #5)."""
    import jaxlib

    import jax

    record = _record()
    warmed = record.get("versions")
    assert warmed, (
        "BENCH_PROGRAM.json carries no version stamp — refresh it with "
        "the recipe in this module's docstring")
    current = {"jax": jax.__version__, "jaxlib": jaxlib.__version__}
    assert warmed == current, (
        f".jax_cache_bench/ was warmed under {warmed} but this "
        f"environment runs {current}: the committed cache will silently "
        "miss and the driver's bench run pays the cold compile. Re-warm "
        "the cache and refresh BENCH_PROGRAM.json.")
