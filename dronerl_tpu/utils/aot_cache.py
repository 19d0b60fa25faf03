"""Serialized-executable (AOT) cache for the benchmark programs.

The persistent compilation cache (``jax.config.compilation_cache_dir``)
covers XLA's host-side compile, but on the tunneled TPU backend a fresh
process still pays a first-execution stall while the device program is
built/loaded remotely (measured 102-501 s per process — PERF.md "The
per-process first-execution stall"). ``jax.experimental
.serialize_executable`` pickles the *loaded PJRT executable* itself, so
a fresh process can deserialize and run without re-building.

Format: one file per program — ``pickle((payload, in_tree, out_tree,
meta))`` where ``payload`` is the PJRT-serialized executable and
``meta`` records the jax/jaxlib versions and the program's jaxpr hash
(the same hash ``bench.py --hash`` / BENCH_PROGRAM.json freeze). The
loader verifies both and raises ``StaleAotCache`` on any mismatch, so a
stale file can never silently serve the wrong program.

Reference context: the reference has no AOT path (its benchmark pays
torch/XLA warmup inline, train_jax.py:220-236); this subsystem exists
because the official record's warmup_s is part of the deliverable.
"""

import os
import pickle

import jax


class StaleAotCache(RuntimeError):
    """The AOT file exists but was serialized for different code."""


def _versions() -> dict:
    import jaxlib

    return {"jax": jax.__version__, "jaxlib": jaxlib.__version__}


def save(compiled, path: str, program_sha256: str) -> None:
    """Serialize a ``jax.stages.Compiled`` to ``path`` (atomic rename)."""
    from jax.experimental import serialize_executable as se

    payload, in_tree, out_tree = se.serialize(compiled)
    meta = {"sha256": program_sha256, "versions": _versions()}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump((payload, in_tree, out_tree, meta), f)
    os.replace(tmp, path)


def load(path: str, program_sha256: str):
    """Deserialize ``path`` → ``jax.stages.Compiled``.

    Raises ``StaleAotCache`` when the file's recorded program hash or
    jax/jaxlib versions differ from the current ones, and ``OSError``
    when the file is absent — callers fall back to a normal compile.
    """
    from jax.experimental import serialize_executable as se

    with open(path, "rb") as f:
        payload, in_tree, out_tree, meta = pickle.load(f)
    if meta.get("sha256") != program_sha256:
        raise StaleAotCache(
            f"{path}: serialized for program {meta.get('sha256', '?')[:12]}, "
            f"current is {program_sha256[:12]} — re-warm (run bench.py)")
    if meta.get("versions") != _versions():
        raise StaleAotCache(
            f"{path}: serialized under {meta.get('versions')}, running "
            f"{_versions()} — re-warm (run bench.py)")
    return se.deserialize_and_load(payload, in_tree, out_tree)
