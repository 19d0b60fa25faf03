"""Shared robust-timing protocol for the chip measurement scripts.

One implementation of bench.py's measurement discipline (see PERF.md
"The round-2 benchmark incident") so ring_bench.py, config5_bench.py and
knee_experiments.py cannot drift apart:

- a 2-call warmup absorbs compilation AND the axon backend's deferred
  remote device-program build at first execution (102-501 s measured;
  never inside the timed region),
- every repeat chains ``calls`` scans through the carry and ends with a
  hard host sync (``float(scalar)`` — ``block_until_ready`` can return
  early on this tunneled backend),
- the caller reports the MEDIAN over repeats, so one contended or
  contaminated iteration cannot destroy the number.
"""

import json
import os
import statistics
import time


def timed_median(run, carry, dummy, repeats: int, calls: int):
    """Run the protocol; returns (median_s, warmup_s, per-repeat times).

    ``run(carry, dummy) -> (carry', (rewards, *aux))`` must thread the
    carry so every call is data-dependent on the previous one.
    """
    t0 = time.perf_counter()
    for _ in range(2):
        carry, (rewards, *_aux) = run(carry, dummy)
    float(rewards.sum())
    warmup_s = time.perf_counter() - t0

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(calls):
            carry, (rewards, *_aux) = run(carry, dummy)
        float(rewards.sum())
        times.append(time.perf_counter() - t0)
    return statistics.median(times), warmup_s, times


def append_row(path: str, row: dict) -> None:
    """Append one result row to a JSON list file, saving immediately —
    a backend flap mid-sweep must not lose earlier points."""
    existing = []
    if os.path.exists(path):
        with open(path) as f:
            existing = json.load(f)
    with open(path, "w") as f:
        json.dump(existing + [row], f, indent=1)
