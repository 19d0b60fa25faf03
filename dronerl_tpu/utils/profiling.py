"""First-class profiling hooks: trace capture, timing, memory stats.

Upgrades the reference's ad-hoc commented-out profiler usage (reference:
jax_impl/env/env.py:394-397, timeit timers in train_jax.py:219-236) into a
supported API: a trace context manager (viewable in TensorBoard via the
installed ``tensorboard_plugin_profile``), steps/s timers that block on
device work, and device memory reporting.
"""

import contextlib
import logging
import time
from typing import Iterator, Optional

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace for everything inside the block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s (view with tensorboard)",
                    log_dir)


class Stopwatch:
    """Wall-clock timer that waits for device completion on stop.

    Caveat: on tunneled backends ``block_until_ready`` may return before
    execution finishes; for benchmark-grade numbers prefer a host
    readback of a scalar that depends on the timed computation (see
    bench.py).
    """

    def __init__(self):
        self.start = None
        self.elapsed = 0.0

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def stop(self, *block_on) -> float:
        if block_on:
            jax.block_until_ready(block_on)
        self.elapsed = time.perf_counter() - self.start
        return self.elapsed

    def __exit__(self, *exc):
        if self.elapsed == 0.0:
            self.elapsed = time.perf_counter() - self.start


def device_memory_stats(device: Optional[jax.Device] = None) -> dict:
    """Live/peak HBM usage for one device (empty dict if unsupported)."""
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats() or {}
    except (AttributeError, jax.errors.JaxRuntimeError):
        return {}
    keys = ("bytes_in_use", "peak_bytes_in_use", "bytes_limit",
            "largest_alloc_size")
    return {k: stats[k] for k in keys if k in stats}


def log_device_memory(prefix: str = "") -> None:
    for device in jax.local_devices():
        stats = device_memory_stats(device)
        if stats:
            used = stats.get("bytes_in_use", 0) / 2**20
            peak = stats.get("peak_bytes_in_use", 0) / 2**20
            limit = stats.get("bytes_limit", 0) / 2**20
            logger.info("%s%s: %.1f MiB in use (peak %.1f / limit %.1f)",
                        prefix, device, used, peak, limit)
