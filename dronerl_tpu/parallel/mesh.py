"""Device mesh construction and multi-host bring-up.

The canonical layout is a 1-D ``('dp',)`` mesh over every chip in the
slice (all hosts): environments are sharded along ``dp``; learner
parameters are replicated and gradients ride the ICI all-reduce. The env
batch has no cross-env coupling, so a single data-parallel axis is the
right mesh for this workload — a second axis would only pay off once the
Q-network itself outgrows one chip, which a (128, 64) MLP never does.

On CPU test rigs, ``XLA_FLAGS=--xla_force_host_platform_device_count=N``
provides N virtual devices, so every code path here is exercised by the
unit tests without TPU pod hardware.
"""

import logging
from typing import Optional

import jax
from jax.sharding import Mesh

logger = logging.getLogger(__name__)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join a multi-host JAX cluster (no-op for single-process runs).

    On TPU pods the arguments are auto-detected from the metadata server;
    pass them explicitly for manual bring-up. Must be called before any
    other JAX API touches the backend.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address)
    logger.info(
        "process %d/%d — %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count())


def make_env_mesh(num_devices: Optional[int] = None, axis_name: str = "dp") -> Mesh:
    """1-D data-parallel mesh over (a prefix of) all global devices."""
    devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices, have {len(devices)}")
        devices = devices[:num_devices]
    return jax.make_mesh((len(devices),), (axis_name,), devices=devices)
