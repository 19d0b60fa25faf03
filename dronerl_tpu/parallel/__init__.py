"""Multi-chip / multi-host scaling: meshes, sharded training, collectives."""

from dronerl_tpu.parallel.mesh import make_env_mesh, initialize_distributed
from dronerl_tpu.parallel.distributed import DistributedTrainer

__all__ = ["make_env_mesh", "initialize_distributed", "DistributedTrainer"]
