"""Hot array kernels shared across the environment and training stack."""

from dronerl_tpu.ops.collision import same_cell_conflicts
from dronerl_tpu.ops.window import crop_windows

__all__ = ["same_cell_conflicts", "crop_windows"]
