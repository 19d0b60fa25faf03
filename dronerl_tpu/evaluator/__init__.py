"""Competition evaluation: fixed-seed round-robin scoring of checkpoints."""

from dronerl_tpu.evaluator.evaluator import DroneRacerEvaluator, evaluate_checkpoints

__all__ = ["DroneRacerEvaluator", "evaluate_checkpoints"]
