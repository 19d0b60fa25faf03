"""Frozen-baseline evaluator regression lock.

Mirror of the reference's evaluator regression (reference:
tests/torch_tests/test_drone_evaluator.py:5-31): running the round-robin
over the shipped frozen checkpoints must reproduce the recorded scores —
an end-to-end determinism lock on env + spawning + observation encoding +
checkpoint loading + greedy inference.

Scores recorded from the 10 fixed seeds × 1000 steps round-robin of the
five baselines (trained by scripts/create_baselines.py, frozen at commit
time) on the CPU backend that the test suite pins. The lock is
backend-specific: greedy argmax amplifies the tiniest Q-value difference
into different trajectories, so TPU runs (different matmul accumulation)
produce different — individually deterministic — scores, e.g. agent-1
scores -55.13 on TPU v5e vs -56.02 here. The reference's equivalent lock
was likewise CPU-only.
"""

import os

import numpy as np
import pytest

from dronerl_tpu.evaluator.evaluator import evaluate_checkpoints

BASE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "dronerl_tpu", "evaluator", "baselines")

EXPECTED = {
    "dqn-agent-1": (-56.0200, 16.9308),
    "dqn-agent-2": (-72.1200, 27.1892),
    "dqn-agent-3": (-58.0500, 21.2450),
    "dqn-agent-4": (-52.3000, 23.3050),
    "dqn-agent-5": (-46.4600, 16.4000),
}


@pytest.mark.slow
def test_baseline_round_robin_scores():
    paths = [os.path.join(BASE, f"{name}.safetensors") for name in EXPECTED]
    for path in paths:
        assert os.path.exists(path), f"missing frozen baseline {path}"
    results = evaluate_checkpoints(paths)
    for i, (name, (mean, std)) in enumerate(EXPECTED.items()):
        np.testing.assert_allclose(
            results["mean"][i], mean, rtol=0.01,
            err_msg=f"{name} mean score drifted")
        np.testing.assert_allclose(
            results["std"][i], std, rtol=0.01,
            err_msg=f"{name} std drifted")


# The reference's OWN frozen checkpoints (reference: sample_models/
# dqn-agent-{1..5}.safetensors, torch NCHW format), scored through THIS
# evaluator on the pinned CPU backend. The reference locks these same
# files at (-64.98, -81.31, -65.08, -71.88, -68.43) on its stack
# (reference: tests/torch_tests/test_drone_evaluator.py:5-11); exact
# score reproduction is impossible by design (its env consumes CPython
# `random` in dict order — PARITY.md), but the capability is the same:
# load the real competition checkpoints, fly the round-robin, and pin
# the result. Ordering agrees on the best/worst spread and the scores
# land in the same band, which is as close as two engines with
# different RNG streams can witness each other.
REFERENCE_CKPT_DIR = "/root/reference/sample_models"
EXPECTED_REFERENCE_CKPTS = {
    "dqn-agent-1": (-56.1800, 6.0091),
    "dqn-agent-2": (-83.4500, 10.3328),
    "dqn-agent-3": (-59.9000, 5.8829),
    "dqn-agent-4": (-70.5900, 8.9717),
    "dqn-agent-5": (-64.5000, 9.5709),
}


@pytest.mark.slow
def test_reference_sample_models_round_robin_scores():
    paths = [os.path.join(REFERENCE_CKPT_DIR, f"{n}.safetensors")
             for n in EXPECTED_REFERENCE_CKPTS]
    if not all(os.path.exists(p) for p in paths):
        pytest.skip("reference checkout not available")
    results = evaluate_checkpoints(paths)
    for i, (name, (mean, std)) in enumerate(EXPECTED_REFERENCE_CKPTS.items()):
        np.testing.assert_allclose(
            results["mean"][i], mean, rtol=0.01,
            err_msg=f"{name} mean score drifted")
        np.testing.assert_allclose(
            results["std"][i], std, rtol=0.01,
            err_msg=f"{name} std drifted")
