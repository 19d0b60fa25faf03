"""Training-quality parity lock vs the reference trainer.

The frozen numbers in scripts/quality_parity_results.json come from
scripts/quality_parity.py: both trainers run at the matched CLI-default
config (grid 9, 4 drones, dense (16,16), num_envs 1 — reference:
train_jax.py:338-365) for 50k steps x 5 seeds on CPU, evaluated with the
same protocol (5 greedy episodes x 10k steps).

Two locks:
* a fast statistical check that the recorded repo results sit inside the
  reference's seed band (guards the frozen experiment record);
* a ``slow`` re-run of one repo seed asserting it still lands in the
  band (guards the live trainer against quality regressions).
"""

import json
import os
import statistics
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(REPO, "scripts", "quality_parity_results.json")
RESULTS_CONV = os.path.join(
    REPO, "scripts", "quality_parity_results_conv.json")


RESULTS_128 = os.path.join(
    REPO, "scripts", "quality_parity_results_dense128x64.json")
_RESULT_FILES = {
    "dense": RESULTS, "conv": RESULTS_CONV, "dense128x64": RESULTS_128}


@pytest.fixture(scope="module", params=sorted(_RESULT_FILES))
def results(request):
    path = _RESULT_FILES[request.param]
    if not os.path.exists(path):
        pytest.skip(f"{request.param} quality parity experiment not run")
    with open(path) as f:
        return json.load(f)


def band(rows, z=4.0):
    means = [r["eval_reward_mean"] for r in rows]
    mu = statistics.mean(means)
    sd = statistics.stdev(means) if len(means) > 1 else 0.01
    return mu - z * sd, mu + z * sd


def test_recorded_parity_within_seed_variance(results):
    ref_rows, repo_rows = results["reference"], results["repo"]
    assert len(ref_rows) >= 3 and len(repo_rows) >= 3
    lo, hi = band(ref_rows)
    repo_mean = statistics.mean(r["eval_reward_mean"] for r in repo_rows)
    assert lo <= repo_mean <= hi, (
        f"repo mean {repo_mean:.4f} outside reference band "
        f"[{lo:.4f}, {hi:.4f}]")
    # Both sides must decisively beat their own random-agent baseline.
    for rows in (ref_rows, repo_rows):
        agent = statistics.mean(r["eval_reward_mean"] for r in rows)
        rand = statistics.mean(r["random_reward_mean"] for r in rows)
        assert agent > rand + 0.1


def test_conv_matmul_lands_in_conv_reference_band():
    """--conv_matmul (the im2col lowering that runs the conv actor inside
    the fused Pallas kernel, ops/conv2mat.py) changes only float summation
    order vs the flax conv path, so its quality lock is the SAME frozen
    reference band as the conv experiment: repo runs from
    quality_parity_results_conv_matmul.json must sit inside the reference
    rows of quality_parity_results_conv.json."""
    path = os.path.join(
        REPO, "scripts", "quality_parity_results_conv_matmul.json")
    if not (os.path.exists(path) and os.path.exists(RESULTS_CONV)):
        pytest.skip("conv_matmul quality experiment not run")
    with open(path) as f:
        data = json.load(f)
    with open(RESULTS_CONV) as f:
        conv = json.load(f)
    assert data["reference"] == []  # compares against the conv band
    rows = data["repo"]
    assert len(rows) >= 3
    lo, hi = band(conv["reference"])
    repo_mean = statistics.mean(r["eval_reward_mean"] for r in rows)
    assert lo <= repo_mean <= hi, (
        f"conv_matmul repo mean {repo_mean:.4f} outside conv reference "
        f"band [{lo:.4f}, {hi:.4f}]")
    rand = statistics.mean(r["random_reward_mean"] for r in rows)
    assert repo_mean > rand + 0.1


_GLOBAL_RESULT_FILES = {
    "global": os.path.join(
        REPO, "scripts", "quality_parity_results_global.json"),
    "conv_global": os.path.join(
        REPO, "scripts", "quality_parity_results_conv_global.json"),
}


@pytest.mark.parametrize("name", sorted(_GLOBAL_RESULT_FILES))
def test_global_wrapper_learning_datapoint(name):
    """--wrapper global runs are repo-only (no reference trainer exposes
    the full-grid view — jax_impl/env/env.py:275-277 raises,
    train_torch.py:41 hardcodes WindowedGridView), so the lock is
    against the run's own random-policy baseline: the trained agent must
    decisively beat random on the global observation surface."""
    path = _GLOBAL_RESULT_FILES[name]
    if not os.path.exists(path):
        pytest.skip(f"{name} quality experiment not run")
    with open(path) as f:
        data = json.load(f)
    assert data["reference"] == []  # repo-only by design
    rows = data["repo"]
    assert len(rows) >= 3
    agent = statistics.mean(r["eval_reward_mean"] for r in rows)
    rand = statistics.mean(r["random_reward_mean"] for r in rows)
    assert agent > rand + 0.03, (
        f"global-obs agent {agent:.4f} not decisively above random "
        f"{rand:.4f}")


@pytest.mark.slow
def test_fresh_repo_run_lands_in_reference_band(tmp_path):
    """Train 50k steps at the matched (dense) config NOW and assert the
    final eval reward still falls inside the frozen reference seed band."""
    if not os.path.exists(RESULTS):
        pytest.skip("dense quality parity experiment not run")
    with open(RESULTS) as f:
        results = json.load(f)
    num_steps = results["config"]["num_steps"]
    run_dir = str(tmp_path / "fresh")
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "from dronerl_tpu.train import main;"
        f"main(['--seed', '0', '--num_steps', '{num_steps}',"
        f" '--run_dir', {run_dir!r}])")
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                   check=True, timeout=1800, capture_output=True)
    with open(os.path.join(run_dir, "metrics.json")) as f:
        metrics = json.load(f)
    lo, hi = band(results["reference"], z=6.0)
    assert lo <= metrics["eval_reward_mean"] <= hi
