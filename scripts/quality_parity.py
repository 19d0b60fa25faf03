"""Training-quality parity experiment: reference trainer vs dronerl_tpu.

Runs /root/reference/train_jax.py and ``python -m dronerl_tpu.train`` at
the matched CLI-default config (grid 9, 4 drones, (16,16) dense — the
reference trainer's defaults, reference: train_jax.py:338-365) for N
seeds each on CPU, at the same step count and eval protocol (5 greedy
eval episodes x 10k steps, eval seeds 0..4), and records final eval
rewards side by side.

Output: scripts/quality_parity_results.json, updated after every run so
a partial sweep is still usable. The summary table is reproduced in
PERF.md and locked by tests/test_quality_parity.py (band check against
these frozen results).

Usage:  python scripts/quality_parity.py [--num_steps 50000] [--seeds 0 1 2]
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
STUBS = os.path.join(REPO, "scripts", "_stubs")
RESULTS = os.path.join(REPO, "scripts", "quality_parity_results.json")

EVAL_RE = re.compile(
    r"Final mean eval reward: (-?\d+\.\d+) . (-?\d+\.\d+) "
    r"\(random agent: (-?\d+\.\d+) . (-?\d+\.\d+)\)")


def cpu_env(pythonpath: str) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = pythonpath  # deliberately excludes the axon plugin
    env["JAX_PLATFORMS"] = "cpu"
    return env


def run_reference(seed: int, num_steps: int, extra=()) -> dict:
    cmd = [sys.executable, "train_jax.py",
           "--seed", str(seed), "--num_steps", str(num_steps), *extra]
    t0 = time.time()
    proc = subprocess.run(
        cmd, cwd=REFERENCE, env=cpu_env(f"{STUBS}:{REFERENCE}"),
        capture_output=True, text=True, timeout=3600)
    out = proc.stdout + proc.stderr
    m = EVAL_RE.search(out)
    if proc.returncode != 0 or not m:
        raise RuntimeError(f"reference run seed={seed} failed:\n{out[-3000:]}")
    return {
        "seed": seed,
        "eval_reward_mean": float(m.group(1)),
        "eval_reward_std": float(m.group(2)),
        "random_reward_mean": float(m.group(3)),
        "random_reward_std": float(m.group(4)),
        "wall_seconds": round(time.time() - t0, 1),
    }


def run_repo(seed: int, num_steps: int, extra=(), tag="") -> dict:
    run_dir = os.path.join(REPO, "output", f"parity{tag}_seed{seed}")
    argv = ["--seed", str(seed), "--num_steps", str(num_steps),
            "--run_dir", run_dir, *extra]
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "from dronerl_tpu.train import main;"
        f"main({argv!r})")
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=cpu_env(REPO),
        capture_output=True, text=True, timeout=3600)
    metrics_path = os.path.join(run_dir, "metrics.json")
    if proc.returncode != 0 or not os.path.exists(metrics_path):
        out = proc.stdout + proc.stderr
        raise RuntimeError(f"repo run seed={seed} failed:\n{out[-3000:]}")
    with open(metrics_path) as f:
        metrics = json.load(f)
    out = proc.stdout + proc.stderr
    m = re.search(r"random (-?\d+\.\d+) . (-?\d+\.\d+)", out)
    return {
        "seed": seed,
        "eval_reward_mean": metrics["eval_reward_mean"],
        "eval_reward_std": metrics["eval_reward_std"],
        "random_reward_mean": float(m.group(1)) if m else None,
        "random_reward_std": float(m.group(2)) if m else None,
        "wall_seconds": round(time.time() - t0, 1),
    }


def save(results: dict) -> None:
    with open(RESULTS, "w") as f:
        json.dump(results, f, indent=2)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--num_steps", type=int, default=50_000)
    p.add_argument("--seeds", nargs="+", type=int, default=[0, 1, 2])
    p.add_argument("--network_type", choices=["dense", "conv"],
                   default="dense",
                   help="conv writes to quality_parity_results_conv.json")
    p.add_argument("--hidden_layers", nargs="+", type=int, default=None,
                   help="dense widths; non-default writes to "
                        "quality_parity_results_dense<widths>.json")
    p.add_argument("--conv_matmul", action="store_true",
                   help="repo side runs the im2col conv lowering "
                        "(--conv_matmul); no reference runs of its own — "
                        "compare against the frozen reference band in "
                        "quality_parity_results_conv.json; writes to "
                        "quality_parity_results_conv_matmul.json")
    p.add_argument("--wrapper", choices=["window", "global"],
                   default="window",
                   help="'global' is repo-only (neither reference trainer "
                        "exposes the full-grid view on its CLI: the jax env "
                        "raises for wrapper!='window', train_torch.py "
                        "hardcodes WindowedGridView); writes to "
                        "quality_parity_results_global.json")
    args = p.parse_args()

    global RESULTS
    extra = ()
    net_desc = "dense (16,16)"
    if args.conv_matmul and args.network_type != "conv":
        p.error("--conv_matmul requires --network_type conv")
    if args.network_type == "conv":
        RESULTS = RESULTS.replace(".json", "_conv.json")
        extra = ("--network_type", "conv")
        net_desc = "conv (8ch 3x3, CLI default)"
        if args.conv_matmul:
            RESULTS = RESULTS.replace("_conv.json", "_conv_matmul.json")
            extra = (*extra, "--conv_matmul")
            net_desc += ", im2col matmul lowering"
    elif args.hidden_layers:
        widths = "x".join(str(w) for w in args.hidden_layers)
        RESULTS = RESULTS.replace(".json", f"_dense{widths}.json")
        extra = ("--hidden_layers", *map(str, args.hidden_layers))
        net_desc = f"dense ({widths})"
    if args.wrapper == "global":
        RESULTS = RESULTS.replace(".json", "_global.json")
        extra = (*extra, "--wrapper", "global")
        net_desc += ", global (full-grid) obs"

    results = {"config": {
        "num_steps": args.num_steps, "seeds": args.seeds,
        "trainer_config": f"CLI defaults: grid 9, 4 drones, {net_desc}, "
                          "num_envs 1, batch 8, lr 1e-3, gamma 0.9",
        "eval": "5 greedy episodes x 10k steps, eval seeds 0-4",
    }, "reference": [], "repo": []}
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            prev = json.load(f)
        if prev.get("config", {}).get("num_steps") == args.num_steps:
            results = prev

    if args.network_type == "conv":
        tag = "_conv_matmul" if args.conv_matmul else "_conv"
    elif args.hidden_layers:
        tag = "_dense" + "x".join(str(w) for w in args.hidden_layers)
    else:
        tag = ""
    if args.wrapper == "global":
        tag += "_global"
        results["config"]["reference"] = (
            "none: no reference trainer exposes a full-grid view "
            "(jax_impl/env/env.py:275-277 raises; train_torch.py:41 "
            "hardcodes WindowedGridView). Repo-only learning datapoint; "
            "compare against this file's own random_reward_mean.")
    if args.conv_matmul and args.wrapper != "global":
        # (global keeps its "no reference" note above — the frozen conv
        # band was measured on window obs and is not a global baseline)
        results["config"]["reference"] = (
            "frozen reference conv band in quality_parity_results_conv.json"
            " — the lowering changes only float summation order, so the "
            "flax-conv reference rows are the comparison baseline; no "
            "reference runs are repeated here.")
    skip_reference = args.wrapper == "global" or args.conv_matmul
    ref_extra = () if args.wrapper == "global" else extra
    for seed in args.seeds:
        if not any(r["seed"] == seed for r in results["repo"]):
            print(f"[repo] seed {seed} ...", flush=True)
            results["repo"].append(
                run_repo(seed, args.num_steps, extra, tag))
            save(results)
            print(f"[repo] seed {seed}: {results['repo'][-1]}", flush=True)
        if not skip_reference and not any(
                r["seed"] == seed for r in results["reference"]):
            print(f"[ref ] seed {seed} ...", flush=True)
            results["reference"].append(
                run_reference(seed, args.num_steps, ref_extra))
            save(results)
            print(f"[ref ] seed {seed}: {results['reference'][-1]}", flush=True)

    for side in ("reference", "repo"):
        if not results[side]:
            continue
        means = [r["eval_reward_mean"] for r in results[side]]
        print(f"{side}: mean over seeds = {sum(means) / len(means):.4f}  "
              f"per-seed = {[round(m, 4) for m in means]}")


if __name__ == "__main__":
    main()
