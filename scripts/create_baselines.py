"""Train and freeze the five evaluator baseline agents.

Capability mirror of the reference baseline creator (reference:
create_baselines.py:14-122): four dense nets of increasing width plus one
conv net, trained against random opponents, frozen as jax-format
safetensors under dronerl_tpu/evaluator/baselines/.

Run: PYTHONPATH=. python scripts/create_baselines.py [--num_steps 20000]
"""

import argparse
import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dronerl_tpu import train as train_mod  # noqa: E402

BASELINE_SPECS = [
    ("dqn-agent-1", ["--hidden_layers", "8"]),
    ("dqn-agent-2", ["--hidden_layers", "16"]),
    ("dqn-agent-3", ["--hidden_layers", "16", "16"]),
    ("dqn-agent-4", ["--hidden_layers", "32", "16"]),
    ("dqn-agent-5", ["--network_type", "conv", "--conv_dense_layers", "16"]),
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_steps", type=int, default=20_000)
    parser.add_argument("--num_envs", type=int, default=32)
    parser.add_argument("--out_dir", type=str, default=None)
    cli = parser.parse_args()

    out_dir = cli.out_dir or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "..", "dronerl_tpu", "evaluator", "baselines")
    os.makedirs(out_dir, exist_ok=True)

    for i, (name, flags) in enumerate(BASELINE_SPECS):
        print(f"=== training baseline {name} ===", flush=True)
        run_dir = f"/tmp/baseline_{name}"
        args = train_mod.parse_args([
            "--num_steps", str(cli.num_steps),
            "--num_envs", str(cli.num_envs),
            "--batch_size", "32",
            "--seed", str(100 + i),
            "--num_evals", "2",
            "--num_eval_steps", "1000",
            "--save_final_checkpoint",
            "--run_dir", run_dir,
        ] + flags)
        metrics = train_mod.train(args)
        src = glob.glob(os.path.join(run_dir, "*_jax.safetensors"))[0]
        dst = os.path.join(out_dir, f"{name}.safetensors")
        shutil.copy(src, dst)
        print(f"{name}: eval {metrics.get('eval_reward_mean'):.3f} → {dst}",
              flush=True)


if __name__ == "__main__":
    main()
