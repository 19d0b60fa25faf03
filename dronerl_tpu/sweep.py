"""W&B Bayesian hyper-parameter sweep entry point.

Capability mirror of the reference sweeps (reference: run_jax_sweep.py:13-68,
torch_impl/sweep.py:17-132): a bayes search over network topology, env
batch, exploration schedule, batch size and learning rate, maximizing final
eval reward. Sharding turns on automatically when the env batch spans
multiple devices.

Run: PYTHONPATH=. python -m dronerl_tpu.sweep [--count 20] [--num_steps 5000000]
Requires the optional ``wandb`` dependency.
"""

import argparse


SWEEP_CONFIG = {
    "method": "bayes",
    "metric": {"goal": "maximize", "name": "eval_reward"},
    "parameters": {
        # Topology is one joint parameter so the bayes optimizer never
        # explores a dead dimension (hidden_layers has no effect on conv
        # nets; the reference likewise fixes topology per network type,
        # reference: run_jax_sweep.py:17-26). "dense:<widths>" sets
        # --hidden_layers; "conv[:<head widths>]" sets the CLI-default
        # conv stack with an optional --conv_dense_layers head.
        "topology": {"values": [
            "dense:16,16", "dense:64,32", "dense:128,64",
            "conv", "conv:32",
        ]},
        "num_envs": {"values": [1, 8, 64, 512]},
        "epsilon_end": {"values": [0.01, 0.05, 0.1]},
        "batch_size": {"values": [8, 32, 128]},
        "learning_rate": {"values": [1e-2, 1e-3, 1e-4]},
        # Learner schedule + env shaping, matching the reference torch
        # sweep's space (reference: torch_impl/sweep.py:96-127: gamma,
        # target_update_interval, epsilon_decay, memory_size, n_drones,
        # pickup_reward; topology covers its size/num_layers).
        "gamma": {"values": [0.9, 0.95, 0.99, 0.995, 0.999]},
        "target_update_interval": {"values": [1, 10, 100]},
        "epsilon_decay": {"values": [0.9, 0.95, 0.99, 0.995, 0.999]},
        "epsilon_decay_every": {"values": [1, 5, 25]},
        "memory_size": {"values": [1_000, 10_000, 100_000]},
        "n_drones": {"values": [2, 4, 8]},
        "pickup_reward": {"values": [0.0, 0.1, 0.5, 1.0]},
    },
}


def run_trial(num_steps: int):
    import wandb

    from dronerl_tpu import train as train_mod

    run = wandb.init()
    cfg = wandb.config
    net, _, spec = cfg.topology.partition(":")
    argv = [
        "--num_steps", str(num_steps),
        "--network_type", net,
        "--num_envs", str(cfg.num_envs),
        "--epsilon_end", str(cfg.epsilon_end),
        "--batch_size", str(cfg.batch_size),
        "--learning_rate", str(cfg.learning_rate),
        "--gamma", str(cfg.gamma),
        "--target_update_interval", str(cfg.target_update_interval),
        "--epsilon_decay", str(cfg.epsilon_decay),
        "--epsilon_decay_every", str(cfg.epsilon_decay_every),
        "--memory_size", str(cfg.memory_size),
        "--n_drones", str(cfg.n_drones),
        "--pickup_reward", str(cfg.pickup_reward),
    ]
    if net == "dense":
        argv += ["--hidden_layers", *spec.split(",")]
    elif spec:
        argv += ["--conv_dense_layers", *spec.split(",")]
    import jax

    if cfg.num_envs > 1 and cfg.num_envs % jax.device_count() == 0 \
            and jax.device_count() > 1:
        argv.append("--use_sharding")
    args = train_mod.parse_args(argv)
    metrics = train_mod.train(args)
    run.log({
        "eval_reward": metrics.get("eval_reward_mean", float("-inf")),
        "obs_per_sec": metrics["obs_per_sec"],
    })
    run.finish()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--count", type=int, default=20)
    parser.add_argument("--num_steps", type=int, default=5_000_000)
    parser.add_argument("--project", type=str, default="dronerl-tpu-sweep")
    parser.add_argument("--entity", type=str, default=None)
    args = parser.parse_args()

    import wandb

    sweep_id = wandb.sweep(
        SWEEP_CONFIG, project=args.project, entity=args.entity)
    wandb.agent(sweep_id, lambda: run_trial(args.num_steps),
                count=args.count)


if __name__ == "__main__":
    main()
