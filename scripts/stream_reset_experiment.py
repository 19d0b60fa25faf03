"""Measure the StreamReplay reset-boundary approximation's training impact.

The fused/ring engines store each observation once (StreamReplay): a
transition recorded on a periodic-reset tick pairs with the POST-reset
observation instead of the true pre-reset one the jnp engine stores
(1 in ``reset_env_every`` stored transitions; counted exactly by
tests/test_replay.py::test_stream_replay_reset_corruption_count).
Reference semantics being approximated: the reference trainer stores the
pre-reset next_obs (reference: train_jax.py:101-113).

This experiment isolates EXACTLY that semantic difference, holding
everything else fixed: both variants run the identical jnp-engine tick,
buffer, layout and RNG stream; the "stream" variant merely pushes the
post-reset observation as next_obs on reset-crossing ticks (what
StreamReplay's offset arithmetic yields), while "exact" pushes the
pre-reset one. Paired per-seed comparison at the trainer-default reset
cadence (R=100, 1% corrupted tuples) and a 10x stress cadence (R=10,
10% corrupted).

Outputs per run: final greedy eval reward (train.evaluate protocol) and
mean TD loss over the final scan chunk. Results frozen in
scripts/stream_reset_results.json; PERF.md summarizes.

Run: PYTHONPATH=. python scripts/stream_reset_experiment.py [--quick]
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")  # isolate semantics on CPU
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dronerl_tpu import replay  # noqa: E402
from dronerl_tpu import train as train_mod  # noqa: E402
from dronerl_tpu.agents.dqn import DQN  # noqa: E402
from dronerl_tpu.constants import NUM_ACTIONS  # noqa: E402
from dronerl_tpu.env import core as env_core  # noqa: E402


def build_tick(agent, buffer, env_params, num_envs, reset_env_every,
               stream_semantics: bool):
    """build_train_step's tick with a switchable next_obs-at-reset rule.

    Mirrors dronerl_tpu/train.py::build_train_step line for line; the
    ONLY divergence is which observation is stored as next_obs on ticks
    where ``step % reset_env_every == 0``.
    """
    obs_dim = agent.obs_dim

    def learner_obs(states):
        return env_core.observe_batch(states, env_params, 1).reshape(
            num_envs, 1, obs_dim)

    def tick(carry, _):
        rng, env_states, obs, ag_state, bstate, step = carry
        rng, rand_key, act_key, step_key, sample_key, reset_key = (
            jax.random.split(rng, 6))

        actions = jax.random.randint(
            rand_key, (num_envs, env_params.n_drones), 0, NUM_ACTIONS)
        dqn_actions = agent.act(act_key, obs[:, 0], ag_state)
        actions = actions.at[:, 0].set(dqn_actions)

        step_keys = jax.random.split(step_key, num_envs)
        env_states, rewards, dones = env_core.step_batch(
            step_keys, env_states, actions, env_params)
        next_obs = learner_obs(env_states)

        def fresh_envs(reset_rng):
            states = env_core.reset_batch(reset_rng, env_params, num_envs)
            return states, learner_obs(states)

        env_states2, next_obs2 = jax.lax.cond(
            step % reset_env_every == 0, fresh_envs,
            lambda _: (env_states, next_obs), reset_key)

        # THE experimental variable: stream semantics store the post-
        # reset observation as next_obs on crossing ticks.
        stored_next = next_obs2 if stream_semantics else next_obs

        exps = {
            "obs": obs.reshape(num_envs, obs_dim),
            "actions": actions[:, :1].reshape(-1),
            "rewards": rewards[:, :1].reshape(-1),
            "next_obs": stored_next.reshape(num_envs, obs_dim),
            "dones": dones[:, :1].reshape(-1),
        }
        bstate = buffer.push_many(bstate, exps)

        def do_train(operand):
            ag, bs, key = operand
            batch = buffer.sample(key, bs)
            batch = dict(batch, dones=batch["dones"].astype(jnp.float32))
            return agent.train_step(ag, batch)

        ag_state, loss = jax.lax.cond(
            buffer.can_sample(bstate), do_train,
            lambda operand: (operand[0], 0.0),
            (ag_state, bstate, sample_key))

        ag_state = jax.lax.cond(
            step % agent.config.target_update_interval == 0,
            agent.update_target, lambda s: s, ag_state)
        ag_state = jax.lax.cond(
            agent.should_decay_epsilon(step, dones[0, 0]),
            agent.decay_epsilon, lambda s: s, ag_state)

        carry = (rng, env_states2, next_obs2, ag_state, bstate, step + 1)
        return carry, (rewards[:, 0], loss)

    return tick


def run_one(args, seed, reset_env_every, stream_semantics):
    env_params = train_mod.env_params_from_args(args)
    agent = DQN(train_mod.agent_config_from_args(args), env_params)
    num_envs = args.num_envs

    buffer = replay.ReplayBuffer(
        capacity=args.memory_size, batch_size=args.batch_size,
        uniform_pushes=True)
    template = {
        "obs": jnp.zeros((agent.obs_dim,), jnp.float32),
        "actions": jnp.array(0, jnp.int32),
        "rewards": jnp.array(0.0, jnp.float32),
        "next_obs": jnp.zeros((agent.obs_dim,), jnp.float32),
        "dones": jnp.array(False, jnp.bool_),
    }
    rng = jax.random.PRNGKey(seed)
    env_states = env_core.reset_batch(rng, env_params, num_envs)
    ag_state = agent.init_state(rng)
    obs = env_core.observe_batch(env_states, env_params, 1).reshape(
        num_envs, 1, agent.obs_dim)
    carry = (rng, env_states, obs, ag_state, buffer.init(template),
             jnp.array(0))

    tick = build_tick(agent, buffer, env_params, num_envs,
                      reset_env_every, stream_semantics)

    @jax.jit
    def chunk(carry, dummy):
        return jax.lax.scan(tick, carry, dummy)

    scan_steps = args.num_steps // 2
    losses = None
    for _ in range(2):
        carry, (_, losses) = chunk(carry, jnp.zeros((scan_steps,)))
    ag_state = carry[3]
    trained = losses[losses >= 0.0]  # NO_TRAIN_LOSS sentinel is negative
    td_loss = float(trained.mean()) if trained.size else float("nan")

    (emean, estd), (rmean, _) = train_mod.evaluate(args, agent, ag_state)
    return {"seed": seed, "reset_env_every": reset_env_every,
            "semantics": "stream" if stream_semantics else "exact",
            "eval_reward": emean, "eval_std": estd,
            "random_reward": rmean, "td_loss_final_chunk": td_loss}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="1 seed, 4k steps (smoke)")
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--num_steps", type=int, default=50_000)
    cli = p.parse_args()
    if cli.quick:
        cli.seeds, cli.num_steps = 1, 4_000

    args = train_mod.parse_args([
        "--num_envs", "32", "--num_steps", str(cli.num_steps),
        "--memory_size", "100000", "--batch_size", "64",
        "--num_evals", "5", "--num_eval_steps", "5000",
        "--epsilon_decay_every", "5",
    ])
    results = []
    for reset_env_every in (100, 10):
        for seed in range(cli.seeds):
            for stream_semantics in (False, True):
                t0 = time.time()
                r = run_one(args, seed, reset_env_every, stream_semantics)
                r["wall_s"] = round(time.time() - t0, 1)
                results.append(r)
                print(json.dumps(r), flush=True)

    # Paired per-seed deltas (stream − exact)
    summary = {}
    for reset_env_every in (100, 10):
        deltas = []
        for seed in range(cli.seeds):
            pair = {r["semantics"]: r for r in results
                    if r["seed"] == seed
                    and r["reset_env_every"] == reset_env_every}
            deltas.append(pair["stream"]["eval_reward"]
                          - pair["exact"]["eval_reward"])
        summary[f"R={reset_env_every}"] = {
            "per_seed_eval_delta_stream_minus_exact":
                [round(d, 4) for d in deltas],
            "mean_delta": round(sum(deltas) / len(deltas), 4),
        }
    out = {"config": {"num_envs": 32, "num_steps": cli.num_steps,
                      "seeds": cli.seeds}, "runs": results,
           "summary": summary}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "stream_reset_results.json")
    if not cli.quick:
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {path}", flush=True)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
