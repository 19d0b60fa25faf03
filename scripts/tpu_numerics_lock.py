"""On-chip numerics regression lock (VERDICT r2 weak item 5).

The repo's regression locks (evaluator scores, quality parity, the
bitwise reference-parity matrix) are all CPU-pinned; nothing locked
TPU-side numerics, where MXU bf16 rounding, divide→reciprocal rewrites
and fusion decisions can drift across compiler versions — exactly the
class of bug that once shifted einsum point-ops by ±3 while every CPU
test stayed green (PERF.md "TPU matmuls round f32 inputs to bf16").

This script runs a deterministic fused-ring-engine scenario on the
attached chip and locks two tiers:

Tier A — bitwise (ints) / tight-band (env floats): with epsilon pinned
  at 1.0 every action is threefry-random, so the 64-step trajectory is
  driven only by integer-exact env physics + in-kernel threefry — no
  Q-network output can flip it. Integer state fields and the reward
  ring digest bitwise; the bf16 obs ring is summarized (sum / nonzero
  count / strided sample, atol 1e-2 = bf16 granularity at obs scale).

Tier B — band (learner floats): training still runs on ring samples, so
  the final Q-params and greedy Q-values on a frozen probe batch are
  recorded. Same-compiler re-runs reproduce them bitwise; across
  compiler versions ULP churn amplifies through 64 Adam steps, so the
  check uses rtol 5e-2 — loose enough to survive rewrite churn, tight
  enough to catch real corruption (the ±3 bug was ~1e3 × this band).

Usage (on the chip):
    python scripts/tpu_numerics_lock.py --record   # freeze the record
    python scripts/tpu_numerics_lock.py            # check against it

Frozen record: scripts/tpu_numerics_lock.json (committed).
Structure is schema-checked by tests/test_aux.py on CPU.
"""

import argparse
import hashlib
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dronerl_tpu.agents.dqn import DQN, DQNConfig
from dronerl_tpu.env.types import EnvParams
from dronerl_tpu.train import (
    build_train_step_ring, init_ring_carry, setup_compilation_cache)

RECORD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "tpu_numerics_lock.json")

NUM_ENVS = 256          # smallest fused block ×2 — fast cold compile
STEPS = 64              # one scan; trajectory stays short on purpose
CAPACITY = 4 * NUM_ENVS


def run_scenario(interpret: bool = False) -> dict:
    """One deterministic fused-engine run; returns the observables."""
    env_params = EnvParams(grid_size=9, n_drones=4, window_radius=3)
    config = DQNConfig(
        network_type="dense", hidden_layers=(16, 16),
        # epsilon pinned at 1.0: pure-random actions → the env
        # trajectory is independent of Q numerics (Tier A bit-locks).
        epsilon_start=1.0, epsilon_end=1.0, epsilon_decay=1.0,
        epsilon_decay_every=5, target_update_interval=10, gamma=0.9)
    agent = DQN(config, env_params)
    rng = jax.random.PRNGKey(1234)

    tick = build_train_step_ring(
        agent, env_params, NUM_ENVS, CAPACITY, batch_size=8,
        reset_env_every=100, interpret=interpret)
    carry = init_ring_carry(agent, env_params, NUM_ENVS, CAPACITY, rng,
                            obs_dtype=jnp.bfloat16, batch_size=8)

    @jax.jit
    def run(carry, dummy):
        return jax.lax.scan(tick, carry, dummy)

    carry, (rewards, _eps, losses) = run(carry, jnp.zeros((STEPS,)))
    _rng, (tstate, ring), _scalars, ag_state, _u, _step = (
        jax.device_get(carry))
    rewards = np.asarray(jax.device_get(rewards), dtype=np.float32)
    losses = np.asarray(jax.device_get(losses), dtype=np.float32)

    # Probe: greedy Q-values on the first 32 ring columns (the frozen
    # initial observations — slot 0 is seeded pre-run and the 4-column
    # ring wraps STEPS=64 % 4 == 0 times, so column block 0 holds the
    # step-60..63 writes; deterministic either way).
    probe = jnp.asarray(ring[:, :32], jnp.float32).T
    q_probe = np.asarray(jax.device_get(
        agent.q_values(ag_state.params, probe)), dtype=np.float32)

    out = {"int_digests": {}, "env_floats": {}, "learner": {}}
    # --- Tier A: integer state fields, bitwise ---
    for name, arr in enumerate_fields(tstate):
        a = np.asarray(arr)
        if a.dtype.kind in "iub":
            out["int_digests"][name] = hashlib.sha256(
                np.ascontiguousarray(a).tobytes()).hexdigest()
        else:  # charge: float but exact (+/- constants, clip)
            out["int_digests"][name] = hashlib.sha256(
                np.ascontiguousarray(a.astype(np.float32)).tobytes()
            ).hexdigest()
    out["int_digests"]["rewards_trace"] = hashlib.sha256(
        np.ascontiguousarray(rewards).tobytes()).hexdigest()

    # --- Tier A: bf16 obs ring summary ---
    ring_f = np.asarray(ring, dtype=np.float32)
    out["env_floats"] = {
        "ring_sum": float(ring_f.sum()),
        "ring_nonzero": int((ring_f != 0).sum()),
        "ring_sample": ring_f.reshape(-1)[::4099][:64].tolist(),
    }

    # --- Tier B: learner numerics ---
    leaves = jax.tree_util.tree_leaves(ag_state.params)
    out["learner"] = {
        "param_abs_sums": [float(np.abs(np.asarray(l)).sum())
                           for l in leaves],
        "q_probe": q_probe.reshape(-1).tolist(),
        "loss_tail_mean": float(losses[-16:].mean()),
    }
    return out


def enumerate_fields(tstate):
    """SoA tstate may be a NamedTuple/pytree — yield (name, leaf)."""
    if hasattr(tstate, "_fields"):
        return list(zip(tstate._fields, tstate))
    leaves = jax.tree_util.tree_leaves(tstate)
    return [(f"leaf{i}", l) for i, l in enumerate(leaves)]


def compare(rec: dict, now: dict) -> list:
    errs = []
    for name, digest in rec["int_digests"].items():
        if now["int_digests"].get(name) != digest:
            errs.append(f"Tier A bit mismatch: {name}")
    ef_rec, ef_now = rec["env_floats"], now["env_floats"]
    if ef_rec["ring_nonzero"] != ef_now["ring_nonzero"]:
        errs.append("Tier A: ring nonzero-count changed "
                    f"{ef_rec['ring_nonzero']} -> {ef_now['ring_nonzero']}")
    if not np.isclose(ef_rec["ring_sum"], ef_now["ring_sum"],
                      rtol=1e-3, atol=1.0):
        errs.append(f"Tier A: ring sum {ef_rec['ring_sum']} -> "
                    f"{ef_now['ring_sum']}")
    if not np.allclose(ef_rec["ring_sample"], ef_now["ring_sample"],
                       atol=1e-2):
        errs.append("Tier A: ring sample drifted past bf16 granularity")
    lr_rec, lr_now = rec["learner"], now["learner"]
    if not np.allclose(lr_rec["param_abs_sums"], lr_now["param_abs_sums"],
                       rtol=5e-2):
        errs.append("Tier B: trained-param abs-sums outside 5% band")
    if not np.allclose(lr_rec["q_probe"], lr_now["q_probe"],
                       rtol=5e-2, atol=5e-3):
        errs.append("Tier B: greedy Q probe outside band")
    return errs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--record", action="store_true")
    p.add_argument("--interpret", action="store_true",
                   help="CPU interpret-mode run (debug only; the frozen "
                        "record is chip-native)")
    args = p.parse_args()

    if args.interpret:
        # Debug mode must not depend on the chip being reachable: force
        # the CPU backend before the first JAX call (env vars are
        # overridden by the preregistered TPU plugin — see ring_bench.py).
        jax.config.update("jax_platforms", "cpu")
    setup_compilation_cache("/root/repo/jax_cache")
    dev = jax.devices()[0]
    t0 = time.perf_counter()
    now = run_scenario(interpret=args.interpret)
    wall = time.perf_counter() - t0

    if args.record:
        now["meta"] = {
            "device_kind": dev.device_kind, "platform": dev.platform,
            "jax_version": jax.__version__,
            "num_envs": NUM_ENVS, "steps": STEPS,
            "recorded_wall_s": round(wall, 1),
        }
        with open(RECORD, "w") as f:
            json.dump(now, f, indent=1)
        print(f"recorded -> {RECORD} ({wall:.1f}s on {dev.device_kind})")
        return

    with open(RECORD) as f:
        rec = json.load(f)
    errs = compare(rec, now)
    if errs:
        print("TPU numerics lock FAILED:")
        for e in errs:
            print(" -", e)
        sys.exit(1)
    print(f"TPU numerics lock OK ({wall:.1f}s on {dev.device_kind}; "
          f"record from {rec['meta']['device_kind']}, "
          f"jax {rec['meta']['jax_version']})")


if __name__ == "__main__":
    main()
