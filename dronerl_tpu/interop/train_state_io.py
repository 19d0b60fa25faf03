"""Full-training-state checkpointing (resume support).

Persists the complete scan carry — PRNG key, batched env states, current
observations, learner state (params / target / optimizer / ε), replay
buffer contents and step counter — so a run can resume exactly where it
stopped. This closes the reference's gap of weights-only checkpoints
(reference saves q-network params only, reference: train_jax.py:238-249).

Format: flax msgpack state-dict. The caller supplies a template carry with
the right structure/shapes (built from the same CLI args), which also acts
as a shape/dtype check on restore.
"""

from typing import Any

import jax
from flax import serialization


def save(path: str, carry: Any) -> None:
    carry = jax.device_get(carry)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(carry))


def restore(path: str, template: Any) -> Any:
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(template, data)
