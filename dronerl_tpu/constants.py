"""Shared action / ground-object vocabulary.

The integer values are a public contract: they appear in checkpoints,
observations and on-disk grids, and they must match the reference
implementation exactly (reference: common/constants.py:3-19) so that
rollouts are bit-identical and checkpoints interoperate.
"""

from enum import IntEnum


class Action(IntEnum):
    """Discrete drone actions (grid moves plus hover)."""

    LEFT = 0
    DOWN = 1
    RIGHT = 2
    UP = 3
    STAY = 4

    @classmethod
    def num_actions(cls) -> int:
        return len(cls)


class Object(IntEnum):
    """Ground-layer object codes. 0 encodes an empty cell."""

    SKYSCRAPER = 2
    STATION = 3
    DROPZONE = 4
    PACKET = 5


NUM_ACTIONS: int = Action.num_actions()

# Observation channel layout (one-hot window encoding):
#   0: any drone present, 1: packet (or carried packet at center),
#   2: dropzone, 3: charging station, 4: charge level in [0, 1],
#   5: skyscraper / out-of-board wall.
NUM_OBS_CHANNELS: int = 6

# Loss emitted by warm-up (no-train) scan ticks across every engine
# (train.py, parallel/distributed.py). The TD loss is an MSE — never
# negative — so a negative sentinel is unambiguous, unlike a 0.0
# sentinel which would also drop a genuine zero loss. Readers mask with
# ``losses >= 0.0``.
NO_TRAIN_LOSS: float = -1.0
