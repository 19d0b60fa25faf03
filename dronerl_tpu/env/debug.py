"""Human-readable board/action printers for debugging sessions.

Host-side only (never jitted). Capability mirror of the reference debug
printers (reference: jax_impl/env/env.py:311-339).
"""

import jax
import numpy as np

from dronerl_tpu.constants import Object
from dronerl_tpu.env.types import EnvState

ACTION_GLYPHS = ["←", "↓", "→", "↑", "X"]

_TILE_GLYPHS = {
    0: "⬜",
    Object.SKYSCRAPER.value: "🏢",
    Object.STATION.value: "🔌",
    Object.DROPZONE.value: "📍",
    Object.PACKET.value: "📦",
}


def format_actions(actions) -> list:
    """Map integer actions to arrow glyphs."""
    return [ACTION_GLYPHS[int(a)] for a in np.asarray(actions)]


def board_string(state: EnvState) -> str:
    """Render the ground grid plus drones as an emoji board."""
    board = np.array(jax.device_get(state.ground))
    air_x = np.asarray(jax.device_get(state.air_x))
    air_y = np.asarray(jax.device_get(state.air_y))
    carrying = np.asarray(jax.device_get(state.carrying_package))

    drone_at = {}
    for i, (x, y) in enumerate(zip(air_x, air_y)):
        drone_at[(int(y), int(x))] = i

    lines = []
    for y in range(board.shape[0]):
        row = []
        for x in range(board.shape[1]):
            if (y, x) in drone_at:
                i = drone_at[(y, x)]
                row.append(f"📦{i}" if carrying[i] else f"P{i}")
            else:
                row.append(_TILE_GLYPHS.get(int(board[y, x]), "❓"))
        lines.append(" ".join(row))
    return "\n".join(lines)


def print_board(state: EnvState) -> None:
    print(board_string(state))
