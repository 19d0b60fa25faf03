"""Minimal gym stub: just enough surface for importing the reference's
torch_impl.agents.dqn (which does `import gym.spaces as spaces` and
`from gym import Env` at module level) without the real gym package.
The interop tests only touch the Q-network factories, never the env."""
from . import spaces  # noqa: F401


class Env:
    pass
