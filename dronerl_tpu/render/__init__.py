"""Host-side visualization: PIL frame renderer and video encoding."""

from dronerl_tpu.render.renderer import Renderer
from dronerl_tpu.render.video import encode_video, render_policy_video

__all__ = ["Renderer", "encode_video", "render_policy_video"]
