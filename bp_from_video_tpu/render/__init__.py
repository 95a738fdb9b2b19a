"""Display: on-device overlay/plot rasterization + host window shell."""

from bp_from_video_tpu.render.drawer import Drawer

__all__ = ["Drawer"]
