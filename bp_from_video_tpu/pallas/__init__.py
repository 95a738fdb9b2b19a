"""Pallas TPU kernels for the hot ops."""

from bp_from_video_tpu.pallas.warp_kernel import multi_crop, multi_crop_reference

__all__ = ["multi_crop", "multi_crop_reference"]
