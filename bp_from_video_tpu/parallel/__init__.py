"""Parallel execution: device meshes, stream data-parallelism, tensor
sharding (the rebuild's replacement for the reference's 4-process host
pipeline, pbp.py)."""

from bp_from_video_tpu.parallel.mesh import (
    MODEL_AXIS, STREAM_AXIS, make_mesh, replicate, shard_params,
    shard_streams, stream_sharding)
from bp_from_video_tpu.parallel.streams import ClipOutputs, MultiStreamEngine

__all__ = [
    "MODEL_AXIS", "STREAM_AXIS", "make_mesh", "replicate", "shard_params",
    "shard_streams", "stream_sharding", "ClipOutputs", "MultiStreamEngine",
]
