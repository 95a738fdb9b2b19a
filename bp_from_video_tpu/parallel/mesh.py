"""Device-mesh construction and sharding placement helpers.

The reference's only parallelism is a 4-process host pipeline over depth-1
queues (reference pbp.py:14-75).  On TPU the inter-stage transport disappears
into XLA dataflow (the whole per-frame pipeline is one jitted step), and the
parallelism axes that remain are:

  * ``dp`` — data parallelism over independent video streams (the rebuild's
    multi-stream config; SURVEY.md §2.3).  Stream state, frames, and
    timestamps are sharded on their leading stream axis; no collectives are
    needed in the forward step because streams are independent.
  * ``tp`` — tensor parallelism over model weight channels for the vision
    nets.  Wide conv kernels / dense matrices are sharded on their output-
    channel axis; XLA's GSPMD partitioner inserts the all-gathers /
    reduce-scatters over ICI.

Everything here is plain ``jax.sharding`` — pick a mesh, annotate shardings
with ``NamedSharding``, let the compiler place collectives.
"""

from __future__ import annotations

import math
from typing import Any, Mapping, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

STREAM_AXIS = "dp"
MODEL_AXIS = "tp"


def make_mesh(axis_sizes: Mapping[str, int] | None = None,
              devices: Sequence[jax.Device] | None = None) -> Mesh:
    """Build a named device mesh.

    With no arguments: a 1-D ``dp`` mesh over every visible device.  Axis
    sizes must multiply to at most the device count; extra devices are left
    idle (the mesh uses a prefix).
    """
    if devices is None:
        devices = jax.devices()
    if axis_sizes is None:
        axis_sizes = {STREAM_AXIS: len(devices)}
    names = tuple(axis_sizes)
    dims = tuple(int(axis_sizes[n]) for n in names)
    need = math.prod(dims)
    if need > len(devices):
        raise ValueError(
            f"mesh {dict(axis_sizes)} needs {need} devices, have {len(devices)}")
    grid = np.asarray(devices[:need], dtype=object).reshape(dims)
    return Mesh(grid, names)


def stream_sharding(mesh: Mesh, ndim: int, axis: str = STREAM_AXIS
                    ) -> NamedSharding:
    """Sharding for a stream-major array: leading axis over ``axis``."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def _put(x, sharding: NamedSharding):
    """Place one host-identical value with ``sharding``.

    Single process: plain ``device_put``.  Multi-process (a mesh spanning
    ``jax.distributed`` processes): ``device_put`` first cross-checks the
    value bitwise across processes, which (a) all-gathers data we know is
    identical (engine construction is deterministic) and (b) FAILS on the
    NaN-prefilled signal rings — NaN != NaN, so the equality assert trips
    on correct input.  ``make_array_from_callback`` skips the check: each
    process materializes exactly its addressable shards."""
    if jax.process_count() > 1:
        xh = np.asarray(x)
        return jax.make_array_from_callback(xh.shape, sharding,
                                            lambda idx: xh[idx])
    return jax.device_put(x, sharding)


def shard_streams(tree: Any, mesh: Mesh, axis: str = STREAM_AXIS) -> Any:
    """Place a stream-major pytree (every leaf has a leading stream axis)
    so streams are split across the ``axis`` mesh dimension."""
    def place(x):
        x = jax.numpy.asarray(x)
        return _put(x, stream_sharding(mesh, x.ndim, axis))
    return jax.tree.map(place, tree)


def shard_params(params: Any, mesh: Mesh, axis: str = MODEL_AXIS) -> Any:
    """Tensor-parallel placement for model weights: shard each leaf's last
    (output-channel) dimension over ``axis`` when divisible; replicate
    otherwise.  GSPMD propagates the rest."""
    size = mesh.shape[axis]

    def place(x):
        x = jax.numpy.asarray(x)
        if x.ndim >= 1 and x.shape[-1] % size == 0 and x.shape[-1] >= size:
            spec = P(*([None] * (x.ndim - 1)), axis)
        else:
            spec = P()
        return _put(x, NamedSharding(mesh, spec))
    return jax.tree.map(place, params)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree across the mesh."""
    def place(x):
        x = jax.numpy.asarray(x)
        return _put(x, NamedSharding(mesh, P()))
    return jax.tree.map(place, tree)
