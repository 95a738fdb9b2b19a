"""Multi-host (DCN) initialization.

Single-host meshes (parallel/mesh.py) cover the reference's scale and the
multi-stream configs; this helper is the entry point when stream fan-out
outgrows one host: initialize the jax.distributed runtime from standard
environment variables, then build the same named meshes over
``jax.devices()`` — data (streams) stays sharded over `dp` riding ICI
within a slice, and only the host→device feeds cross DCN.

Usage (per host):
    from bp_from_video_tpu.parallel import distributed
    distributed.initialize()                # env-driven, idempotent
    mesh = distributed.global_mesh()        # dp over every global device
"""

from __future__ import annotations

import os

import jax

from bp_from_video_tpu.parallel import mesh as mesh_lib

_initialized = False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Initialize jax.distributed; parameters default to the standard
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars.
    No-op (returns False) when unconfigured — single-host mode."""
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return False
    # `is not None`, not truthiness: process_id=0 (the coordinator) is the
    # most common explicitly-passed value.
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=(num_processes if num_processes is not None
                       else int(os.environ["JAX_NUM_PROCESSES"])),
        process_id=(process_id if process_id is not None
                    else int(os.environ["JAX_PROCESS_ID"])))
    _initialized = True
    return True


def global_mesh(axis_sizes=None):
    """A named mesh over every global device (all hosts)."""
    return mesh_lib.make_mesh(axis_sizes, jax.devices())


def local_stream_slice(num_streams: int) -> tuple[int, int]:
    """[start, end) of the global stream batch this host feeds — each host
    captures and uploads only its shard; the dp-sharded step never moves
    frames across DCN."""
    n = jax.process_count()
    per = num_streams // n
    i = jax.process_index()
    return i * per, (i + 1) * per if i < n - 1 else num_streams
