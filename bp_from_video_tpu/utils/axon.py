"""Axon (remote-TPU tunnel) dispatch-mode control.

Measured behavior of the environment's experimental 'axon' PJRT client
(tools/poisonprobe.py + tools/honestyprobe.py, round 3):

* **Fast mode** (process start): dispatches return in ~0.03 ms and
  ``jax.block_until_ready`` does NOT actually wait — a 1.1-TFLOP scan
  "completes" in 0.000 s.  Readiness is fake; any wall-clock timing taken
  in this mode is garbage.  Results ARE correct once a real
  synchronization happens.
* **The latch**: the FIRST device-to-host transfer (``jax.device_get`` /
  ``np.asarray`` of an axon array) stalls ~3-10 minutes (a transport
  renegotiation — it happens even with an empty execution queue), after
  which the process is permanently in…
* **Sync mode**: every dispatch costs its true ~25-45 ms tunnel round
  trip and ``block_until_ready`` is honest (timings scale with compute;
  results verified against numpy oracles).  ``jax.clear_caches()`` does
  not revert the latch; no reversion mechanism is known.

Round 2 interpreted this as "fused_trunk construction poisons the
process": fused-trunk construction was simply the only config whose
weight packing performed a D2H.  The construction paths are now D2H-free
(numpy-native packing, single ``device_put``), so mode switching is this
module's explicit, caller-controlled decision.

Rules of thumb:
* Benchmarks / measurement tools MUST call :func:`force_sync_dispatch`
  before timing anything — otherwise they time fake readiness.
* Live drivers SHOULD call it at startup so the multi-minute stall lands
  before capture begins, not on the first HUD download.
* Pure-compute batch jobs that only fetch results at the very end may
  skip it and pay the stall once at the final fetch.
"""

from __future__ import annotations

import logging
import time

logger = logging.getLogger(__name__)

_FORCED = False


def force_sync_dispatch() -> float:
    """Perform one tiny device-to-host transfer to flip the axon client
    into honest synchronous dispatch.  Returns the stall seconds (0.0 when
    already in sync mode or on a local backend).  Idempotent per process,
    and a no-op off-TPU — callers may invoke it unconditionally.
    """
    global _FORCED
    if _FORCED:
        return 0.0
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        return 0.0

    t0 = time.perf_counter()
    jax.device_get(jnp.zeros((1,), jnp.float32))
    stall = time.perf_counter() - t0
    _FORCED = True
    if stall > 1.0:
        logger.info("axon sync-dispatch latch: first D2H stalled %.1f s "
                    "(one-time transport renegotiation)", stall)
    return stall
