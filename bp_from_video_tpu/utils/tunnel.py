"""Bounded probing of the remote-TPU tunnel.

The environment reaches its one TPU chip through a tunnel that goes dark
for stretches (minutes to hours) and then recovers.  While dark, jax's
first backend init — even ``jax.devices()`` — blocks indefinitely, so any
process that unconditionally initializes the backend (bench.py,
__graft_entry__.py under the driver) wedges until an external timeout
kills it, and the round's artifact records nothing useful.

``wait_for_tpu`` makes that failure mode bounded and recoverable: each
probe runs ``jax.devices()`` in a SUBPROCESS with its own timeout (the
parent never touches the backend, so it can never wedge), and probes are
retried within a wall budget because observed outages frequently recover
within minutes.  Callers get a clean True/False and can emit an honest
failure instead of hanging.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time


def _default_probe_cmd() -> list[str]:
    # Plain backend init under the environment's default platform config
    # (the sitecustomize pins "axon,cpu"): succeeds iff the tunnel answers.
    return [sys.executable, "-c", "import jax; jax.devices()"]


def wait_for_tpu(total_wait_s: float | None = None,
                 probe_timeout_s: float | None = None,
                 sleep_s: float = 45.0,
                 probe_cmd: list[str] | None = None) -> bool:
    """True once a backend-init probe succeeds; False when the wall budget
    is exhausted.  Budgets come from ``BPTPU_TUNNEL_WAIT`` (seconds of
    total retrying, default 1200) and ``BPTPU_TUNNEL_PROBE_TIMEOUT``
    (per-probe subprocess timeout, default 300 — a trivial init measured
    237 s right after a tunnel recovery, so shorter timeouts misread a
    recovering tunnel as dark)."""
    if total_wait_s is None:
        total_wait_s = float(os.environ.get("BPTPU_TUNNEL_WAIT", "1200"))
    if probe_timeout_s is None:
        probe_timeout_s = float(
            os.environ.get("BPTPU_TUNNEL_PROBE_TIMEOUT", "300"))
    cmd = probe_cmd if probe_cmd is not None else _default_probe_cmd()

    deadline = time.monotonic() + total_wait_s
    attempt = 0
    while True:
        attempt += 1
        budget = deadline - time.monotonic()
        if attempt > 1 and budget <= 0:
            return False
        try:
            proc = subprocess.run(
                cmd, capture_output=True, text=True,
                timeout=max(min(probe_timeout_s, budget), 5.0)
                if attempt > 1 else probe_timeout_s)
            if proc.returncode == 0:
                return True
            detail = (proc.stderr or proc.stdout or "").strip()[-300:]
            print(f"tunnel probe {attempt}: rc={proc.returncode} {detail}",
                  file=sys.stderr, flush=True)
        except subprocess.TimeoutExpired:
            print(f"tunnel probe {attempt}: no answer in "
                  f"{probe_timeout_s:.0f}s (tunnel dark)",
                  file=sys.stderr, flush=True)
        if time.monotonic() + sleep_s >= deadline:
            return False
        time.sleep(sleep_s)
