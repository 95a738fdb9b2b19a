"""Host-keyed persistent-compilation-cache directories for CPU runs.

XLA:CPU's persistent cache stores AOT-compiled executables targeting the
*compiling* host's CPU feature set.  This repo's working tree migrates
between machines (remote-TPU tunnel host vs local boxes), and XLA's AOT
loader only *warns* on a machine-feature mismatch ("cpu_aot_loader ...
Machine type used for XLA:CPU compilation doesn't match") before running
the foreign code anyway — which produced silently wrong numerics once
(a flipped detection in sharded tests) and SIGILL risk always.

Fix: suffix every CPU cache directory with a short hash of this host's
CPU feature flags, so artifacts from a different machine simply *miss*
instead of loading.  (The TPU cache `.jax_cache` stays unkeyed — its
artifacts target the TPU, not the host, and the tunnel's libtpu build
mismatch is already detected hard by the runtime.)
"""

from __future__ import annotations

import hashlib
import os
import platform


def host_cache_tag() -> str:
    """Short stable tag for this host's CPU codegen target (machine arch +
    feature flags from /proc/cpuinfo; best-effort on non-Linux)."""
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = line.strip()
                    break
    except OSError:  # pragma: no cover - non-Linux
        feats = platform.processor()
    return hashlib.sha1(
        (platform.machine() + ":" + feats).encode()).hexdigest()[:10]


def scoped_cpu_cache_dir(repo_root: str, name: str) -> str:
    """``<repo_root>/<name>.<host-tag>`` — created if missing."""
    path = os.path.join(repo_root, f"{name}.{host_cache_tag()}")
    os.makedirs(path, exist_ok=True)
    return path
