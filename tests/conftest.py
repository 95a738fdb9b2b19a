"""Test harness: run everything on a virtual 8-device CPU platform
(SURVEY.md §4: multi-chip without a cluster).

The environment's 'axon' TPU plugin registers itself regardless of
JAX_PLATFORMS, so setting the env var alone is not enough — we also pin
jax's default device to CPU after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

try:
    _cpu0 = jax.devices("cpu")[0]
    jax.config.update("jax_default_device", _cpu0)
except RuntimeError:  # pragma: no cover - no cpu platform
    pass

# Persistent compilation cache: the engine tests compile multi-second XLA
# programs; caching them makes reruns of the suite several times faster.
_cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def cpu_devices(n: int = 8):
    return jax.devices("cpu")[:n]
