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

# NOTE: do NOT point the persistent compilation cache at .jax_cache here.
# The cache is shared with the remote-TPU tunnel runs, whose XLA:CPU AOT
# artifacts are compiled for a different host machine type; loading them
# (cpu_aot_loader "machine feature" warnings) produced wrong numerics in
# sharded tests.  CPU test compiles are cheap enough without it.


def cpu_devices(n: int = 8):
    return jax.devices("cpu")[:n]
