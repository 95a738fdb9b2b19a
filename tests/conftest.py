"""Test harness: run everything on a virtual 8-device CPU platform
(SURVEY.md §4: multi-chip without a cluster).

Hermeticity (the hard-won part): the environment boots the remote-TPU
'axon' PJRT plugin from a sitecustomize on PYTHONPATH in EVERY python
process, and that boot calls ``jax.config.update("jax_platforms",
"axon,cpu")`` at interpreter start — overriding any ``JAX_PLATFORMS``
env var (env vars only seed the config default; an explicit update
wins).  jax's first backend init then dials the TPU tunnel, which goes
dark for stretches, hanging the whole suite before a single test runs.
The fix is to update the config BACK to "cpu" here, before anything
initializes a backend — env-var pinning alone demonstrably does not
keep processes off the tunnel in this environment.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

try:
    _cpu0 = jax.devices("cpu")[0]
    jax.config.update("jax_default_device", _cpu0)
except RuntimeError:  # pragma: no cover - no cpu platform
    pass

# NOTE: do NOT point the persistent compilation cache at .jax_cache here.
# The cache is shared with the remote-TPU tunnel runs, whose XLA:CPU AOT
# artifacts are compiled for a different host machine type; loading them
# (cpu_aot_loader "machine feature" warnings) produced wrong numerics in
# sharded tests.  Tests get their OWN cache dir instead, further keyed by
# the host's CPU feature hash (the working tree migrates between machines,
# and XLA's AOT loader runs foreign-machine code after only a warning):
# the suite is compile-dominated on this 1-CPU box, and repeat runs are
# the iteration loop.
import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bp_from_video_tpu.utils.hostcache import scoped_cpu_cache_dir  # noqa: E402

_cache = scoped_cpu_cache_dir(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache_tests_cpu")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def cpu_devices(n: int = 8):
    return jax.devices("cpu")[:n]


import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _hermetic_standins(request, monkeypatch):
    """Keep the suite independent of trained stand-in artifacts.

    models/*_standin_synth.npz are TRAINING OUTPUTS (tools/
    train_hand_standin.py etc.), loaded by default by InferenceRunner
    when the real TFLite blob is absent — so without this stub, running a
    train tool would silently change what every runner-constructing test
    executes.  Tests that exercise the trained-artifact path opt in with
    @pytest.mark.trained_standins."""
    if request.node.get_closest_marker("trained_standins"):
        yield
        return
    from bp_from_video_tpu.models.runner import InferenceRunner
    monkeypatch.setattr(
        InferenceRunner, "_load_trained_standin",
        lambda self, key, standin_path, expect, meta_expect=None: None)
    yield


@pytest.fixture(scope="session")
def tiny_engine48():
    """Session-shared tiny engine (48x64, random-init nets) + jitted step
    for display-layer tests: the suite is trace-bound, and test_render /
    test_glyphs each used to build and trace their own engine."""
    from bp_from_video_tpu.config import (EngineConfig, InferenceConfig,
                                          SignalConfig)
    from bp_from_video_tpu.runtime.engine import Engine

    cfg = EngineConfig(
        signal=SignalConfig(signal_max_samples=16, peak_max_samples=4),
        inference=InferenceConfig(
            face_detector_path=None, face_landmarker_path=None,
            hand_landmarker_path=None, person_segmenter_path=None),
        frame_height=48, frame_width=64)
    eng = Engine(cfg)
    return cfg, eng, jax.jit(eng.step)
