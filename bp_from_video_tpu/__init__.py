"""bp_from_video_tpu — a TPU-native rPPG (remote photoplethysmography) framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of thvlio/bp-from-video
(reference mounted read-only at /root/reference): read frames from a camera or
video file, run vision models (face detector / face landmarker / hand
landmarker / person segmenter), derive landmark-anchored regions of interest,
average a color channel inside each ROI into fixed-size ring buffers, run a
configurable DSP chain (derivatives, interpolation, detrending,
Butterworth/FIR zero-phase band-pass), transform to the frequency domain
(rFFT / Welch / Lomb-Scargle), estimate heart rate (BPM) from the spectral
peak and pulse transit time (PTT) from pairwise cross-correlation, and render
annotated frames plus live signal plots.

Execution model (TPU-first, not a port):
  * All per-frame compute — inference, ROI sampling, the full DSP chain,
    spectra, correlation and peak extraction — is a single jitted function
    ``step(params, state, frame, timestamp) -> (state, outputs)`` with all
    signal state held in fixed-shape, NaN-masked device arrays
    (see runtime/engine.py).
  * Multi-stream scaling is a stream-batched step ``shard_map``-partitioned
    over a device mesh (parallel/), replacing the reference's 4-process
    pipeline (pbp.py) whose drop-oldest real-time semantics survive in the
    host feeder (runtime/feeder.py + native/ C++ frame slots).
  * The hottest image op (all landmark crops per frame) is a fused Pallas
    TPU kernel (pallas/warp_kernel.py); every other resample is
    interpolation-matrix matmuls.
"""

__version__ = "0.1.0"

from bp_from_video_tpu.config import (  # noqa: F401
    CaptureConfig,
    DrawConfig,
    EngineConfig,
    InferenceConfig,
    ModelType,
    ROIConfig,
    RunningMode,
    SignalColorChannel,
    SignalConfig,
    SignalProcessingMethod,
    SignalSpectrumTransform,
    preset_configs,
)
from bp_from_video_tpu.exceptions import CaptureError  # noqa: F401


def __getattr__(name):
    """Lazy heavyweight entry points (importing them pulls in jax tracing)."""
    if name == "Engine":
        from bp_from_video_tpu.runtime.engine import Engine
        return Engine
    if name == "MultiStreamEngine":
        from bp_from_video_tpu.parallel import MultiStreamEngine
        return MultiStreamEngine
    if name == "Drawer":
        from bp_from_video_tpu.render import Drawer
        return Drawer
    raise AttributeError(name)
