"""Offline / batch video processing: decode whole clips on the host, run
the fused step over them as one device scan.

The reference only has a live loop (recorded videos replay through the same
real-time path, reference bp.py:11-15).  The batch API is the throughput-
oriented counterpart: decode → one [T, S, H, W, 3] uint8 block → run_clip
(lax.scan of the fused step) → per-frame BPM/PTT series, with no per-frame
host round-trips.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from bp_from_video_tpu.config import EngineConfig
from bp_from_video_tpu.exceptions import CaptureError
from bp_from_video_tpu.parallel import ClipOutputs, MultiStreamEngine
from bp_from_video_tpu.runtime.capture import VideoReader


def decode_clip(path: str, max_frames: int | None = None,
                target_res: tuple[int, int] | None = None,
                crop_portrait: bool = False,
                flip_horizontally: bool | None = None
                ) -> tuple[np.ndarray, np.ndarray]:
    """Decode a video file into (frames_rgb uint8 [T, H, W, 3],
    timestamps [T]).  ``crop_portrait``/``flip_horizontally`` apply the
    same geometry the live capture path would (offline results must match
    a live run with identical flags)."""
    reader = VideoReader(path, target_res=target_res,
                         crop_portrait=crop_portrait,
                         flip_horizontally=flip_horizontally)
    frames, ts = [], []
    try:
        while max_frames is None or len(frames) < max_frames:
            fd = reader.read_frame()
            frames.append(fd.frame[..., ::-1])  # BGR -> RGB on host
            ts.append(fd.timestamp)
    except CaptureError:
        pass
    finally:
        reader.cleanup()
    if not frames:
        raise CaptureError(f"no frames decoded from {path!r}")
    return np.stack(frames), np.asarray(ts, np.float32)


def process_videos(paths: Sequence[str], config: EngineConfig | None = None,
                   *, asset_dir: str | None = None,
                   max_frames: int | None = None, chunk: int = 256,
                   target_res: tuple[int, int] | None = None,
                   crop_portrait: bool = False,
                   flip_horizontally: bool | None = None,
                   micro_batch: int | None = None
                   ) -> tuple[ClipOutputs, np.ndarray]:
    """Run the full pipeline over recorded videos in batch.

    All videos are decoded (truncated to the shortest, resized to
    ``target_res`` when given — required for mixed-resolution inputs),
    stacked as streams, and scanned through the fused step in
    ``chunk``-frame device blocks.  Returns (time-major ClipOutputs
    [T, S, ...], timestamps [T, S] seconds).

    ``micro_batch=F`` switches to the lagged-rect temporal micro-batch
    operating point (engine.batch_step_lagged): F frames per dispatch
    with pre-window tracking rects, one analysis per window — output
    rows are per WINDOW (T//F of them, each at its window-end frame),
    trading vitals update rate for throughput."""
    config = config or EngineConfig()
    decoded = [decode_clip(p, max_frames=max_frames, target_res=target_res,
                           crop_portrait=crop_portrait,
                           flip_horizontally=flip_horizontally)
               for p in paths]
    t_len = min(f.shape[0] for f, _ in decoded)
    frames = np.stack([f[:t_len] for f, _ in decoded], axis=1)  # [T, S, ...]
    ts = np.stack([t[:t_len] for _, t in decoded], axis=1)      # [T, S]

    h, w = frames.shape[2], frames.shape[3]
    config = dataclasses.replace(config, frame_height=h, frame_width=w,
                                 num_streams=len(paths))
    ms = MultiStreamEngine(config, asset_dir=asset_dir)
    state = ms.init_states()
    if micro_batch and micro_batch > 1:
        # Window-align the chunk so every device block reshapes cleanly to
        # [chunk // F, F, S, ...].
        chunk = max(micro_batch, chunk - chunk % micro_batch)
    outs = []
    for i in range(0, t_len, chunk):
        fb = frames[i:i + chunk]
        tb = ts[i:i + chunk]
        rem = fb.shape[0]
        if rem < chunk and i > 0:
            # Pad the tail block to the static chunk length: a fresh T
            # shape would recompile run_clip (minutes through the remote
            # tunnel) to process a few leftover frames.  Pad steps run
            # AFTER the real ones within the scan, so the [:rem] outputs
            # kept below come from uncorrupted state; the post-block state
            # is discarded.  NaN pad timestamps keep the pad rows masked
            # out of any x-dependent math.
            pad = chunk - rem
            fb = np.concatenate([fb, np.repeat(fb[-1:], pad, axis=0)])
            tb = np.concatenate(
                [tb, np.full((pad,) + tb.shape[1:], np.nan, np.float32)])
        if micro_batch and micro_batch > 1:
            f_n = micro_batch
            if fb.shape[0] % f_n:
                # First-and-only block shorter than one chunk: pad to a
                # whole number of windows (NaN pad timestamps gate the
                # ring pushes off, as above).
                pad = f_n - fb.shape[0] % f_n
                fb = np.concatenate([fb, np.repeat(fb[-1:], pad, axis=0)])
                tb = np.concatenate(
                    [tb, np.full((pad,) + tb.shape[1:], np.nan,
                                 np.float32)])
            fbw = fb.reshape((fb.shape[0] // f_n, f_n) + fb.shape[1:])
            tbw = tb.reshape((tb.shape[0] // f_n, f_n) + tb.shape[1:])
            state, out = ms.run_clip_lagged(ms.params, state,
                                            jnp.asarray(fbw),
                                            jnp.asarray(tbw))
            kept = (rem + f_n - 1) // f_n
            outs.append(jax.tree.map(lambda a: np.asarray(a)[:kept], out))
        else:
            state, out = ms.run_clip(ms.params, state, jnp.asarray(fb),
                                     jnp.asarray(tb))
            outs.append(jax.tree.map(lambda a: np.asarray(a)[:rem], out))
    return (ClipOutputs(*[np.concatenate([getattr(o, f) for o in outs])
                          for f in ClipOutputs._fields]), ts)
