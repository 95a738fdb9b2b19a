"""Host→device frame pipeline: capture threads feeding latest-wins slots,
batched uint8 upload, on-device BGR→RGB.

The reference's pipeline transport is three depth-1 manager queues with
drop-oldest semantics (reference pbp.py:24-30, :64-68).  Here the one real
queue left is host→HBM: each stream has a capture thread publishing into a
lock-free native FrameSlot (drop-oldest, bounded latency), and the feeder
batches the newest frame of every stream into one [S, 3, H, W] uint8 upload
(PLANAR — the layout the engine's Pallas kernels consume, so the device
never pays a per-step transpose)
(uint8 on the wire — 4× less PCIe traffic than f32; the cast fuses into the
first on-device matmul).
"""

from __future__ import annotations

import queue
import threading
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from bp_from_video_tpu.exceptions import CaptureError
from bp_from_video_tpu.native import FrameSlot
from bp_from_video_tpu.runtime.capture import VideoReader


@jax.jit
def _to_rgb(frames_bgr: jnp.ndarray) -> jnp.ndarray:
    """On-device channel flip of planar frames (OpenCV frames are BGR; the
    engine consumes
    RGB, reference inference_runner.py:171's cvtColor moved in-graph)."""
    return frames_bgr[:, ::-1]


class StreamFeed:
    """One capture thread pumping a VideoReader into a FrameSlot."""

    def __init__(self, reader: VideoReader, frame_shape):
        self.reader = reader
        # planar=True: the native put transposes HWC->CHW inside this
        # stream's capture thread (GIL-released), so the feeder's batch
        # gather is a contiguous copy straight into the upload buffer.
        self.slot = FrameSlot(frame_shape, planar=True)
        self.error: BaseException | None = None
        self.done = threading.Event()
        self._release_lock = threading.Lock()
        self._released = False
        self._prop_keys: queue.SimpleQueue[int] = queue.SimpleQueue()
        self._thread = threading.Thread(target=self._loop, daemon=True)

    def start(self):
        self._thread.start()
        return self

    def request_prop(self, key: int) -> None:
        """Queue a camera-property keypress for the CAPTURE thread to apply
        between reads: cv2.VideoCapture is not thread-safe, so the driver
        must not call prop_control concurrently with cap.read()."""
        self._prop_keys.put(key)

    def _loop(self):
        try:
            while not self.done.is_set():
                while not self._prop_keys.empty():
                    self.reader.prop_control(self._prop_keys.get_nowait())
                fd = self.reader.read_frame()
                self.slot.put(fd.frame, fd.timestamp, fd.sampling_freq,
                              fd.calibrating)
        except CaptureError as e:
            self.error = e
        except Exception as e:  # pragma: no cover
            self.error = e
        finally:
            self.done.set()
            # The reader is released by the thread that reads it:
            # cv2.VideoCapture is not thread-safe, and releasing from the
            # feeder's cleanup while this thread sits blocked inside
            # cap.read() (stalled webcam) is documented UB (segfault/hang).
            self._release_reader()

    def _release_reader(self):
        with self._release_lock:
            if not self._released:
                self._released = True
                try:
                    self.reader.cleanup()
                except Exception:  # pragma: no cover - release best-effort
                    pass

    def stop(self):
        self.done.set()

    def join(self, timeout=None):
        self._thread.join(timeout)
        return not self._thread.is_alive()


class DeviceFeeder:
    """Batches the newest frame of every stream and ships it to the device.

    ``get_batch()`` returns (frames_rgb_u8 [S,3,H,W] device array,
    timestamps [S], sampling_freqs [S], calibrating [S]) — always the newest
    available frame per stream (frames the engine missed are dropped,
    exactly the reference's latest-wins policy).  Raises CaptureError when
    every stream has ended (EOF) — the drivers' clean-shutdown signal.
    """

    def __init__(self, readers: Sequence[VideoReader],
                 frame_shape: tuple[int, int, int], device=None):
        self.frame_shape = tuple(frame_shape)
        self.feeds = [StreamFeed(r, frame_shape).start() for r in readers]
        self.device = device
        s = len(readers)
        h, w, c = self.frame_shape
        self._frames = np.zeros((s, c, h, w), np.uint8)
        self._ts = np.zeros((s,), np.float32)
        self._fs = np.full((s,), np.nan, np.float32)
        self._cal = np.zeros((s,), bool)
        self._have = np.zeros((s,), bool)
        self._warm = False

    def get_batch(self, block: bool = True):
        import time as _time
        # Warm-up barrier: the first batch must not ship a stream's initial
        # zero frame just because another stream produced first.  Wait until
        # every stream has published at least one frame (or ended) — the
        # analog of the reference pipeline's blocking first q_in.get()
        # (pbp.py:21: downstream stages idle until a real frame arrives).
        while block and not self._warm:
            for i, feed in enumerate(self.feeds):
                item = feed.slot.get(require_fresh=True,
                                     out=self._frames[i])
                if item is not None:
                    _, ts, fs, cal, _ = item
                    self._ts[i] = ts
                    self._fs[i] = fs
                    self._cal[i] = cal
                    self._have[i] = True
            if all(h or f.done.is_set()
                   for h, f in zip(self._have, self.feeds)):
                self._warm = True
                if self._have.any():
                    ts = np.where(self._have, self._ts, np.nan)
                    frames = jax.device_put(self._frames, self.device)
                    return (_to_rgb(frames), jnp.asarray(ts),
                            jnp.asarray(self._fs), jnp.asarray(self._cal))
            _time.sleep(0.0005)
        while True:
            fresh = False
            alive = False
            for i, feed in enumerate(self.feeds):
                # Unexpected capture-thread failures propagate to the driver
                # (the reference's any-stage-dies-stops-all contract,
                # pbp.py:49-53); CaptureError is the normal EOF path and is
                # handled by the all-streams-ended checks below.
                if feed.error is not None and not isinstance(
                        feed.error, CaptureError):
                    raise feed.error
                if not feed.done.is_set():
                    alive = True
                item = feed.slot.get(require_fresh=True,
                                     out=self._frames[i])
                if item is not None:
                    _, ts, fs, cal, _ = item
                    self._ts[i] = ts
                    self._fs[i] = fs
                    self._cal[i] = cal
                    self._have[i] = True
                    fresh = True
            if not alive and not fresh and not self._have.any():
                raise CaptureError("all streams ended")
            if fresh or not block:
                break
            if not alive:
                raise CaptureError("all streams ended")
            _time.sleep(0.0005)
        if not self._have.any():
            # Non-blocking call before any stream produced: no real frames
            # to ship (never hand the engine the zero-initialized buffer).
            return None
        # Streams that ended before producing anything keep NaN timestamps:
        # the NaN-masked rings discard their samples end-to-end.
        ts = np.where(self._have, self._ts, np.nan)
        frames = jax.device_put(self._frames, self.device)
        return (_to_rgb(frames), jnp.asarray(ts),
                jnp.asarray(self._fs), jnp.asarray(self._cal))

    def prop_control(self, stream: int, key: int) -> None:
        """Thread-safe camera prop adjustment: routes the keypress to the
        stream's capture thread (StreamFeed.request_prop)."""
        if key is None or key < 0:
            return  # no key pressed this frame
        self.feeds[stream].request_prop(key)

    def cleanup(self):
        for feed in self.feeds:
            feed.stop()
        for feed in self.feeds:
            if feed.join(timeout=2.0):
                # Thread exited; its finally released the reader already
                # (idempotent).  A thread still blocked in cap.read() keeps
                # ownership and releases on return — releasing from here
                # concurrently is the undefined-behavior case.
                feed._release_reader()
