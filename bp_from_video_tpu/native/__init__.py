"""Native host-runtime components (C++ via ctypes).

The reference leans on native code in its *dependencies* (MediaPipe C++
graph runtime, OpenCV, scipy — SURVEY.md §2.2); this package holds the
rebuild's own native pieces.  Currently: the lock-free latest-wins frame
slot used by the capture→device pipeline.

The shared library is built on demand with g++ (cached next to the source);
a pure-Python fallback with identical semantics keeps everything working
where no toolchain exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "framequeue.cpp")
_LIB = os.path.join(_DIR, "_framequeue.so")


def _build() -> str | None:
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            # Compile to a per-PID temp name and os.replace (atomic on
            # POSIX): a concurrent process must never CDLL a half-written
            # .so (truncated ELF -> OSError with no fallback engaged).
            tmp = f"{_LIB}.{os.getpid()}.tmp"
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                 "-o", tmp, _SRC],
                check=True, capture_output=True)
            os.replace(tmp, _LIB)
        return _LIB
    except (OSError, subprocess.CalledProcessError):  # pragma: no cover
        return None


_lib = None
_lib_lock = threading.Lock()


def _load():
    global _lib
    with _lib_lock:
        if _lib is None:
            path = _build()
            if path is None:  # pragma: no cover
                return None
            try:
                lib = ctypes.CDLL(path)
            except OSError:  # pragma: no cover - stale/foreign .so
                # A leftover library from another machine/ABI (the working
                # tree migrates) must degrade to the Python fallback, not
                # kill FrameSlot construction.
                return None
            lib.fq_create.restype = ctypes.c_void_p
            lib.fq_create.argtypes = [ctypes.c_size_t]
            lib.fq_destroy.argtypes = [ctypes.c_void_p]
            lib.fq_put.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_double,
                ctypes.c_double, ctypes.c_int32]
            lib.fq_get.restype = ctypes.c_int64
            lib.fq_get.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
            lib.fq_latest_seq.restype = ctypes.c_int64
            lib.fq_latest_seq.argtypes = [ctypes.c_void_p]
            if not hasattr(lib, "fq_put_planar"):
                # Stale prebuilt .so predating the planar entry point (the
                # mtime check can pass on restored/copied artifacts):
                # degrade to the Python fallback like the CDLL OSError
                # path above, never AttributeError out of FrameSlot().
                return None
            lib.fq_put_planar.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_double,
                ctypes.c_double, ctypes.c_int32]
            _lib = lib
    return _lib


class FrameSlot:
    """Latest-wins frame hand-off between a capture thread and the device
    feeder (native triple-buffer; reference pbp.py:24-30 drop-oldest
    semantics without pickling or a manager process)."""

    def __init__(self, frame_shape: tuple[int, int, int],
                 planar: bool = False):
        """``planar=True``: ``put`` takes interleaved HWC frames but the
        slot stores (and ``get`` returns) the planar [C, H, W] layout the
        engine's Pallas kernels consume — the HWC->CHW transpose happens
        inside the native producer-side copy, GIL-released in each
        stream's capture thread, so the feeder's batch gather is a plain
        contiguous memcpy instead of a per-stream numpy strided
        transpose on the driver thread."""
        self.frame_shape = tuple(frame_shape)
        self.planar = planar
        if planar and len(self.frame_shape) != 3:
            raise ValueError(
                f"planar slots need a 3-D HWC frame shape, got "
                f"{self.frame_shape} (single-channel planarize is the "
                "identity — use a plain slot)")
        h, w, c = (self.frame_shape if len(self.frame_shape) == 3
                   else (*self.frame_shape, 1))
        self.out_shape = (c, h, w) if planar else self.frame_shape
        self.frame_bytes = int(np.prod(frame_shape))
        self._lib = _load()
        q = (ctypes.c_void_p(self._lib.fq_create(self.frame_bytes))
             if self._lib is not None else None)
        if q is not None and q.value:
            self._q = q
            self.native = True
            self._consumed = 0
        else:  # pragma: no cover - toolchain-less / allocation-failure
            # fq_create returns NULL on allocation failure; dereferencing
            # it in fq_put would segfault the process.
            self._lock = threading.Lock()
            self._item = None
            self._seq = 0
            self._consumed = 0
            self.native = False

    def put(self, frame: np.ndarray, timestamp: float, fs: float,
            calibrating: bool) -> None:
        frame = np.ascontiguousarray(frame, np.uint8)
        if frame.shape != self.frame_shape:
            # The native path memcpy's frame_bytes — a smaller source would
            # be an out-of-bounds read, not just corrupt data.
            raise ValueError(
                f"frame shape {frame.shape} != slot shape {self.frame_shape}"
                " (all streams must share one resolution)")
        if self.native:
            if self.planar:
                h, w, c = frame.shape
                self._lib.fq_put_planar(
                    self._q, frame.ctypes.data_as(ctypes.c_char_p),
                    h, w, c, float(timestamp), float(fs), int(calibrating))
            else:
                self._lib.fq_put(
                    self._q, frame.ctypes.data_as(ctypes.c_char_p),
                    float(timestamp), float(fs), int(calibrating))
        else:  # pragma: no cover
            with self._lock:
                self._seq += 1
                stored = (np.ascontiguousarray(frame.transpose(2, 0, 1))
                          if self.planar else frame.copy())
                self._item = (stored, timestamp, fs, calibrating,
                              self._seq)

    def get(self, require_fresh: bool = False, out: np.ndarray | None = None):
        """Newest (frame, timestamp, fs, calibrating, seq) or None.

        ``out``: optional preallocated uint8 array of ``out_shape`` the
        frame is written into directly (the feeder passes its batch
        buffer's stream row — no intermediate allocation or copy)."""
        if self.native:
            if (require_fresh
                    and self._lib.fq_latest_seq(self._q) == self._consumed):
                # Cheap freshness pre-check: the feeder polls every ~0.5 ms;
                # don't allocate a full frame buffer just to learn "nothing
                # new".  (Racing a concurrent put is fine — the next poll
                # picks it up; latest-wins semantics are unchanged.)
                return None
            if out is None:
                out = np.empty(self.out_shape, np.uint8)
            elif (out.shape != self.out_shape or out.dtype != np.uint8
                  or not out.flags["C_CONTIGUOUS"]):
                # Hard error, not assert: fq_get memcpy's frame_bytes
                # through this pointer — a smaller/strided buffer would be
                # an out-of-bounds native write (mirror of put()'s guard).
                raise ValueError(
                    f"out must be C-contiguous uint8 {self.out_shape}, "
                    f"got {out.dtype} {out.shape}")
            ts = ctypes.c_double()
            fs = ctypes.c_double()
            cal = ctypes.c_int32()
            seq = self._lib.fq_get(self._q,
                                   out.ctypes.data_as(ctypes.c_char_p),
                                   ctypes.byref(ts), ctypes.byref(fs),
                                   ctypes.byref(cal), int(require_fresh))
            if seq == 0:
                return None
            self._consumed = int(seq)
            return out, ts.value, fs.value, bool(cal.value), int(seq)
        with self._lock:  # pragma: no cover
            if self._item is None:
                return None
            frame, ts_v, fs_v, cal_v, seq = self._item
            if require_fresh and seq == self._consumed:
                return None
            self._consumed = seq
            if out is not None:
                out[...] = frame
                frame = out
            return frame, ts_v, fs_v, cal_v, seq

    def latest_seq(self) -> int:
        if self.native:
            return int(self._lib.fq_latest_seq(self._q))
        with self._lock:  # pragma: no cover
            return self._seq

    def __del__(self):
        if getattr(self, "native", False) and self._q:
            self._lib.fq_destroy(self._q)
            self._q = None
