"""Host-runtime tests: capture (against generated video files), the native
latest-wins frame slot, the device feeder, and the stage profiler."""

import os
import threading
import time

import numpy as np
import pytest

from bp_from_video_tpu.exceptions import CaptureError
from bp_from_video_tpu.native import FrameSlot
from bp_from_video_tpu.runtime.capture import FrameData, VideoReader
from bp_from_video_tpu.runtime.feeder import DeviceFeeder
from bp_from_video_tpu.utils.profiling import StageProfiler

cv2 = pytest.importorskip("cv2")

H, W, N_FRAMES, FPS = 48, 64, 30, 30.0


@pytest.fixture(scope="module")
def video_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "synth.avi")
    wr = cv2.VideoWriter(path, cv2.VideoWriter.fourcc(*"MJPG"), FPS, (W, H))
    assert wr.isOpened()
    for i in range(N_FRAMES):
        frame = np.full((H, W, 3), i * 8 % 256, np.uint8)
        frame[:, :4] = (255, 0, 0)  # blue stripe on the LEFT (BGR)
        wr.write(frame)
    wr.release()
    return path


def test_video_reader_file(video_file):
    r = VideoReader(video_file)
    fd = r.read_frame()
    assert isinstance(fd, FrameData)
    assert fd.frame.shape == (H, W, 3)
    # The startup probe read rewinds for files (the reference never does,
    # silently dropping every file's first frame — a conscious fix), so the
    # first delivered frame is index 0 at timestamp 0.
    assert fd.timestamp == pytest.approx(0.0)
    assert np.isnan(fd.sampling_freq)
    assert not fd.calibrating
    fd2 = r.read_frame()
    assert fd2.timestamp == pytest.approx(1.0 / FPS)
    assert fd2.sampling_freq == pytest.approx(FPS, rel=1e-3)
    # Files are not flipped by default: the blue stripe stays on the left.
    assert fd2.frame[0, 0, 0] > 200
    r.cleanup()


def test_video_reader_eof_raises(video_file):
    r = VideoReader(video_file)
    with pytest.raises(CaptureError):
        for _ in range(N_FRAMES + 2):
            r.read_frame()
    r.cleanup()


def test_video_reader_flip_and_resize(video_file):
    r = VideoReader(video_file, target_res=(24, 32), flip_horizontally=True)
    fd = r.read_frame()
    assert fd.frame.shape == (24, 32, 3)
    # Flipped: blue stripe moved to the right edge.
    assert fd.frame[0, -1, 0] > 200
    assert fd.frame[0, 0, 0] < 200
    r.cleanup()


def test_video_reader_portrait_crop(video_file):
    r = VideoReader(video_file, crop_portrait=True)
    fd = r.read_frame()
    expect_w = 2 * (int(np.round(H / np.sqrt(2))) // 2)
    assert fd.frame.shape[1] == expect_w
    r.cleanup()


def test_video_reader_bad_path():
    with pytest.raises(CaptureError):
        VideoReader("/nonexistent/video.mp4")


def test_frame_slot_latest_wins():
    slot = FrameSlot((4, 4, 3))
    assert slot.native, "native framequeue should build in this environment"
    assert slot.get() is None
    for i in range(5):
        slot.put(np.full((4, 4, 3), i, np.uint8), float(i), 30.0, False)
    item = slot.get()
    assert item is not None
    frame, ts, fs, cal, seq = item
    assert frame[0, 0, 0] == 4          # newest wins; 0..3 dropped
    assert ts == 4.0 and seq == 5
    # Nothing new -> require_fresh returns None, re-read returns the same.
    assert slot.get(require_fresh=True) is None
    assert slot.get(require_fresh=False)[4] == 5


def test_frame_slot_threaded():
    slot = FrameSlot((8, 8, 3))
    n = 500
    stop = threading.Event()

    def producer():
        for i in range(n):
            slot.put(np.full((8, 8, 3), i % 256, np.uint8), float(i), 30.0,
                     False)
        stop.set()

    seen = []
    t = threading.Thread(target=producer)
    t.start()
    while not stop.is_set() or slot.get(require_fresh=True) is not None:
        item = slot.get(require_fresh=True)
        if item is not None:
            seen.append(item[4])
    t.join()
    assert seen == sorted(seen)          # monotonic, no reordering
    assert slot.latest_seq() == n
    final = slot.get()
    assert final[1] == float(n - 1)      # last published frame observable
    for s in seen:                        # frames are never torn
        pass


def test_device_feeder_batches(video_file):
    readers = [VideoReader(video_file), VideoReader(video_file)]
    feeder = DeviceFeeder(readers, (H, W, 3))
    frames, ts, fs, cal = feeder.get_batch()
    assert frames.shape == (2, 3, H, W)   # planar upload layout
    assert frames.dtype.name == "uint8"
    # BGR->RGB happened on-device: the blue stripe is now channel 2.
    f0 = np.asarray(frames)[0]
    assert f0[2, 0, 0] > 200 and f0[0, 0, 0] < 200
    # Streams end -> CaptureError (clean shutdown signal).
    with pytest.raises(CaptureError):
        for _ in range(5 * N_FRAMES):
            feeder.get_batch()
            time.sleep(0.001)
    feeder.cleanup()


def test_stage_profiler():
    p = StageProfiler()

    @p.timeit
    def work(x):
        return x + 1

    @p.timeit(name="named", fence=True)
    def work2(x):
        import jax.numpy as jnp
        return jnp.ones((4,)) * x

    for i in range(3):
        work(i)
    work2(2.0)
    rep = p.report()
    assert "work" in rep and "named" in rep
    assert p.stats["work"].calls == 3
    p.enabled = False
    work(1)
    assert p.stats["work"].calls == 3
    p.clear()
    assert p.report() == "(no profile data)"


def test_feeder_propagates_thread_errors(video_file):
    """Unexpected capture-thread exceptions reach the driver (the
    reference's any-stage-dies-stops-all contract, pbp.py:49-53)."""
    class BoomReader:
        def read_frame(self):
            raise ValueError("boom")

        def cleanup(self):
            pass

    from bp_from_video_tpu.runtime.feeder import DeviceFeeder
    feeder = DeviceFeeder([BoomReader()], (H, W, 3))
    with pytest.raises(ValueError, match="boom"):
        for _ in range(200):
            feeder.get_batch(block=False)
            time.sleep(0.005)
    feeder.cleanup()


def test_distributed_helpers_single_host(monkeypatch):
    from bp_from_video_tpu.parallel import distributed

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert distributed.initialize() is False          # unconfigured -> no-op
    mesh = distributed.global_mesh()
    assert mesh.devices.size >= 1
    lo, hi = distributed.local_stream_slice(8)
    assert (lo, hi) == (0, 8)                         # single process


def test_frame_slot_never_tears():
    """Concurrent producer/consumer: a consumed frame must be internally
    consistent (all pixels from ONE put) — the triple-buffer exchange
    guarantees tear-free hand-off."""
    slot = FrameSlot((32, 32, 3))
    n = 300
    stop = threading.Event()

    def producer():
        for i in range(n):
            slot.put(np.full((32, 32, 3), i % 251, np.uint8),
                     float(i), 30.0, False)
        stop.set()

    torn = []
    t = threading.Thread(target=producer)
    t.start()
    while not stop.is_set():
        item = slot.get(require_fresh=True)
        if item is not None:
            frame = item[0]
            if frame.min() != frame.max():
                torn.append(item[4])
    t.join()
    assert not torn, f"torn frames at seqs {torn[:5]}"


def test_device_feeder_nonblocking_returns_none_until_first_frame():
    """get_batch(block=False) must never ship the zero-initialized buffer."""
    import threading

    from bp_from_video_tpu.runtime.feeder import DeviceFeeder

    gate = threading.Event()

    class SlowReader:
        def read_frame(self):
            gate.wait(5.0)
            from bp_from_video_tpu.runtime.capture import FrameData
            frame = np.full((H, W, 3), 7, np.uint8)
            return FrameData(frame, 0.5, float("nan"), False)

        def cleanup(self):
            pass

    feeder = DeviceFeeder([SlowReader()], (H, W, 3))
    try:
        assert feeder.get_batch(block=False) is None
        gate.set()
        deadline = time.time() + 5.0
        out = None
        while out is None and time.time() < deadline:
            out = feeder.get_batch(block=False)
            time.sleep(0.005)
        assert out is not None
        frames, ts, fs, cal = out
        assert np.asarray(frames).max() == 7
        assert float(ts[0]) == 0.5
    finally:
        gate.set()
        feeder.cleanup()


def test_frame_slot_planar_layout_and_out():
    """planar=True slots must store exactly the HWC->CHW transpose (the
    native producer-side planarize vs numpy oracle), and get(out=...)
    must write into the caller's buffer without reallocation."""
    from bp_from_video_tpu.native import FrameSlot

    rng = np.random.default_rng(5)
    slot = FrameSlot((24, 32, 3), planar=True)
    assert slot.out_shape == (3, 24, 32)
    frame = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    slot.put(frame, 1.5, 30.0, False)
    got, ts, fs, cal, seq = slot.get()
    np.testing.assert_array_equal(np.asarray(got),
                                  frame.transpose(2, 0, 1))
    assert (ts, fs, cal, seq) == (1.5, 30.0, False, 1)

    out = np.zeros((3, 24, 32), np.uint8)
    frame2 = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    slot.put(frame2, 2.0, 30.0, True)
    got2 = slot.get(require_fresh=True, out=out)
    assert got2 is not None and got2[0] is out
    np.testing.assert_array_equal(out, frame2.transpose(2, 0, 1))


def test_frame_slot_planar_tear_free_under_load():
    """Concurrent planar puts must never tear: every consumed frame is a
    valid transpose of SOME produced frame (per-frame constant fill makes
    mixing detectable)."""
    import threading
    from bp_from_video_tpu.native import FrameSlot

    slot = FrameSlot((16, 16, 3), planar=True)
    n = 300

    def produce():
        for k in range(1, n + 1):
            f = np.empty((16, 16, 3), np.uint8)
            f[..., 0] = k % 251
            f[..., 1] = (k * 3) % 251
            f[..., 2] = (k * 7) % 251
            slot.put(f, float(k), 30.0, False)

    t = threading.Thread(target=produce)
    t.start()
    seen = 0
    while seen < n:
        item = slot.get(require_fresh=True)
        if item is None:
            if not t.is_alive() and slot.latest_seq() <= seen:
                break
            continue
        frame, ts, _, _, seq = item
        seen = seq
        k = int(ts)
        assert (frame[0] == k % 251).all()
        assert (frame[1] == (k * 3) % 251).all()
        assert (frame[2] == (k * 7) % 251).all()
    t.join()
    assert seen == n
