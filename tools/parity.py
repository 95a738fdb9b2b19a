"""Accuracy parity harness: HR within ±1 BPM of the CPU reference on
recorded videos (the BASELINE acceptance gate).

Modes
-----
1. Compare two recorded series (ours `.npz` from `--record`, reference CSV
   with columns time,bpm[,bpm2...]):
       python tools/parity.py --ours run.npz --ref ref.csv
2. Run THIS framework on a video and, when the `mediapipe` package and the
   reference sources are importable (not the case in the build image —
   mediapipe is absent), run the reference loop on the same video and
   compare directly:
       python tools/parity.py --video clip.mp4 [--reference-dir PATH]

The in-repo correctness story that doesn't need mediapipe lives in tests/:
every DSP stage is validated against a scipy re-derivation of the
reference's signal path (tests/ref_oracle.py), and the fused engine
reproduces the oracle's BPM on synthetic landmark streams to <1e-3 BPM
(tests/test_engine.py).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def compare_series(t_a, bpm_a, t_b, bpm_b, settle: float = 5.0):
    """Align two BPM time series (nearest timestamp) after a settle period;
    return (mean |delta|, max |delta|, n)."""
    t_a, bpm_a = np.asarray(t_a), np.asarray(bpm_a, np.float64)
    t_b, bpm_b = np.asarray(t_b), np.asarray(bpm_b, np.float64)
    keep = (t_a >= settle) & np.isfinite(bpm_a)
    deltas = []
    for t, v in zip(t_a[keep], bpm_a[keep]):
        j = int(np.argmin(np.abs(t_b - t)))
        if abs(t_b[j] - t) <= 0.1 and np.isfinite(bpm_b[j]):
            deltas.append(abs(v - bpm_b[j]))
    if not deltas:
        return float("nan"), float("nan"), 0
    d = np.asarray(deltas)
    return float(d.mean()), float(d.max()), len(d)


def run_ours(video: str, signal_idx: int = 0):
    from bp_from_video_tpu.config import CaptureConfig, EngineConfig
    from bp_from_video_tpu.drivers import sequential
    from bp_from_video_tpu.runtime.recorder import SignalRecorder

    rec = SignalRecorder("/dev/null")
    rec.save = lambda: None  # in-memory only
    sequential.run(EngineConfig(), CaptureConfig(path=video), show=False,
                   print_profile=False, recorder=rec)
    t = np.asarray(rec._rows["timestamp"])
    bpm = np.stack(rec._rows["bpm"])[:, signal_idx]
    return t, bpm


def run_reference(video: str, reference_dir: str):
    """Drive the reference implementation (requires mediapipe)."""
    sys.path.insert(0, reference_dir)
    import inference_runner
    import signal_processor
    import video_reader

    reader = video_reader.VideoReader(video)
    runner = inference_runner.InferenceRunner()
    proc = signal_processor.SignalProcessor()
    ts, bpms = [], []
    try:
        while True:
            fd = reader.read_frame()
            mr = runner.predict(fd)
            store = proc.process(fd, mr)
            ts.append(fd.timestamp)
            bpms.append(store.sg_bpm.get_means(as_int=False)[0])
    except Exception:
        pass
    finally:
        reader.cleanup()
        runner.cleanup()
    return np.asarray(ts), np.asarray(bpms)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--ours", help="our recorded npz (from --record)")
    p.add_argument("--ref", help="reference CSV: time,bpm")
    p.add_argument("--video", help="run both pipelines on this video")
    p.add_argument("--reference-dir", default="/root/reference")
    p.add_argument("--signal", type=int, default=0)
    p.add_argument("--tolerance", type=float, default=1.0)
    args = p.parse_args(argv)

    if args.video:
        t_a, bpm_a = run_ours(args.video, args.signal)
        try:
            t_b, bpm_b = run_reference(args.video, args.reference_dir)
        except ImportError as e:
            print(f"reference unavailable ({e}); our series only:")
            print(f"  frames: {len(t_a)}, settled mean BPM: "
                  f"{np.nanmean(bpm_a[t_a >= 5.0]):.1f}")
            return 0
    else:
        data = np.load(args.ours)
        t_a = data["timestamp"]
        bpm_a = data["bpm"][:, args.signal]
        ref = np.loadtxt(args.ref, delimiter=",", skiprows=1)
        t_b, bpm_b = ref[:, 0], ref[:, 1 + args.signal]

    mean_d, max_d, n = compare_series(t_a, bpm_a, t_b, bpm_b)
    print(f"compared {n} settled samples: mean |dBPM| = {mean_d:.3f}, "
          f"max |dBPM| = {max_d:.3f}")
    ok = np.isfinite(mean_d) and mean_d <= args.tolerance
    print("PASS" if ok else "FAIL",
          f"(gate: mean |dBPM| <= {args.tolerance})")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
