"""Measure a LIST of bench rows in ONE process (dev tool).

Each ``python bench.py`` invocation pays the axon sync-dispatch latch
(2-30 min, tunnel-load dependent) before its first honest measurement;
sweeping N operating points as N processes wastes N-1 latches.  This
driver reuses bench.measure()/build_config() for a comma-separated spec
list and prints one JSON line per row (no artifact writes — BENCH_ALL
stays the only BENCH_PRESETS.json writer).

Spec grammar (comma list in BENCH_ROWS):
    <preset|flagship>[:s=<streams>][:mb=<F>][:render=<all|display|none>]
    [:sub=<shear_subbatch>][:tilt=<deg>][:tiltk=<k>]

Example:
    BENCH_ROWS="multistream:s=16:render=all,flagship:mb=4" \
        python tools/benchrows.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _enable_compile_cache, build_config, measure  # noqa: E402


def main():
    if not os.environ.get("BENCH_PLATFORM"):
        from bp_from_video_tpu.utils.tunnel import wait_for_tpu
        if not wait_for_tpu():
            print("benchrows: tunnel unreachable", file=sys.stderr)
            sys.exit(3)
    import jax
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    _enable_compile_cache()
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        from bp_from_video_tpu.utils.axon import force_sync_dispatch
        print(f"benchrows: latch {force_sync_dispatch():.1f} s",
              file=sys.stderr, flush=True)

    clip_len = int(os.environ.get("BENCH_CLIP", "256"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    h, w = 480, 640

    for spec in os.environ.get("BENCH_ROWS", "flagship").split(","):
        parts = spec.strip().split(":")
        name = parts[0]
        kv = dict(p.split("=", 1) for p in parts[1:])
        streams = int(kv.get("s", "64"))
        mb = int(kv["mb"]) if "mb" in kv else None
        render = {"all": True, "display": "display", "none": False}[
            kv.get("render", "none")]
        preset = None if name == "flagship" else name
        cfg, metric = build_config(preset, streams, h, w, on_tpu)
        if "sub" in kv or "tilt" in kv:
            over = {"rotation_mode": "hybrid"}
            if "sub" in kv:
                over["shear_subbatch"] = int(kv["sub"])
            cfg = dataclasses.replace(cfg, inference=dataclasses.replace(
                cfg.inference, **over))
        label = spec.strip().replace(":", "_").replace("=", "")
        try:
            res = measure(cfg, f"rppg_row_{label}", clip_len, reps,
                          render=render, micro_batch=mb,
                          tilt_deg=float(kv["tilt"]) if "tilt" in kv
                          else None,
                          tilt_k=int(kv["tiltk"]) if "tiltk" in kv
                          else None)
            print(json.dumps(res), flush=True)
        except Exception as e:  # keep sweeping; one 413 must not kill all
            print(json.dumps({"metric": f"rppg_row_{label}",
                              "error": repr(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
