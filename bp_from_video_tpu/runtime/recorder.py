"""Recording + checkpoint/resume.

The reference keeps everything in in-memory rings and loses it on exit
(SURVEY.md §5.4: no checkpointing, no recording).  This framework adds both
because it has offline/batch processing (parallel.run_clip) and a training
loop:

  * :class:`SignalRecorder` — appends per-frame physiological outputs
    (timestamps, per-ROI BPM, per-pair PTT, sampling rate) and writes one
    ``.npz``; the offline analog of watching the live HUD.
  * :func:`save_state` / :func:`load_state` — whole-pytree checkpoints
    (engine state, training state) via orbax when available, with an ``npz``
    fallback; lets a streaming session or a BP-regressor fit resume where it
    stopped.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

Array = jax.Array


class SignalRecorder:
    """Accumulate per-frame outputs; ``save()`` writes one npz file."""

    def __init__(self, path: str):
        self.path = path
        self._rows: dict[str, list[np.ndarray]] = {
            "timestamp": [], "bpm": [], "ptt": [], "curr_fs": []}

    def add(self, timestamp, out) -> None:
        """Record one step's compact outputs (StepOutputs or any object with
        .bpm/.ptt/.curr_fs)."""
        self._rows["timestamp"].append(np.asarray(timestamp, np.float32))
        self._rows["bpm"].append(np.asarray(out.bpm, np.float32))
        self._rows["ptt"].append(np.asarray(out.ptt, np.float32))
        self._rows["curr_fs"].append(np.asarray(out.curr_fs, np.float32))

    def add_clip(self, timestamps, clip_out) -> None:
        """Record a whole offline clip result (parallel.ClipOutputs,
        time-major).  Stored row-per-step so clips and live ``add`` steps
        mix freely (``save`` stacks uniformly shaped rows)."""
        ts = np.asarray(timestamps, np.float32)
        bpm = np.asarray(clip_out.bpm, np.float32)
        ptt = np.asarray(clip_out.ptt, np.float32)
        fs = np.asarray(clip_out.curr_fs, np.float32)
        for t in range(ts.shape[0]):
            self._rows["timestamp"].append(ts[t])
            self._rows["bpm"].append(bpm[t])
            self._rows["ptt"].append(ptt[t])
            self._rows["curr_fs"].append(fs[t])

    def __len__(self) -> int:
        return len(self._rows["timestamp"])

    def save(self) -> str:
        os.makedirs(os.path.dirname(os.path.abspath(self.path)), exist_ok=True)
        arrays = {k: np.stack(v) for k, v in self._rows.items() if v}
        np.savez_compressed(self.path, **arrays)
        # np.savez appends '.npz' when the suffix is missing; return the
        # path of the file that actually exists.
        return (self.path if self.path.endswith(".npz")
                else self.path + ".npz")


def _flatten(tree: Any):
    leaves, treedef = jax.tree.flatten(tree)
    return leaves, treedef


def _flat_dict(tree: Any) -> dict[str, np.ndarray]:
    """Structure-independent representation: leaves keyed by zero-padded
    flatten index (immune to checkpoint libraries converting NamedTuples to
    dicts and re-sorting keys)."""
    leaves, _ = _flatten(tree)
    return {f"leaf_{i:06d}": np.asarray(l) for i, l in enumerate(leaves)}


def save_state(path: str, tree: Any) -> str:
    """Checkpoint any pytree of arrays.  Uses orbax if importable (the
    production path: async, durable directory format), else a plain npz.
    Either way the payload is the flat leaf dict — the caller's template
    supplies the structure on load."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat = _flat_dict(tree)
    try:
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path), flat, force=True)
        return path
    except Exception:  # orbax missing or version drift -> npz fallback
        # A half-written orbax directory must not shadow the npz on load
        # (load_state prefers the directory form).
        if os.path.isdir(path):
            import shutil
            shutil.rmtree(path, ignore_errors=True)
        np.savez(path + ".npz", **flat)
        return path + ".npz"


def load_state(path: str, template: Any) -> Any:
    """Restore a pytree saved by :func:`save_state`; ``template`` supplies
    the structure and dtypes."""
    if os.path.isdir(path):
        import orbax.checkpoint as ocp
        data = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    else:
        data = np.load(path if path.endswith(".npz") else path + ".npz")
    leaves, treedef = _flatten(template)
    out = [jax.numpy.asarray(data[f"leaf_{i:06d}"]).astype(l.dtype)
           for i, l in enumerate(leaves)]
    return jax.tree.unflatten(treedef, out)
