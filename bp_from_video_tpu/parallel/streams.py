"""Multi-stream engine: the fused per-frame step vmapped over a leading
stream axis and (optionally) sharded over a device mesh.

This is the rebuild's data-parallelism story (SURVEY.md §2.3): the reference
processes one stream with batch=1 everywhere; here N independent streams run
as one SPMD program — state, frames, and timestamps carry a leading ``[S]``
axis sharded over the mesh's ``dp`` axis, model params are replicated (or
tensor-sharded over ``tp``), and XLA partitions the whole step.

Two execution surfaces from the same step function:
  * ``step``     — one frame per stream (live / low-latency path).
  * ``run_clip`` — ``lax.scan`` over a time-major frame block (offline /
    throughput path; per-frame rings are carried, only compact per-frame
    outputs are stacked).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from bp_from_video_tpu.config import EngineConfig
from bp_from_video_tpu.parallel import mesh as mesh_lib
from bp_from_video_tpu.runtime.engine import Engine, EngineState

Array = jax.Array


class ClipOutputs(NamedTuple):
    """Compact per-frame results stacked over a clip (time-major): the
    numbers a user of the offline/batch path consumes."""

    bpm: Array      # [T, S, num_signals] smoothed HR means
    ptt: Array      # [T, S, num_pairs]
    curr_fs: Array  # [T, S]


class MultiStreamEngine:
    """N-stream SPMD wrapper around :class:`Engine`.

    ``mesh=None`` runs single-device (vmap only — the N-streams-on-one-chip
    throughput config); with a mesh, use :meth:`shard_state` /
    :meth:`shard_params` to place data and the same jitted callables run
    partitioned over the mesh.
    """

    def __init__(self, config: EngineConfig, asset_dir: str | None = None,
                 mesh=None):
        self.engine = Engine(config, asset_dir=asset_dir)
        self.config = config
        self.mesh = mesh
        self.params = self.engine.params
        self.num_streams = config.num_streams
        # _vstep_local is the per-shard (or single-device) stream-batched
        # step; _vstep is the mesh-spanning callable (what e2e training
        # composes).  batch_step == vmap(step) except detectors are gated
        # behind one scalar cond and skipped when every stream is tracking.
        self._vstep_local = self.engine.batch_step
        self._vstep = self._vstep_local
        if mesh is None:
            self.step = jax.jit(self._vstep)
            self.run_clip = jax.jit(self._run_clip)
            self.run_clip_lagged = jax.jit(self._run_clip_lagged)
        else:
            # Streams are independent -> shard_map over the dp axis (each
            # device runs a local vmap over its stream shard; zero
            # collectives, and no GSPMD guesswork over the vmapped depthwise
            # convs).  Other mesh axes (tp) stay automatic so matmul-heavy
            # consumers (e.g. the BP-regressor train step) can GSPMD-shard
            # over them in the same jit.
            dp = mesh_lib.STREAM_AXIS
            if config.num_streams % mesh.shape[dp]:
                raise ValueError(
                    f"num_streams={config.num_streams} not divisible by "
                    f"dp={mesh.shape[dp]}")
            self._vstep = jax.shard_map(
                self._vstep_local, mesh=mesh,
                in_specs=(P(), P(dp), P(dp), P(dp)),
                out_specs=P(dp), axis_names={dp}, check_vma=False)
            self.step = jax.jit(self._vstep)
            self.run_clip = jax.jit(jax.shard_map(
                self._run_clip, mesh=mesh,
                in_specs=(P(), P(dp), P(None, dp), P(None, dp)),
                out_specs=(P(dp), P(None, dp)),
                axis_names={dp}, check_vma=False))
            # Lagged micro-batch clip: frames [Tw, F, S, ...] — streams on
            # axis 2, so the dp shard spec skips two leading time axes.
            self.run_clip_lagged = jax.jit(jax.shard_map(
                self._run_clip_lagged, mesh=mesh,
                in_specs=(P(), P(dp), P(None, None, dp), P(None, None, dp)),
                out_specs=(P(dp), P(None, dp)),
                axis_names={dp}, check_vma=False))

    # -- state ------------------------------------------------------------

    def init_states(self) -> EngineState:
        """Stack S fresh per-stream engine states on a leading axis."""
        st = self.engine.init_state()
        s = self.num_streams
        return jax.tree.map(
            lambda x: jnp.broadcast_to(x, (s,) + x.shape), st)

    # -- mesh placement ------------------------------------------------------

    def shard_state(self, state: EngineState) -> EngineState:
        if self.mesh is None:
            return state
        return mesh_lib.shard_streams(state, self.mesh)

    def shard_params(self, params: Any) -> Any:
        """Vision-model params are replicated across the mesh: the step runs
        manual over ``dp`` (each device computes its streams whole), and
        channel-sharding 2-MB conv nets over ``tp`` costs more in collectives
        than it saves.  ``tp`` is for the matmul-heavy heads (e.g. the
        BP-regressor, mesh.shard_params)."""
        if self.mesh is None:
            return params
        return mesh_lib.replicate(params, self.mesh)

    def shard_frames(self, frames: Array) -> Array:
        """Place a ``[S, ...]`` frame batch stream-sharded."""
        if self.mesh is None:
            return jnp.asarray(frames)
        return mesh_lib.shard_streams(frames, self.mesh)

    # -- live display path ---------------------------------------------------

    def make_display_step(self, compose_fn, display_stream: int = 0):
        """ONE dispatch per displayed frame: the S-stream fused step AND
        the display composition (overlays + plots + on-device text +
        packed HUD scalars) for the single displayed stream compile into
        one executable.  Composing only the displayed stream keeps the
        rasterization cost O(1) in stream count (the bench's multistream
        row prices the all-streams variant); fusing kills the extra
        per-frame dispatch round trip (~30 ms on a remote device).

        ``compose_fn`` is ``Drawer._compose_fn``; ``display_stream`` is
        static (re-make on switch).  Frames are planar ``[S, 3, H, W]``
        (the feeder's upload layout) or NHWC ``[S, H, W, 3]``.
        """
        def fn(params, state, frames, ts):
            state, out = self._vstep(params, state, frames, ts)
            sel = jax.tree.map(lambda a: a[display_stream], out)
            f = frames[display_stream]
            if f.shape[0] == 3:  # planar -> HWC for the overlay composer
                f = jnp.transpose(f, (1, 2, 0))
            frame_img, plot_img, packed = compose_fn(f, sel)
            return state, out, frame_img, plot_img, packed
        return jax.jit(fn)

    # -- offline / throughput path -----------------------------------------

    def _run_clip(self, params, state: EngineState, frames: Array,
                  timestamps: Array) -> tuple[EngineState, ClipOutputs]:
        """Scan the fused step over a time-major clip.

        frames: uint8 ``[T, S, H, W, 3]``; timestamps: ``[T, S]`` seconds.
        The reference analog is the whole bp.py:21-30 loop over a recorded
        video, with stage hand-off replaced by the scan carry.
        """
        def body(st, xs):
            frame_t, ts_t = xs
            st, out = self._vstep_local(params, st, frame_t, ts_t)
            return st, ClipOutputs(out.bpm, out.ptt, out.curr_fs)

        return jax.lax.scan(body, state, (frames, timestamps))

    def _run_clip_lagged(self, params, state: EngineState, frames: Array,
                         timestamps: Array
                         ) -> tuple[EngineState, ClipOutputs]:
        """Scan the lagged micro-batch step over window-major frames.

        frames: uint8 ``[Tw, F, S, ...]``; timestamps: ``[Tw, F, S]``.
        Outputs are per WINDOW (one analysis per F frames — the
        throughput operating point; engine.batch_step_lagged docstring)."""
        def body(st, xs):
            frame_w, ts_w = xs
            st, out = self.engine.batch_step_lagged(params, st, frame_w,
                                                    ts_w)
            return st, ClipOutputs(out.bpm, out.ptt, out.curr_fs)

        return jax.lax.scan(body, state, (frames, timestamps))
