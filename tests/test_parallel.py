"""Multi-stream / mesh-sharding tests (SURVEY.md §4: single-chip vmap
equivalence — N streams vmapped == N streams looped — plus sharded ==
unsharded on a virtual 8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bp_from_video_tpu.config import EngineConfig, InferenceConfig, SignalConfig
from bp_from_video_tpu.parallel import (
    MultiStreamEngine, make_mesh, shard_params, shard_streams)
from bp_from_video_tpu.parallel.mesh import MODEL_AXIS, STREAM_AXIS

from conftest import cpu_devices


def tiny_config(num_streams: int) -> EngineConfig:
    return EngineConfig(
        signal=SignalConfig(signal_max_samples=16, peak_max_samples=4),
        inference=InferenceConfig(
            face_detector_path=None, face_landmarker_path=None,
            hand_landmarker_path=None, person_segmenter_path=None),
        frame_height=32, frame_width=32, num_streams=num_streams)


def make_inputs(rng, num_streams, t, cfg):
    """Frames with a strong per-stream green pulse: random noise alone gives
    near-flat spectra whose argmax (-> BPM) is numerically fragile, flipping
    between vmapped and looped fusion orders."""
    base = rng.integers(0, 40, (num_streams, cfg.frame_height,
                                cfg.frame_width, 3), dtype=np.uint8)
    pulse = 120 + 60 * np.sin(2 * np.pi * (1.0 + 0.3 * np.arange(num_streams))
                              * (t + 1) / 30.0)
    base[..., 1] = pulse.astype(np.uint8)[:, None, None]
    ts = jnp.asarray(
        (t + 1) / 30.0 + 0.001 * np.arange(num_streams, dtype=np.float32))
    return jnp.asarray(base), ts


@pytest.mark.slow
def test_vmap_matches_loop():
    s = 3
    cfg = tiny_config(s)
    ms = MultiStreamEngine(cfg)
    states = ms.init_states()
    rng = np.random.default_rng(7)

    # Per-stream sequential oracle using the same engine/params.
    solo_step = jax.jit(ms.engine.step)
    solo_states = [jax.tree.map(lambda x: x[i], states) for i in range(s)]

    for t in range(6):
        frames, ts = make_inputs(rng, s, t, cfg)
        states, out = ms.step(ms.params, states, frames, ts)
        for i in range(s):
            solo_states[i], solo_out = solo_step(
                ms.params, solo_states[i], frames[i], ts[i])
            np.testing.assert_allclose(out.rois[i], solo_out.rois,
                                       rtol=1e-5, equal_nan=True)
            np.testing.assert_allclose(out.raw_y[i], solo_out.raw_y,
                                       rtol=1e-4, equal_nan=True)
            # Equivalence is asserted on the CONTINUOUS outputs (spectra,
            # correlations), not on bpm/ptt: those are argmaxes, and on
            # short warmup windows the spectrum is near-flat, so f32
            # fusion-order noise between the batched and solo programs can
            # legitimately flip the peak between equal-quality bins.
            np.testing.assert_allclose(out.spec_y[i], solo_out.spec_y,
                                       rtol=2e-3, atol=1e-5, equal_nan=True)
            np.testing.assert_allclose(out.corr_y[i], solo_out.corr_y,
                                       rtol=2e-3, atol=1e-5, equal_nan=True)


@pytest.mark.slow
def test_run_clip_matches_stepping():
    s, t_len = 2, 8
    cfg = tiny_config(s)
    ms = MultiStreamEngine(cfg)
    rng = np.random.default_rng(3)
    frames = jnp.asarray(rng.integers(
        0, 256, (t_len, s, cfg.frame_height, cfg.frame_width, 3),
        dtype=np.uint8))
    ts = jnp.asarray(np.arange(1, t_len + 1, dtype=np.float32)[:, None]
                     / 30.0 * np.ones((1, s), np.float32))

    st_a = ms.init_states()
    st_a, clip_out = ms.run_clip(ms.params, st_a, frames, ts)

    st_b = ms.init_states()
    for k in range(t_len):
        st_b, out = ms.step(ms.params, st_b, frames[k], ts[k])
        # Scan-vs-step equivalence is asserted on CONTINUOUS outputs and
        # the carried state (below), not on exact bpm/ptt values: those
        # are argmaxes of near-flat warmup spectra over random noise, and
        # f32 fusion-order differences between the scan-compiled and
        # step-compiled programs can legitimately flip a near-tied peak
        # bin (same rationale as test_batched_matches_solo above).  The
        # NaN degradation pattern must still agree exactly.
        np.testing.assert_array_equal(np.isfinite(clip_out.bpm[k]),
                                      np.isfinite(out.bpm))
        np.testing.assert_array_equal(np.isfinite(clip_out.ptt[k]),
                                      np.isfinite(out.ptt))
        np.testing.assert_allclose(clip_out.curr_fs[k], out.curr_fs,
                                   rtol=1e-6, equal_nan=True)
    # Carried ring STRUCTURE must agree exactly (timestamps, NaN pattern —
    # the scan-carry semantics under test); ring VALUES only to ~pixel
    # tolerance: each sample is a mean over a landmark-derived ROI box,
    # and the random-init nets amplify f32 fusion-order differences into
    # an occasional 1-px box shift (~1% mean change on noise frames).
    np.testing.assert_allclose(
        np.asarray(st_a.signals.raw_x), np.asarray(st_b.signals.raw_x),
        rtol=0, atol=0, equal_nan=True)
    a_y = np.asarray(st_a.signals.raw_y)
    b_y = np.asarray(st_b.signals.raw_y)
    np.testing.assert_array_equal(np.isfinite(a_y), np.isfinite(b_y))
    np.testing.assert_allclose(a_y, b_y, rtol=0.05, equal_nan=True)


def test_run_clip_matches_stepping_deterministic(monkeypatch):
    """Scan-vs-step with the landmark nets STUBBED to a closed form (fixed
    in-crop point fan, presence=1) and tracking pre-seeded, so no
    landmark-derived geometry rides on random-init float noise: the
    carried rings must then match TIGHTLY.  The net-driven variant above
    needs a 5% value gate (fusion-order noise through the nets shifts ROI
    boxes by a pixel), which is wide enough to hide a real state-carry
    regression — this variant restores the exact lock (ADVICE r3)."""
    from bp_from_video_tpu.models import blaze

    def fixed_lm(p, x, input_size):
        n_lm = p["head_lm"]["w"].shape[1] // 3
        i = jnp.arange(n_lm, dtype=jnp.float32)
        # Irrational-ish fractions: keep derived ROI boxes away from
        # integer floor boundaries where a ULP could flip a pixel.
        xs = input_size * (0.3531 + 0.2973 * (i % 5) / 4.0)
        ys = input_size * (0.3497 + 0.3011 * jnp.floor(i / 5.0)
                           / max(1.0, (n_lm - 1) // 5))
        lm = jnp.stack([xs, ys, jnp.zeros_like(xs)], -1).reshape(1, -1)
        one = jnp.ones((1, 1), jnp.float32)
        return lm, one, one

    monkeypatch.setattr(blaze, "blaze_landmark_apply", fixed_lm)
    s, t_len = 2, 8
    cfg = tiny_config(s)
    ms = MultiStreamEngine(cfg)
    rng = np.random.default_rng(3)
    frames = jnp.asarray(rng.integers(
        0, 256, (t_len, s, cfg.frame_height, cfg.frame_width, 3),
        dtype=np.uint8))
    ts = jnp.asarray(np.arange(1, t_len + 1, dtype=np.float32)[:, None]
                     / 30.0 * np.ones((1, s), np.float32))

    def seeded():
        st = ms.init_states()
        tr = st.track
        h, w = cfg.frame_height, cfg.frame_width
        rect = jnp.asarray([w / 2, h / 2, 0.8 * w, 0.8 * h, 0.0],
                           jnp.float32)
        return st._replace(track=tr._replace(
            face_rect=jnp.tile(rect[None], (s, 1)),
            face_tracking=jnp.ones((s,), bool),
            hand_rects=jnp.tile(rect[None, None],
                                (s, tr.hand_rects.shape[1], 1)),
            hand_tracking=jnp.ones(tr.hand_tracking.shape, bool)))

    st_a, clip_out = ms.run_clip(ms.params, seeded(), frames, ts)
    st_b = seeded()
    for k in range(t_len):
        st_b, _ = ms.step(ms.params, st_b, frames[k], ts[k])
    np.testing.assert_array_equal(np.asarray(st_a.signals.raw_x),
                                  np.asarray(st_b.signals.raw_x))
    a_y = np.asarray(st_a.signals.raw_y)
    b_y = np.asarray(st_b.signals.raw_y)
    np.testing.assert_array_equal(np.isfinite(a_y), np.isfinite(b_y))
    np.testing.assert_allclose(a_y, b_y, rtol=1e-6, equal_nan=True)
    np.testing.assert_allclose(np.asarray(st_a.signals.bpm_y),
                               np.asarray(st_b.signals.bpm_y),
                               rtol=1e-6, equal_nan=True)


# Both virtual-mesh engine compiles are slow-marked (round 4): the
# driver's dryrun_multichip compiles AND EXECUTES the dp×tp e2e path on
# the 8-device virtual mesh every round, so the quick loop no longer
# needs either ~60-100 s compile; the full suite keeps both.
@pytest.mark.parametrize("axes", [
    pytest.param({STREAM_AXIS: 8}, marks=pytest.mark.slow),
    pytest.param({STREAM_AXIS: 4, MODEL_AXIS: 2},
                 marks=pytest.mark.slow)])
def test_sharded_matches_unsharded(axes):
    s = 8
    cfg = tiny_config(s)
    mesh = make_mesh(axes, cpu_devices(8))
    ms = MultiStreamEngine(cfg, mesh=mesh)
    rng = np.random.default_rng(11)

    ms_u = MultiStreamEngine(cfg)
    states_u = ms_u.init_states()
    states_s = ms.shard_state(ms.init_states())
    params_s = ms.shard_params(ms.params)

    for t in range(4):
        frames, ts = make_inputs(rng, s, t, cfg)
        states_u, out_u = ms_u.step(ms.params, states_u, frames, ts)
        states_s, out_s = ms.step(params_s, states_s,
                                  ms.shard_frames(frames),
                                  ms.shard_frames(ts))
        np.testing.assert_allclose(np.asarray(out_u.bpm),
                                   np.asarray(out_s.bpm),
                                   rtol=1e-4, equal_nan=True)
        np.testing.assert_allclose(np.asarray(out_u.rois),
                                   np.asarray(out_s.rois),
                                   rtol=1e-4, equal_nan=True)


def test_mesh_validation():
    with pytest.raises(ValueError):
        make_mesh({STREAM_AXIS: 64}, cpu_devices(8))


def test_shard_streams_and_params_placement():
    mesh = make_mesh({STREAM_AXIS: 4, MODEL_AXIS: 2}, cpu_devices(8))
    x = shard_streams(jnp.zeros((8, 5)), mesh)
    assert not x.sharding.is_fully_replicated
    p = shard_params({"w": jnp.zeros((3, 16)), "b": jnp.zeros((3,))}, mesh)
    assert not p["w"].sharding.is_fully_replicated
    assert p["b"].sharding.is_fully_replicated


@pytest.mark.slow
def test_dryrun_multihost_two_processes():
    """A REAL 2-process mesh (jax.distributed + gloo CPU collectives), not
    the monkeypatched single-host init: dp crosses the process boundary,
    tp stays intra-process, and the full e2e train step must execute
    (VERDICT r2 next #5).  Children are env-isolated subprocesses, so this
    is safe under the CPU-pinned suite."""
    import __graft_entry__ as g
    g.dryrun_multihost(n_processes=2, devices_per_process=2)


@pytest.mark.slow
def test_dryrun_multihost_child_death_mid_step(monkeypatch):
    """Distributed failure semantics (VERDICT r4 next #8): one rank dies
    AFTER compile, while its sibling enters the executed step and blocks
    in the cross-process dp gradient all-reduce.  The spawner is the
    failure detector (the reference's e_exit broadcast, SURVEY §5.3, at
    the process-mesh level): it must observe the death, kill the blocked
    sibling, and raise a clean error naming the dead rank — no hang past
    a bounded timeout, no orphan holding the coordinator port."""
    import time

    import __graft_entry__ as g

    monkeypatch.setenv("_BPTPU_DCN_FAULT", "1")   # rank 1 dies mid-step
    t0 = time.time()
    with pytest.raises(RuntimeError, match=r"child 1 died \(rc=17\)"):
        g.dryrun_multihost(n_processes=2, devices_per_process=2)
    # Warm-cache budget: 2 attempts (the spawner retries once for port
    # races) of ~distributed-init + compile-load + fault delay each.  A
    # hang would blow far past this.
    assert time.time() - t0 < 600


@pytest.mark.slow
def test_run_clip_lagged_sharded_matches_unsharded(monkeypatch):
    """The lagged micro-batch clip scan under shard_map(dp) must equal the
    single-device path (streams are independent; the [Tw, F, S, ...]
    window layout shards on axis 2).  Landmark nets are stubbed to a
    closed form and tracking pre-seeded — random-init nets on noise
    frames flip knife-edge presence/peak decisions between fusion orders
    (memory: assert continuous outputs, not argmax luck)."""
    from bp_from_video_tpu.models import blaze

    def fixed_lm(p, x, input_size):
        n_lm = p["head_lm"]["w"].shape[1] // 3
        i = jnp.arange(n_lm, dtype=jnp.float32)
        xs = input_size * (0.3531 + 0.2973 * (i % 5) / 4.0)
        ys = input_size * (0.3497 + 0.3011 * jnp.floor(i / 5.0)
                           / max(1.0, (n_lm - 1) // 5))
        lm = jnp.stack([xs, ys, jnp.zeros_like(xs)], -1).reshape(1, -1)
        one = jnp.ones((1, 1), jnp.float32)
        return lm, one, one

    monkeypatch.setattr(blaze, "blaze_landmark_apply", fixed_lm)
    s, f_n, t_w = 4, 3, 3
    cfg = tiny_config(s)
    mesh = make_mesh({STREAM_AXIS: 4}, cpu_devices(4))
    ms_u = MultiStreamEngine(cfg)
    ms_s = MultiStreamEngine(cfg, mesh=mesh)
    rng = np.random.default_rng(17)
    frames = jnp.asarray(rng.integers(
        0, 256, (t_w, f_n, s, cfg.frame_height, cfg.frame_width, 3),
        dtype=np.uint8))
    ts = jnp.asarray(
        (np.arange(1, t_w * f_n + 1, dtype=np.float32) / 30.0
         ).reshape(t_w, f_n)[..., None] * np.ones((1, 1, s), np.float32))

    def seeded(ms):
        st = ms.init_states()
        tr = st.track
        return st._replace(track=tr._replace(
            face_tracking=jnp.ones_like(tr.face_tracking),
            hand_tracking=jnp.ones_like(tr.hand_tracking)))

    st_u, out_u = ms_u.run_clip_lagged(ms_u.params, seeded(ms_u),
                                       frames, ts)
    st_s, out_s = ms_s.run_clip_lagged(
        ms_s.shard_params(ms_s.params),
        ms_s.shard_state(seeded(ms_s)), frames, ts)
    np.testing.assert_allclose(np.asarray(st_u.signals.raw_y),
                               np.asarray(st_s.signals.raw_y),
                               rtol=1e-4, equal_nan=True)
    np.testing.assert_allclose(np.asarray(out_u.bpm),
                               np.asarray(out_s.bpm),
                               rtol=1e-4, equal_nan=True)
