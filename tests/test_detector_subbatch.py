"""Bounded re-detection sub-batch (VERDICT.md Weak #4).

The batch detector gate used to be all-or-nothing: one stream of S losing
its face re-ran BOTH detectors for all S streams.  Now (up to)
``detector_subbatch`` compacted streams are served per frame, most-starved
first.  These tests pin: scheduler selection/merge semantics, starvation
freedom, and end-to-end equivalence with per-stream ``predict`` whenever
every needing stream fits in the sub-batch.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bp_from_video_tpu.config import InferenceConfig, RunningMode
from bp_from_video_tpu.models.runner import InferenceRunner


@pytest.fixture(scope="module")
def runner():
    cfg = InferenceConfig(
        face_landmarker=True, hand_landmarker=True,
        face_detector_path=None, face_landmarker_path=None,
        hand_landmarker_path=None, person_segmenter_path=None,
        detector_subbatch=4)
    return InferenceRunner(cfg, 64, 64)


def _stub_det_one(frame):
    """Marker detector: rect encodes the stream id (frames are constant)."""
    mid = jnp.mean(frame.astype(jnp.float32))
    return jnp.full((5,), mid), mid < 100.0  # valid for streams 0..99


def _frames(s):
    """Planar uint8 frames whose constant value is the stream index."""
    return jnp.tile(jnp.arange(s, dtype=jnp.uint8)[:, None, None, None],
                    (1, 3, 8, 8))


def test_subbatch_serves_most_starved_first(runner):
    s, k = 8, 3
    need = jnp.asarray([1, 1, 0, 1, 1, 0, 1, 0], bool)
    age = jnp.asarray([0, 5, 0, 1, 3, 0, 2, 0], jnp.int32)
    cur = jnp.full((s, 5), -1.0)
    det_rects, det_valid, served = runner._subbatch_detect(
        _frames(s), True, need, age, cur, _stub_det_one, k)
    # Oldest needing streams: 1 (age 5), 4 (age 3), 6 (age 2).
    np.testing.assert_array_equal(
        np.asarray(served), [0, 1, 0, 0, 1, 0, 1, 0])
    np.testing.assert_array_equal(np.asarray(det_valid), np.asarray(served))
    got = np.asarray(det_rects)
    for i in range(s):
        want = float(i) if served[i] else -1.0
        assert (got[i] == want).all(), (i, got[i])


def test_subbatch_skips_when_nothing_needed(runner):
    s, k = 6, 3
    need = jnp.zeros((s,), bool)
    cur = jnp.full((s, 5), -2.0)
    det_rects, det_valid, served = runner._subbatch_detect(
        _frames(s), True, need, jnp.zeros((s,), jnp.int32), cur,
        _stub_det_one, k)
    assert not bool(jnp.any(served))
    assert not bool(jnp.any(det_valid))
    np.testing.assert_array_equal(np.asarray(det_rects), np.asarray(cur))


def test_subbatch_round_robin_is_starvation_free(runner):
    """Persistent need (detections keep failing): every needing stream is
    served exactly once per ceil(n/k) frames under the age rule."""
    s, k = 9, 3
    need = jnp.ones((s,), bool)
    age = jnp.zeros((s,), jnp.int32)
    cur = jnp.zeros((s, 5))
    counts = np.zeros(s, int)
    for _ in range(6):  # 2 full rotations
        _, _, served = runner._subbatch_detect(
            _frames(s), True, need, age, cur, _stub_det_one, k)
        counts += np.asarray(served, int)
        age = jnp.where(need & ~served, age + 1, 0)
    np.testing.assert_array_equal(counts, np.full(s, 2))


@pytest.mark.slow
def test_batch_matches_per_stream_predict_under_mixed_tracking(runner):
    """The VERDICT equivalence gate: with <= detector_subbatch streams
    needing detection, predict_batch == vmap-free per-stream predict."""
    s = 6
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randint(0, 255, (s, 64, 64, 3)), jnp.uint8)
    state0 = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (s,) + x.shape)
        if hasattr(x, "shape") else x, runner.init_state())
    # Streams 1 and 4 lost face tracking; stream 2 lost one hand slot.
    face_tr = jnp.asarray([1, 0, 1, 1, 0, 1], bool)
    hand_tr = jnp.ones((s, 2), bool).at[2, 1].set(False)
    # Give non-needing streams plausible tracked rects.
    rect = jnp.asarray([32.0, 32.0, 40.0, 40.0, 0.0])
    state0 = state0._replace(
        face_rect=jnp.tile(rect[None], (s, 1)),
        hand_rects=jnp.tile(rect[None, None], (s, 2, 1)),
        face_tracking=face_tr, hand_tracking=hand_tr)

    bstate, bres = jax.jit(runner.predict_batch)(runner.params, state0,
                                                 frames)

    sstates, sres = [], []
    for i in range(s):
        st_i = jax.tree.map(lambda x: x[i], state0)
        st_o, r_o = jax.jit(runner.predict)(runner.params, st_i, frames[i])
        sstates.append(st_o)
        sres.append(r_o)
    sstate = jax.tree.map(lambda *xs: jnp.stack(xs), *sstates)
    sres = jax.tree.map(lambda *xs: jnp.stack(xs), *sres)

    for name, a, b in [("results", bres, sres), ("state", bstate, sstate)]:
        for la, lb, path in zip(jax.tree.leaves(a), jax.tree.leaves(b),
                                jax.tree.structure(a).flatten_up_to(a)):
            la, lb = np.asarray(la, np.float64), np.asarray(lb, np.float64)
            np.testing.assert_allclose(
                la, lb, atol=1e-3, equal_nan=True,
                err_msg=f"{name} leaf mismatch")
