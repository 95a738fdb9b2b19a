"""Angle-gated hybrid rotation mode (VERDICT r2 item 2).

``rotation_mode="hybrid"`` must be exactly the cover fast path while every
tracked crop's |rotation| stays within ``hybrid_max_tilt_deg``, and the
gather-free shear rotated view beyond it — on BOTH execution surfaces:

* the batched Pallas path (one scalar lax.cond — exercised here in
  interpret mode via ``pallas_interpret``), and
* the per-stream fallback path (per-crop cond in _run_landmarker).

Reference contract: MediaPipe feeds the landmark nets a rotation-
normalized crop (inference_runner.py:120-122); cover approximates it near
upright, shear matches it at every angle (tests/test_shear_crop.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bp_from_video_tpu.config import InferenceConfig, RunningMode
from bp_from_video_tpu.models import runner as runner_mod
from bp_from_video_tpu.models.runner import InferenceRunner

H = W = 128


@pytest.fixture(autouse=True)
def _always_present(monkeypatch):
    """The real face mesh (resolved from /root/reference) scores a noise
    frame deeply absent (raw presence ≈ -25); force the presence gate open
    so landmark geometry (the thing under test) stays finite."""
    monkeypatch.setattr(runner_mod, "PRESENCE_THRESHOLD", -1e9)


def _frame(seed=7):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0, 255, (H, W, 3)).astype(np.uint8))


def _runner(mode, **kw):
    cfg = InferenceConfig(face_landmarker=True, hand_landmarker=False,
                          running_mode=RunningMode.VIDEO,
                          rotation_mode=mode, **kw)
    return InferenceRunner(cfg, H, W)


def _tracked_state(runner, rot_deg):
    """Tracking state mid-stream: a valid face rect with the given tilt, so
    predict skips detection and the crop stage sees exactly this rect."""
    st = runner.init_state()
    rect = jnp.asarray([W / 2, H / 2, 64.0, 64.0, np.deg2rad(rot_deg)],
                       jnp.float32)
    return st._replace(face_rect=rect, face_tracking=jnp.asarray(True))


def _points(runner, rot_deg, frame):
    st = _tracked_state(runner, rot_deg)
    # One jitted predict per runner, reused across angles: a fresh
    # jax.jit wrapper per call retraced the whole runner every time
    # (3 angles x 2 runners per test — pure suite-time waste).
    jp = getattr(runner, "_test_jit_predict", None)
    if jp is None:
        jp = jax.jit(runner.predict)
        runner._test_jit_predict = jp
    _, res = jp(runner.params, st, frame)
    return np.asarray(res.face_landmarker.points, np.float64)



@pytest.fixture(scope="module")
def shear_oracle():
    """Shared shear-mode oracle runner (module scope: 4 tests re-built it,
    each paying real-weight construction + a fresh predict trace)."""
    return _runner("shear")


@pytest.fixture(scope="module")
def cover_pallas():
    return _runner("cover", use_pallas=True, pallas_interpret=True)


# The non-Pallas variant covers the per-stream cond path; it duplicates
# the geometry assertions of the batch-gate variant, so it rides in the
# slow set (suite-time budget, VERDICT r2 next #8).
@pytest.mark.parametrize("pallas", [
    pytest.param(False, marks=pytest.mark.slow), True])
def test_hybrid_upright_matches_cover(pallas):
    frame = _frame()
    kw = dict(use_pallas=pallas, pallas_interpret=pallas)
    hybrid = _runner("hybrid", **kw)
    cover = _runner("cover", **kw)
    for deg in (0.0, 8.0, -14.0):
        p_h, p_c = _points(hybrid, deg, frame), _points(cover, deg, frame)
        # Same branch, same math; the cond wrapper may reassociate float
        # ops, and landmark ints truncate — allow 1-px flips on a handful
        # of knife-edge landmarks but require essentially exact identity.
        np.testing.assert_allclose(p_h, p_c, atol=1.0,
                                   err_msg=f"deg={deg} pallas={pallas}")
        assert np.nanmean(np.abs(p_h - p_c)) < 0.05, (deg, pallas)


@pytest.mark.parametrize("pallas", [
    pytest.param(False, marks=pytest.mark.slow), True])
def test_hybrid_tilted_matches_shear(pallas, shear_oracle):
    """Past the gate the hybrid crop/projection must be the shear rotated
    view.  The shear oracle runs through the plain per-stream path, the
    pallas hybrid through packed crops + the fused stem — numerically
    equivalent (the packed stem twin is exact), so landmark agreement is
    tight; random-init nets amplify interpolation deltas, so allow px."""
    frame = _frame()
    shear = shear_oracle  # per-stream plain path oracle
    hybrid = _runner("hybrid", use_pallas=pallas, pallas_interpret=pallas)
    cover = _runner("cover", use_pallas=pallas, pallas_interpret=pallas)
    for deg in (25.0, -40.0):
        p_h = _points(hybrid, deg, frame)
        p_s = _points(shear, deg, frame)
        p_c = _points(cover, deg, frame)
        finite = np.isfinite(p_h).all(axis=-1) & np.isfinite(p_s).all(axis=-1)
        assert finite.any()
        d_hs = np.linalg.norm(p_h - p_s, axis=-1)[finite]
        assert np.mean(d_hs) < 3.0, (deg, np.mean(d_hs))
        # and it must NOT be the cover view (the whole point of the gate)
        assert not np.allclose(p_h, p_c), deg


def test_hybrid_gate_threshold_is_configurable():
    frame = _frame()
    wide = _runner("hybrid", hybrid_max_tilt_deg=60.0)
    cover = _runner("cover")
    p_w, p_c = _points(wide, 40.0, frame), _points(cover, 40.0, frame)
    np.testing.assert_allclose(p_w, p_c, atol=1.0)
    assert np.nanmean(np.abs(p_w - p_c)) < 0.05


def test_hybrid_batch_mixed_streams_shear_subbatch(shear_oracle,
                                                  cover_pallas):
    """One tilted stream is served by the bounded shear SUB-BATCH while
    the upright stream stays on the Pallas cover fast path (round 4: the
    whole-batch flip cost all streams 2.9x for one tilted subject —
    VERDICT r3 Weak #5)."""
    frame = _frame()
    frames = jnp.stack([frame, frame])
    hybrid = _runner("hybrid", use_pallas=True, pallas_interpret=True)
    shear = shear_oracle
    cover = cover_pallas

    st1 = _tracked_state(hybrid, 0.0)
    st2 = _tracked_state(hybrid, 30.0)
    st_b = jax.tree.map(lambda a, b: jnp.stack([a, b]), st1, st2)
    _, res = jax.jit(hybrid.predict_batch)(hybrid.params, st_b, frames)
    got = np.asarray(res.face_landmarker.points, np.float64)

    # Tilted stream 1: served by the sub-batch -> shear-oracle view.
    p_s1 = _points(shear, 30.0, frame)
    finite = (np.isfinite(got[1]).all(axis=-1)
              & np.isfinite(p_s1[0]).all(axis=-1))
    d = np.linalg.norm(got[1] - p_s1[0], axis=-1)[finite]
    assert np.mean(d) < 3.0, np.mean(d)
    # Upright stream 0: stays on the cover fast path (essentially exact
    # vs a pure-cover runner — the whole point of the sub-batch).
    _, res_c = jax.jit(cover.predict_batch)(
        cover.params, jax.tree.map(lambda a, b: jnp.stack([a, b]),
                                   _tracked_state(cover, 0.0),
                                   _tracked_state(cover, 30.0)), frames)
    p_c0 = np.asarray(res_c.face_landmarker.points, np.float64)[0]
    np.testing.assert_allclose(got[0], p_c0, atol=1.0)


def test_hybrid_subbatch_overflow_falls_back_to_full_shear(shear_oracle):
    """More gated crops than the shear budget: every gated crop must
    STILL get the rotated view (the whole-batch shear fallback) — the
    budget bounds cost, never fidelity."""
    frame = _frame()
    frames = jnp.stack([frame, frame])
    hybrid = _runner("hybrid", use_pallas=True, pallas_interpret=True,
                     shear_subbatch=1)
    shear = shear_oracle

    st_b = jax.tree.map(lambda a, b: jnp.stack([a, b]),
                        _tracked_state(hybrid, 25.0),
                        _tracked_state(hybrid, 30.0))
    _, res = jax.jit(hybrid.predict_batch)(hybrid.params, st_b, frames)
    got = np.asarray(res.face_landmarker.points, np.float64)
    for i, deg in enumerate((25.0, 30.0)):
        p_s = _points(shear, deg, frame)
        finite = (np.isfinite(got[i]).all(axis=-1)
                  & np.isfinite(p_s[0]).all(axis=-1))
        d = np.linalg.norm(got[i] - p_s[0], axis=-1)[finite]
        assert np.mean(d) < 3.0, (i, np.mean(d))


def test_hybrid_config_validation():
    with pytest.raises(ValueError):
        InferenceConfig(hybrid_max_tilt_deg=0.0)
    assert InferenceConfig(
        rotation_mode="hybrid").resolved_rotation_mode() == "hybrid"


def test_hybrid_gate_ignores_stale_untracked_rects():
    """A stream that LOST tracking keeps its last (finite, maybe tilted)
    rect until the bounded detector sub-batch serves it; its landmark
    output is masked downstream, so its stale tilt must NOT flip the
    batch gate off the Pallas cover fast path (review finding, round 3).

    Setup forces the unserved-stale window: detector_subbatch=1 with two
    needy streams — the more-starved one is served, the other's crop rect
    stays the stale 30-degree state rect with det_ok=False."""
    frame = _frame()
    frames = jnp.stack([frame, frame, frame])
    kw = dict(use_pallas=True, pallas_interpret=True, detector_subbatch=1)
    hybrid = _runner("hybrid", **kw)
    cover = _runner("cover", **kw)

    def batch_state(runner):
        sts = [_tracked_state(runner, 0.0),          # tracked, upright
               _tracked_state(runner, 30.0),         # stale tilted, LOST
               _tracked_state(runner, 10.0)]         # lost, most starved
        st = jax.tree.map(lambda *xs: jnp.stack(xs), *sts)
        return st._replace(
            face_tracking=jnp.asarray([True, False, False]),
            face_det_age=st.face_det_age.at[2].set(5))

    _, res_h = jax.jit(hybrid.predict_batch)(
        hybrid.params, batch_state(hybrid), frames)
    _, res_c = jax.jit(cover.predict_batch)(
        cover.params, batch_state(cover), frames)
    p_h = np.asarray(res_h.face_landmarker.points[0], np.float64)
    p_c = np.asarray(res_c.face_landmarker.points[0], np.float64)
    # Tracked stream 0 must be on the cover branch (essentially exact);
    # pre-fix the stale 30-degree rect tripped the gate onto shear.
    np.testing.assert_allclose(p_h, p_c, atol=1.0)
    assert np.nanmean(np.abs(p_h - p_c)) < 0.05


def test_pow2_ladder_unit():
    from bp_from_video_tpu.models.runner import _pow2_ladder
    assert _pow2_ladder(1) == [1]
    assert _pow2_ladder(2) == [1, 2]
    assert _pow2_ladder(4) == [1, 2, 4]
    assert _pow2_ladder(5) == [1, 2, 4, 5]
    assert _pow2_ladder(8) == [1, 2, 4, 8]


@pytest.mark.slow
def test_hybrid_ladder_intermediate_count_serves_all_gated(shear_oracle,
                                                          cover_pallas):
    """3 of 4 streams tilted with budget 4: the pay-per-serve switch picks
    the 4-crop rung (first pow2 >= 3) and every gated stream must still
    get the shear-grade view while the upright one stays on cover
    (VERDICT r4 next #4 — sizing must never trade fidelity)."""
    frame = _frame()
    frames = jnp.stack([frame] * 4)
    hybrid = _runner("hybrid", use_pallas=True, pallas_interpret=True,
                     shear_subbatch=4)
    shear = shear_oracle
    cover = cover_pallas

    degs = (0.0, 25.0, 30.0, 35.0)
    st_b = jax.tree.map(lambda *a: jnp.stack(a),
                        *[_tracked_state(hybrid, d) for d in degs])
    _, res = jax.jit(hybrid.predict_batch)(hybrid.params, st_b, frames)
    got = np.asarray(res.face_landmarker.points, np.float64)

    for i, deg in enumerate(degs[1:], start=1):
        p_s = _points(shear, deg, frame)
        finite = (np.isfinite(got[i]).all(axis=-1)
                  & np.isfinite(p_s[0]).all(axis=-1))
        d = np.linalg.norm(got[i] - p_s[0], axis=-1)[finite]
        assert np.mean(d) < 3.0, (i, np.mean(d))
    p_c0 = _points(cover, 0.0, frame)
    np.testing.assert_allclose(got[0], p_c0, atol=1.0)
