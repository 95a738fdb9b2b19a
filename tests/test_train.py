"""BP-regressor training tests (the reference's abandoned end goal,
README.md:38/:46-48, completed here)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bp_from_video_tpu.train import bp_regressor as bpr


def test_features_nan_handling():
    bpm = jnp.array([70.0, jnp.nan])
    ptt = jnp.array([30.0])
    f = bpr.features_from_outputs(bpm, ptt)
    assert f.shape == (6,)
    np.testing.assert_allclose(f, [70.0, 0.0, 30.0, 1.0, 0.0, 1.0])


def test_training_reduces_loss():
    key = jax.random.key(0)
    in_dim = 6
    state, opt = bpr.init_train_state(key, in_dim, hidden=(32,), lr=1e-2)
    step = jax.jit(lambda st, f, l: bpr.train_step(opt, st, f, l))

    # Synthetic law: SBP/DBP linear in HR and PTT (plausible physiology).
    rng = np.random.default_rng(0)
    hr = rng.uniform(50, 110, (256, 2)).astype(np.float32)
    ptt = rng.uniform(10, 60, (256, 1)).astype(np.float32)
    feats = np.asarray(bpr.features_from_outputs(jnp.asarray(hr),
                                                 jnp.asarray(ptt)))
    labels = np.stack([100 + 0.2 * hr[:, 0] - 0.3 * ptt[:, 0],
                       60 + 0.1 * hr[:, 0] - 0.2 * ptt[:, 0]], -1)
    labels = labels.astype(np.float32)

    first = None
    for _ in range(200):
        state, loss = step(state, jnp.asarray(feats), jnp.asarray(labels))
        if first is None:
            first = float(loss)
    assert float(loss) < 0.5 * first


@pytest.mark.slow
def test_e2e_train_step_runs():
    from bp_from_video_tpu.config import (EngineConfig, InferenceConfig,
                                          SignalConfig)
    from bp_from_video_tpu.parallel import MultiStreamEngine

    s = 2
    cfg = EngineConfig(
        signal=SignalConfig(signal_max_samples=16, peak_max_samples=4),
        inference=InferenceConfig(
            face_detector_path=None, face_landmarker_path=None,
            hand_landmarker_path=None, person_segmenter_path=None),
        frame_height=32, frame_width=32, num_streams=s)
    ms = MultiStreamEngine(cfg)
    sig = cfg.signal
    in_dim = 2 * (sig.num_signals + sig.num_pairs)
    tstate, opt = bpr.init_train_state(jax.random.key(1), in_dim)
    e2e = jax.jit(bpr.make_e2e_train_step(ms._vstep, opt))

    estate = ms.init_states()
    frames = jnp.zeros((s, 32, 32, 3), jnp.uint8)
    ts = jnp.full((s,), 1 / 30.0)
    labels = jnp.tile(jnp.array([[120.0, 80.0]]), (s, 1))
    estate, tstate, loss = e2e(ms.params, estate, tstate, frames, ts, labels)
    assert jnp.isfinite(loss)
    assert int(tstate.step) == 1


def test_train_cli_synthetic_checkpoint_resume(tmp_path, capsys):
    """python -m bp_from_video_tpu.train: synthetic task trains (loss
    falls), checkpoints, and resumes from the saved step counter — sharded
    over the virtual 8-device mesh (conftest) via NamedSharding."""
    from bp_from_video_tpu.train.__main__ import main

    ck = str(tmp_path / "ck")
    assert main(["--synthetic", "512", "--steps", "60", "--batch", "64",
                 "--ckpt-every", "30", "--checkpoint", ck]) == 0
    out = capsys.readouterr().out
    assert "eval MAE" in out

    assert main(["--synthetic", "512", "--steps", "80", "--batch", "64",
                 "--checkpoint", ck, "--resume"]) == 0
    assert "resumed at step 60" in capsys.readouterr().out


def test_train_cli_recorded_features(tmp_path, capsys):
    """The recorded-data path consumes a SignalRecorder npz + labels npz."""
    import numpy as np

    from bp_from_video_tpu.runtime.recorder import SignalRecorder
    from bp_from_video_tpu.train.__main__ import main

    class Out:
        def __init__(self, bpm, ptt, fs):
            self.bpm, self.ptt, self.curr_fs = bpm, ptt, fs

    rng = np.random.default_rng(0)
    rec = SignalRecorder(str(tmp_path / "rec.npz"))
    for t in range(64):
        rec.add(t / 30.0, Out(rng.uniform(50, 110, (2,)).astype(np.float32),
                              rng.uniform(10, 60, (1,)).astype(np.float32),
                              np.float32(30.0)))
    feats_path = rec.save()
    labels = rng.uniform(60, 140, (64, 2)).astype(np.float32)
    labels_path = str(tmp_path / "labels.npz")
    np.savez(labels_path, labels=labels)

    assert main(["--features", feats_path, "--labels", labels_path,
                 "--steps", "20", "--batch", "32"]) == 0
    assert "eval MAE" in capsys.readouterr().out


def test_train_cli_csv_cohort(tmp_path, capsys):
    """--csv consumes hr,ptt,sbp,dbp cohort rows; standardization makes
    the near-linear synthetic relation learnable to single-digit MAE."""
    import numpy as np

    from bp_from_video_tpu.train.__main__ import main

    rng = np.random.default_rng(1)
    n = 512
    hr = rng.uniform(50, 110, n)
    ptt = rng.uniform(15, 60, n)
    sbp = 150 - 0.9 * ptt + 0.15 * hr + rng.normal(0, 2, n)
    dbp = 95 - 0.5 * ptt + 0.08 * hr + rng.normal(0, 1.5, n)
    path = str(tmp_path / "cohort.csv")
    np.savetxt(path, np.stack([hr, ptt, sbp, dbp], -1), delimiter=",",
               header="hr,ptt,sbp,dbp")

    assert main(["--csv", path, "--steps", "300", "--batch", "128"]) == 0
    out = capsys.readouterr().out
    last = [ln for ln in out.splitlines() if "eval MAE" in ln][-1]
    mae_sbp = float(last.split("SBP")[1].split()[0])
    assert mae_sbp < 8.0, last


def test_predictor_roundtrip_and_parity(tmp_path):
    """save_predictor/load_predictor: the host-side numpy head reproduces
    the jitted training-time forward (standardize -> mlp_apply ->
    un-standardize) and degrades to NaN when no vital is valid."""
    import numpy as np

    in_dim = 6  # 2 BPM + 1 PTT columns, doubled by validity indicators
    state, _ = bpr.init_train_state(jax.random.key(3), in_dim, hidden=(16, 8))
    norm = {"f_mu": jnp.arange(in_dim, dtype=jnp.float32) * 0.1,
            "f_sd": jnp.full((in_dim,), 2.0, jnp.float32),
            "l_mu": jnp.array([100.0, 70.0], jnp.float32),
            "l_sd": jnp.array([15.0, 10.0], jnp.float32)}
    path = bpr.save_predictor(str(tmp_path / "pred"), state.params, norm)
    assert path.endswith(".npz")
    pred = bpr.load_predictor(path)

    bpm = np.array([72.0, np.nan], np.float32)
    ptt = np.array([32.0], np.float32)
    feats = bpr.features_from_outputs(jnp.asarray(bpm), jnp.asarray(ptt))
    x = (feats - norm["f_mu"]) / norm["f_sd"]
    want = np.asarray(bpr.mlp_apply(state.params, x)
                      * norm["l_sd"] + norm["l_mu"])
    got = pred(bpm, ptt)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    # All vitals invalid (nothing settled) -> NaN, never a guess.
    assert np.isnan(pred(np.array([np.nan, np.nan]),
                         np.array([np.nan]))).all()
    # Batched rows keep their leading axes.
    got2 = pred(np.tile(bpm, (5, 1)), np.tile(ptt, (5, 1)))
    assert got2.shape == (5, 2)
    np.testing.assert_allclose(got2[0], want, rtol=1e-5, atol=1e-4)
    # Wrong vital count is a loud error, not a silent mis-prediction.
    with pytest.raises(ValueError):
        pred(np.array([70.0]), np.array([30.0]))


def test_train_cli_exports_predictor(tmp_path, capsys):
    """--checkpoint also emits <dir>_predictor.npz; the loaded head predicts
    plausible mmHg on the synthetic physiological task it was trained on."""
    import numpy as np

    from bp_from_video_tpu.train.__main__ import main

    ck = str(tmp_path / "ck")
    assert main(["--synthetic", "512", "--steps", "120", "--batch", "128",
                 "--checkpoint", ck]) == 0
    out = capsys.readouterr().out
    assert "predictor:" in out
    pred = bpr.load_predictor(ck + "_predictor.npz")
    bp = pred(np.array([70.0, 75.0], np.float32),
              np.array([30.0], np.float32))
    assert bp.shape == (2,) and np.isfinite(bp).all()
    # synth_dataset's law at these vitals sits near 120/65; a briefly
    # trained head lands in the physiological ballpark.
    assert 60.0 < bp[0] < 220.0 and 30.0 < bp[1] < 140.0
