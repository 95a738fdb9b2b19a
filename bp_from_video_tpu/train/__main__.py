"""Train the blood-pressure regressor — ``python -m bp_from_video_tpu.train``.

The reference's stated end goal was regressing blood pressure from PTT and
was abandoned at the PTT stage (reference README.md:38, :46-48).  This
driver carries it to completion over the engine's recorded outputs:

  * ``--features rec.npz`` — a ``runtime.recorder.SignalRecorder`` file
    (keys ``bpm [T, num_signals]``, ``ptt [T, num_pairs]``) produced by the
    live CLI's ``--record`` or the offline batch mode, paired with cuff
    labels (``--labels labels.npz``, key ``labels [T, 2]`` = SBP/DBP mmHg).
  * ``--csv cohort.csv`` — ``hr,ptt,sbp,dbp`` rows (one header line), the
    tabular-cohort format of PTT–BP studies.
  * ``--synthetic N`` — a self-contained physiological toy task
    (SBP/DBP as affine functions of HR and pulse-wave velocity ~ 1/PTT,
    plus noise) so the full loop — sharding, training, eval, checkpoint,
    resume — runs and is testable without data.

Features and labels are standardized on training-split statistics (the
validity-indicator columns are 0/1 and pass through); the normalization
constants ride in the checkpoint next to the params so a restored model
predicts raw mmHg without the original data.

TPU-native mechanics: one jitted ``train_step`` (pure loss + optax update);
batches sharded over every available device on the ``dp`` axis via
``NamedSharding`` — the mean-loss gradient all-reduce is inserted by the
GSPMD partitioner (train_step docstring).  Checkpoints go through
``runtime.recorder.save_state``/``load_state`` (orbax when available, npz
fallback) every ``--ckpt-every`` steps; ``--resume`` restores and continues
from the saved step counter.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def synth_dataset(n: int, num_signals: int = 2, num_pairs: int = 1,
                  seed: int = 0
                  ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Toy physiological task: labels are affine in HR and 1/PTT (PTT is
    inversely related to pulse-wave velocity, the BP proxy the reference
    cites), with measurement noise and occasional NaN dropouts exactly like
    real engine output (features_from_outputs maps those to 0 + validity)."""
    rng = np.random.default_rng(seed)
    hr = rng.uniform(50.0, 110.0, (n, num_signals)).astype(np.float32)
    ptt = rng.uniform(10.0, 60.0, (n, num_pairs)).astype(np.float32)
    pwv = 1000.0 / ptt  # higher velocity ~ stiffer/loaded arteries
    sbp = 0.35 * hr.mean(-1, keepdims=True) + 1.2 * pwv.mean(-1, keepdims=True) + 60.0
    dbp = 0.20 * hr.mean(-1, keepdims=True) + 0.7 * pwv.mean(-1, keepdims=True) + 40.0
    labels = np.concatenate([sbp, dbp], axis=-1)
    labels += rng.normal(0.0, 2.0, labels.shape)
    # Dropouts: ~5% of rows lose a signal (pre-settled windows).
    drop = rng.random((n, num_signals)) < 0.05
    hr[drop] = np.nan
    return hr, ptt, labels.astype(np.float32)


def load_recorded(features_path: str, labels_path: str):
    rec = np.load(features_path)
    bpm = rec["bpm"].astype(np.float32)
    ptt = rec["ptt"].astype(np.float32)
    labels = np.load(labels_path)["labels"].astype(np.float32)
    if bpm.ndim == 3:
        # Pipelined/offline recordings carry a stream axis ([T, S, R]):
        # each (step, stream) pair is one training sample.  Labels may be
        # per-step ([T, 2] — broadcast across streams) or per-sample
        # ([T, S, 2] / [T*S, 2]).
        t, s = bpm.shape[:2]
        if labels.ndim == 2 and labels.shape[0] == t:
            labels = np.repeat(labels[:, None, :], s, axis=1)
        bpm = bpm.reshape(t * s, -1)
        ptt = ptt.reshape(t * s, -1)
        labels = labels.reshape(-1, labels.shape[-1])
    if labels.shape[0] != bpm.shape[0]:
        raise SystemExit(f"labels rows {labels.shape[0]} != feature rows "
                         f"{bpm.shape[0]}")
    if labels.ndim != 2 or labels.shape[-1] != 2:
        raise SystemExit(f"labels must be [rows, 2] (SBP, DBP); got "
                         f"{labels.shape}")
    return bpm, ptt, labels


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m bp_from_video_tpu.train", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--features", help="SignalRecorder npz (bpm/ptt rows)")
    src.add_argument("--csv", help="hr,ptt,sbp,dbp rows (one header line)")
    src.add_argument("--synthetic", type=int, metavar="N",
                     help="generate N synthetic rows instead")
    ap.add_argument("--labels", help="npz with 'labels' [T, 2] (SBP, DBP)")
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--hidden", type=int, nargs="+", default=[64, 64])
    ap.add_argument("--eval-frac", type=float, default=0.2)
    ap.add_argument("--checkpoint", default=None, metavar="DIR")
    ap.add_argument("--predictor", default=None, metavar="OUT.npz",
                    help="export a standalone inference head (weights + "
                         "normalization) for the live CLI's --bp flag "
                         "(default: <checkpoint>_predictor.npz when "
                         "--checkpoint is given)")
    ap.add_argument("--ckpt-every", type=int, default=200,
                    help="save every N steps; 0 = only at the end")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None,
                    help="pin jax platform (e.g. cpu) before backend init")
    args = ap.parse_args(argv)

    import jax
    if args.platform:
        # The environment's sitecustomize re-pins jax_platforms at
        # interpreter start; an explicit update wins (tests/conftest.py).
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from bp_from_video_tpu.runtime.recorder import load_state, save_state
    from bp_from_video_tpu.train import bp_regressor as bpr

    if args.synthetic is not None:
        bpm, ptt, labels = synth_dataset(args.synthetic, seed=args.seed)
    elif args.csv:
        rows = np.loadtxt(args.csv, delimiter=",", skiprows=1,
                          dtype=np.float32, ndmin=2)
        bpm, ptt, labels = rows[:, 0:1], rows[:, 1:2], rows[:, 2:4]
    else:
        if not args.labels:
            ap.error("--features requires --labels")
        bpm, ptt, labels = load_recorded(args.features, args.labels)

    # features_from_outputs doubles the width with validity indicators.
    n = bpm.shape[0]
    n_eval = max(1, int(n * args.eval_frac))
    rng = np.random.default_rng(args.seed)
    perm = rng.permutation(n)
    bpm, ptt, labels = bpm[perm], ptt[perm], labels[perm]
    feats = np.asarray(bpr.features_from_outputs(
        jnp.asarray(bpm), jnp.asarray(ptt)))
    tr_x, ev_x = feats[n_eval:], feats[:n_eval]
    tr_y, ev_y = labels[n_eval:], labels[:n_eval]
    if tr_x.shape[0] == 0:
        raise SystemExit(f"no training rows left: {n} rows with "
                         f"--eval-frac {args.eval_frac} leaves an empty "
                         "training split")
    in_dim = feats.shape[-1]

    # Standardize on training-split statistics; the validity-indicator
    # half of the feature vector (0/1 flags) passes through unscaled.
    f_mu = tr_x.mean(0).astype(np.float32)
    f_sd = np.maximum(tr_x.std(0), 1e-6).astype(np.float32)
    f_mu[in_dim // 2:] = 0.0
    f_sd[in_dim // 2:] = 1.0
    l_mu = tr_y.mean(0).astype(np.float32)
    l_sd = np.maximum(tr_y.std(0), 1e-6).astype(np.float32)

    state, opt = bpr.init_train_state(jax.random.key(args.seed), in_dim,
                                      tuple(args.hidden), args.lr)
    norm = {"f_mu": jnp.asarray(f_mu), "f_sd": jnp.asarray(f_sd),
            "l_mu": jnp.asarray(l_mu), "l_sd": jnp.asarray(l_sd)}
    if args.resume:
        if not args.checkpoint:
            ap.error("--resume requires --checkpoint")
        state, norm = load_state(args.checkpoint, (state, norm))
        print(f"resumed at step {int(state.step)}")
    f_mu, f_sd = np.asarray(norm["f_mu"]), np.asarray(norm["f_sd"])
    l_mu, l_sd = np.asarray(norm["l_mu"]), np.asarray(norm["l_sd"])
    tr_x = (tr_x - f_mu) / f_sd
    ev_x = (ev_x - f_mu) / f_sd
    tr_y_n = (tr_y - l_mu) / l_sd

    # dp: shard batch rows over every device; gradients psum via GSPMD.
    devs = jax.devices()
    mesh = Mesh(np.asarray(devs), ("dp",))
    batch_sharding = NamedSharding(mesh, P("dp"))
    bsz = max(args.batch // len(devs), 1) * len(devs)

    step_fn = jax.jit(lambda s, x, y: bpr.train_step(opt, s, x, y))
    # Eval in raw mmHg: un-standardize predictions with the label stats.
    eval_fn = jax.jit(lambda p, x, y: jnp.mean(
        jnp.abs(bpr.mlp_apply(p, x) * norm["l_sd"] + norm["l_mu"] - y),
        axis=0))

    loss = float("nan")
    saved_at = -1
    for i in range(int(state.step), args.steps):
        # Per-step batch RNG keyed on (seed, step): a resumed run draws the
        # SAME batches an uninterrupted run would at each step, instead of
        # replaying the stream from position 0.
        idx = np.random.default_rng([args.seed, i]).integers(
            0, tr_x.shape[0], (bsz,))
        x = jax.device_put(tr_x[idx], batch_sharding)
        y = jax.device_put(tr_y_n[idx], batch_sharding)
        state, loss = step_fn(state, x, y)
        if (i + 1) % 50 == 0 or i + 1 == args.steps:
            mae = eval_fn(state.params, jnp.asarray(ev_x), jnp.asarray(ev_y))
            print(f"step {i + 1:6d}  huber {float(loss):8.3f}  "
                  f"eval MAE mmHg  SBP {float(mae[0]):6.2f}  "
                  f"DBP {float(mae[1]):6.2f}", flush=True)
        if (args.checkpoint and args.ckpt_every > 0
                and (i + 1) % args.ckpt_every == 0):
            save_state(args.checkpoint, (state, norm))
            saved_at = i + 1
    if args.checkpoint:
        path = (save_state(args.checkpoint, (state, norm))
                if saved_at != int(state.step) else args.checkpoint)
        print(f"checkpoint: {path}")
    predictor_path = args.predictor or (
        args.checkpoint + "_predictor.npz" if args.checkpoint else None)
    if predictor_path:
        p = bpr.save_predictor(predictor_path, state.params, norm)
        print(f"predictor: {p}  (live HUD: python -m bp_from_video_tpu "
              f"--source 0 --bp {p})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
