"""Train the blood-pressure regressor — the reference's abandoned end goal
(reference README.md:38, :46-48) carried to a working training loop.

Consumes a dataset of (HR, PTT, SBP, DBP) rows — either a CSV
(hr,ptt,sbp,dbp per line) or, with --synthetic, a generated cohort following
the inverse PTT–BP relation from the PTT literature the reference cites —
fits the MLP head with the jitted optax step, reports validation MAE in
mmHg, and checkpoints the trained state.

    python tools/train_bp.py --synthetic --steps 2000 --out /tmp/bp_ckpt
    python tools/train_bp.py --csv cohort.csv --out ckpt
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bp_from_video_tpu.runtime import recorder
from bp_from_video_tpu.train import bp_regressor as bpr


def synthetic_cohort(n: int, seed: int = 0):
    """Plausible physiology: BP inversely related to PTT, weakly to HR,
    with inter-subject noise (the PTT->BP premise of the reference's cited
    literature; coefficients are illustrative, not clinical)."""
    rng = np.random.default_rng(seed)
    hr = rng.uniform(50, 110, n)
    ptt = rng.uniform(15, 60, n)
    sbp = 150 - 0.9 * ptt + 0.15 * hr + rng.normal(0, 4, n)
    dbp = 95 - 0.5 * ptt + 0.08 * hr + rng.normal(0, 3, n)
    feats = np.asarray(bpr.features_from_outputs(
        jnp.asarray(hr[:, None], jnp.float32),
        jnp.asarray(ptt[:, None], jnp.float32)))
    labels = np.stack([sbp, dbp], -1).astype(np.float32)
    return feats, labels


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--csv", help="hr,ptt,sbp,dbp rows")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--hidden", type=int, nargs="+", default=[64, 64])
    p.add_argument("--out", default=None, help="checkpoint path")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    if args.csv:
        rows = np.loadtxt(args.csv, delimiter=",", skiprows=1)
        feats = np.asarray(bpr.features_from_outputs(
            jnp.asarray(rows[:, 0:1], jnp.float32),
            jnp.asarray(rows[:, 1:2], jnp.float32)))
        labels = rows[:, 2:4].astype(np.float32)
    else:
        feats, labels = synthetic_cohort(args.n, args.seed)

    n_val = max(1, len(feats) // 10)
    f_tr, l_tr = feats[n_val:], labels[n_val:]
    f_va, l_va = feats[:n_val], labels[:n_val]

    # Standardize on train statistics (validity-indicator columns are 0/1
    # and left alone by the unit-scale guard); predictions invert the label
    # transform.
    f_mu, f_sd = f_tr.mean(0), np.maximum(f_tr.std(0), 1e-6)
    l_mu, l_sd = l_tr.mean(0), np.maximum(l_tr.std(0), 1e-6)
    norm_f = lambda f: (f - f_mu) / f_sd
    state, opt = bpr.init_train_state(jax.random.key(args.seed),
                                      feats.shape[-1],
                                      hidden=tuple(args.hidden), lr=args.lr)
    step = jax.jit(lambda st, f, l: bpr.train_step(opt, st, f, l))

    rng = np.random.default_rng(args.seed)
    loss = float("nan")
    for i in range(args.steps):
        idx = rng.integers(0, len(f_tr), args.batch)
        state, loss = step(state, jnp.asarray(norm_f(f_tr[idx])),
                           jnp.asarray((l_tr[idx] - l_mu) / l_sd))
        if i % max(1, args.steps // 10) == 0:
            print(f"step {i:5d}  train huber {float(loss):8.4f}")

    pred = np.asarray(bpr.mlp_apply(state.params,
                                    jnp.asarray(norm_f(f_va)))) * l_sd + l_mu
    mae = np.abs(pred - l_va).mean(0)
    print(f"validation MAE: SBP {mae[0]:.2f} mmHg, DBP {mae[1]:.2f} mmHg "
          f"({n_val} held-out samples)")

    if args.out:
        path = recorder.save_state(args.out, state)
        print(f"checkpoint -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
