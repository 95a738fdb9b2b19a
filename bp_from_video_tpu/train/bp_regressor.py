"""Blood-pressure regression from rPPG features — the reference's stated but
abandoned end goal (reference README.md:38, :46-48: "regressing blood
pressure from PTT" was dropped at the PTT stage).  The rebuild carries it to
completion as a trainable head over the engine's physiological outputs.

Model: a small MLP mapping per-stream feature vectors
``[HR_bpm, PTT_ms...]`` (plus optional spectral summary stats) to
``[systolic, diastolic]`` mmHg.  Training is standard JAX: pure loss,
``jax.grad``, optax optimizer, one jitted ``train_step`` that is data-parallel
over the batch axis when sharded over a mesh (the engine's ``dp`` axis).

The end-to-end variant (:func:`make_e2e_train_step`) runs the FULL fused
engine step (all enabled vision models + DSP + spectra + PTT) as the feature
extractor inside the training step — frames in, parameter update out — which
is what the multi-chip dry-run compiles over a ``dp×tp`` mesh.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

Array = jax.Array


class MLPParams(NamedTuple):
    weights: tuple[Array, ...]
    biases: tuple[Array, ...]


def init_mlp(key: Array, in_dim: int, hidden: tuple[int, ...] = (64, 64),
             out_dim: int = 2) -> MLPParams:
    dims = (in_dim, *hidden, out_dim)
    ws, bs = [], []
    for i in range(len(dims) - 1):
        key, sub = jax.random.split(key)
        scale = jnp.sqrt(2.0 / dims[i])
        ws.append(jax.random.normal(sub, (dims[i], dims[i + 1]),
                                    jnp.float32) * scale)
        bs.append(jnp.zeros((dims[i + 1],), jnp.float32))
    return MLPParams(tuple(ws), tuple(bs))


def mlp_apply(params: MLPParams, x: Array) -> Array:
    """x: [..., in_dim] -> [..., out_dim] (systolic, diastolic) mmHg."""
    h = x
    n = len(params.weights)
    for i, (w, b) in enumerate(zip(params.weights, params.biases)):
        h = h @ w + b
        if i < n - 1:
            h = jax.nn.gelu(h)
    return h


def features_from_outputs(bpm: Array, ptt: Array) -> Array:
    """Build the regression feature vector from engine outputs.

    bpm: [..., num_signals]; ptt: [..., num_pairs].  NaNs (no detection yet)
    are mapped to 0 with a companion validity indicator so the regressor can
    learn to discount unsettled windows.
    """
    feats = jnp.concatenate([bpm, ptt], axis=-1)
    valid = jnp.isfinite(feats)
    # where(), not bare nan_to_num: +/-inf features (e.g. fs = 1/dt with a
    # zero timestamp delta) must become 0 like NaN does, not +/-3.4e38 —
    # the validity flag already marks them invalid either way.
    return jnp.concatenate([jnp.where(valid, feats, 0.0),
                            valid.astype(jnp.float32)], axis=-1)


def loss_fn(params: MLPParams, feats: Array, labels: Array) -> Array:
    """Huber loss over (SBP, DBP) — robust to cuff-label noise."""
    pred = mlp_apply(params, feats)
    return jnp.mean(optax.huber_loss(pred, labels, delta=5.0))


class TrainState(NamedTuple):
    params: MLPParams
    opt_state: Any
    step: Array


def make_optimizer(lr: float = 1e-3) -> optax.GradientTransformation:
    return optax.adamw(lr)


def init_train_state(key: Array, in_dim: int,
                     hidden: tuple[int, ...] = (64, 64),
                     lr: float = 1e-3) -> tuple[TrainState, Any]:
    opt = make_optimizer(lr)
    params = init_mlp(key, in_dim, hidden)
    return TrainState(params, opt.init(params), jnp.zeros((), jnp.int32)), opt


def train_step(opt: optax.GradientTransformation, state: TrainState,
               feats: Array, labels: Array) -> tuple[TrainState, Array]:
    """One SGD step on a feature batch. Pure; jit/shard over the batch axis.
    Under a sharded batch, the mean-loss gradient is a cross-device psum the
    GSPMD partitioner inserts automatically."""
    loss, grads = jax.value_and_grad(loss_fn)(state.params, feats, labels)
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), loss


def make_e2e_train_step(engine_vstep: Callable, opt: optax.GradientTransformation
                        ) -> Callable:
    """End-to-end training step: frames -> fused engine (vision models + DSP
    + spectra + PTT) -> features -> regressor update.

    engine_vstep: the stream-vmapped engine step
    ``(engine_params, engine_state, frames[S,H,W,3], ts[S]) ->
    (engine_state, StepOutputs)`` (parallel/streams.py).

    Returns ``step(engine_params, engine_state, train_state, frames, ts,
    labels) -> (engine_state, train_state, loss)``.  The engine forward is
    the (non-differentiated) feature extractor; the gradient flows through
    the regressor head only, matching the reference's intended design
    (hand-engineered HR/PTT features -> learned BP map, README.md:36-38).
    """
    def step(engine_params, engine_state, train_state: TrainState,
             frames: Array, timestamps: Array, labels: Array):
        engine_state, out = engine_vstep(engine_params, engine_state,
                                         frames, timestamps)
        feats = features_from_outputs(out.bpm, out.ptt)
        feats = jax.lax.stop_gradient(feats)
        train_state, loss = train_step(opt, train_state, feats, labels)
        return engine_state, train_state, loss

    return step
