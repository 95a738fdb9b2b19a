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


def save_predictor(path: str, params: MLPParams, norm: dict) -> str:
    """Export a self-describing inference-only checkpoint: the MLP layers
    plus the feature/label standardization constants, under explicit names
    (``w_0/b_0/...``, ``f_mu/f_sd/l_mu/l_sd``) so :func:`load_predictor`
    can rebuild the head without knowing the training hyperparameters.
    Unlike the full training checkpoint (recorder.save_state: params +
    optimizer state + step, template-shaped), this file stands alone."""
    import os

    import numpy as np

    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    arrays = {f"w_{i}": np.asarray(w) for i, w in enumerate(params.weights)}
    arrays |= {f"b_{i}": np.asarray(b) for i, b in enumerate(params.biases)}
    arrays |= {k: np.asarray(v) for k, v in norm.items()}
    np.savez(path, **arrays)
    return path if path.endswith(".npz") else path + ".npz"


class BPPredictor:
    """Host-side blood-pressure inference head over the engine's HUD vitals.

    Runs the trained MLP in plain numpy: the per-frame inputs (mean BPM per
    ROI, mean PTT per pair) are scalars the display path has ALREADY
    downloaded from the device, and the head is a [in,64,64,2] matmul chain —
    host math is faster than another device round-trip per frame.

    Returns raw mmHg ``[..., 2]`` (SBP, DBP).  When every feature in a row is
    invalid (no detection settled yet) the prediction is NaN — the same
    graceful-degradation contract as the rest of the HUD (reference
    drawer.py:141: unsettled vitals render as "NaN", never as a guess).
    """

    def __init__(self, weights, biases, f_mu, f_sd, l_mu, l_sd):
        import numpy as np

        self.weights = [np.asarray(w, np.float32) for w in weights]
        self.biases = [np.asarray(b, np.float32) for b in biases]
        self.f_mu = np.asarray(f_mu, np.float32)
        self.f_sd = np.asarray(f_sd, np.float32)
        self.l_mu = np.asarray(l_mu, np.float32)
        self.l_sd = np.asarray(l_sd, np.float32)
        self.in_dim = self.weights[0].shape[0]

    def __call__(self, bpm, ptt):
        import numpy as np

        bpm = np.atleast_1d(np.asarray(bpm, np.float32))
        ptt = np.atleast_1d(np.asarray(ptt, np.float32))
        feats = np.concatenate([bpm, ptt], axis=-1)
        valid = np.isfinite(feats)
        x = np.concatenate([np.where(valid, feats, 0.0),
                            valid.astype(np.float32)], axis=-1)
        if x.shape[-1] != self.in_dim:
            raise ValueError(
                f"predictor expects {self.in_dim // 2} vitals "
                f"(trained on that many BPM+PTT columns), got {x.shape[-1] // 2}")
        h = (x - self.f_mu) / self.f_sd
        n = len(self.weights)
        for i, (w, b) in enumerate(zip(self.weights, self.biases)):
            h = h @ w + b
            if i < n - 1:
                # jax.nn.gelu's default tanh approximation, for parity with
                # the jitted training-time forward (mlp_apply).
                h = 0.5 * h * (1.0 + np.tanh(
                    np.sqrt(2.0 / np.pi) * (h + 0.044715 * h ** 3)))
        pred = h * self.l_sd + self.l_mu
        # All-invalid rows (nothing settled) degrade to NaN, not a guess.
        none_valid = ~valid.any(axis=-1, keepdims=True)
        return np.where(none_valid, np.nan, pred)


def load_predictor(path: str) -> BPPredictor:
    """Load a :func:`save_predictor` file into a host-side inference head."""
    import numpy as np

    data = np.load(path if path.endswith(".npz") else path + ".npz")
    n_layers = sum(1 for k in data.files if k.startswith("w_"))
    ws = [data[f"w_{i}"] for i in range(n_layers)]
    bs = [data[f"b_{i}"] for i in range(n_layers)]
    return BPPredictor(ws, bs, data["f_mu"], data["f_sd"],
                       data["l_mu"], data["l_sd"])


def make_e2e_train_step(engine_vstep: Callable,
                        opt: optax.GradientTransformation,
                        norm: dict | None = None) -> Callable:
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

    ``norm`` (optional): {"f_mu", "f_sd", "l_mu", "l_sd"} standardization
    constants applied to features and labels before the update -- the same
    contract the offline trainer and save_predictor use (train/__main__);
    without it the raw mmHg/BPM scales condition the MLP poorly.
    """
    def step(engine_params, engine_state, train_state: TrainState,
             frames: Array, timestamps: Array, labels: Array):
        engine_state, out = engine_vstep(engine_params, engine_state,
                                         frames, timestamps)
        feats = features_from_outputs(out.bpm, out.ptt)
        feats = jax.lax.stop_gradient(feats)
        if norm is not None:
            feats = (feats - norm["f_mu"]) / norm["f_sd"]
            labels = (labels - norm["l_mu"]) / norm["l_sd"]
        train_state, loss = train_step(opt, train_state, feats, labels)
        return engine_state, train_state, loss

    return step
