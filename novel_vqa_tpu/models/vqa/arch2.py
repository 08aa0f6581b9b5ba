"""Arch2: encoder-initialized (early fusion) VQA model.

Definition follows 003_train_vqa_arch2/002_train_baseline.lua:
  * ``cnn_projection`` = Linear(nhimage, input_encoding_size), no activation
    (:166);
  * question encoder = ``nn.Encoder`` (misc/Encoder_lstm.lua): the arch2-AE
    encoder — image projection at t=1, START at t=2, then the LEFT-aligned
    question tokens (arch2 applies no right_align; nulls redirect to token 1
    with the batch-wide can_skip, Encoder_lstm.lua:170-226); the output is
    the final *top-layer hidden state* only (:226);
  * classifier = Dropout(0.5) -> Linear(rnn_size, num_output) (:162-164);
  * CrossEntropy over 1-indexed answers; rmsprop with weightDecay 1e-4
    (:203-207 `optimize.weightDecay`), grad clamp +-10 (:335).

The encoder reuses models/seq/autoencoder.encode with ``variant="arch2"``
(plain LookupTable, same scan); the AE-based trainers clone the pre-trained
AE's encoder + lookup directly into this model (003_train_ae_based.lua:150-152).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from novel_vqa_tpu.models.seq import autoencoder as ae
from novel_vqa_tpu.ops import cross_entropy, dropout
from novel_vqa_tpu.ops import optim as ref_optim
from novel_vqa_tpu.parallel.dp import gather_batch, vqa_scan_steps


class Arch2Config(NamedTuple):
    vocab_size: int
    input_encoding_size: int = 512  # :38
    rnn_size: int = 512
    num_layers: int = 1
    nhimage: int = 4096
    num_output: int = 1000
    seq_length: int = 16
    dropout: float = 0.5  # -drop_prob_ae

    @property
    def ae_cfg(self) -> ae.AEConfig:
        return ae.AEConfig(
            vocab_size=self.vocab_size,
            input_encoding_size=self.input_encoding_size,
            rnn_size=self.rnn_size,
            num_layers=self.num_layers,
            seq_length=self.seq_length,
            dropout=self.dropout,
            variant="arch2",
        )


def init_params(rng: jax.Array, cfg: Arch2Config) -> Dict[str, Any]:
    """uniform(-0.08, 0.08) everywhere (:180-187)."""
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    u = lambda k, shape: jax.random.uniform(k, shape, jnp.float32, -0.08, 0.08)
    from novel_vqa_tpu.ops.lstm import lstm_layer_init

    layers = []
    for i in range(cfg.num_layers):
        in_size = cfg.input_encoding_size if i == 0 else cfg.rnn_size
        layers.append(lstm_layer_init(jax.random.fold_in(k3, i), in_size, cfg.rnn_size))
    return {
        "cnn_proj": {
            "w": u(k1, (cfg.nhimage, cfg.input_encoding_size)),
            "b": u(jax.random.fold_in(k1, 1), (cfg.input_encoding_size,)),
        },
        "lookup": u(k2, (cfg.vocab_size + 1, cfg.input_encoding_size)),
        "encoder": layers,
        "classifier": {
            "w": u(k4, (cfg.rnn_size, cfg.num_output)),
            "b": u(k5, (cfg.num_output,)),
        },
    }


def apply(
    params: Dict[str, Any],
    cfg: Arch2Config,
    tokens: jax.Array,  # (N, D) LEFT-aligned int tokens, 0 = pad suffix
    image: jax.Array,  # (N, nhimage) float32 (L2-normalized per img_norm)
    *,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jax.Array:
    if rng is not None:
        k_enc, k_cls = jax.random.split(rng)
    else:
        k_enc = k_cls = None
    img_proj = (
        jnp.dot(image, params["cnn_proj"]["w"], preferred_element_type=jnp.float32)
        + params["cnn_proj"]["b"]
    )
    seq = jnp.swapaxes(tokens, 0, 1)  # (D, N) time-major
    enc_params = {"lookup": params["lookup"], "encoder": params["encoder"]}
    c, h = ae.encode(
        enc_params, cfg.ae_cfg, seq, img_proj, rng=k_enc, deterministic=deterministic
    )
    top_h = h[-1]
    if not deterministic:
        top_h = dropout(k_cls, top_h, cfg.dropout, deterministic=False)
    return (
        jnp.dot(top_h, params["classifier"]["w"], preferred_element_type=jnp.float32)
        + params["classifier"]["b"]
    )


def loss_fn(params, cfg, tokens, image, labels, rng) -> jax.Array:
    scores = apply(params, cfg, tokens, image, rng=rng, deterministic=False)
    return cross_entropy(scores, labels)


def make_optimizer(
    learning_rate: float = 3e-4,
    weight_decay: float = 1e-4,  # optimize.weightDecay
    grad_clamp: float = 10.0,
    alpha: float = 0.99,
    epsilon: float = 1e-8,
    decay_factor: float = 1.0,
) -> optax.GradientTransformation:
    sched = (
        ref_optim.exponential_decay_schedule(learning_rate, decay_factor)
        if decay_factor != 1.0
        else learning_rate
    )
    return optax.chain(
        ref_optim.clamp(grad_clamp),
        ref_optim.rmsprop(sched, alpha=alpha, epsilon=epsilon, weight_decay=weight_decay),
    )


@functools.partial(jax.jit, static_argnums=(0, 1), donate_argnums=(2, 3))
def train_step_indexed(cfg, tx, params, opt_state, data, qinds, rng):
    """HBM-resident indexed train step (see arch1.train_step_indexed)."""
    tokens, image, labels = gather_batch(data, qinds)
    loss, grads = jax.value_and_grad(loss_fn)(params, cfg, tokens, image, labels, rng)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


@functools.partial(jax.jit, static_argnums=(0,))
def eval_step(cfg, params, tokens, image, labels):
    scores = apply(params, cfg, tokens, image, deterministic=True)
    return cross_entropy(scores, labels), scores


# HBM-resident / single-dispatch eval paths — shared factory with arch1
# (models/vqa/eval_paths.py)
from novel_vqa_tpu.models.vqa.eval_paths import build_eval_fns as _build_eval_fns

(
    eval_step_indexed,
    eval_predict_indexed,
    eval_predict_scan,
    eval_scores_scan,
) = _build_eval_fns(apply)


@functools.partial(jax.jit, static_argnums=(0, 1, 5, 6), donate_argnums=(2, 3))
def train_steps_scan(cfg, tx, params, opt_state, data, n_steps: int, batch_size: int, rng):
    """N iterations per dispatch with on-device batch sampling (see
    arch1.train_steps_scan; body shared in parallel.dp.vqa_scan_steps)."""
    return vqa_scan_steps(
        loss_fn, cfg, tx, params, opt_state, data, rng, n_steps, batch_size
    )


def make_dp_steps_scan(cfg, tx, mesh, n_steps: int, batch_size: int, donate: bool = True):
    """Data-parallel multi-step scan trainer (shared builder in
    parallel/dp.py, parameterized by this model's ``loss_fn``)."""
    from novel_vqa_tpu.parallel.dp import make_vqa_dp_steps_scan

    return make_vqa_dp_steps_scan(loss_fn, cfg, tx, mesh, n_steps, batch_size, donate)


def make_dp_indexed_step(cfg, tx, mesh):
    """Data-parallel :func:`train_step_indexed` (shared builder in
    parallel/dp.py) — qinds sharded, grads psum over ICI."""
    from novel_vqa_tpu.parallel.dp import make_vqa_dp_indexed_step

    return make_vqa_dp_indexed_step(loss_fn, cfg, tx, mesh)
