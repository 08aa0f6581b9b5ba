"""Arch1: late-fusion LSTM VQA baseline (the north-star training workload).

Model definition follows 002_train_vqa_arch1/002_train_baseline.lua:
  * word embedding = Linear(V, E) -> Dropout(0.5) -> Tanh (:141-144); since
    the input is one-hot, the Linear is an embedding-row gather plus a shared
    bias (ops/embedding.py) — the one-hot scatter is never materialized;
  * question encoder = ``rnn_layer``-layer packed-state LSTM with inter-layer
    dropout 0.5 (:147, misc/LSTM.lua), run as a masked dense ``lax.scan`` over
    right-aligned tokens;
  * the question representation is the *entire* packed final state
    [c1, h1, ..., cL, hL] of width 2*rnn_size*rnn_layer (:152, state join at
    misc/LSTM.lua:70);
  * multimodal head = AxB(2*rnn*layers, nhimage, common, 0.5) -> Dropout(0.5)
    -> Linear(common, num_output) (:151-154);
  * loss = CrossEntropy over 1-indexed answers (:157).

The variants 003_train_ae_based*.lua reuse this module with
``rnn_layer=1, input_encoding_size=512`` and AE-initialized weights, and
003_train_ae_based_wp.lua swaps AxB for AskipB (``fusion="askipb"``,
misc/netdef.lua:16-25).

Everything (fwd, bwd, grad clamp, rmsprop update, lr decay) runs in ONE jitted
``train_step`` — the reference's host-driven JdJ closure with 26 cloned cells
and flat-vector scatter/gather (:272-335) collapses into a single XLA program.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from novel_vqa_tpu.ops import (
    axb_apply,
    askipb_apply,
    axb_init,
    cross_entropy,
    dropout,
    embedding_lookup,
    lstm_encode,
    lstm_layer_init,
    pack_state,
)
from novel_vqa_tpu.ops import optim as ref_optim
from novel_vqa_tpu.parallel.dp import gather_batch, vqa_scan_steps


class Arch1Config(NamedTuple):
    vocab_size: int
    input_encoding_size: int = 200  # -input_encoding_size (:34)
    rnn_size: int = 512  # -rnn_size (:35)
    rnn_layer: int = 2  # -rnn_layer (:36)
    nhimage: int = 4096  # -nhimage (:33)
    common_embedding_size: int = 1024  # -common_embedding_size (:37)
    num_output: int = 1000  # -num_output (:38)
    dropout: float = 0.5
    fusion: str = "axb"  # "axb" | "askipb" (wp variant)
    remat: bool = False  # jax.checkpoint the LSTM step (FLOPs for HBM)
    # "bfloat16" = mixed precision: bf16 weights/activations in the forward
    # (halves the HBM traffic of the saved per-step LSTM states that the
    # backward re-reads), f32 matmul accumulation (preferred_element_type),
    # f32 master weights + optimizer state, f32 loss.  Default f32 — the
    # reference trains f32 and the parity suite pins f32 numerics.
    compute_dtype: str = "float32"


def init_params(rng: jax.Array, cfg: Arch1Config) -> Dict[str, Any]:
    """uniform(-0.08, 0.08) everywhere (:174-181)."""
    ks = jax.random.split(rng, 4 + cfg.rnn_layer)
    u = lambda k, shape: jax.random.uniform(k, shape, jnp.float32, -0.08, 0.08)
    layers = []
    for i in range(cfg.rnn_layer):
        in_size = cfg.input_encoding_size if i == 0 else cfg.rnn_size
        layers.append(lstm_layer_init(ks[4 + i], in_size, cfg.rnn_size))
    return {
        "embedding": {
            "w": u(ks[0], (cfg.vocab_size, cfg.input_encoding_size)),
            "b": u(ks[1], (cfg.input_encoding_size,)),
        },
        "encoder": layers,
        "fusion": axb_init(
            ks[2],
            2 * cfg.rnn_size * cfg.rnn_layer,
            cfg.nhimage,
            cfg.common_embedding_size,
        ),
        "classifier": {
            "w": u(ks[3], (cfg.common_embedding_size, cfg.num_output)),
            "b": u(jax.random.fold_in(ks[3], 1), (cfg.num_output,)),
        },
    }


def apply(
    params: Dict[str, Any],
    cfg: Arch1Config,
    tokens: jax.Array,  # (N, D) right-aligned int tokens, 0 = pad
    image: jax.Array,  # (N, nhimage) float32 (already L2-normalized)
    *,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jax.Array:
    """Forward pass -> (N, num_output) answer scores."""
    if rng is not None:
        k_emb, k_enc, k_fus, k_cls = jax.random.split(rng, 4)
    else:
        k_emb = k_enc = k_fus = k_cls = None

    if cfg.compute_dtype == "bfloat16":
        # bf16 weights + activations; master params stay f32 (the cast's
        # transpose accumulates the grads back to f32 for the optimizer)
        cdt = jnp.bfloat16
        params = jax.tree_util.tree_map(
            lambda a: a.astype(cdt) if a.dtype == jnp.float32 else a, params
        )
        image = image.astype(cdt)

    # embedding: tanh(dropout(W[t] + b)) — Linear->Dropout->Tanh order (:141-144)
    emb = embedding_lookup(params["embedding"]["w"], tokens, params["embedding"]["b"])
    if not deterministic:
        emb = dropout(k_emb, emb, cfg.dropout, deterministic=False)
    emb = jnp.tanh(emb)

    # encoder over time (time-major for the scan)
    xs = jnp.swapaxes(emb, 0, 1)  # (D, N, E)
    mask = jnp.swapaxes((tokens != 0).astype(xs.dtype), 0, 1)  # (D, N)
    c, h = lstm_encode(
        params["encoder"],
        xs,
        mask,
        dropout_rate=cfg.dropout,
        rng=k_enc,
        deterministic=deterministic,
        remat=cfg.remat,
    )
    tv_q = pack_state(c, h)  # (N, 2*rnn*layers)

    # explicit routing: an unknown --fusion value must raise at trace time,
    # not silently select the wp fusion head (wrong scores, no error)
    if cfg.fusion == "axb":
        fuse = axb_apply
    elif cfg.fusion == "askipb":
        fuse = askipb_apply
    else:
        raise ValueError(
            f"cfg.fusion={cfg.fusion!r}: must be 'axb' or 'askipb'"
        )
    fused = fuse(
        params["fusion"],
        tv_q,
        image,
        dropout_rate=cfg.dropout,
        rng=k_fus,
        deterministic=deterministic,
    )
    if not deterministic:
        fused = dropout(k_cls, fused, cfg.dropout, deterministic=False)
    scores = (
        jnp.dot(fused, params["classifier"]["w"], preferred_element_type=jnp.float32)
        + params["classifier"]["b"]
    )
    return scores


def loss_fn(params, cfg, tokens, image, labels, rng) -> jax.Array:
    scores = apply(params, cfg, tokens, image, rng=rng, deterministic=False)
    return cross_entropy(scores, labels)


def make_optimizer(
    learning_rate: float = 3e-4,
    decay_factor: float = 0.99997592083,  # :78
    grad_clamp: float = 10.0,  # :329
    alpha: float = 0.99,
    epsilon: float = 1e-8,
    grad_scales=None,
) -> optax.GradientTransformation:
    """[optional grad scaling] -> clamp(+-10) -> reference rmsprop with
    per-step multiplicative decay (:408-410).  ``grad_scales`` is a pytree of
    factors matching the params (the wp variant's ``-lr_scale`` on the
    encoder/embedding blocks, 003_train_ae_based_wp.lua:344 — applied before
    the clamp, as in the reference)."""
    chain = []
    if grad_scales is not None:
        chain.append(ref_optim.scale_by_tree(grad_scales))
    chain += [
        ref_optim.clamp(grad_clamp),
        ref_optim.rmsprop(
            ref_optim.exponential_decay_schedule(learning_rate, decay_factor),
            alpha=alpha,
            epsilon=epsilon,
        ),
    ]
    return optax.chain(*chain)


@functools.partial(jax.jit, static_argnums=(0, 1), donate_argnums=(2, 3))
def train_step(
    cfg: Arch1Config,
    tx: optax.GradientTransformation,
    params,
    opt_state,
    tokens,
    image,
    labels,
    rng,
):
    """One fused fwd/bwd/update step (replaces JdJ + optim.rmsprop,
    002_train_baseline.lua:272-335,408)."""
    loss, grads = jax.value_and_grad(loss_fn)(params, cfg, tokens, image, labels, rng)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


@functools.partial(jax.jit, static_argnums=(0,))
def eval_step(cfg: Arch1Config, params, tokens, image, labels):
    scores = apply(params, cfg, tokens, image, deterministic=True)
    return cross_entropy(scores, labels), scores


# HBM-resident / single-dispatch eval paths — shared factory (see
# models/vqa/eval_paths.py for the full contract and the measured rationale;
# arch2 builds the same four from its own ``apply``)
from novel_vqa_tpu.models.vqa.eval_paths import build_eval_fns as _build_eval_fns

(
    eval_step_indexed,
    eval_predict_indexed,
    eval_predict_scan,
    eval_scores_scan,
) = _build_eval_fns(apply)


def make_dp_indexed_step(cfg: Arch1Config, tx: optax.GradientTransformation, mesh):
    """Data-parallel :func:`train_step_indexed` (shared builder in
    parallel/dp.py, parameterized by this model's ``loss_fn``)."""
    from novel_vqa_tpu.parallel.dp import make_vqa_dp_indexed_step

    return make_vqa_dp_indexed_step(loss_fn, cfg, tx, mesh)


@functools.partial(jax.jit, static_argnums=(0, 1, 5, 6), donate_argnums=(2, 3))
def train_steps_scan(
    cfg: Arch1Config,
    tx: optax.GradientTransformation,
    params,
    opt_state,
    data,  # HBM-resident dict (see train_step_indexed)
    n_steps: int,
    batch_size: int,
    rng,
):
    """Run ``n_steps`` training iterations in ONE dispatch via ``lax.scan``.

    Batch sampling moves on-device (uniform with replacement via
    ``jax.random.randint`` — statistical parity with the reference's
    ``torch.random`` draw, 002_train_baseline.lua:203; exact RNG coupling is
    impossible either way, SURVEY.md section 7).  This removes the per-step
    host dispatch entirely — the steady-state production path, and the right
    shape for high-latency links between host and device.

    Returns (params, opt_state, losses (n_steps,)).  The scan body is the
    shared :func:`novel_vqa_tpu.parallel.dp.vqa_scan_steps` (also behind the
    DP builder and arch2), so the sampling semantics have one source.
    """
    return vqa_scan_steps(
        loss_fn, cfg, tx, params, opt_state, data, rng, n_steps, batch_size
    )


def make_dp_steps_scan(
    cfg: Arch1Config,
    tx: optax.GradientTransformation,
    mesh,
    n_steps: int,
    batch_size: int,
    donate: bool = True,
):
    """Data-parallel :func:`train_steps_scan` — the steady-state production
    path on a mesh (shared builder in parallel/dp.py)."""
    from novel_vqa_tpu.parallel.dp import make_vqa_dp_steps_scan

    return make_vqa_dp_steps_scan(loss_fn, cfg, tx, mesh, n_steps, batch_size, donate)


@functools.partial(jax.jit, static_argnums=(0, 1), donate_argnums=(2, 3))
def train_step_indexed(
    cfg: Arch1Config,
    tx: optax.GradientTransformation,
    params,
    opt_state,
    data,  # dict of HBM-resident arrays: tokens (N,D), image (M,F), img_pos (N,), answers (N,)
    qinds,  # (B,) int32 indices sampled on host (tiny transfer)
    rng,
):
    """HBM-resident variant of :func:`train_step`.

    The reference gathers each batch on the host and ships ~8 MB of fc7
    features to the device every iteration (002_train_baseline.lua:202-218).
    TPU-native inversion: the whole train split lives in HBM (the largest
    split is ~1.3 GB of fc7 float32 — small next to 16 GB HBM) and the batch
    gather happens inside the jitted step, so only the (B,) index vector
    crosses the host boundary.  This removes the host->HBM bandwidth term
    from the steady-state step entirely.
    """
    tokens, image, labels = gather_batch(data, qinds)
    loss, grads = jax.value_and_grad(loss_fn)(params, cfg, tokens, image, labels, rng)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss
