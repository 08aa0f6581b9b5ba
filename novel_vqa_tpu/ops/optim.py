"""Reference-exact optimizers.

Ports of 001_train_autoencoder/misc/optim_updates.lua (sgd :4-9, sgdm :12-24,
sgdmom :26-40, adagrad :42-57, rmsprop :60-76, adam :78-111) and of Torch
``optim.rmsprop`` (used by the VQA trainers,
002_train_vqa_arch1/002_train_baseline.lua:408 — mathematically identical to
optim_updates.rmsprop, with an optional weight-decay term folded into the
gradient as in 003_train_vqa_arch2/003_train_ae_based.lua's
``optimize.weightDecay``).

All support the reference's optional per-parameter learning-rate scale vector
``lrs`` (e.g. ``rmsprop_lrscale``, 002_train_vqa_arch1/misc/rmsprop_lrscale.lua,
and the CNN per-param scales at
001_train_autoencoder/004_train_arch1_weakpaired_autoencoder_vgg.lua:182-185)
as a pytree matching the params (or None).

Every update is expressed as an ``optax.GradientTransformation`` over pytrees
so trainers compose them with clipping/schedules; the whole update runs inside
the jitted train step (no host-side flat-vector scatter/gather — the
reference's ``join_vector``/``split_vector`` plumbing, misc/RNNUtils.lua:22-39,
is intentionally dropped per SURVEY.md section 2.7).

Math notes vs. common implementations (these differ from optax defaults and
are required for parity):
  * rmsprop/adagrad/adam add eps *after* the sqrt:  x -= lr * g / (sqrt(m)+eps)
  * adam folds bias correction into the step size:
        step = lr * sqrt(1-b2^t) / (1-b1^t);  x -= step * m / (sqrt(v)+eps)
  * sgdmom is the Nesterov form  x += -a*m_prev + (1+a)*m_new  with
    m_new = a*m - lr*g  (optim_updates.lua:26-40).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

Schedule = Callable[[jax.Array], jax.Array]


def _as_schedule(lr) -> Schedule:
    if callable(lr):
        return lr
    return lambda _count: jnp.asarray(lr, jnp.float32)


def _scaled(update, lrs_leaf):
    return update if lrs_leaf is None else update * lrs_leaf


def _tree_map_with_lrs(fn, *trees, lrs=None):
    """tree_map where the last argument may be None (broadcast to all leaves)."""
    if lrs is None:
        return jax.tree_util.tree_map(lambda *args: fn(*args, None), *trees)
    return jax.tree_util.tree_map(lambda *args: fn(*args[:-1], args[-1]), *trees, lrs)


class ScalarState(NamedTuple):
    count: jax.Array


class MomentState(NamedTuple):
    count: jax.Array
    m: Any


class AdamState(NamedTuple):
    count: jax.Array
    m: Any
    v: Any


def sgd(lr, lrs=None) -> optax.GradientTransformation:
    """optim_updates.lua:4-9: x += -lr * g (* lrs)."""
    sched = _as_schedule(lr)

    def init(params):
        return ScalarState(count=jnp.zeros([], jnp.int32))

    def update(grads, state, params=None):
        step_lr = sched(state.count)
        upd = _tree_map_with_lrs(
            lambda g, s: -step_lr * _scaled(g, s), grads, lrs=lrs
        )
        return upd, ScalarState(count=state.count + 1)

    return optax.GradientTransformation(init, update)


def sgdm(lr, alpha: float, lrs=None) -> optax.GradientTransformation:
    """optim_updates.lua:12-24: v = a*v + lr*g; x -= v."""
    sched = _as_schedule(lr)

    def init(params):
        return MomentState(
            count=jnp.zeros([], jnp.int32),
            m=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update(grads, state, params=None):
        step_lr = sched(state.count)
        new_m = _tree_map_with_lrs(
            lambda v, g, s: alpha * v + step_lr * _scaled(g, s),
            state.m,
            grads,
            lrs=lrs,
        )
        upd = jax.tree_util.tree_map(lambda v: -v, new_m)
        return upd, MomentState(count=state.count + 1, m=new_m)

    return optax.GradientTransformation(init, update)


def sgdmom(lr, alpha: float, lrs=None) -> optax.GradientTransformation:
    """optim_updates.lua:26-40 (Nesterov): m' = a*m - lr*g;
    x += -a*m + (1+a)*m'."""
    sched = _as_schedule(lr)

    def init(params):
        return MomentState(
            count=jnp.zeros([], jnp.int32),
            m=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update(grads, state, params=None):
        step_lr = sched(state.count)
        new_m = _tree_map_with_lrs(
            lambda m, g, s: alpha * m - step_lr * _scaled(g, s),
            state.m,
            grads,
            lrs=lrs,
        )
        upd = jax.tree_util.tree_map(
            lambda m_old, m_new: -alpha * m_old + (1.0 + alpha) * m_new,
            state.m,
            new_m,
        )
        return upd, MomentState(count=state.count + 1, m=new_m)

    return optax.GradientTransformation(init, update)


def adagrad(lr, epsilon: float, lrs=None) -> optax.GradientTransformation:
    """optim_updates.lua:42-57: m += g*g; x -= lr * g/(sqrt(m)+eps)."""
    sched = _as_schedule(lr)

    def init(params):
        return MomentState(
            count=jnp.zeros([], jnp.int32),
            m=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update(grads, state, params=None):
        step_lr = sched(state.count)
        new_m = jax.tree_util.tree_map(lambda m, g: m + g * g, state.m, grads)
        upd = _tree_map_with_lrs(
            lambda m, g, s: -step_lr * _scaled(g / (jnp.sqrt(m) + epsilon), s),
            new_m,
            grads,
            lrs=lrs,
        )
        return upd, MomentState(count=state.count + 1, m=new_m)

    return optax.GradientTransformation(init, update)


def rmsprop(
    lr, alpha: float = 0.99, epsilon: float = 1e-8, weight_decay: float = 0.0,
    lrs=None,
) -> optax.GradientTransformation:
    """optim_updates.lua:60-76 / Torch optim.rmsprop:
    g += wd*x; m = a*m + (1-a)*g*g; x -= lr * g/(sqrt(m)+eps)."""
    sched = _as_schedule(lr)

    def init(params):
        return MomentState(
            count=jnp.zeros([], jnp.int32),
            m=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update(grads, state, params=None):
        if weight_decay != 0.0:
            grads = jax.tree_util.tree_map(
                lambda g, p: g + weight_decay * p, grads, params
            )
        step_lr = sched(state.count)
        new_m = jax.tree_util.tree_map(
            lambda m, g: alpha * m + (1.0 - alpha) * g * g, state.m, grads
        )
        upd = _tree_map_with_lrs(
            lambda m, g, s: -step_lr * _scaled(g / (jnp.sqrt(m) + epsilon), s),
            new_m,
            grads,
            lrs=lrs,
        )
        return upd, MomentState(count=state.count + 1, m=new_m)

    return optax.GradientTransformation(init, update)


def adam(
    lr, beta1: float = 0.9, beta2: float = 0.999, epsilon: float = 1e-8,
    lrs=None,
) -> optax.GradientTransformation:
    """optim_updates.lua:78-111."""
    sched = _as_schedule(lr)

    def init(params):
        zeros = functools.partial(jax.tree_util.tree_map, jnp.zeros_like)
        return AdamState(count=jnp.zeros([], jnp.int32), m=zeros(params), v=zeros(params))

    def update(grads, state, params=None):
        t = state.count + 1
        step_lr = sched(state.count)
        new_m = jax.tree_util.tree_map(
            lambda m, g: beta1 * m + (1.0 - beta1) * g, state.m, grads
        )
        new_v = jax.tree_util.tree_map(
            lambda v, g: beta2 * v + (1.0 - beta2) * g * g, state.v, grads
        )
        tf = t.astype(jnp.float32)
        bc1 = 1.0 - beta1**tf
        bc2 = 1.0 - beta2**tf
        step = step_lr * jnp.sqrt(bc2) / bc1
        upd = _tree_map_with_lrs(
            lambda m, v, s: -step * _scaled(m / (jnp.sqrt(v) + epsilon), s),
            new_m,
            new_v,
            lrs=lrs,
        )
        return upd, AdamState(count=t, m=new_m, v=new_v)

    return optax.GradientTransformation(init, update)


def clamp(limit: float) -> optax.GradientTransformation:
    """Element-wise gradient clamp to [-limit, limit] — the reference clamps
    gradients, not the global norm (002_train_baseline.lua:329 clamps +-10;
    the AE trainers clamp +-grad_clip,
    001_train_arch1_text_autoencoder.lua:237-243)."""

    def init(params):
        return optax.EmptyState()

    def update(grads, state, params=None):
        return (
            jax.tree_util.tree_map(lambda g: jnp.clip(g, -limit, limit), grads),
            state,
        )

    return optax.GradientTransformation(init, update)


def add_decayed_weights(weight_decay: float) -> optax.GradientTransformation:
    """g += wd * x, applied by the AE trainers after clipping
    (001_train_arch1_text_autoencoder.lua:240-243)."""

    def init(params):
        return optax.EmptyState()

    def update(grads, state, params=None):
        return (
            jax.tree_util.tree_map(lambda g, p: g + weight_decay * p, grads, params),
            state,
        )

    return optax.GradientTransformation(init, update)


def scale_by_tree(scales) -> optax.GradientTransformation:
    """Element-wise gradient scaling by a pytree of (scalar) factors matching
    the params structure — the reference's ``-lr_scale`` multiplies the
    encoder and embedding gradient blocks before clamping
    (002_train_vqa_arch1/003_train_ae_based_wp.lua:344)."""

    def init(params):
        return optax.EmptyState()

    def update(grads, state, params=None):
        return (
            jax.tree_util.tree_map(lambda g, s: g * s, grads, scales),
            state,
        )

    return optax.GradientTransformation(init, update)


def exponential_decay_schedule(lr0: float, decay_factor: float) -> Schedule:
    """Per-iteration multiplicative decay: iteration k uses lr0 * d^k,
    matching ``optimize.learningRate = optimize.learningRate * decay_factor``
    applied after every step (002_train_baseline.lua:410, d = 0.99997592083)."""

    def sched(count):
        return lr0 * decay_factor ** count.astype(jnp.float32)

    return sched


def half_life_schedule(
    lr0: float, decay_start: int, decay_every: int
) -> Schedule:
    """LR half-life schedule of the AE trainers
    (001_train_arch1_text_autoencoder.lua:341-346): past ``decay_start``,
    lr = lr0 * 0.5^((iter - decay_start) / decay_every) with a *continuous*
    exponent (not stepped).  ``decay_start < 0`` disables decay."""

    def sched(count):
        frac = jnp.where(
            jnp.logical_and(decay_start >= 0, count > decay_start),
            (count.astype(jnp.float32) - decay_start) / decay_every,
            0.0,
        )
        return lr0 * 0.5**frac

    return sched
