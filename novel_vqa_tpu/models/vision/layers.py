"""Vision building blocks: conv / maxpool / avgpool / batchnorm, NHWC layout.

NHWC + HWIO is the TPU-native layout (XLA tiles the channel dim onto the MXU
lanes).  The reference's native surface here is cuDNN via loadcaffe / Torch7
graphs (SURVEY.md section 2.7); XLA's conv emitter plays that role, fusing
bias + ReLU into the conv epilogue.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def conv_init(rng, kh, kw, c_in, c_out, dtype=jnp.float32):
    """He-style init for random benchmarks; real weights come from converted
    caffemodel/t7 dumps (core/vision_weights.py)."""
    kw_, kb_ = jax.random.split(rng)
    fan_in = kh * kw * c_in
    std = (2.0 / fan_in) ** 0.5
    return {
        "w": std * jax.random.normal(kw_, (kh, kw, c_in, c_out), dtype),
        "b": jnp.zeros((c_out,), dtype),
    }


def conv2d(
    params: Dict[str, jax.Array],
    x: jax.Array,  # (N, H, W, C)
    stride: Tuple[int, int] = (1, 1),
    padding="SAME",
    relu: bool = True,
) -> jax.Array:
    # follow the weight dtype: with bf16 weights the input cast fuses into
    # the producer's epilogue, so inter-layer activations are STORED bf16
    # (half the HBM traffic) — measured 24% on VGG-16 fc7 extraction
    # (11.5 -> 9.3 ms/batch-32 on the v5e).  f32 weights keep the f32
    # accumulation pin (preferred_element_type); bf16 weights take the
    # natural bf16 output dtype instead — the MXU still accumulates f32
    # internally, and a same-dtype output is required for the conv
    # TRANSPOSE rule (an f32 cotangent against bf16 operands is rejected),
    # which the weak-paired trainer differentiates through.
    # TPU-specific caveat: the f32-internal-accumulation guarantee is an MXU
    # property; on other backends (e.g. the CPU test mesh) XLA may accumulate
    # bf16, and the bias/ReLU epilogue runs bf16 too — bf16-storage numerics
    # are therefore backend-dependent (keep CPU-mesh bf16 test tolerances
    # loose; the documented <=1% extraction deviation bound is TPU-measured).
    y = raw_conv(params["w"], x, stride, padding) + params["b"]
    return jnp.maximum(y, 0.0) if relu else y


def raw_conv(w, x, stride=(1, 1), padding="SAME"):
    """NHWC conv carrying the ONE load-bearing dtype policy for every vision
    conv (conv2d here; inception's _cbr/_cbr_multi/_cbr_packed/_stem_conv_s2d):
    the input follows the weight dtype; f32 weights pin f32 accumulation
    (``preferred_element_type``); bf16 weights take the NATURAL bf16 output —
    the MXU still accumulates f32 internally, and a same-dtype output is
    required for the conv TRANSPOSE rule (an f32 cotangent against bf16
    operands is rejected), which the weak-paired finetune differentiates
    through.  Keep the policy HERE only — a per-call-site restatement is how
    one path silently diverges."""
    return jax.lax.conv_general_dilated(
        x.astype(w.dtype),
        w,
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32 if w.dtype == jnp.float32 else None,
    )


def bf16_storage_cast(params):
    """Cast conv/linear weights to bf16 storage, keeping BatchNorm units f32
    (the rsqrt/eps math is precision-sensitive).  The layer primitives cast
    their inputs to the weight dtype, so inter-layer activations store bf16
    (half the HBM traffic); bf16-weight convs emit their NATURAL bf16
    output (the MXU still accumulates f32 internally — do not reintroduce
    ``preferred_element_type=f32`` there, the conv transpose rule rejects
    the resulting f32 cotangent against bf16 operands, see conv2d).
    Measured +24% on VGG-16 fc7 extraction, and larger at the sweep's
    bs-128 config (docs/PERF.md).

    Works on host or device trees; returns a new tree (masters untouched),
    so a trainer can apply it per-step inside jit for mixed-precision
    training with f32 master weights."""
    if isinstance(params, dict):
        if set(params) == {"scale", "offset", "mean", "var"}:
            return params  # BN unit: keep f32
        return {k: bf16_storage_cast(v) for k, v in params.items()}
    if isinstance(params, list):
        return [bf16_storage_cast(v) for v in params]
    return params.astype(jnp.bfloat16)


def max_pool(x, window=2, stride=2, padding="VALID"):
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        padding,
    )


def avg_pool(x, window, stride=1, padding="SAME"):
    summed = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        (1, window, window, 1),
        (1, stride, stride, 1),
        padding,
    )
    counts = jax.lax.reduce_window(
        jnp.ones_like(x),
        0.0,
        jax.lax.add,
        (1, window, window, 1),
        (1, stride, stride, 1),
        padding,
    )
    return summed / counts


def bn_init(rng, c, dtype=jnp.float32):
    return {
        "scale": jnp.ones((c,), dtype),
        "offset": jnp.zeros((c,), dtype),
        "mean": jnp.zeros((c,), dtype),
        "var": jnp.ones((c,), dtype),
    }


def batch_norm(params, x, eps: float = 1e-3):
    """Inference-mode BN with folded running stats (the reference Inception t7
    is always run in evaluate mode for feature extraction)."""
    inv = jax.lax.rsqrt(params["var"] + eps)
    return (x - params["mean"]) * inv * params["scale"] + params["offset"]


def conv_bn(conv_p, bn_p, x, stride=(1, 1), padding="SAME"):
    y = conv2d(conv_p, x, stride=stride, padding=padding, relu=False)
    return jnp.maximum(batch_norm(bn_p, y), 0.0)


def linear_init(rng, n_in, n_out, dtype=jnp.float32):
    kw_, kb_ = jax.random.split(rng)
    std = (2.0 / n_in) ** 0.5
    return {
        "w": std * jax.random.normal(kw_, (n_in, n_out), dtype),
        "b": jnp.zeros((n_out,), dtype),
    }


def linear(params, x, relu=False):
    y = (
        jnp.dot(
            x.astype(params["w"].dtype), params["w"],
            preferred_element_type=jnp.float32,
        )
        + params["b"]
    )
    return jnp.maximum(y, 0.0) if relu else y
