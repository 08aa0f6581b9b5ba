"""Inception-v3 with the 2048-d global-pool feature tap.

Replaces the reference's torch.load'ed Inception-v3 t7 graph
(002_train_vqa_arch1/001_prepro_img_inc.lua:34) whose features are the
pre-logits global average pool (2048-d, ``nhimage 2048`` in the -inc trainers).
Standard v3 topology (BN-conv stem, 3xInceptionA, InceptionB, 4xInceptionC,
InceptionD, 2xInceptionE); batch-norm runs in inference mode with folded
running stats, matching the always-``evaluate()`` reference extractor.

Input: NHWC float32, 299x299, normalized (x*255 - 128) * 0.0078125 in RGB
order (001_prepro_img_inc.lua:40-57) — see ``data/images.py``.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from novel_vqa_tpu.models.vision.layers import (
    avg_pool,
    bn_init,
    batch_norm,
    conv_init,
    linear,
    raw_conv,
    linear_init,
    max_pool,
)


class InceptionConfig(NamedTuple):
    num_classes: int = 1000
    image_size: int = 299


def _cbr_init(rng, kh, kw, c_in, c_out):
    k1, k2 = jax.random.split(rng)
    conv = conv_init(k1, kh, kw, c_in, c_out)
    del conv["b"]  # BN provides the shift
    return {"conv": conv, "bn": bn_init(k2, c_out)}


def _cbr(p, x, stride=(1, 1), padding="SAME"):
    # input follows the conv weight dtype (bf16-storage mode: see
    # layers.conv2d); f32 weights pin f32 accumulation, bf16 weights take
    # the natural bf16 output — required for the conv TRANSPOSE rule (an
    # f32 cotangent against bf16 operands is rejected), which the
    # weak-paired finetune differentiates through (--cnn_arch inception
    # --compute_dtype bfloat16).  BN upcasts to f32 via its f32 stats.
    y = raw_conv(p["conv"]["w"], x, stride, padding)
    return jnp.maximum(batch_norm(p["bn"], y), 0.0)


def _branch_fusion_on() -> bool:
    # A/B knob for the same-input 1x1 branch fusion (docs/PERF.md Inception
    # record).  Read at TRACE time: it affects newly traced programs only —
    # an already-jitted forward keeps whatever route was compiled in, so
    # A/B runs must flip it per PROCESS (as bench/inc_ab do), not mid-run.
    import os

    return os.environ.get("NOVEL_VQA_INC_FUSE", "1") != "0"


def _cbr_multi(units, x, pool_last: bool = False):
    """Same-input 1x1 conv+BN+ReLU branches computed as ONE conv.

    Inception's parallel branches open with narrow 1x1 convs on the SAME
    input (e.g. InceptionA: 64+48+64 out-channels) — each pads its output
    channels up to the MXU's 128 lanes, wasting up to 4x of the systolic
    array (the round-3 attribution's structural diagnosis, docs/PERF.md).
    Concatenating the weights along C_out turns k narrow GEMMs into one
    wide one; every output channel is computed by exactly the same
    contraction as in the separate convs, and BN/ReLU are per-channel, so
    applying them on the concatenated output is identical math — pure
    op-count/lane-fill surgery, no approximation.  The params tree is
    untouched (importers/checkpoints unchanged); the concat is traced per
    compile and fuses into the conv's weight read.

    ``pool_last``: the LAST unit is a pool-projection branch — in the
    reference graph it reads ``avg_pool(x, 3)`` (stride 1, SAME).  Our
    ``avg_pool`` divides by the true window count (exclude-pad), making it
    a channel-wise linear map with row sums 1, so it commutes EXACTLY with
    the per-channel affine conv1x1+BN: BN(conv(avg(x))) == avg(BN(conv(x)))
    (algebraically; float reassociation only).  The branch therefore joins
    the fused GEMM, with its avg_pool applied to the pre-ReLU slice and
    ReLU after — same FLOPs (the pool is stride 1), one more narrow GEMM
    absorbed into the wide one.

    Returns the per-branch outputs (list, in ``units`` order).
    """
    sizes = [u["conv"]["w"].shape[-1] for u in units]
    if not _branch_fusion_on():
        outs = []
        for k, u in enumerate(units):
            inp = avg_pool(x, 3) if (pool_last and k == len(units) - 1) else x
            outs.append(_cbr(u, inp))
        return outs
    w = jnp.concatenate([u["conv"]["w"] for u in units], axis=-1)
    y = raw_conv(w, x)
    bn = {
        k: jnp.concatenate([u["bn"][k] for u in units])
        for k in ("scale", "offset", "mean", "var")
    }
    y = batch_norm(bn, y)
    offs = [0]
    for s in sizes:
        offs.append(offs[-1] + s)
    outs = []
    for k in range(len(units)):
        part = y[..., offs[k] : offs[k + 1]]
        if pool_last and k == len(units) - 1:
            part = avg_pool(part, 3)
        outs.append(jnp.maximum(part, 0.0))
    return outs


def _pack_on() -> bool:
    # A/B knob for width-shift lane packing of the narrow stem convs
    # (docs/PERF.md Inception record).  Trace-time, like _branch_fusion_on.
    import os

    return os.environ.get("NOVEL_VQA_INC_PACK", "0") == "1"


def _cbr_packed(p, x, padding: str):
    """3x3 stride-1 conv+BN+ReLU with s horizontal output shifts packed
    into the channel dimension — lane-fill surgery for C_out << 128.

    The stem's 147x147 convs carry 32/64 output channels; the MXU pads
    C_out to its 128 lanes, so those GEMMs run at <= 25/50% lane fill (the
    round-3 attribution's remaining untreated diagnosis).  Packing s =
    128//C_out horizontally adjacent output positions into the channel dim
    makes the conv produce s*C_out (=128) channels at stride (1, s): the
    packed kernel holds the SAME weights replicated at s horizontal
    offsets (width 3 -> s+2, zero-filled elsewhere), so every output value
    is the exact same contraction as the plain conv — no approximation,
    only a reassociation.  Cost: the kernel widens 3 -> s+2, so the GEMM's
    K grows (s+2)/3-fold (2x at s=4, 4/3x at s=2) while lane fill grows
    s-fold — worth it only if XLA's native handling really idles the
    lanes; measured on-device either way (docs/PERF.md).

    BN/ReLU run on the UNPACKED output (per-channel params apply
    unchanged).  Weights stay stored in the reference (3,3,C_in,C_out)
    framing; the packed kernel is rebuilt per call from a handful of pads
    on a tiny tensor."""
    w = p["conv"]["w"]  # (3, 3, c_in, c_out)
    kh, kw, ci, co = w.shape
    assert (kh, kw) == (3, 3)
    s = max(1, 128 // co)
    if s == 1:
        return _cbr(p, x, padding=padding)
    x = x.astype(w.dtype)
    if padding == "SAME":
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    n, h, wi, _ = x.shape
    wo = wi - 2  # VALID output width at the original stride 1
    n_w = -(-wo // s)
    need = s * n_w + 2  # input width a (s+2)-wide stride-s VALID conv reads
    if need > wi:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, need - wi), (0, 0)))
    # packed kernel: shift j's copy occupies kw2 in [j, j+3)
    w2 = jnp.concatenate(
        [jnp.pad(w, ((0, 0), (j, s - 1 - j), (0, 0), (0, 0))) for j in range(s)],
        axis=-1,
    )  # (3, s+2, c_in, s*c_out)
    y = raw_conv(w2, x, (1, s), "VALID")  # (n, h-2, n_w, s*c_out)
    y = y.reshape(n, h - 2, n_w, s, co).reshape(n, h - 2, n_w * s, co)
    y = y[:, :, :wo]
    return jnp.maximum(batch_norm(p["bn"], y), 0.0)


def _stem_conv_s2d(p, x):
    """The first stem conv (3x3, stride 2, VALID, C_in=3) via 2x2
    space-to-depth — the standard TPU fix for pathological C_in=3 convs.

    MEASURED AND REJECTED (docs/PERF.md round-3 Inception record): device
    time regressed 8.66 -> 9.21 ms/batch-32 fp32 (6.78 -> 7.34 bf16) on the
    v5e — XLA's native handling of the C_in=3 conv is already fine here and
    the extra pad/reshape/transpose traffic costs more than it saves.  Kept
    (with its equivalence test) as the documented A/B path, not routed.

    Exact same math: pad the kernel 3->4 and the input 299->300 with zeros,
    then a 4x4/stride-2 conv over the padded input equals a 2x2/stride-1 conv
    over the 2x2 space-to-depth rearrangement with 4*3=12 input channels —
    no approximation, only a reassociation of the contraction.  The weight is
    STORED in its reference (3,3,3,32) framing (importers unchanged); the
    rearrangement is traced and constant-folded per compile.
    """
    w = p["conv"]["w"]  # (3, 3, 3, c_out)
    x = x.astype(w.dtype)
    n, h, ww_, c = x.shape
    hp, wp = h + h % 2, ww_ + ww_ % 2  # pad to even (299 -> 300)
    xp = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - ww_), (0, 0)))
    # (N, hp/2, 2, wp/2, 2, C) -> (N, hp/2, wp/2, (ri, rj, C))
    xs = xp.reshape(n, hp // 2, 2, wp // 2, 2, c)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(n, hp // 2, wp // 2, 4 * c)
    # kernel (kh=2a+ri, kw=2b+rj, C, O) -> (a, b, (ri, rj, C), O)
    w4 = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
    w2 = w4.reshape(2, 2, 2, 2, c, -1).transpose(0, 2, 1, 3, 4, 5)
    w2 = w2.reshape(2, 2, 4 * c, -1)
    y = raw_conv(w2, xs, (1, 1), "VALID")
    return jnp.maximum(batch_norm(p["bn"], y), 0.0)


class _KeyGen:
    def __init__(self, rng):
        self.rng = rng

    def __call__(self):
        self.rng, k = jax.random.split(self.rng)
        return k


def _inception_a_init(kg, c_in, pool_features):
    return {
        "b1x1": _cbr_init(kg(), 1, 1, c_in, 64),
        "b5x5_1": _cbr_init(kg(), 1, 1, c_in, 48),
        "b5x5_2": _cbr_init(kg(), 5, 5, 48, 64),
        "b3x3dbl_1": _cbr_init(kg(), 1, 1, c_in, 64),
        "b3x3dbl_2": _cbr_init(kg(), 3, 3, 64, 96),
        "b3x3dbl_3": _cbr_init(kg(), 3, 3, 96, 96),
        "bpool": _cbr_init(kg(), 1, 1, c_in, pool_features),
    }


def _inception_a(p, x):
    # ALL four 1x1 branch heads run as one 64+48+64+pool-wide GEMM (the
    # pool branch joins via the avg_pool/conv+BN commute — see _cbr_multi)
    b1, b5, b3, bp = _cbr_multi(
        [p["b1x1"], p["b5x5_1"], p["b3x3dbl_1"], p["bpool"]], x, pool_last=True
    )
    b5 = _cbr(p["b5x5_2"], b5)
    b3 = _cbr(p["b3x3dbl_3"], _cbr(p["b3x3dbl_2"], b3))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b_init(kg, c_in):
    return {
        "b3x3": _cbr_init(kg(), 3, 3, c_in, 384),
        "b3x3dbl_1": _cbr_init(kg(), 1, 1, c_in, 64),
        "b3x3dbl_2": _cbr_init(kg(), 3, 3, 64, 96),
        "b3x3dbl_3": _cbr_init(kg(), 3, 3, 96, 96),
    }


def _inception_b(p, x):
    b3 = _cbr(p["b3x3"], x, stride=(2, 2), padding="VALID")
    bd = _cbr(p["b3x3dbl_2"], _cbr(p["b3x3dbl_1"], x))
    bd = _cbr(p["b3x3dbl_3"], bd, stride=(2, 2), padding="VALID")
    bp = max_pool(x, 3, 2, "VALID")
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _inception_c_init(kg, c_in, c7):
    return {
        "b1x1": _cbr_init(kg(), 1, 1, c_in, 192),
        "b7x7_1": _cbr_init(kg(), 1, 1, c_in, c7),
        "b7x7_2": _cbr_init(kg(), 1, 7, c7, c7),
        "b7x7_3": _cbr_init(kg(), 7, 1, c7, 192),
        "b7x7dbl_1": _cbr_init(kg(), 1, 1, c_in, c7),
        "b7x7dbl_2": _cbr_init(kg(), 7, 1, c7, c7),
        "b7x7dbl_3": _cbr_init(kg(), 1, 7, c7, c7),
        "b7x7dbl_4": _cbr_init(kg(), 7, 1, c7, c7),
        "b7x7dbl_5": _cbr_init(kg(), 1, 7, c7, 192),
        "bpool": _cbr_init(kg(), 1, 1, c_in, 192),
    }


def _inception_c(p, x):
    # 192 + c7 + c7 + 192(pool) same-input 1x1 heads as one 640-768-wide
    # GEMM (c7 = 128/160/160/192 across the four C blocks)
    b1, b7, bd, bp = _cbr_multi(
        [p["b1x1"], p["b7x7_1"], p["b7x7dbl_1"], p["bpool"]], x, pool_last=True
    )
    b7 = _cbr(p["b7x7_3"], _cbr(p["b7x7_2"], b7))
    for name in ("b7x7dbl_2", "b7x7dbl_3", "b7x7dbl_4", "b7x7dbl_5"):
        bd = _cbr(p[name], bd)
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d_init(kg, c_in):
    return {
        "b3x3_1": _cbr_init(kg(), 1, 1, c_in, 192),
        "b3x3_2": _cbr_init(kg(), 3, 3, 192, 320),
        "b7x7x3_1": _cbr_init(kg(), 1, 1, c_in, 192),
        "b7x7x3_2": _cbr_init(kg(), 1, 7, 192, 192),
        "b7x7x3_3": _cbr_init(kg(), 7, 1, 192, 192),
        "b7x7x3_4": _cbr_init(kg(), 3, 3, 192, 192),
    }


def _inception_d(p, x):
    # both branch heads are same-input 192-wide 1x1s -> one 384-wide GEMM
    b3, b7 = _cbr_multi([p["b3x3_1"], p["b7x7x3_1"]], x)
    b3 = _cbr(p["b3x3_2"], b3, stride=(2, 2), padding="VALID")
    b7 = _cbr(p["b7x7x3_3"], _cbr(p["b7x7x3_2"], b7))
    b7 = _cbr(p["b7x7x3_4"], b7, stride=(2, 2), padding="VALID")
    bp = max_pool(x, 3, 2, "VALID")
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e_init(kg, c_in):
    return {
        "b1x1": _cbr_init(kg(), 1, 1, c_in, 320),
        "b3x3_1": _cbr_init(kg(), 1, 1, c_in, 384),
        "b3x3_2a": _cbr_init(kg(), 1, 3, 384, 384),
        "b3x3_2b": _cbr_init(kg(), 3, 1, 384, 384),
        "b3x3dbl_1": _cbr_init(kg(), 1, 1, c_in, 448),
        "b3x3dbl_2": _cbr_init(kg(), 3, 3, 448, 384),
        "b3x3dbl_3a": _cbr_init(kg(), 1, 3, 384, 384),
        "b3x3dbl_3b": _cbr_init(kg(), 3, 1, 384, 384),
        "bpool": _cbr_init(kg(), 1, 1, c_in, 192),
    }


def _inception_e(p, x):
    # 320 + 384 + 448 + 192(pool) same-input 1x1 heads as one 1344-wide GEMM
    b1, b3, bd, bp = _cbr_multi(
        [p["b1x1"], p["b3x3_1"], p["b3x3dbl_1"], p["bpool"]], x, pool_last=True
    )
    b3 = jnp.concatenate([_cbr(p["b3x3_2a"], b3), _cbr(p["b3x3_2b"], b3)], axis=-1)
    bd = _cbr(p["b3x3dbl_2"], bd)
    bd = jnp.concatenate([_cbr(p["b3x3dbl_3a"], bd), _cbr(p["b3x3dbl_3b"], bd)], axis=-1)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def init_params(rng: jax.Array, cfg: InceptionConfig) -> Dict[str, Any]:
    kg = _KeyGen(rng)
    p: Dict[str, Any] = {
        "stem": {
            "c1": _cbr_init(kg(), 3, 3, 3, 32),
            "c2": _cbr_init(kg(), 3, 3, 32, 32),
            "c3": _cbr_init(kg(), 3, 3, 32, 64),
            "c4": _cbr_init(kg(), 1, 1, 64, 80),
            "c5": _cbr_init(kg(), 3, 3, 80, 192),
        },
        "mixed5b": _inception_a_init(kg, 192, 32),
        "mixed5c": _inception_a_init(kg, 256, 64),
        "mixed5d": _inception_a_init(kg, 288, 64),
        "mixed6a": _inception_b_init(kg, 288),
        "mixed6b": _inception_c_init(kg, 768, 128),
        "mixed6c": _inception_c_init(kg, 768, 160),
        "mixed6d": _inception_c_init(kg, 768, 160),
        "mixed6e": _inception_c_init(kg, 768, 192),
        "mixed7a": _inception_d_init(kg, 768),
        "mixed7b": _inception_e_init(kg, 1280),
        "mixed7c": _inception_e_init(kg, 2048),
        "fc": linear_init(kg(), 2048, cfg.num_classes),
    }
    return p


def iter_conv_bn(params: Dict[str, Any]):
    """Yield every {conv, bn} unit in definition order (the dict insertion
    order fixed by init_params) — the hook weight importers use to map an
    ordered external conv list onto this tree."""
    def walk(p):
        if isinstance(p, dict):
            if set(p) == {"conv", "bn"}:
                yield p
            else:
                for v in p.values():
                    yield from walk(v)

    yield from walk(params)


def apply(
    params: Dict[str, Any],
    cfg: InceptionConfig,
    images: jax.Array,  # (N, 299, 299, 3) normalized RGB
    tap: str = "pool",  # "pool" (2048-d features) | "logits"
) -> jax.Array:
    s = params["stem"]
    x = _cbr(s["c1"], images, stride=(2, 2), padding="VALID")
    if _pack_on():
        # NOVEL_VQA_INC_PACK=1: width-shift lane packing for the two
        # narrow-channel 147x147 stem convs (see _cbr_packed)
        x = _cbr_packed(s["c2"], x, padding="VALID")
        x = _cbr_packed(s["c3"], x, padding="SAME")
    else:
        x = _cbr(s["c2"], x, padding="VALID")
        x = _cbr(s["c3"], x)
    x = max_pool(x, 3, 2, "VALID")
    x = _cbr(s["c4"], x, padding="VALID")
    x = _cbr(s["c5"], x, padding="VALID")
    x = max_pool(x, 3, 2, "VALID")
    for name in ("mixed5b", "mixed5c", "mixed5d"):
        x = _inception_a(params[name], x)
    x = _inception_b(params["mixed6a"], x)
    for name in ("mixed6b", "mixed6c", "mixed6d", "mixed6e"):
        x = _inception_c(params[name], x)
    x = _inception_d(params["mixed7a"], x)
    for name in ("mixed7b", "mixed7c"):
        x = _inception_e(params[name], x)
    x = jnp.mean(x, axis=(1, 2))  # global average pool -> (N, 2048)
    if tap == "pool":
        return x
    return linear(params["fc"], x)
