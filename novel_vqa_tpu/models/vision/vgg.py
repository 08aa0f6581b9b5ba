"""VGG-16/19 with the fc7 feature tap.

Replaces the reference's loadcaffe-loaded caffe VGG
(002_train_vqa_arch1/001_prepro_img_vgg.lua:36) whose fc7 features are read
from ``net.modules[38].output`` — in the loadcaffe module list that is the
dropout after relu7, i.e. in evaluate mode the *post-ReLU fc7 activations*
(4096-d, non-negative).  ``apply(..., tap="fc7")`` returns exactly that.

Input convention matches the reference extractor's ``loadim``
(001_prepro_img_vgg.lua:47-71): NHWC float32 in **BGR** channel order, scaled
to [0,255] and mean-subtracted ([103.939, 116.779, 123.68] BGR) — see
``data/images.py``.  Weights convert from caffemodel dumps without any channel
swap; for Torch-pipeline weights converted with net_utils.build_cnn's BGR->RGB
first-conv swap (misc/net_utils.lua:25-33), the converter re-applies the swap
(core flag ``first_conv_bgr``).

fc6 consumes the 7x7x512 pool5 block flattened in caffe's CHW order, so
converted fc6 weights load unchanged; the NHWC->NCHW transpose before the
flatten is folded into XLA's reshape.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from novel_vqa_tpu.models.vision.layers import conv2d, conv_init, linear, linear_init, max_pool

# convs per block (all 3x3); pools after each block.  "vggembed" is the
# custom early-fusion embedding net (thin_VGGNetEmbed in VGGEmbed.t7,
# 002_train_vqa_arch1/001_prepro_img_ef.lua:39-41): a VGG-16 backbone whose
# classifier head is replaced by a Linear(4096 -> 4800) embedding; the ef
# extractor taps net.modules[39].output — in the module list (31 conv/pool
# modules, view 32, fc6 33-35, fc7 36-38) module 39 IS that Linear, so the
# tap is its raw (pre-activation) output (:99).
_BLOCKS = {
    "vgg16": [2, 2, 3, 3, 3],
    "vgg19": [2, 2, 4, 4, 4],
    "vggembed": [2, 2, 3, 3, 3],
}
_WIDTHS = [64, 128, 256, 512, 512]


class VGGConfig(NamedTuple):
    arch: str = "vgg16"
    num_classes: int = 1000
    image_size: int = 224
    embed_dim: int = 4800  # vggembed head width (001_prepro_img_ef.lua:99)


def init_params(rng: jax.Array, cfg: VGGConfig) -> Dict[str, Any]:
    blocks = _BLOCKS[cfg.arch]
    n_convs = sum(blocks)
    ks = jax.random.split(rng, n_convs + 3)
    params: Dict[str, Any] = {"conv": []}
    c_in = 3
    ki = 0
    for width, n in zip(_WIDTHS, blocks):
        for _ in range(n):
            params["conv"].append(conv_init(ks[ki], 3, 3, c_in, width))
            c_in = width
            ki += 1
    feat = (cfg.image_size // 32) ** 2 * 512  # 7*7*512 for 224
    params["fc6"] = linear_init(ks[-3], feat, 4096)
    params["fc7"] = linear_init(ks[-2], 4096, 4096)
    if cfg.arch == "vggembed":
        params["embed"] = linear_init(ks[-1], 4096, cfg.embed_dim)
    else:
        params["fc8"] = linear_init(ks[-1], 4096, cfg.num_classes)
    return params


def apply(
    params: Dict[str, Any],
    cfg: VGGConfig,
    images: jax.Array,  # (N, H, W, 3) BGR mean-subtracted float32
    tap: str = "fc7",
) -> jax.Array:
    """Forward; ``tap`` in {"pool5", "fc6", "fc7", "fc8"}.  fc6/fc7 taps are
    post-ReLU (the reference taps module 38 = after relu7)."""
    x = images
    blocks = _BLOCKS[cfg.arch]
    ci = 0
    for bi, n in enumerate(blocks):
        for _ in range(n):
            x = conv2d(params["conv"][ci], x)
            ci += 1
        x = max_pool(x)
    if tap == "pool5":
        return x
    # caffe flattens CHW: transpose NHWC -> NCHW before reshape so converted
    # fc6 weights apply unchanged
    n = x.shape[0]
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(n, -1)
    x = linear(params["fc6"], x, relu=True)
    if tap == "fc6":
        return x
    x = linear(params["fc7"], x, relu=True)
    if tap == "fc7":
        return x
    if tap == "embed":
        # module 39's raw Linear output — no activation follows the tap
        return linear(params["embed"], x)
    return linear(params["fc8"], x)
