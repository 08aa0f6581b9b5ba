"""VGGEmbed early-fusion support (VERDICT round-1 item 7).

The reference ef extractor taps a custom 4800-d net
(/root/reference/002_train_vqa_arch1/001_prepro_img_ef.lua:39-41,99): the
``thin_VGGNetEmbed`` inside VGGEmbed.t7, whose module list is a VGG-16
backbone (31 conv/relu/pool modules + view 32 + fc6 33-35 + fc7 36-38)
followed by a Linear(4096 -> 4800) at index 39 — the tap is that Linear's
raw output.  These tests pin the reconstructed topology, the import_t7
mapping from a synthetic VGGEmbed-shaped t7, and the 8896-d ef store
(4800 VGGEmbed cols then 4096 VGG-19 fc7 cols, :99-101).
"""

import json
import os

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from novel_vqa_tpu.core import t7
from novel_vqa_tpu.models.vision import vgg


def test_vggembed_topology_and_tap():
    cfg = vgg.VGGConfig(arch="vggembed", image_size=32, embed_dim=24)
    params = jax.device_get(vgg.init_params(jax.random.PRNGKey(0), cfg))
    assert "embed" in params and "fc8" not in params
    assert params["embed"]["w"].shape == (4096, 24)
    assert len(params["conv"]) == 13  # VGG-16 backbone

    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32))
    out = np.asarray(vgg.apply(params, cfg, x, tap="embed"))
    assert out.shape == (2, 24)
    # module 39 is the Linear itself: raw pre-activation output (negative
    # values must survive — a stray ReLU here would be wrong)
    assert (out < 0).any()


def _synthetic_vggembed_t7(params):
    """nn.Sequential shaped like thin_VGGNetEmbed: convs (+ReLUs, pools have
    no params and are represented implicitly), view, then fc6/fc7/embed."""
    modules = []
    for cp in params["conv"]:
        w = np.transpose(np.asarray(cp["w"]), (3, 2, 0, 1)).copy()
        modules.append(
            t7.TorchObject(
                "cudnn.SpatialConvolution",
                {"weight": w, "bias": np.asarray(cp["b"])},
            )
        )
        modules.append(t7.TorchObject("cudnn.ReLU", {}))
    modules.append(t7.TorchObject("nn.View", {}))
    for name in ("fc6", "fc7", "embed"):
        modules.append(
            t7.TorchObject(
                "nn.Linear",
                {
                    "weight": np.asarray(params[name]["w"]).T.copy(),
                    "bias": np.asarray(params[name]["b"]),
                },
            )
        )
        modules.append(t7.TorchObject("nn.ReLU", {}))
    seq = t7.TorchObject("nn.Sequential", {"modules": modules})
    # the checkpoint wraps it as {model = {thin_VGGNetEmbed = net}}
    return {"model": {"thin_VGGNetEmbed": seq}}


def test_import_t7_vggembed_mapping(tmp_path):
    from novel_vqa_tpu.core.checkpoint import load_npz, unflatten_like
    from novel_vqa_tpu.train.import_t7 import vision_t7_to_npz

    cfg = vgg.VGGConfig(arch="vggembed", image_size=32, embed_dim=24)
    tree = jax.device_get(vgg.init_params(jax.random.PRNGKey(1), cfg))
    net = _synthetic_vggembed_t7(tree)

    out = str(tmp_path / "vggembed.npz")
    vision_t7_to_npz(net, out, bgr_to_rgb=False, arch="vggembed")
    flat, _ = load_npz(out)
    assert "embed/w" in flat and "fc8/w" not in flat
    back = unflatten_like(tree, flat)
    for a, b in zip(jax.tree_util.tree_leaves(tree), jax.tree_util.tree_leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    x = jnp.asarray(np.random.RandomState(2).randn(1, 32, 32, 3).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(vgg.apply(back, cfg, x, tap="embed")),
        np.asarray(vgg.apply(tree, cfg, x, tap="embed")),
        rtol=1e-6,
    )


@pytest.mark.slow
def test_ef_extraction_store(tmp_path):
    """extract_features --model vggembed --model2 vgg19 writes the 8896-d
    ef store with VGGEmbed columns first (001_prepro_img_ef.lua:99-101)."""
    from PIL import Image

    from novel_vqa_tpu.train import extract_features

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rs = np.random.RandomState(0)
    names = []
    for i in range(8):
        p = f"im{i}.jpg"
        Image.fromarray(rs.randint(0, 255, size=(48, 40, 3), dtype=np.uint8)).save(
            img_dir / p
        )
        names.append(p)
    meta = {"unique_img_train": names, "unique_img_test": names[:4]}
    meta_json = str(tmp_path / "data_prepro.json")
    with open(meta_json, "w") as f:
        json.dump(meta, f)

    out_h5 = str(tmp_path / "data_img_ef.h5")
    extract_features.main(
        [
            "--input_json", meta_json,
            "--image_root", str(img_dir),
            "--model", "vggembed",
            "--model2", "vgg19",
            "--batch_size", "8",
            "--image_size", "32",
            "--out_name", out_h5,
        ]
    )
    with h5py.File(out_h5) as f:
        feats = f["images_train"][()]
        assert feats.shape == (8, 4800 + 4096)
        # VGGEmbed block is a raw Linear output (signed); the VGG-19 fc7
        # block is post-ReLU (non-negative)
        assert (feats[:, :4800] < 0).any()
        assert (feats[:, 4800:] >= 0).all()
        assert f["images_test"][()].shape == (4, 8896)
