"""Weight importers: torchvision .pth state_dicts (VGG + Inception) and the
ordered Inception t7 mapping."""

import jax
import numpy as np
import pytest

from novel_vqa_tpu.models.vision import inception as inc
from novel_vqa_tpu.models.vision import vgg


def make_vgg16_state_dict():
    """Synthetic torchvision-layout vgg16 state_dict (numpy values)."""
    rs = np.random.RandomState(0)
    cfg_channels = [
        (3, 64), (64, 64), (64, 128), (128, 128),
        (128, 256), (256, 256), (256, 256),
        (256, 512), (512, 512), (512, 512),
        (512, 512), (512, 512), (512, 512),
    ]
    feature_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    sd = {}
    for fi, (cin, cout) in zip(feature_idx, cfg_channels):
        sd[f"features.{fi}.weight"] = rs.randn(cout, cin, 3, 3).astype(np.float32)
        sd[f"features.{fi}.bias"] = rs.randn(cout).astype(np.float32)
    dims = [(25088, 4096), (4096, 4096), (4096, 1000)]
    for ci, (i, o) in zip([0, 3, 6], dims):
        sd[f"classifier.{ci}.weight"] = rs.randn(o, i).astype(np.float32)
        sd[f"classifier.{ci}.bias"] = rs.randn(o).astype(np.float32)
    return sd


def test_import_vgg16_pth_layout():
    from novel_vqa_tpu.train.import_pth import import_vgg

    sd = make_vgg16_state_dict()
    flat = import_vgg(sd, "vgg16")
    assert flat["conv/0/w"].shape == (3, 3, 3, 64)  # HWIO
    np.testing.assert_allclose(
        flat["conv/0/w"][:, :, 1, 5],
        sd["features.0.weight"][5, 1],
        rtol=1e-6,
    )
    assert flat["fc6/w"].shape == (25088, 4096)
    np.testing.assert_allclose(
        flat["fc6/w"], sd["classifier.0.weight"].T, rtol=1e-6
    )
    # loads into the model tree and runs
    from novel_vqa_tpu.core.checkpoint import unflatten_like

    cfg = vgg.VGGConfig(arch="vgg16")
    template = jax.device_get(vgg.init_params(jax.random.PRNGKey(0), cfg))
    params = unflatten_like(template, flat)
    import jax.numpy as jnp

    out = vgg.apply(params, cfg, jnp.zeros((1, 224, 224, 3)), tap="fc7")
    assert out.shape == (1, 4096)


def make_inception_state_dict_from_tree(tree):
    """Invert the name mapping: build a torchvision-layout sd from our tree."""
    from novel_vqa_tpu.train.import_pth import _MIXED, _STEM_MAP, _our_branch_to_tv

    sd = {}

    def put(prefix, unit):
        w = np.asarray(unit["conv"]["w"])
        sd[f"{prefix}.conv.weight"] = np.transpose(w, (3, 2, 0, 1)).copy()
        sd[f"{prefix}.bn.weight"] = np.asarray(unit["bn"]["scale"])
        sd[f"{prefix}.bn.bias"] = np.asarray(unit["bn"]["offset"])
        sd[f"{prefix}.bn.running_mean"] = np.asarray(unit["bn"]["mean"])
        sd[f"{prefix}.bn.running_var"] = np.asarray(unit["bn"]["var"])

    for tv_name, ours in _STEM_MAP:
        put(tv_name, tree["stem"][ours])
    for tv_block in _MIXED:
        block = tree[tv_block.replace("Mixed_", "mixed").lower()]
        for key, unit in block.items():
            put(f"{tv_block}.{_our_branch_to_tv(key)}", unit)
    sd["fc.weight"] = np.asarray(tree["fc"]["w"]).T.copy()
    sd["fc.bias"] = np.asarray(tree["fc"]["b"])
    return sd


def test_import_inception_pth_roundtrip():
    from novel_vqa_tpu.train.import_pth import import_inception

    cfg = inc.InceptionConfig()
    src = jax.device_get(inc.init_params(jax.random.PRNGKey(1), cfg))
    sd = make_inception_state_dict_from_tree(src)
    back = import_inception(sd)
    for a, b in zip(
        jax.tree_util.tree_leaves(src), jax.tree_util.tree_leaves(back)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_iter_conv_bn_count_and_t7_mapping():
    from novel_vqa_tpu.core import t7
    from novel_vqa_tpu.train.import_t7 import inception_t7_to_npz

    cfg = inc.InceptionConfig()
    tree = jax.device_get(inc.init_params(jax.random.PRNGKey(2), cfg))
    units = list(inc.iter_conv_bn(tree))
    assert len(units) == 94  # standard v3 conv count (no aux head)

    # synthetic ordered t7 graph mirroring the tree's definition order
    modules = []
    for u in units:
        w = np.asarray(u["conv"]["w"])
        modules.append(
            t7.TorchObject(
                "cudnn.SpatialConvolution",
                {"weight": np.transpose(w, (3, 2, 0, 1)).copy()},
            )
        )
        modules.append(
            t7.TorchObject(
                "nn.SpatialBatchNormalization",
                {
                    "weight": np.asarray(u["bn"]["scale"]),
                    "bias": np.asarray(u["bn"]["offset"]),
                    "running_mean": np.asarray(u["bn"]["mean"]),
                    "running_var": np.asarray(u["bn"]["var"]),
                },
            )
        )
    modules.append(
        t7.TorchObject(
            "nn.Linear",
            {
                "weight": np.asarray(tree["fc"]["w"]).T.copy(),
                "bias": np.asarray(tree["fc"]["b"]),
            },
        )
    )
    net = t7.TorchObject("nn.Sequential", {"modules": modules})

    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "inc.npz")
        inception_t7_to_npz(net, out)
        from novel_vqa_tpu.core.checkpoint import load_npz, unflatten_like

        flat, _ = load_npz(out)
        back = unflatten_like(tree, flat)
    for a, b in zip(
        jax.tree_util.tree_leaves(tree), jax.tree_util.tree_leaves(back)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_torchvision_prepro():
    from novel_vqa_tpu.data.images import torchvision_device_prepro
    import jax.numpy as jnp

    u8 = np.full((1, 2, 2, 3), 255, np.uint8)
    out = np.asarray(torchvision_device_prepro(jnp.asarray(u8), None))
    np.testing.assert_allclose(
        out[0, 0, 0],
        (1.0 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225]),
        rtol=1e-5,
    )
