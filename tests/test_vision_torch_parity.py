"""End-to-end numerical parity of the vision nets against PyTorch-CPU
(VERDICT round-1 item 3).

The jax VGG-16 and Inception-v3 forwards are evaluated from the SAME weights
in an independent backend (torch.nn.functional conv/pool/batch_norm on CPU)
and compared at every tap.  This pins the semantics that topology/shape tests
cannot: conv padding, maxpool/avgpool window accounting (incl.
count_include_pad=False on the SAME-padded 3x3 averages), the caffe-CHW fc6
flatten, post-ReLU tap placement, and the inference-mode BN eps=1e-3 math.

Reference taps being protected: fc7 = loadcaffe module 38
(/root/reference/002_train_vqa_arch1/001_prepro_img_vgg.lua:101-113), and the
Inception pre-logits 2048-d pool
(/root/reference/002_train_vqa_arch1/001_prepro_img_inc.lua:34).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from novel_vqa_tpu.models.vision import inception as inc  # noqa: E402
from novel_vqa_tpu.models.vision import vgg  # noqa: E402


def _t(x):
    return torch.from_numpy(np.array(x, np.float32, copy=True))


def _conv_oihw(w):
    # jax HWIO -> torch OIHW
    return _t(np.transpose(np.asarray(w), (3, 2, 0, 1)).copy())


def _rel_close(a, b, tol=1e-4):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    denom = max(np.abs(a).max(), np.abs(b).max(), 1e-6)
    rel = np.abs(a - b).max() / denom
    assert rel < tol, f"max relative deviation {rel:.3e} >= {tol}"


# ---------------------------------------------------------------- VGG


def _torch_vgg_forward(params, x_nhwc, arch, tap):
    """Independent torch evaluation of the VGG graph from jax params."""
    blocks = {"vgg16": [2, 2, 3, 3, 3], "vgg19": [2, 2, 4, 4, 4]}[arch]
    x = _t(x_nhwc).permute(0, 3, 1, 2)  # NCHW
    ci = 0
    for n in blocks:
        for _ in range(n):
            p = params["conv"][ci]
            x = F.relu(F.conv2d(x, _conv_oihw(p["w"]), _t(p["b"]), padding=1))
            ci += 1
        x = F.max_pool2d(x, 2)
    if tap == "pool5":
        return x.permute(0, 2, 3, 1).numpy()
    x = x.reshape(x.shape[0], -1)  # torch-native CHW flatten == caffe order
    x = F.relu(F.linear(x, _t(params["fc6"]["w"]).T, _t(params["fc6"]["b"])))
    if tap == "fc6":
        return x.numpy()
    x = F.relu(F.linear(x, _t(params["fc7"]["w"]).T, _t(params["fc7"]["b"])))
    if tap == "fc7":
        return x.numpy()
    return F.linear(x, _t(params["fc8"]["w"]).T, _t(params["fc8"]["b"])).numpy()


@pytest.mark.parametrize("tap", ["pool5", "fc7", "fc8"])
def test_vgg16_matches_torch(tap):
    cfg = vgg.VGGConfig(arch="vgg16", image_size=64)  # 2x2x512 pool5
    params = jax.device_get(vgg.init_params(jax.random.PRNGKey(0), cfg))
    rs = np.random.RandomState(1)
    # VGG-range inputs: BGR mean-subtracted, roughly [-124, 151]
    x = rs.uniform(-120.0, 150.0, size=(2, 64, 64, 3)).astype(np.float32)

    ours = np.asarray(vgg.apply(params, cfg, jnp.asarray(x), tap=tap))
    theirs = _torch_vgg_forward(params, x, "vgg16", tap)
    _rel_close(ours, theirs, 2e-4)


@pytest.mark.slow
def test_vgg16_matches_torch_full_res_fc7():
    """Full 224x224 — the exact extraction workload incl. the 7x7x512 CHW
    flatten into fc6."""
    cfg = vgg.VGGConfig(arch="vgg16")
    params = jax.device_get(vgg.init_params(jax.random.PRNGKey(0), cfg))
    rs = np.random.RandomState(2)
    x = rs.uniform(-120.0, 150.0, size=(1, 224, 224, 3)).astype(np.float32)
    ours = np.asarray(vgg.apply(params, cfg, jnp.asarray(x), tap="fc7"))
    theirs = _torch_vgg_forward(params, x, "vgg16", "fc7")
    _rel_close(ours, theirs, 2e-4)


def test_vgg19_matches_torch():
    cfg = vgg.VGGConfig(arch="vgg19", image_size=64)
    params = jax.device_get(vgg.init_params(jax.random.PRNGKey(3), cfg))
    rs = np.random.RandomState(4)
    x = rs.uniform(-120.0, 150.0, size=(1, 64, 64, 3)).astype(np.float32)
    ours = np.asarray(vgg.apply(params, cfg, jnp.asarray(x), tap="fc7"))
    theirs = _torch_vgg_forward(params, x, "vgg19", "fc7")
    _rel_close(ours, theirs, 2e-4)


# ---------------------------------------------------------------- Inception


def _cbr_t(u, x, stride=1, padding="same"):
    y = F.conv2d(x, _conv_oihw(u["conv"]["w"]), stride=stride,
                 padding=0 if padding == "valid" else padding)
    bn = u["bn"]
    y = F.batch_norm(
        y, _t(bn["mean"]), _t(bn["var"]), _t(bn["scale"]), _t(bn["offset"]),
        training=False, eps=1e-3,
    )
    return F.relu(y)


def _avg3(x):
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


def _torch_inception_forward(p, x_nhwc, tap):
    x = _t(x_nhwc).permute(0, 3, 1, 2)
    s = p["stem"]
    x = _cbr_t(s["c1"], x, stride=2, padding="valid")
    x = _cbr_t(s["c2"], x, padding="valid")
    x = _cbr_t(s["c3"], x)
    x = F.max_pool2d(x, 3, 2)
    x = _cbr_t(s["c4"], x, padding="valid")
    x = _cbr_t(s["c5"], x, padding="valid")
    x = F.max_pool2d(x, 3, 2)

    def block_a(p, x):
        b1 = _cbr_t(p["b1x1"], x)
        b5 = _cbr_t(p["b5x5_2"], _cbr_t(p["b5x5_1"], x))
        b3 = _cbr_t(p["b3x3dbl_3"], _cbr_t(p["b3x3dbl_2"], _cbr_t(p["b3x3dbl_1"], x)))
        bp = _cbr_t(p["bpool"], _avg3(x))
        return torch.cat([b1, b5, b3, bp], 1)

    def block_b(p, x):
        b3 = _cbr_t(p["b3x3"], x, stride=2, padding="valid")
        bd = _cbr_t(p["b3x3dbl_2"], _cbr_t(p["b3x3dbl_1"], x))
        bd = _cbr_t(p["b3x3dbl_3"], bd, stride=2, padding="valid")
        return torch.cat([b3, bd, F.max_pool2d(x, 3, 2)], 1)

    def block_c(p, x):
        b1 = _cbr_t(p["b1x1"], x)
        b7 = _cbr_t(p["b7x7_3"], _cbr_t(p["b7x7_2"], _cbr_t(p["b7x7_1"], x)))
        bd = _cbr_t(p["b7x7dbl_1"], x)
        for name in ("b7x7dbl_2", "b7x7dbl_3", "b7x7dbl_4", "b7x7dbl_5"):
            bd = _cbr_t(p[name], bd)
        bp = _cbr_t(p["bpool"], _avg3(x))
        return torch.cat([b1, b7, bd, bp], 1)

    def block_d(p, x):
        b3 = _cbr_t(p["b3x3_2"], _cbr_t(p["b3x3_1"], x), stride=2, padding="valid")
        b7 = _cbr_t(p["b7x7x3_3"], _cbr_t(p["b7x7x3_2"], _cbr_t(p["b7x7x3_1"], x)))
        b7 = _cbr_t(p["b7x7x3_4"], b7, stride=2, padding="valid")
        return torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)

    def block_e(p, x):
        b1 = _cbr_t(p["b1x1"], x)
        b3 = _cbr_t(p["b3x3_1"], x)
        b3 = torch.cat([_cbr_t(p["b3x3_2a"], b3), _cbr_t(p["b3x3_2b"], b3)], 1)
        bd = _cbr_t(p["b3x3dbl_2"], _cbr_t(p["b3x3dbl_1"], x))
        bd = torch.cat([_cbr_t(p["b3x3dbl_3a"], bd), _cbr_t(p["b3x3dbl_3b"], bd)], 1)
        bp = _cbr_t(p["bpool"], _avg3(x))
        return torch.cat([b1, b3, bd, bp], 1)

    for name in ("mixed5b", "mixed5c", "mixed5d"):
        x = block_a(p[name], x)
    x = block_b(p["mixed6a"], x)
    for name in ("mixed6b", "mixed6c", "mixed6d", "mixed6e"):
        x = block_c(p[name], x)
    x = block_d(p["mixed7a"], x)
    for name in ("mixed7b", "mixed7c"):
        x = block_e(p[name], x)
    x = x.mean(dim=(2, 3))
    if tap == "pool":
        return x.numpy()
    return F.linear(x, _t(p["fc"]["w"]).T, _t(p["fc"]["b"])).numpy()


def _randomize_bn(params, seed):
    """Give BN units non-trivial running stats so the eps/var math is
    actually exercised (fresh init has mean=0, var=1 which would hide a
    wrong eps or a scale/offset swap)."""
    rs = np.random.RandomState(seed)
    for unit in inc.iter_conv_bn(params):
        c = unit["bn"]["mean"].shape[0]
        unit["bn"]["mean"] = rs.randn(c).astype(np.float32) * 0.2
        unit["bn"]["var"] = (0.5 + rs.rand(c).astype(np.float32)) ** 2
        unit["bn"]["scale"] = 1.0 + 0.2 * rs.randn(c).astype(np.float32)
        unit["bn"]["offset"] = 0.1 * rs.randn(c).astype(np.float32)
    return params


@pytest.mark.slow
def test_inception_v3_matches_torch():
    cfg = inc.InceptionConfig()
    params = jax.device_get(inc.init_params(jax.random.PRNGKey(5), cfg))
    params = _randomize_bn(params, 6)
    rs = np.random.RandomState(7)
    # inception-range inputs: (x*255-128)*0.0078125 in [-1, 1)
    x = rs.uniform(-1.0, 1.0, size=(1, 299, 299, 3)).astype(np.float32)

    ours_pool = np.asarray(inc.apply(params, cfg, jnp.asarray(x), tap="pool"))
    theirs_pool = _torch_inception_forward(params, x, "pool")
    _rel_close(ours_pool, theirs_pool, 5e-4)

    ours_log = np.asarray(inc.apply(params, cfg, jnp.asarray(x), tap="logits"))
    theirs_log = _torch_inception_forward(params, x, "logits")
    _rel_close(ours_log, theirs_log, 5e-4)


def test_inception_stem_matches_torch():
    """Fast non-slow guard on the stem (stride-2 VALID convs + maxpools) at a
    reduced resolution."""
    cfg = inc.InceptionConfig()
    params = jax.device_get(inc.init_params(jax.random.PRNGKey(8), cfg))
    params = _randomize_bn(params, 9)
    rs = np.random.RandomState(10)
    x = rs.uniform(-1.0, 1.0, size=(2, 147, 147, 3)).astype(np.float32)

    def jax_stem(p, images):
        s = p["stem"]
        y = inc._cbr(s["c1"], images, stride=(2, 2), padding="VALID")
        y = inc._cbr(s["c2"], y, padding="VALID")
        y = inc._cbr(s["c3"], y)
        y = inc.max_pool(y, 3, 2, "VALID")
        y = inc._cbr(s["c4"], y, padding="VALID")
        y = inc._cbr(s["c5"], y, padding="VALID")
        return inc.max_pool(y, 3, 2, "VALID")

    ours = np.asarray(jax_stem(params, jnp.asarray(x)))

    xt = _t(x).permute(0, 3, 1, 2)
    s = params["stem"]
    y = _cbr_t(s["c1"], xt, stride=2, padding="valid")
    y = _cbr_t(s["c2"], y, padding="valid")
    y = _cbr_t(s["c3"], y)
    y = F.max_pool2d(y, 3, 2)
    y = _cbr_t(s["c4"], y, padding="valid")
    y = _cbr_t(s["c5"], y, padding="valid")
    y = F.max_pool2d(y, 3, 2)
    theirs = y.permute(0, 2, 3, 1).numpy()
    _rel_close(ours, theirs, 2e-4)
