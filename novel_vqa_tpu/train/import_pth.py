"""PyTorch state_dict (.pth) -> vision trunk .npz importer.

The reference's real VGG weights ship as caffemodel/t7 (handled by
import_t7); in practice torchvision-format state_dicts are the most available
source of VGG-16/19 and Inception-v3 weights, so this tool maps them onto the
framework's trees:

  * vgg16/vgg19: ordered ``features.*.weight`` convs (OIHW -> HWIO) and the
    three ``classifier.*`` Linears -> fc6/fc7/fc8 ((out,in) -> (in,out));
  * inception: torchvision's named blocks (``Conv2d_1a_3x3`` .. ``Mixed_7c``,
    ``branchX.conv/bn``) map 1:1 onto our ``stem.c1..c5`` / ``mixedNx.bX``
    units; BN running stats fold into inference-mode batch_norm. The aux
    head (``AuxLogits``) is dropped.

IMPORTANT prepro note: torchvision weights expect RGB in [0,1] normalized by
mean (0.485, 0.456, 0.406) / std (0.229, 0.224, 0.225) — NOT the reference's
caffe BGR/mean-sub (VGG) or (x-128)/128 (Inception) pipelines.  Pass
``--prepro torchvision`` to extract_features when using weights imported
here; use caffe/t7-sourced weights (import_t7) to reproduce the reference's
exact features.
"""

from __future__ import annotations

import argparse
import re
from typing import Any, Dict

import numpy as np

from novel_vqa_tpu.core.checkpoint import save_npz


def _to_np(v) -> np.ndarray:
    try:
        return np.asarray(v.detach().cpu().numpy(), np.float32)
    except AttributeError:
        return np.asarray(v, np.float32)


def _conv_hwio(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0))).astype(np.float32)


def import_vgg(sd: Dict[str, Any], arch: str) -> Dict[str, np.ndarray]:
    conv_idx = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(r"features\.(\d+)\.weight$", k))
        }
    )
    flat: Dict[str, np.ndarray] = {}
    for i, fi in enumerate(conv_idx):
        flat[f"conv/{i}/w"] = _conv_hwio(_to_np(sd[f"features.{fi}.weight"]))
        flat[f"conv/{i}/b"] = _to_np(sd[f"features.{fi}.bias"])
    cls_idx = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(r"classifier\.(\d+)\.weight$", k))
        }
    )
    assert len(cls_idx) == 3, f"expected 3 classifier Linears, got {cls_idx}"
    for name, ci in zip(("fc6", "fc7", "fc8"), cls_idx):
        flat[f"{name}/w"] = np.ascontiguousarray(_to_np(sd[f"classifier.{ci}.weight"]).T)
        flat[f"{name}/b"] = _to_np(sd[f"classifier.{ci}.bias"])
    expected = {"vgg16": 13, "vgg19": 16}[arch]
    assert len(conv_idx) == expected, (
        f"{arch} expects {expected} convs, state_dict has {len(conv_idx)}"
    )
    return flat


_STEM_MAP = [
    ("Conv2d_1a_3x3", "c1"),
    ("Conv2d_2a_3x3", "c2"),
    ("Conv2d_2b_3x3", "c3"),
    ("Conv2d_3b_1x1", "c4"),
    ("Conv2d_4a_3x3", "c5"),
]
_MIXED = [
    "Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a", "Mixed_6b", "Mixed_6c",
    "Mixed_6d", "Mixed_6e", "Mixed_7a", "Mixed_7b", "Mixed_7c",
]


def _our_branch_to_tv(key: str) -> str:
    # b5x5_1 -> branch5x5_1 ; bpool -> branch_pool
    return "branch_pool" if key == "bpool" else "branch" + key[1:]


def _fill_cbr(unit: Dict[str, Any], sd, prefix: str):
    unit["conv"]["w"] = _conv_hwio(_to_np(sd[f"{prefix}.conv.weight"]))
    unit["bn"] = {
        "scale": _to_np(sd[f"{prefix}.bn.weight"]),
        "offset": _to_np(sd[f"{prefix}.bn.bias"]),
        "mean": _to_np(sd[f"{prefix}.bn.running_mean"]),
        "var": _to_np(sd[f"{prefix}.bn.running_var"]),
    }


def import_inception(sd: Dict[str, Any]):
    import jax

    from novel_vqa_tpu.models.vision import inception as inc

    cfg = inc.InceptionConfig()
    tree = jax.device_get(inc.init_params(jax.random.PRNGKey(0), cfg))
    for tv_name, ours in _STEM_MAP:
        _fill_cbr(tree["stem"][ours], sd, tv_name)
    for tv_block in _MIXED:
        block = tree[tv_block.replace("Mixed_", "mixed").lower()]
        for key, unit in block.items():
            _fill_cbr(unit, sd, f"{tv_block}.{_our_branch_to_tv(key)}")
    if "fc.weight" in sd:
        tree["fc"] = {
            "w": np.ascontiguousarray(_to_np(sd["fc.weight"]).T),
            "b": _to_np(sd["fc.bias"]),
        }
    return tree


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pth", required=True, help="torch state_dict file")
    ap.add_argument("--arch", required=True, choices=["vgg16", "vgg19", "inception"])
    ap.add_argument("--out", required=True, help="output .npz")
    args = ap.parse_args(argv)

    import torch

    sd = torch.load(args.pth, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()

    if args.arch in ("vgg16", "vgg19"):
        flat = import_vgg(sd, args.arch)
        np.savez(args.out, **flat)
    else:
        tree = import_inception(sd)
        save_npz(args.out, tree)
    print("wrote", args.out)
    print(
        "NOTE: torchvision weights expect --prepro torchvision at extraction "
        "time (RGB [0,1], ImageNet mean/std), not the reference caffe pipeline"
    )


if __name__ == "__main__":
    main()
