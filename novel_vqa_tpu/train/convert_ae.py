"""AE checkpoint -> VQA-init transfer dump.

Port of the reference converters:
  * 001_train_autoencoder/002_convert_text_model_arch1.lua:27-39 (+ _as_h5
    variant :39-42): extract {lookup (transposed), encoder (flat)} from a
    text-AE checkpoint;
  * 005_convert_weakpaired_model_arch1.lua:28-43: additionally extract the
    multimodal flat vector from a weak-paired AE.

Reads the native .npz AE checkpoint written by train_text_ae.py /
train_weakpaired_ae.py and writes the interchange h5 consumed by
``--init_from`` of the VQA trainers (same layout the reference's Lua h5
export produces, so reference-side conversions load too).

Usage:
  python -m novel_vqa_tpu.train.convert_ae --ae_model model_id.npz --out converted.h5
"""

from __future__ import annotations

import dataclasses

import numpy as np

from novel_vqa_tpu.core.checkpoint import (
    _linear_to_flat,
    ae_transfer_to_h5,
    load_npz,
)
from novel_vqa_tpu.core.config import parse_config


@dataclasses.dataclass
class ConvertConfig:
    ae_model: str = ""  # .npz AE checkpoint
    out: str = "converted.h5"
    include_multimodal: int = 0  # 1 for weak-paired (005_convert_...)


def main(argv=None):
    opt = parse_config(ConvertConfig, argv, description=__doc__)
    flat, meta = load_npz(opt.ae_model)
    if "lookup" not in flat and any(k.startswith("ae/") for k in flat):
        # weak-paired checkpoints store {"ae": ..., "cnn": ...}
        flat = {k[3:]: v for k, v in flat.items() if k.startswith("ae/")}

    lookup = flat["lookup"]
    num_layers = len(
        {k.split("/")[1] for k in flat if k.startswith("encoder/")}
    )
    encoder_layers = [
        {p: flat[f"encoder/{i}/{p}"] for p in ("wx", "bx", "wh", "bh")}
        for i in range(num_layers)
    ]
    multimodal = None
    if opt.include_multimodal:
        mm = {k.split("/")[-1]: v for k, v in flat.items() if k.startswith("multimodal/")}
        multimodal = np.concatenate(
            _linear_to_flat(mm["wq"], mm["bq"]) + _linear_to_flat(mm["wi"], mm["bi"])
        ).astype(np.float32)

    ae_transfer_to_h5(opt.out, lookup, encoder_layers, multimodal_flat=multimodal)
    print("wrote", opt.out)


if __name__ == "__main__":
    main()
