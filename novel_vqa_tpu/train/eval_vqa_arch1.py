"""Arch1 VQA test-split inference CLI — port of
002_train_vqa_arch1/004_eval_model.lua (and its _wp/_ef variants via
``--fusion`` / ``--nhimage`` / ``--img_norm_split``).

Rebuilds the model, loads the flat-parameter checkpoint (h5 interchange for
the reference's ``lstm.t7`` {encoder_w_q, embedding_w_q, multimodal_w},
:149-163), forwards every test question in fixed-size batches, and writes:
  * OpenEnded results: argmax over all answers -> ix_to_ans (:255,:259-260);
  * MultipleChoice results: argmax over the provided non-zero choice indices
    (:258-273).
"""

from __future__ import annotations

import dataclasses
import json
import os

from novel_vqa_tpu.core.checkpoint import arch1_from_flat, load_flat_h5
from novel_vqa_tpu.core.config import parse_config
from novel_vqa_tpu.data.vqa import VQAData
from novel_vqa_tpu.models.vqa import arch1
from novel_vqa_tpu.models.vqa.predict import host_mc_predict
from novel_vqa_tpu.train.eval_loop import run_full_split


@dataclasses.dataclass
class EvalConfig:
    input_img_h5: str = "data_img.h5"
    input_ques_h5: str = "data_prepro.h5"
    input_json: str = "data_prepro.json"
    model_path: str = "model/lstm.h5"
    batch_size: int = 500
    nhimage: int = 4096
    input_encoding_size: int = 200
    rnn_size: int = 512
    rnn_layer: int = 2
    common_embedding_size: int = 1024
    num_output: int = 1000
    img_norm: int = 1
    img_norm_split: str = ""  # e.g. "2048,4096" for early-fusion split norm
    fusion: str = "axb"
    out_path: str = "result/"
    result_name: str = "mscoco_val2014_lstm_novel_new_2"
    seed: int = 123
    # batch-sharded DP inference over the attached mesh (004_eval_model.lua's
    # full-split forward is embarrassingly parallel); results are assembled
    # in global order exactly as the single-device path
    data_parallel: int = 0
    # 1 (default) = upload the test split ONCE and gather batches on device
    # (eval_step_indexed — the reference likewise holds the full fv_im store
    # resident for the pass); 0 = stream each batch host->device (for stores
    # larger than device memory)
    hbm_resident: int = 1


def main(argv=None):
    opt = parse_config(EvalConfig, argv, description=__doc__)
    os.makedirs(opt.out_path, exist_ok=True)

    split_dims = (
        [int(x) for x in opt.img_norm_split.split(",")] if opt.img_norm_split else None
    )
    data = VQAData(
        opt.input_ques_h5,
        opt.input_img_h5,
        opt.input_json,
        img_norm=bool(opt.img_norm),
        load_test=True,
        img_norm_split_dims=split_dims,
    )
    cfg = arch1.Arch1Config(
        vocab_size=data.vocab_size,
        input_encoding_size=opt.input_encoding_size,
        rnn_size=opt.rnn_size,
        rnn_layer=opt.rnn_layer,
        nhimage=opt.nhimage,
        common_embedding_size=opt.common_embedding_size,
        num_output=opt.num_output,
        fusion=opt.fusion,
    )
    params = arch1_from_flat(load_flat_h5(opt.model_path), cfg)

    # shared full-split driver (train/eval_loop.py): default is the
    # single-dispatch HBM-resident scan + device-side OE/MC argmax
    # (611 s serialized -> 60-118 s at novel_v2 scale, docs/PERF.md);
    # --data_parallel shards the per-batch index vector; --hbm_resident 0
    # streams each batch (scores come back, argmax on host)
    pred, mc_pred, scores = run_full_split(
        arch1, cfg, params, data, "test", opt.batch_size,
        hbm_resident=bool(opt.hbm_resident),
        data_parallel=bool(opt.data_parallel),
        want="predict" if opt.hbm_resident else "scores",
    )
    qids = data.d["question_id_test"]
    if pred is None:
        pred = scores.argmax(axis=1) + 1  # 1-indexed answer ids

    ix_to_ans = data.ix_to_ans
    oe = [
        {"question_id": int(q), "answer": ix_to_ans[str(int(p))]}
        for q, p in zip(qids, pred)
    ]
    oe_path = os.path.join(opt.out_path, f"OpenEnded_{opt.result_name}_results.json")
    with open(oe_path, "w") as f:
        json.dump(oe, f)
    print("wrote", oe_path)

    mc_ans = data.d.get("mc_ans_test")
    if mc_ans is not None:
        if mc_pred is None:  # streaming path: argmax-over-choices on host
            mc_pred = host_mc_predict(scores, mc_ans, pred)
        mc = [
            {"question_id": int(q), "answer": ix_to_ans[str(int(p))]}
            for q, p in zip(qids, mc_pred)
        ]
        mc_path = os.path.join(
            opt.out_path, f"MultipleChoice_{opt.result_name}_results.json"
        )
        with open(mc_path, "w") as f:
            json.dump(mc, f)
        print("wrote", mc_path)

    # raw score vectors for late-fusion ensembling are produced by
    # lf_ensemble compute (003_compute_lf_answers.lua analog); the indexed
    # path here never materializes them on host (scores is None then)
    return scores, qids


if __name__ == "__main__":
    main()
