"""Arch2 VQA test-split inference CLI — port of
003_train_vqa_arch2/004_eval_model{,_baseline}.lua: cnn_projection ->
encoder -> classifier (:245-253), OE argmax + MC argmax-over-choices result
JSON emission (same as arch1's eval tail)."""

from __future__ import annotations

import dataclasses
import json
import os

from novel_vqa_tpu.core.checkpoint import arch2_from_flat, load_flat_h5
from novel_vqa_tpu.core.config import parse_config
from novel_vqa_tpu.data.vqa import VQAData
from novel_vqa_tpu.models.vqa import arch2
from novel_vqa_tpu.models.vqa.predict import host_mc_predict
from novel_vqa_tpu.train.eval_loop import run_full_split


@dataclasses.dataclass
class EvalConfig:
    input_img_h5: str = "data_img.h5"
    input_ques_h5: str = "data_prepro.h5"
    input_json: str = "data_prepro.json"
    model_path: str = "models_vqa/lstm.h5"
    batch_size: int = 500
    input_encoding_size: int = 512
    rnn_size: int = 512
    num_layers: int = 1
    num_output: int = 1000
    img_norm: int = 1
    # per-part L2 dims for early-fusion features (004_eval_model_ef analog)
    img_norm_split: str = ""
    nhimage: int = 4096
    drop_prob_ae: float = 0.5
    out_path: str = "result/"
    result_name: str = "mscoco_val2014_lstm_novel_new_2"
    dump_scores_h5: str = ""  # write raw score vectors (late-fusion input)
    dump_scores_key: str = "Out"
    # batch-sharded DP inference over the attached mesh; global-order
    # assembly identical to the single-device path
    data_parallel: int = 0
    # 1 (default) = HBM-resident split store + device-side batch gather
    # (eval_step_indexed); 0 = stream each batch (see eval_vqa_arch1)
    hbm_resident: int = 1


def main(argv=None):
    opt = parse_config(EvalConfig, argv, description=__doc__)
    os.makedirs(opt.out_path, exist_ok=True)

    data = VQAData(
        opt.input_ques_h5,
        opt.input_img_h5,
        opt.input_json,
        img_norm=bool(opt.img_norm),
        load_test=True,
        align="left",
        img_norm_split_dims=(
            [int(x) for x in opt.img_norm_split.split(",")]
            if opt.img_norm_split
            else None
        ),
    )
    cfg = arch2.Arch2Config(
        vocab_size=data.vocab_size,
        input_encoding_size=opt.input_encoding_size,
        rnn_size=opt.rnn_size,
        num_layers=opt.num_layers,
        nhimage=opt.nhimage,
        num_output=opt.num_output,
        seq_length=data.seq_length,
        dropout=opt.drop_prob_ae,
    )
    params = arch2_from_flat(load_flat_h5(opt.model_path), cfg)

    # shared full-split driver (train/eval_loop.py — see eval_vqa_arch1).
    # --dump_scores_h5 needs the full score matrices on host, so that mode
    # fetches scores (still through the resident store); otherwise only the
    # prediction vectors cross back (device-side argmax).
    need_scores = bool(opt.dump_scores_h5) or not opt.hbm_resident
    pred, mc_pred, scores = run_full_split(
        arch2, cfg, params, data, "test", opt.batch_size,
        hbm_resident=bool(opt.hbm_resident),
        data_parallel=bool(opt.data_parallel),
        want="scores" if need_scores else "predict",
    )
    qids = data.d["question_id_test"]
    if pred is None:
        pred = scores.argmax(axis=1) + 1

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

    if opt.dump_scores_h5:
        import h5py

        with h5py.File(opt.dump_scores_h5, "a") as f:
            key = f"{opt.dump_scores_key}Test"
            if key in f:
                del f[key]
            f.create_dataset(key, dtype="float32", data=scores)
        print("wrote scores to", opt.dump_scores_h5)
    return scores, qids


if __name__ == "__main__":
    main()
