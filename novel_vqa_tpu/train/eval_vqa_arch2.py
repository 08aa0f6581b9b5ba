"""Arch2 VQA test-split inference CLI — port of
003_train_vqa_arch2/004_eval_model{,_baseline}.lua: cnn_projection ->
encoder -> classifier (:245-253), OE argmax + MC argmax-over-choices result
JSON emission (same as arch1's eval tail)."""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from novel_vqa_tpu.core.checkpoint import arch2_from_flat, load_flat_h5
from novel_vqa_tpu.core.config import parse_config
from novel_vqa_tpu.data.vqa import VQAData
from novel_vqa_tpu.models.vqa import arch2
from novel_vqa_tpu.parallel.dp import (
    DeferredFetch,
    make_eval_forward as _make_eval_forward,
    make_eval_forward_indexed,
)


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

    # deep-pipelined forward with deferred fetches; HBM-resident split store
    # by default (see eval_vqa_arch1).  --dump_scores_h5 needs the full
    # score matrices on host, so that mode fetches scores (still through the
    # resident store); otherwise only the two (B,) prediction vectors cross
    # back per batch (device-side argmax).
    need_scores = bool(opt.dump_scores_h5)
    fetch = DeferredFetch()
    mc_pred = None
    if opt.hbm_resident and not opt.data_parallel:
        # whole split as ONE dispatch (see eval_vqa_arch1 /
        # arch1.eval_predict_scan); with --dump_scores_h5 the score matrices
        # come back in one bulk fetch instead (eval_scores_scan)
        store = jax.tree_util.tree_map(jnp.asarray, data.split_store("test"))
        n = data.num_examples("test")
        n_batches = -(-n // opt.batch_size)
        qids = data.d["question_id_test"]
        if need_scores:
            from novel_vqa_tpu.parallel.dp import fetch_chunked

            _, scores_m = arch2.eval_scores_scan(cfg, params, store,
                                                 n_batches, opt.batch_size)
            # chunked fetch — the one-shot np.asarray of a ~0.5 GB score
            # block measures ~1.5 MB/s through the tunnel (fetch_chunked)
            scores_m = fetch_chunked(scores_m)
            scores = scores_m.reshape(-1, scores_m.shape[-1])[:n]
            pred = scores.argmax(axis=1) + 1
        else:
            _, pred_m, mc_m = arch2.eval_predict_scan(cfg, params, store,
                                                      n_batches,
                                                      opt.batch_size)
            pred = np.asarray(pred_m).reshape(-1)[:n].astype(np.int64)
            mc_pred = np.asarray(mc_m).reshape(-1)[:n].astype(np.int64)
            scores = None
    elif opt.hbm_resident:
        fn = arch2.eval_step_indexed if need_scores else arch2.eval_predict_indexed
        step = make_eval_forward_indexed(fn, cfg, opt.batch_size,
                                         bool(opt.data_parallel))
        store = jax.tree_util.tree_map(jnp.asarray, data.split_store("test"))
        qid_all = data.d["question_id_test"]
        n = data.num_examples("test")
        for start in range(0, n, opt.batch_size):
            real = min(n, start + opt.batch_size) - start
            idx = np.arange(start, start + opt.batch_size, dtype=np.int32)
            if real < opt.batch_size:
                idx[real:] = 0
            out = step(params, store, jnp.asarray(idx))
            payload = out[1] if need_scores else jnp.stack([out[1], out[2]])
            fetch.put(payload, qid_all[start : start + real])
        res = fetch.results()
        qids = np.concatenate([q for _, q in res])
        if need_scores:
            scores = np.concatenate([s[: len(q)] for s, q in res])
            pred = scores.argmax(axis=1) + 1
        else:
            scores = None
            pred = np.concatenate([r[0][: len(q)] for r, q in res]).astype(np.int64)
            mc_pred = np.concatenate([r[1][: len(q)] for r, q in res]).astype(np.int64)
    else:
        step = _make_eval_forward(arch2.eval_step, cfg, opt.batch_size,
                                  bool(opt.data_parallel))
        for batch in data.iter_split("test", opt.batch_size, pad_to_batch=True):
            _, scores = step(
                params,
                jnp.asarray(batch.tokens),
                jnp.asarray(batch.image),
                jnp.asarray(batch.labels),
            )
            fetch.put(scores, batch.question_id)
        scores = np.concatenate([s[: len(q)] for s, q in fetch.results()])
        qids = np.concatenate([q for _, q in fetch.results()])
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
        if mc_pred is not None:
            mc = [
                {"question_id": int(q), "answer": ix_to_ans[str(int(p))]}
                for q, p in zip(qids, mc_pred)
            ]
        else:
            mc = []
            for i in range(len(qids)):
                choices = mc_ans[i]
                valid = choices[choices != 0].astype(np.int64)
                best = (
                    int(valid[np.argmax(scores[i, valid - 1])])
                    if valid.size
                    else int(pred[i])
                )
                mc.append(
                    {"question_id": int(qids[i]), "answer": ix_to_ans[str(best)]}
                )
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
