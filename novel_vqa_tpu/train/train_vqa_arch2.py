"""Arch2 VQA trainer CLI.

Port of 003_train_vqa_arch2/002_train_baseline.lua (flags :26-52) and the
AE-based variants 003_train_ae_based{,_wp_vgg,_wp_inc}.lua:
  * ``--init_from`` (AE .npz checkpoint from train_text_ae --variant arch2, or
    a weak-paired AE): the pre-trained encoder + lookup are cloned into the
    ``nn.Encoder`` equivalent (003_train_ae_based.lua:150-152); the
    cnn_projection is fresh unless ``--cnn_proj_init`` supplies the
    weak-paired CNN checkpoint's post-L2Normalize Linear
    (003_train_ae_based_wp_vgg.lua:174-176);
  * ``--start_from`` resumes flat-parameter h5 checkpoints
    (wp_vgg :198-204);
  * rmsprop with weightDecay 1e-4, grad clamp +-10, bs 500.

Questions stay LEFT-aligned (arch2 never right-aligns).  Execution is the
HBM-resident indexed train step.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from novel_vqa_tpu.core.checkpoint import (
    arch2_from_flat,
    arch2_to_flat,
    load_flat_h5,
    load_npz,
    save_flat_h5,
    save_npz,
)
from novel_vqa_tpu.core.config import parse_config
from novel_vqa_tpu.core.logging import EMA, MetricsLogger
from novel_vqa_tpu.data.vqa import VQAData
from novel_vqa_tpu.models.vqa import arch2


@dataclasses.dataclass
class TrainConfig:
    input_img_h5: str = "data_img.h5"
    input_ques_h5: str = "data_prepro.h5"
    input_json: str = "data_prepro.json"
    drop_prob_ae: float = 0.5
    learning_rate: float = 3e-4
    batch_size: int = 500
    max_iters: int = 150000
    input_encoding_size: int = 512
    rnn_size: int = 512
    num_layers: int = 1
    num_output: int = 1000
    img_norm: int = 1
    # per-part L2 dims for early-fusion features (004_eval_model_ef analog)
    img_norm_split: str = ""
    nhimage: int = 4096
    save_checkpoint_every: int = 25000
    checkpoint_path: str = "models_vqa/"
    seed: int = 123
    profile_dir: str = ""  # jax.profiler trace output dir ('' = off)
    debug_nans: int = 0
    weight_decay: float = 1e-4
    grad_clamp: float = 10.0
    init_from: str = ""  # AE .npz checkpoint (arch2 or null variant)
    cnn_proj_init: str = ""  # npz with cnn_proj/{w,b} (wp CNN Linear)
    start_from: str = ""  # flat h5 resume
    log_every: int = 100
    # >1 runs that many iterations per dispatch via lax.scan with on-device
    # batch sampling (arch2.train_steps_scan)
    steps_per_dispatch: int = 1
    # 1 = data-parallel over all attached chips (batch sharded, grads psum
    # over ICI); requires batch_size % n_devices == 0.  Composes with
    # --steps_per_dispatch > 1 (the DP multi-step scan, arch2.make_dp_steps_scan)
    data_parallel: int = 0


def build_params(opt: TrainConfig, cfg: arch2.Arch2Config):
    params = arch2.init_params(jax.random.PRNGKey(opt.seed), cfg)
    if opt.start_from:
        return {
            k: jax.device_put(v)
            for k, v in arch2_from_flat(load_flat_h5(opt.start_from), cfg).items()
        }
    if opt.init_from:
        flat, meta = load_npz(opt.init_from)
        num_layers = len({k.split("/")[1] for k in flat if k.startswith("encoder/")})
        assert num_layers == cfg.num_layers, (num_layers, cfg.num_layers)
        params["lookup"] = jnp.asarray(flat["lookup"])
        params["encoder"] = [
            {p: jnp.asarray(flat[f"encoder/{i}/{p}"]) for p in ("wx", "bx", "wh", "bh")}
            for i in range(num_layers)
        ]
    if opt.cnn_proj_init:
        flat, _ = load_npz(opt.cnn_proj_init)
        params["cnn_proj"] = {
            "w": jnp.asarray(flat["cnn_proj/w"]),
            "b": jnp.asarray(flat["cnn_proj/b"]),
        }
    return params


def main(argv=None):
    opt = parse_config(TrainConfig, argv, description=__doc__)
    os.makedirs(os.path.join(opt.checkpoint_path, "save"), exist_ok=True)

    data = VQAData(
        opt.input_ques_h5,
        opt.input_img_h5,
        opt.input_json,
        img_norm=bool(opt.img_norm),
        seed=opt.seed,
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
    params = build_params(opt, cfg)
    tx = arch2.make_optimizer(
        learning_rate=opt.learning_rate,
        weight_decay=opt.weight_decay,
        grad_clamp=opt.grad_clamp,
    )
    opt_state = tx.init(params)

    dev_data = {
        "tokens": jnp.asarray(data.d["question_train"]),
        "image": jnp.asarray(data.d["fv_im_train"]),
        "img_pos": jnp.asarray(data.d["img_pos_train"].astype(np.int32)),
        "answers": jnp.asarray(data.d["answers_train"].astype(np.int32)),
    }

    logger = MetricsLogger(os.path.join(opt.checkpoint_path, "save"))
    ema, ema_val = EMA(0.95), EMA(0.95)
    n_train = data.num_examples("train")
    rng_pool = jax.random.PRNGKey(opt.seed)
    pending = []

    def validate():
        total, n_batches = 0.0, 0
        for batch in data.iter_split("val", opt.batch_size):
            loss, _ = arch2.eval_step(
                cfg,
                params,
                jnp.asarray(batch.tokens),
                jnp.asarray(batch.image),
                jnp.asarray(batch.labels),
            )
            ema_val.update(float(loss))
            total += float(loss)
            n_batches += 1
        return total / max(1, n_batches)

    def save_ckpt(tag):
        host = jax.device_get(params)
        save_flat_h5(os.path.join(opt.checkpoint_path, tag + ".h5"), arch2_to_flat(host))
        save_npz(
            os.path.join(opt.checkpoint_path, tag + ".npz"),
            host,
            meta={"cfg": cfg._asdict(), "opt": dataclasses.asdict(opt)},
        )

    dp_step = dp_scan = repl = mesh = None
    if opt.data_parallel:
        from novel_vqa_tpu.parallel import make_mesh, replicated

        mesh = make_mesh()
        n_dev = int(mesh.devices.size)
        assert opt.batch_size % n_dev == 0, (
            f"batch_size {opt.batch_size} not divisible by {n_dev} devices"
        )
        if opt.steps_per_dispatch > 1:
            dp_scan = arch2.make_dp_steps_scan(
                cfg, tx, mesh, opt.steps_per_dispatch, opt.batch_size
            )
        else:
            dp_step = arch2.make_dp_indexed_step(cfg, tx, mesh)
        repl = replicated(mesh)
        params = jax.device_put(params, repl)
        opt_state = jax.device_put(opt_state, repl)
        dev_data = jax.device_put(dev_data, repl)
        from jax.sharding import NamedSharding, PartitionSpec as P

        qind_sharding = NamedSharding(mesh, P("data"))

    chunk = max(1, opt.steps_per_dispatch)
    it = 0

    import contextlib

    from novel_vqa_tpu.core.profiling import nan_guard, trace

    _stack = contextlib.ExitStack()
    _stack.enter_context(trace(opt.profile_dir or None))
    _stack.enter_context(nan_guard(bool(opt.debug_nans)))
    while it < opt.max_iters:
        if (it + 1) % opt.save_checkpoint_every <= chunk - 1 or it == 0:
            loss_val = validate()
            logger.log_val(it + 1, opt.max_iters, loss_val, ema_val.value)
            save_ckpt(os.path.join("save", f"lstm_save_iter{it + 1}"))
        rng_pool, step_rng = jax.random.split(rng_pool)
        if chunk == 1:
            qinds = jnp.asarray(
                data.rng.integers(0, n_train, opt.batch_size), jnp.int32
            )
            if dp_step is not None:
                qinds = jax.device_put(qinds, qind_sharding)
                params, opt_state, loss = dp_step(
                    params, opt_state, dev_data, qinds, step_rng
                )
            else:
                params, opt_state, loss = arch2.train_step_indexed(
                    cfg, tx, params, opt_state, dev_data, qinds, step_rng
                )
            pending.append(loss)
            it += 1
        else:
            n_steps = min(chunk, opt.max_iters - it)
            if dp_scan is not None:
                scan = dp_scan
                if n_steps != chunk:  # shorter tail chunk: fresh jit
                    scan = arch2.make_dp_steps_scan(
                        cfg, tx, mesh, n_steps, opt.batch_size
                    )
                params, opt_state, losses = scan(
                    params, opt_state, dev_data, jax.device_put(step_rng, repl)
                )
            else:
                params, opt_state, losses = arch2.train_steps_scan(
                    cfg, tx, params, opt_state, dev_data, n_steps, opt.batch_size,
                    step_rng,
                )
            pending.append(losses)
            it += n_steps
        if it % opt.log_every < chunk:
            for arr in jax.device_get(pending):
                for f in np.atleast_1d(arr):
                    ema.update(float(f))
            pending.clear()
            logger.log_train(it, opt.max_iters, ema.value)

    save_ckpt("lstm")
    logger.close()
    print("done; final checkpoint at", os.path.join(opt.checkpoint_path, "lstm.h5"))


if __name__ == "__main__":
    main()
