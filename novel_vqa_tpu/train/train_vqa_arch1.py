"""Arch1 VQA trainer CLI.

Port of 002_train_vqa_arch1/002_train_baseline.lua (flags :16-50) and its
AE-initialized variants 003_train_ae_based*.lua:
  * ``--init_from`` loads a converted-AE transfer h5 ({lookup^T, encoder,
    [multimodal]}): embedding weight <- lookup minus its last (START) column
    with zero bias, encoder <- flat vector (003_train_ae_based.lua:175-188);
    with a ``multimodal`` entry present and ``--fusion askipb`` the fusion
    projections are AE-initialized and the final Linear is fresh
    (003_train_ae_based_wp.lua:151-160);
  * defaults are the baseline's: bs 500, 2x512 LSTM, rmsprop 3e-4 with
    per-iteration decay 0.99997592083, grad clamp +-10, 150k iters.

TPU-native execution: the whole split lives in HBM, each iteration ships only
the sampled index vector, and fwd/bwd/update run as one jitted step
(models/vqa/arch1.train_step_indexed).

Usage:
  python -m novel_vqa_tpu.train.train_vqa_arch1 \
      --input_img_h5 data_img.h5 --input_ques_h5 data_prepro.h5 \
      --input_json data_prepro.json --checkpoint_path model/
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from novel_vqa_tpu.core.checkpoint import (
    arch1_to_flat,
    ae_transfer_from_h5,
    save_flat_h5,
    save_npz,
)
from novel_vqa_tpu.core.config import parse_config
from novel_vqa_tpu.core.logging import EMA, MetricsLogger
from novel_vqa_tpu.data.vqa import VQAData
from novel_vqa_tpu.models.vqa import arch1


@dataclasses.dataclass
class TrainConfig:
    input_img_h5: str = "data_img.h5"
    input_ques_h5: str = "data_prepro.h5"
    input_json: str = "data_prepro.json"
    learning_rate: float = 3e-4
    decay_factor: float = 0.99997592083  # :78
    batch_size: int = 500
    max_iters: int = 150000
    nhimage: int = 4096
    input_encoding_size: int = 200
    rnn_size: int = 512
    rnn_layer: int = 2
    common_embedding_size: int = 1024
    num_output: int = 1000
    img_norm: int = 1
    # per-part L2 normalization dims for early-fusion features, e.g.
    # "2048,4096" (003_train_ae_based_ef.lua:116-124)
    img_norm_split: str = ""
    save_checkpoint_every: int = 150000
    checkpoint_path: str = "model/"
    seed: int = 123
    init_from: str = ""  # converted-AE transfer h5 (003_train_ae_based.lua)
    # warm restart from a flat h5 checkpoint (the reference's -start_from,
    # e.g. 003_train_ae_based_wp_vgg.lua:198-204); params only
    start_from: str = ""
    # full-state resume (params + optimizer state + iteration) from a
    # train_state .npz written by --save_train_state
    resume: str = ""
    save_train_state: int = 0  # also write train_state.npz at checkpoints
    fusion: str = "axb"  # axb | askipb (wp variant)
    grad_clamp: float = 10.0
    # gradient downweighting of the encoder+embedding blocks
    # (003_train_ae_based_wp.lua:30,:344)
    lr_scale: float = 1.0
    log_every: int = 100
    # >1 runs that many iterations per device dispatch via lax.scan with
    # on-device batch sampling (arch1.train_steps_scan) — the steady-state
    # production path; 1 keeps host-side sampling (exact data.rng stream)
    steps_per_dispatch: int = 1
    # 1 = data-parallel over all attached chips (batch sharded, grads psum
    # over ICI); requires batch_size % n_devices == 0.  Composes with
    # --steps_per_dispatch > 1 (the DP multi-step scan, arch1.make_dp_steps_scan)
    data_parallel: int = 0
    profile_dir: str = ""  # jax.profiler trace output dir ('' = off)
    debug_nans: int = 0  # enable jax_debug_nans for fault localization
    # "bfloat16" = mixed-precision training (bf16 weights/activations, f32
    # accumulation + master weights); default f32 matches the reference
    compute_dtype: str = "float32"


def build_params(opt: TrainConfig, cfg: arch1.Arch1Config):
    params = arch1.init_params(jax.random.PRNGKey(opt.seed), cfg)
    if opt.start_from:
        from novel_vqa_tpu.core.checkpoint import arch1_from_flat, load_flat_h5

        return {
            k: jax.tree_util.tree_map(jnp.asarray, v)
            for k, v in arch1_from_flat(load_flat_h5(opt.start_from), cfg).items()
        }
    if opt.init_from:
        saved = ae_transfer_from_h5(
            opt.init_from, cfg.input_encoding_size, cfg.rnn_size, cfg.rnn_layer
        )
        lookup = saved["lookup"]  # (vocab+1, E)
        assert lookup.shape[0] - 1 == cfg.vocab_size, (
            f"AE vocab {lookup.shape[0] - 1} != question vocab {cfg.vocab_size}"
        )
        params["embedding"] = {
            # drop the last (START) entry, zero bias (003_train_ae_based.lua:177-183)
            "w": jnp.asarray(lookup[:-1]),
            "b": jnp.zeros((cfg.input_encoding_size,), jnp.float32),
        }
        params["encoder"] = [
            {k: jnp.asarray(v) for k, v in layer.items()} for layer in saved["encoder"]
        ]
        if "multimodal" in saved and opt.fusion == "askipb":
            # AE multimodal init for the AskipB projections
            # (003_train_ae_based_wp.lua:151-160); final Linear stays fresh
            from novel_vqa_tpu.core.checkpoint import _linear_from_flat

            mv = np.asarray(saved["multimodal"], np.float32)
            wq, bq, off = _linear_from_flat(
                mv, 0, 2 * cfg.rnn_size * cfg.rnn_layer, cfg.common_embedding_size
            )
            wi, bi, off = _linear_from_flat(
                mv, off, cfg.nhimage, cfg.common_embedding_size
            )
            params["fusion"] = {
                "wq": jnp.asarray(wq),
                "bq": jnp.asarray(bq),
                "wi": jnp.asarray(wi),
                "bi": jnp.asarray(bi),
            }
    return params


def main(argv=None):
    opt = parse_config(TrainConfig, argv, description=__doc__)
    os.makedirs(os.path.join(opt.checkpoint_path, "save"), exist_ok=True)

    split_dims = (
        [int(x) for x in opt.img_norm_split.split(",")] if opt.img_norm_split else None
    )
    data = VQAData(
        opt.input_ques_h5,
        opt.input_img_h5,
        opt.input_json,
        img_norm=bool(opt.img_norm),
        seed=opt.seed,
        img_norm_split_dims=split_dims,
    )
    if opt.compute_dtype not in ("float32", "bfloat16"):
        raise ValueError(f"unknown --compute_dtype {opt.compute_dtype}")
    cfg = arch1.Arch1Config(
        vocab_size=data.vocab_size,
        input_encoding_size=opt.input_encoding_size,
        rnn_size=opt.rnn_size,
        rnn_layer=opt.rnn_layer,
        nhimage=opt.nhimage,
        common_embedding_size=opt.common_embedding_size,
        num_output=opt.num_output,
        fusion=opt.fusion,
        compute_dtype=opt.compute_dtype,
    )
    params = build_params(opt, cfg)
    grad_scales = None
    if opt.lr_scale != 1.0:
        grad_scales = jax.tree_util.tree_map(lambda _: 1.0, params)
        for block in ("embedding", "encoder"):
            grad_scales[block] = jax.tree_util.tree_map(
                lambda _: opt.lr_scale, grad_scales[block]
            )
    tx = arch1.make_optimizer(
        learning_rate=opt.learning_rate,
        decay_factor=opt.decay_factor,
        grad_clamp=opt.grad_clamp,
        grad_scales=grad_scales,
    )
    opt_state = tx.init(params)
    start_iter = 0
    if opt.resume:
        from novel_vqa_tpu.core.checkpoint import load_npz, unflatten_like

        flat, meta = load_npz(opt.resume)
        state_tpl = {"params": jax.device_get(params), "opt_state": jax.device_get(opt_state)}
        restored = unflatten_like(state_tpl, flat)
        params = jax.tree_util.tree_map(jnp.asarray, restored["params"])
        opt_state = jax.tree_util.tree_map(jnp.asarray, restored["opt_state"])
        start_iter = int(meta.get("iter", 0))
        print(f"resumed from {opt.resume} at iteration {start_iter}")

    # ship the whole train split to HBM once
    dev_data = {
        "tokens": jnp.asarray(data.d["question_train"]),
        "image": jnp.asarray(data.d["fv_im_train"]),
        "img_pos": jnp.asarray(data.d["img_pos_train"].astype(np.int32)),
        "answers": jnp.asarray(data.d["answers_train"].astype(np.int32)),
    }

    logger = MetricsLogger(os.path.join(opt.checkpoint_path, "save"))
    ema = EMA(0.95)
    ema_val = EMA(0.95)
    n_train = data.num_examples("train")
    rng_pool = jax.random.PRNGKey(opt.seed)
    pending_losses: list = []

    def validate():
        total, n_batches = 0.0, 0
        for batch in data.iter_split("val", opt.batch_size):
            loss, _ = arch1.eval_step(
                cfg,
                params,
                jnp.asarray(batch.tokens),
                jnp.asarray(batch.image),
                jnp.asarray(batch.labels),
            )
            f = float(loss)
            ema_val.update(f)
            total += f
            n_batches += 1
        return total / max(1, n_batches)

    def save_ckpt(tag: str):
        host_params = jax.device_get(params)
        save_flat_h5(
            os.path.join(opt.checkpoint_path, tag + ".h5"), arch1_to_flat(host_params)
        )
        save_npz(
            os.path.join(opt.checkpoint_path, tag + ".npz"),
            host_params,
            meta={"cfg": cfg._asdict(), "opt": dataclasses.asdict(opt)},
        )
        if opt.save_train_state:
            save_npz(
                os.path.join(opt.checkpoint_path, "train_state.npz"),
                {"params": host_params, "opt_state": jax.device_get(opt_state)},
                meta={"cfg": cfg._asdict(), "iter": it},
            )

    dp_step = dp_scan = repl = None
    if opt.data_parallel:
        from novel_vqa_tpu.parallel import make_mesh, replicated

        mesh = make_mesh()
        n_dev = int(mesh.devices.size)
        assert opt.batch_size % n_dev == 0, (
            f"batch_size {opt.batch_size} not divisible by {n_dev} devices"
        )
        if opt.steps_per_dispatch > 1:
            # the steady-state production path: N iterations per dispatch,
            # on-device sampling, batch sharded over the mesh, grads psum
            dp_scan = arch1.make_dp_steps_scan(
                cfg, tx, mesh, opt.steps_per_dispatch, opt.batch_size
            )
        else:
            dp_step = arch1.make_dp_indexed_step(cfg, tx, mesh)
        repl = replicated(mesh)
        params = jax.device_put(params, repl)
        opt_state = jax.device_put(opt_state, repl)
        dev_data = jax.device_put(dev_data, repl)
        from jax.sharding import NamedSharding, PartitionSpec as P

        qind_sharding = NamedSharding(mesh, P("data"))

    import contextlib

    from novel_vqa_tpu.core.profiling import nan_guard, trace

    chunk = max(1, opt.steps_per_dispatch)
    it = start_iter
    stack = contextlib.ExitStack()
    stack.enter_context(trace(opt.profile_dir or None))
    stack.enter_context(nan_guard(bool(opt.debug_nans)))
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
                params, opt_state, loss = arch1.train_step_indexed(
                    cfg, tx, params, opt_state, dev_data, qinds, step_rng
                )
            pending_losses.append(loss)
            it += 1
        else:
            n_steps = min(chunk, opt.max_iters - it)
            if dp_scan is not None:
                scan = dp_scan
                if n_steps != chunk:  # shorter tail chunk: fresh jit
                    scan = arch1.make_dp_steps_scan(
                        cfg, tx, mesh, n_steps, opt.batch_size
                    )
                params, opt_state, losses = scan(
                    params, opt_state, dev_data, jax.device_put(step_rng, repl)
                )
            else:
                params, opt_state, losses = arch1.train_steps_scan(
                    cfg, tx, params, opt_state, dev_data, n_steps, opt.batch_size,
                    step_rng,
                )
            pending_losses.append(losses)
            it += n_steps
        # defer the device sync: collect loss handles and fold them into the
        # EMA only at log time (exact running_avg semantics,
        # 002_train_baseline.lua:330-334, without a per-step host roundtrip)
        if it % opt.log_every < chunk:
            for arr in jax.device_get(pending_losses):
                for f in np.atleast_1d(arr):
                    ema.update(float(f))
            pending_losses.clear()
            logger.log_train(it, opt.max_iters, ema.value)

    stack.close()
    save_ckpt("lstm")
    logger.close()
    print("done; final checkpoint at", os.path.join(opt.checkpoint_path, "lstm.h5"))


if __name__ == "__main__":
    main()
