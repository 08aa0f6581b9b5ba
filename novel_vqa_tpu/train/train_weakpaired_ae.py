"""Weak-paired autoencoder trainer CLI (joint CNN + AE).

Port of 001_train_autoencoder/004_train_arch{1,2}_weakpaired_autoencoder_{vgg,inc}.lua:
  * ``--variant vqa_arch`` (arch1): AutoEncoder_vqa — text encoder + AxB
    multimodal skip fusion seeding the decoder; with probability 0.5 the batch
    runs the encoder-skip path feeding the precomputed mean LSTM sentence
    vector (``--lstm_average_path`` h5 ``/mean_vector``,
    004_train_arch1_...vgg.lua:296-310); CNN = build_cnn_2 (VGG fc7 ->
    L2Normalize, no projection, misc/net_utils.lua:46-81);
  * ``--variant null`` (arch2): AutoEncoderNull — with probability
    ``--rand_val`` the encoder's sentence input is zeroed while the criterion
    targets the true sequence (004_train_arch2_...vgg.lua:289-295); CNN =
    build_cnn (VGG fc7 -> L2Normalize -> Linear(4096 -> encoding_size),
    net_utils.lua:5-44);
  * ``--cnn_arch inception`` swaps the trunk for Inception-v3 (2048-d pool,
    nhimage 2048, 004_train_arch1_...inc.lua);
  * ``--start_from_text`` clones encoder/decoder/lookup(/multimodal) from a
    text-AE checkpoint (:143-153);
  * separate CNN optimizer with per-parameter lr scales and
    ``--finetune_cnn_after`` gating (:329-331, :477-487); AE-side clamp +
    weight decay; loss-explosion watchdog; best-checkpoint gating on
    -val_loss.

The AE step (CNN fwd -> AE fwd/bwd -> both updates) is ONE jitted program;
the CNN branch is compiled twice (finetune on/off) since the gate is a
Python-level phase change.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import random

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import optax

from novel_vqa_tpu.core.checkpoint import load_npz, save_npz, unflatten_like
from novel_vqa_tpu.core.config import parse_config
from novel_vqa_tpu.data.weakpaired import (
    WeakPairedLoader,
    center_crop_offsets,
    prepro_wp_images,
    random_crop_offsets,
)
from novel_vqa_tpu.models.seq import autoencoder as ae
from novel_vqa_tpu.ops import l2_normalize
from novel_vqa_tpu.ops import optim as ref_optim


@dataclasses.dataclass
class WPTrainConfig:
    input_h5: str = "data/data.h5"
    input_json: str = "data/data.json"
    # warm restart: reload BOTH nets {ae, cnn} from a saved model_id .npz
    # (004_train_arch1_weakpaired_autoencoder_vgg.lua:121-127 reloads protos)
    start_from: str = ""
    start_from_text: str = ""
    # full-state resume (both params + BOTH optimizer states + iteration +
    # the sequential-with-wrap batch window position; the finetune gate
    # phase is a function of the restored iteration) from a train_state
    # .npz written by --save_train_state.  RNG streams are CONTINUED, not
    # replayed: the restored iteration is folded into the crop / coin-flip /
    # dropout seeds (exact stream positions are not checkpointed; those
    # draws are i.i.d., so this is equivalent in distribution)
    resume: str = ""
    save_train_state: int = 0
    cnn_arch: str = "vgg16"  # vgg16 | inception
    cnn_weights: str = ""  # converted .npz trunk weights ('' = random)
    lstm_average_path: str = ""
    img_average_path: str = ""
    variant: str = "vqa_arch"  # vqa_arch (arch1) | null (arch2)
    rnn_size: int = 512
    input_encoding_size: int = 512
    num_layers: int = 1
    max_iters: int = 50000
    batch_size: int = 16
    grad_clip: float = 0.1
    drop_prob_ae: float = 0.5
    optim: str = "adam"
    learning_rate: float = 3e-5
    learning_rate_decay_start: int = -1
    learning_rate_decay_every: int = 50000
    optim_alpha: float = 0.8
    optim_beta: float = 0.999
    optim_epsilon: float = 1e-8
    weight_decay: float = 1e-6
    finetune_cnn_after: int = -1
    nhimage: int = 4096
    cnn_optim: str = "adam"
    cnn_optim_alpha: float = 0.8
    cnn_optim_beta: float = 0.999
    cnn_learning_rate: float = 1e-5
    cnn_weight_decay: float = 0.0
    rand_val: float = 0.5
    val_sentences_use: int = 30000
    save_checkpoint_every: int = 5000
    checkpoint_path: str = ""
    losses_log_every: int = 25
    id: str = ""
    seed: int = 123
    profile_dir: str = ""  # jax.profiler trace output dir ('' = off)
    debug_nans: int = 0
    image_size: int = 256  # stored image side; cropped to crop_size
    crop_size: int = 224
    # 1 = data-parallel over all attached chips: the image+sequence batch is
    # sharded over the mesh and the gradient means for BOTH nets (CNN and AE)
    # psum over ICI; requires batch_size % n_devices == 0
    data_parallel: int = 0
    # "bfloat16" = bf16 storage for the CNN trunk inside the step (weights +
    # inter-layer activations; f32 accumulation, f32 master weights + both
    # optimizers, f32 AE side — the fc7 features are upcast before the
    # L2-norm).  Default f32 matches the reference numerics.
    compute_dtype: str = "float32"
    # 1 = rematerialize the CNN forward in the finetune-phase backward
    # (jax.checkpoint): trades a second trunk forward for not storing conv
    # activations — A/B'd on device time in docs/PERF.md (weak-paired table)
    remat: int = 0


def build_cnn(opt: WPTrainConfig, with_projection: bool, rng):
    """build_cnn / build_cnn_2 equivalents -> (params, apply_fn, feat_dim)."""
    if opt.cnn_arch == "vgg16":
        from novel_vqa_tpu.models.vision import vgg as net

        vcfg = net.VGGConfig(arch="vgg16", image_size=opt.crop_size)
        cnn_params = {"trunk": net.init_params(rng, vcfg)}
        feat_dim = 4096
        trunk = functools.partial(net.apply, cfg=vcfg, tap="fc7")
    else:
        from novel_vqa_tpu.models.vision import inception as net

        icfg = net.InceptionConfig(image_size=opt.crop_size)
        cnn_params = {"trunk": net.init_params(rng, icfg)}
        feat_dim = 2048
        trunk = functools.partial(net.apply, cfg=icfg, tap="pool")

    if opt.cnn_weights:
        flat, _ = load_npz(opt.cnn_weights)
        cnn_params["trunk"] = unflatten_like(
            jax.device_get(cnn_params["trunk"]),
            {k[len("trunk/"):] if k.startswith("trunk/") else k: v for k, v in flat.items()},
        )

    if with_projection:
        # Linear(feat_dim -> encoding_size), weight +-0.08, bias 0
        # (net_utils.lua:39-42)
        kp = jax.random.fold_in(rng, 99)
        cnn_params["proj"] = {
            "w": jax.random.uniform(
                kp, (feat_dim, opt.input_encoding_size), jnp.float32, -0.08, 0.08
            ),
            "b": jnp.zeros((opt.input_encoding_size,), jnp.float32),
        }

    if opt.compute_dtype not in ("float32", "bfloat16"):
        raise ValueError(f"unknown --compute_dtype {opt.compute_dtype}")

    def apply_fn(cnn_params, images):
        trunk_params = cnn_params["trunk"]
        if opt.compute_dtype == "bfloat16":
            # bf16 storage mixed precision: cast inside the step so the
            # master weights (and both optimizer states) stay f32 — the
            # cast's transpose accumulates the trunk grads back to f32
            from novel_vqa_tpu.models.vision.layers import bf16_storage_cast

            trunk_params = bf16_storage_cast(trunk_params)
        feats = trunk(params=trunk_params, images=images)
        feats = jnp.asarray(feats, jnp.float32)  # f32 boundary for the AE side
        feats = l2_normalize(feats)  # nn.L2Normalize after the tap
        if "proj" in cnn_params:
            feats = (
                jnp.dot(feats, cnn_params["proj"]["w"], preferred_element_type=jnp.float32)
                + cnn_params["proj"]["b"]
            )
        return feats

    return cnn_params, apply_fn, feat_dim


def make_ae_tx(opt: WPTrainConfig):
    sched = ref_optim.half_life_schedule(
        opt.learning_rate, opt.learning_rate_decay_start, opt.learning_rate_decay_every
    )
    inner = {
        "adam": lambda: ref_optim.adam(sched, opt.optim_alpha, opt.optim_beta, opt.optim_epsilon),
        "rmsprop": lambda: ref_optim.rmsprop(sched, opt.optim_alpha, opt.optim_epsilon),
        "adagrad": lambda: ref_optim.adagrad(sched, opt.optim_epsilon),
        "sgd": lambda: ref_optim.sgd(sched),
        "sgdm": lambda: ref_optim.sgdm(sched, opt.optim_alpha),
        "sgdmom": lambda: ref_optim.sgdmom(sched, opt.optim_alpha),
    }[opt.optim]()
    return optax.chain(
        ref_optim.clamp(opt.grad_clip),
        ref_optim.add_decayed_weights(opt.weight_decay),
        inner,
    )


def make_cnn_tx(opt: WPTrainConfig):
    sched = ref_optim.half_life_schedule(
        opt.cnn_learning_rate,
        opt.learning_rate_decay_start,
        opt.learning_rate_decay_every,
    )
    inner = {
        "adam": lambda: ref_optim.adam(sched, opt.cnn_optim_alpha, opt.cnn_optim_beta, opt.optim_epsilon),
        "sgd": lambda: ref_optim.sgd(sched),
        "sgdm": lambda: ref_optim.sgdm(sched, opt.cnn_optim_alpha),
    }[opt.cnn_optim]()
    chain = [inner]
    if opt.cnn_weight_decay > 0:
        chain = [
            ref_optim.add_decayed_weights(opt.cnn_weight_decay),
            ref_optim.clamp(opt.grad_clip),
        ] + chain
    return optax.chain(*chain)


def make_train_step(
    cfg: "ae.AEConfig",
    variant: str,
    crop_size: int,
    cnn_apply,
    ae_tx: optax.GradientTransformation,
    cnn_tx: optax.GradientTransformation,
    mesh=None,
    remat: bool = False,
):
    """Build the fused weak-paired train step: device-side crop/normalize ->
    CNN fwd -> AE fwd/bwd -> BOTH optimizer updates as one jitted program,
    specialised per (skip, finetune) phase (the reference's finetune gate is
    a host-level phase change, 004_train_arch1_weakpaired_autoencoder_vgg.lua:329-331;
    separate CNN optimizer :477-487).

    With ``mesh`` the step is data-parallel — the joint CNN+AE training is
    the heaviest compute in the pipeline (VGG fwd+bwd inside the loop, :317)
    and shards cleanly over the batch: both param trees + both optimizer
    states replicated, the image/sequence batch sharded over ``data`` (seq
    and seq_input are time-major, so their batch axis is axis 1), and the
    gradient means for BOTH nets all-reduce over ICI via GSPMD.

    Returns ``step(skip, finetune, ae_params, ae_opt_state, cnn_params,
    cnn_opt_state, images_u8, offsets, seq, sent_input, seq_input, rng)``.
    """
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        row = NamedSharding(mesh, P("data"))
        tm = NamedSharding(mesh, P(None, "data"))  # time-major (L, N)
        in_sh = (repl, repl, repl, repl, row, row, tm, row, tm, repl)
        out_sh = (repl,) * 5

    def loss_from_feats(ae_params, feats, seq, sent_input, seq_input, skip, rng):
        # fused decoder+criterion (ae.apply_nll): the (L+1, N, V+1) logprobs
        # are never materialized
        if variant == "vqa_arch":
            return ae.apply_nll(
                ae_params, cfg, seq, imgs=feats, sent_input=sent_input,
                encoder_skip=skip, rng=rng, deterministic=False,
            )[0]
        return ae.apply_nll(
            ae_params, cfg, seq, imgs=feats, seq_input=seq_input,
            rng=rng, deterministic=False,
        )[0]

    @functools.lru_cache(maxsize=None)
    def specialise(skip: bool, finetune: bool):
        def step(ae_params, ae_opt_state, cnn_params, cnn_opt_state,
                 images_u8, offsets, seq, sent_input, seq_input, rng):
            images = prepro_wp_images(images_u8, offsets, crop_size)
            cnn_fwd = jax.checkpoint(cnn_apply) if remat else cnn_apply

            def full_loss(ae_params, cnn_params):
                feats = cnn_fwd(cnn_params, images)
                return loss_from_feats(
                    ae_params, feats, seq, sent_input, seq_input, skip, rng
                )

            if finetune:
                loss, (ae_grads, cnn_grads) = jax.value_and_grad(
                    full_loss, argnums=(0, 1)
                )(ae_params, cnn_params)
                cnn_updates, cnn_opt_state2 = cnn_tx.update(
                    cnn_grads, cnn_opt_state, cnn_params
                )
                cnn_params = optax.apply_updates(cnn_params, cnn_updates)
                cnn_opt_state = cnn_opt_state2
            else:
                feats = jax.lax.stop_gradient(cnn_apply(cnn_params, images))
                loss, ae_grads = jax.value_and_grad(loss_from_feats)(
                    ae_params, feats, seq, sent_input, seq_input, skip, rng
                )
            ae_updates, ae_opt_state = ae_tx.update(ae_grads, ae_opt_state, ae_params)
            ae_params = optax.apply_updates(ae_params, ae_updates)
            return ae_params, ae_opt_state, cnn_params, cnn_opt_state, loss

        if mesh is not None:
            return jax.jit(step, in_shardings=in_sh, out_shardings=out_sh)
        return jax.jit(step)

    def step_fn(skip, finetune, *args):
        return specialise(bool(skip), bool(finetune))(*args)

    return step_fn


def main(argv=None):
    opt = parse_config(WPTrainConfig, argv, description=__doc__)
    ckpt_dir = opt.checkpoint_path or "."
    os.makedirs(ckpt_dir, exist_ok=True)
    random.seed(opt.seed)  # math.randomseed(123) for the skip/zero coin flips

    loader = WeakPairedLoader(opt.input_h5, opt.input_json)
    cfg = ae.AEConfig(
        vocab_size=loader.vocab_size,
        input_encoding_size=opt.input_encoding_size,
        rnn_size=opt.rnn_size,
        num_layers=opt.num_layers,
        seq_length=loader.seq_length,
        dropout=opt.drop_prob_ae,
        variant=opt.variant,
        nhimage=opt.nhimage if opt.variant == "vqa_arch" else 0,
    )

    rng0 = jax.random.PRNGKey(opt.seed)
    ae_params = ae.init_params(rng0, cfg)
    if opt.start_from_text:
        flat, _ = load_npz(opt.start_from_text)
        ae_params["lookup"] = jnp.asarray(flat["lookup"])
        n_enc = len({k.split("/")[1] for k in flat if k.startswith("encoder/")})
        ae_params["encoder"] = [
            {p: jnp.asarray(flat[f"encoder/{i}/{p}"]) for p in ("wx", "bx", "wh", "bh")}
            for i in range(n_enc)
        ]
        n_dec = len({k.split("/")[2] for k in flat if k.startswith("decoder/layers/")})
        ae_params["decoder"] = {
            "layers": [
                {p: jnp.asarray(flat[f"decoder/layers/{i}/{p}"]) for p in ("wx", "bx", "wh", "bh")}
                for i in range(n_dec)
            ],
            "proj_w": jnp.asarray(flat["decoder/proj_w"]),
            "proj_b": jnp.asarray(flat["decoder/proj_b"]),
        }
        if "multimodal/wq" in flat and "multimodal" in ae_params:
            ae_params["multimodal"] = {
                k: jnp.asarray(flat[f"multimodal/{k}"]) for k in ("wq", "bq", "wi", "bi")
            }

    with_projection = opt.variant == "null"  # build_cnn vs build_cnn_2
    cnn_params, cnn_apply, feat_dim = build_cnn(
        opt, with_projection, jax.random.fold_in(rng0, 7)
    )
    if opt.variant == "vqa_arch":
        assert feat_dim == opt.nhimage, (feat_dim, opt.nhimage)

    lstm_mean = None
    if opt.lstm_average_path:
        with h5py.File(opt.lstm_average_path, "r") as f:
            lstm_mean = np.asarray(f["mean_vector"][()], np.float32).reshape(-1)

    if opt.start_from:
        # warm restart of BOTH nets from a saved best checkpoint — the
        # reference reloads protos={ae,cnn} wholesale (:121-127)
        flat, _ = load_npz(opt.start_from)
        tpl = {"ae": jax.device_get(ae_params), "cnn": jax.device_get(cnn_params)}
        restored = unflatten_like(tpl, flat)
        ae_params = jax.tree_util.tree_map(jnp.asarray, restored["ae"])
        cnn_params = jax.tree_util.tree_map(jnp.asarray, restored["cnn"])
        print(f"initialized ae+cnn from {opt.start_from}")

    ae_tx = make_ae_tx(opt)
    cnn_tx = make_cnn_tx(opt)
    ae_opt_state = ae_tx.init(ae_params)
    cnn_opt_state = cnn_tx.init(cnn_params)

    start_iter = 0
    if opt.resume:
        # full-state resume: both param trees + BOTH optimizer accumulator
        # sets + the iteration counter (which also restores the
        # --finetune_cnn_after gate phase, since finetune = iter >= gate)
        flat, meta_d = load_npz(opt.resume)
        tpl = {
            "ae": jax.device_get(ae_params),
            "cnn": jax.device_get(cnn_params),
            "ae_opt": jax.device_get(ae_opt_state),
            "cnn_opt": jax.device_get(cnn_opt_state),
        }
        restored = unflatten_like(tpl, flat)
        ae_params = jax.tree_util.tree_map(jnp.asarray, restored["ae"])
        cnn_params = jax.tree_util.tree_map(jnp.asarray, restored["cnn"])
        ae_opt_state = jax.tree_util.tree_map(jnp.asarray, restored["ae_opt"])
        cnn_opt_state = jax.tree_util.tree_map(jnp.asarray, restored["cnn_opt"])
        start_iter = int(meta_d.get("iter", 0)) + 1
        print(f"resumed from {opt.resume} at iteration {start_iter}")
        # continue the RNG streams rather than replaying them from iteration
        # 0: fold the restored iteration into the seed sources (crop offsets
        # / coin flips / dropout keys are i.i.d., so this preserves the
        # training distribution while making a resumed run draw fresh
        # randomness instead of the prefix an uninterrupted run already
        # used).  Batch order is NOT i.i.d. — it is the reference's
        # sequential-with-wrap window (misc/DataLoaderWeakPaired.lua) — so
        # the window position is checkpointed and restored here.
        random.seed(opt.seed + start_iter)
        loader.iterators["train"] = int(meta_d.get("train_it_pos", 0))

    mesh = repl = None
    if opt.data_parallel:
        from novel_vqa_tpu.parallel import make_mesh, replicated

        mesh = make_mesh()
        n_dev = int(mesh.devices.size)
        assert opt.batch_size % n_dev == 0, (
            f"batch_size {opt.batch_size} not divisible by {n_dev} devices"
        )
        repl = replicated(mesh)
        ae_params = jax.device_put(ae_params, repl)
        cnn_params = jax.device_put(cnn_params, repl)
        ae_opt_state = jax.device_put(ae_opt_state, repl)
        cnn_opt_state = jax.device_put(cnn_opt_state, repl)
        from jax.sharding import NamedSharding, PartitionSpec as P

        row_sharding = NamedSharding(mesh, P("data"))
        tm_sharding = NamedSharding(mesh, P(None, "data"))

    train_step = make_train_step(
        cfg, opt.variant, opt.crop_size, cnn_apply, ae_tx, cnn_tx, mesh=mesh,
        remat=bool(opt.remat),
    )

    @jax.jit
    def val_step(ae_params, cnn_params, images_u8, offsets, seq):
        images = prepro_wp_images(images_u8, offsets, opt.crop_size)
        feats = cnn_apply(cnn_params, images)
        if opt.variant == "vqa_arch":
            return ae.apply_nll(
                ae_params, cfg, seq, imgs=feats,
                sent_input=jnp.zeros((seq.shape[1], 2 * cfg.rnn_size)),
                encoder_skip=False, deterministic=True,
            )[0]
        return ae.apply_nll(
            ae_params, cfg, seq, imgs=feats, seq_input=seq, deterministic=True
        )[0]

    np_rng = np.random.default_rng(opt.seed + start_iter)

    def eval_split(split):
        loader.reset_iterator(split)
        loss_sum, n_evals, n = 0.0, 0, 0
        while True:
            labels, images, bounds = loader.get_batch_with_images(split, opt.batch_size)
            offsets = center_crop_offsets(len(images), opt.image_size, opt.crop_size)
            loss_sum += float(
                val_step(ae_params, cnn_params, jnp.asarray(images),
                         jnp.asarray(offsets), jnp.asarray(labels))
            )
            n_evals += 1
            n += labels.shape[1]
            if bounds["wrapped"] or 0 <= opt.val_sentences_use <= n:
                break
        return loss_sum / max(1, n_evals)

    rng = jax.random.fold_in(jax.random.PRNGKey(opt.seed + 1), start_iter)
    it = start_iter
    loss0, best_score = None, None
    loss_history, val_loss_history = {}, {}

    import contextlib

    from novel_vqa_tpu.core.profiling import nan_guard, trace

    _stack = contextlib.ExitStack()
    _stack.enter_context(trace(opt.profile_dir or None))
    _stack.enter_context(nan_guard(bool(opt.debug_nans)))
    while True:
        labels, images, _ = loader.get_batch_with_images("train", opt.batch_size)
        offsets = random_crop_offsets(np_rng, len(images), opt.image_size, opt.crop_size)
        rng, sub = jax.random.split(rng)

        skip = False
        sent_input = np.zeros((labels.shape[1], 2 * cfg.rnn_size), np.float32)
        seq_input = labels
        if opt.variant == "vqa_arch":
            if random.random() <= 0.5 and lstm_mean is not None:  # :296-301
                skip = True
                sent_input = np.tile(lstm_mean, (labels.shape[1], 1))
        else:
            if random.random() <= opt.rand_val:  # arch2 zeroing (:291-293)
                seq_input = np.zeros_like(labels)

        finetune = 0 <= opt.finetune_cnn_after <= it
        if mesh is not None:
            batch = (
                jax.device_put(np.asarray(images), row_sharding),
                jax.device_put(np.asarray(offsets), row_sharding),
                jax.device_put(np.asarray(labels), tm_sharding),
                jax.device_put(np.asarray(sent_input), row_sharding),
                jax.device_put(np.asarray(seq_input), tm_sharding),
                jax.device_put(sub, repl),
            )
        else:
            batch = (
                jnp.asarray(images), jnp.asarray(offsets), jnp.asarray(labels),
                jnp.asarray(sent_input), jnp.asarray(seq_input), sub,
            )
        ae_params, ae_opt_state, cnn_params, cnn_opt_state, loss = train_step(
            skip, finetune, ae_params, ae_opt_state, cnn_params, cnn_opt_state,
            *batch,
        )

        if opt.losses_log_every > 0 and it % opt.losses_log_every == 0:
            f = float(loss)
            loss_history[it] = f
            # update-magnitude diagnostics (004_train_arch1_...vgg.lua:372-376:
            # param norms and the count of params whose step exceeds 1% of
            # their magnitude)
            pn = float(
                jnp.sqrt(
                    sum(jnp.sum(p * p) for p in jax.tree_util.tree_leaves(ae_params))
                )
            )
            cn = float(
                jnp.sqrt(
                    sum(jnp.sum(p * p) for p in jax.tree_util.tree_leaves(cnn_params))
                )
            )
            print(
                f"iter {it}: loss {f:.4f} | paramsNorm: {pn:.4f} | "
                f"cnnParamsNorm: {cn:.4f} (skip={skip} finetune={finetune})"
            )
            if loss0 is None:
                loss0 = f
            if f > loss0 * 20:
                print("loss seems to be exploding, quitting.")
                break

        if it % opt.save_checkpoint_every == 0 or it == opt.max_iters - 1:
            val_loss = eval_split("val")
            val_loss_history[it] = val_loss
            print("validation loss:", val_loss)
            base = os.path.join(ckpt_dir, "model_id" + opt.id)
            with open(base + ".json", "w") as f:
                json.dump(
                    {"opt": dataclasses.asdict(opt), "iter": it,
                     "loss_history": loss_history,
                     "val_loss_history": val_loss_history},
                    f,
                )
            score = -val_loss
            if best_score is None or score > best_score:
                best_score = score
                save_npz(
                    base + ".npz",
                    {"ae": jax.device_get(ae_params), "cnn": jax.device_get(cnn_params)},
                    meta={"cfg": cfg._asdict(), "iter": it, "val_loss": val_loss},
                )
                print("wrote BEST checkpoint to " + base + ".npz")
            if opt.save_train_state:
                save_npz(
                    os.path.join(ckpt_dir, "train_state" + opt.id + ".npz"),
                    {
                        "ae": jax.device_get(ae_params),
                        "cnn": jax.device_get(cnn_params),
                        "ae_opt": jax.device_get(ae_opt_state),
                        "cnn_opt": jax.device_get(cnn_opt_state),
                    },
                    meta={
                        "cfg": cfg._asdict(),
                        "iter": it,
                        # sequential-with-wrap batch window position, so a
                        # resumed run continues mid-epoch instead of
                        # restarting at corpus row 0
                        "train_it_pos": int(loader.iterators.get("train", 0)),
                    },
                )

        it += 1
        if 0 < opt.max_iters <= it:
            break

    loader.close()


if __name__ == "__main__":
    main()
