"""Text-autoencoder trainer CLI.

Port of the stage-001 AE trainers:
  * ``--variant text_nostart`` = 001_train_arch1_text_autoencoder.lua
    (defaults: adam lr 1e-5 alpha 0.8 beta 0.999, bs 1000, grad clip 0.1,
    weight decay 1e-6, 75001 iters, flags :22-59);
  * ``--variant arch2`` = 001_train_arch2_text_autoencoder.lua (image slot at
    t=1 fed zeros by the loader, misc/DataLoader.lua:84; 40001 iters, lr 5e-5);
  * the same harness also fine-tunes on weak-paired text
    (003_train_arch1_weakpaired_autoencoder_text.lua: 15001 iters, lr 5e-5).

Reproduced loop semantics (001_train_arch1_text_autoencoder.lua):
  * lossFun fwd/bwd -> grad clamp(+-grad_clip) -> ``+ weight_decay * w``
    (:237-243) -> optimizer dispatch (:349-364);
  * continuous LR half-life decay (:341-346);
  * ``eval_split`` on val every save_checkpoint_every iters with greedy
    samples decoded for inspection (:148-202);
  * best-checkpoint gating on -val_loss (:296-318) and periodic full save;
  * loss-explosion watchdog: abort when loss > 20 * loss0 (:369-373).

The whole fwd/bwd/clip/decay/update runs as one jitted step; batches come
from the sequential-with-wrap corpus loader.
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from novel_vqa_tpu.core.checkpoint import save_npz
from novel_vqa_tpu.core.config import parse_config
from novel_vqa_tpu.data.corpus import CorpusLoader
from novel_vqa_tpu.models.seq import autoencoder as ae
from novel_vqa_tpu.ops import optim as ref_optim


@dataclasses.dataclass
class AETrainConfig:
    input_h5: str = "data/data.h5"
    input_json: str = "data/data.json"
    start_from: str = ""
    variant: str = "text_nostart"  # text_nostart | arch2
    rnn_size: int = 512
    input_encoding_size: int = 512
    num_layers: int = 1
    max_iters: int = 75001
    batch_size: int = 1000
    grad_clip: float = 0.1
    drop_prob_ae: float = 0.5
    optim: str = "adam"  # rmsprop|sgd|sgdmom|adagrad|adam
    learning_rate: float = 1e-5
    learning_rate_decay_start: int = -1
    learning_rate_decay_every: int = 50000
    optim_alpha: float = 0.8
    optim_beta: float = 0.999
    optim_epsilon: float = 1e-8
    weight_decay: float = 1e-6
    val_sentences_use: int = 30000
    save_checkpoint_every: int = 2500
    checkpoint_path: str = ""
    losses_log_every: int = 25
    id: str = ""
    seed: int = 123
    profile_dir: str = ""  # jax.profiler trace output dir ('' = off)
    debug_nans: int = 0
    sample_print: int = 0  # print N greedy samples per eval (reference prints all)
    # 1 = score greedy reconstructions with local BLEU/CIDEr and gate the
    # best checkpoint on CIDEr (the reference shells out to coco-caption,
    # net_utils.lua:326-334; eval/language_metrics.py implements the metrics)
    language_eval: int = 0
    # >1: HBM-resident corpus + lax.scan over that many sequential-with-wrap
    # iterations per dispatch (exact DataLoader iterator semantics, including
    # the head re-read on wrap); 1 = per-step host h5 reads
    steps_per_dispatch: int = 1
    # 1 = data-parallel over all attached chips (batch sharded over the mesh,
    # grads psum over ICI); requires batch_size % n_devices == 0.  Composes
    # with both dispatch modes: per-step (host batch sharded) and
    # steps_per_dispatch > 1 (the DP scan, make_steps_scan(mesh=...))
    data_parallel: int = 0
    # "bfloat16" = bf16 weights/activations in the forward with f32 masters
    # + accumulation (models/seq/autoencoder.AEConfig.compute_dtype) —
    # halves the per-decode-step HBM fetch of the (H, V+1) projection.
    # Default f32 (reference-parity numerics).
    compute_dtype: str = "float32"


def make_tx(opt: AETrainConfig) -> optax.GradientTransformation:
    sched = ref_optim.half_life_schedule(
        opt.learning_rate, opt.learning_rate_decay_start, opt.learning_rate_decay_every
    )
    if opt.optim == "adam":
        inner = ref_optim.adam(sched, opt.optim_alpha, opt.optim_beta, opt.optim_epsilon)
    elif opt.optim == "rmsprop":
        inner = ref_optim.rmsprop(sched, opt.optim_alpha, opt.optim_epsilon)
    elif opt.optim == "adagrad":
        inner = ref_optim.adagrad(sched, opt.optim_epsilon)
    elif opt.optim == "sgd":
        inner = ref_optim.sgd(sched)
    elif opt.optim == "sgdm":
        inner = ref_optim.sgdm(sched, opt.optim_alpha)
    elif opt.optim == "sgdmom":
        inner = ref_optim.sgdmom(sched, opt.optim_alpha)
    else:
        raise ValueError(f"bad option --optim {opt.optim}")
    return optax.chain(
        ref_optim.clamp(opt.grad_clip),
        ref_optim.add_decayed_weights(opt.weight_decay),
        inner,
    )


def make_steps_scan(
    cfg: "ae.AEConfig",
    tx: optax.GradientTransformation,
    n_steps: int,
    batch_size: int,
    mesh=None,
    donate: bool = True,
):
    """``n_steps`` text-AE training iterations in ONE dispatch via
    ``lax.scan``, over an HBM-resident corpus passed as a RUNTIME argument
    (closing over a large device array would bake it into the HLO as a
    literal — the remote-compile path rejects such programs).

    The scan carries the sequential-with-wrap iterator offset, reproducing
    the reference DataLoader's exact batch windows including the head
    re-read on wrap (misc/DataLoader.lua:58-88).

    With ``mesh`` the step is data-parallel: params/opt_state/corpus
    replicated, each step's index window sharding-constrained over the
    ``data`` axis so the row gather + fwd/bwd run batch-sharded per chip and
    the gradient mean all-reduces over ICI via GSPMD — the DP path for the
    75k-iteration pretraining workload
    (001_train_arch1_text_autoencoder.lua:208-249).

    Returns a jitted ``(params, opt_state, train_rows, offset, rng) ->
    (params, opt_state, offset, losses)``.
    """
    needs_imgs = cfg.variant == "arch2"
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        shard = NamedSharding(mesh, P("data"))

    def steps(params, opt_state, train_rows, offset, rng):
        n_rows = train_rows.shape[0]

        def body(carry, step_rng):
            params, opt_state, offset = carry
            base = jnp.where(offset < n_rows - 1, offset, 0)
            idx = base + jnp.arange(batch_size)
            idx = jnp.where(idx < n_rows, idx, idx - n_rows)
            if mesh is not None:
                idx = jax.lax.with_sharding_constraint(idx, shard)
            seq = jnp.take(train_rows, idx, axis=0).T  # (L, bs)
            kwargs = (
                {"imgs": jnp.zeros((batch_size, cfg.input_encoding_size), jnp.float32)}
                if needs_imgs
                else {}
            )
            loss, grads = jax.value_and_grad(ae.loss_fn)(
                params, cfg, seq, step_rng, **kwargs
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            offset = jnp.where(
                offset + batch_size > n_rows, 0, offset + batch_size
            )
            return (params, opt_state, offset), loss

        step_rngs = jax.random.split(rng, n_steps)
        (params, opt_state, offset), losses = jax.lax.scan(
            body, (params, opt_state, offset), step_rngs
        )
        return params, opt_state, offset, losses

    donate_args = (0, 1) if donate else ()
    if mesh is not None:
        return jax.jit(
            steps,
            in_shardings=(repl,) * 5,
            out_shardings=(repl,) * 4,
            donate_argnums=donate_args,
        )
    return jax.jit(steps, donate_argnums=donate_args)


def decode_sequence(ix_to_word, seq: np.ndarray):
    """ix -> words (net_utils.decode_sequence, misc/net_utils.lua:298-313):
    stop a row at its first out-of-vocab (END) or null token."""
    L, N = seq.shape
    out = []
    for b in range(N):
        words = []
        for t in range(L):
            ix = int(seq[t, b])
            word = ix_to_word.get(str(ix))
            if word is None:
                break
            words.append(word)
        out.append(" ".join(words))
    return out


def main(argv=None):
    opt = parse_config(AETrainConfig, argv, description=__doc__)
    ckpt_dir = opt.checkpoint_path or "."
    os.makedirs(ckpt_dir, exist_ok=True)

    if opt.compute_dtype not in ("float32", "bfloat16"):
        raise ValueError(
            f"--compute_dtype {opt.compute_dtype!r}: must be 'float32' or"
            " 'bfloat16'"
        )
    loader = CorpusLoader(opt.input_h5, opt.input_json)
    cfg = ae.AEConfig(
        vocab_size=loader.vocab_size,
        input_encoding_size=opt.input_encoding_size,
        rnn_size=opt.rnn_size,
        num_layers=opt.num_layers,
        seq_length=loader.seq_length,
        dropout=opt.drop_prob_ae,
        variant=opt.variant,
        compute_dtype=opt.compute_dtype,
    )
    if opt.start_from:
        from novel_vqa_tpu.core.checkpoint import load_npz, unflatten_like

        template = jax.device_get(ae.init_params(jax.random.PRNGKey(opt.seed), cfg))
        flat, _ = load_npz(opt.start_from)
        params = jax.device_put(unflatten_like(template, flat))
    else:
        params = ae.init_params(jax.random.PRNGKey(opt.seed), cfg)
    tx = make_tx(opt)
    opt_state = tx.init(params)

    needs_imgs = opt.variant == "arch2"

    @jax.jit
    def train_step(params, opt_state, seq, imgs, rng):
        kwargs = {"imgs": imgs} if needs_imgs else {}
        loss, grads = jax.value_and_grad(ae.loss_fn)(params, cfg, seq, rng, **kwargs)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def val_step(params, seq, imgs):
        kwargs = {"imgs": imgs} if needs_imgs else {}
        return ae.apply_nll(params, cfg, seq, deterministic=True, **kwargs)[0]

    @jax.jit
    def sample_step(params, seq, imgs):
        kwargs = {"imgs": imgs} if needs_imgs else {}
        if needs_imgs:
            state = ae.encode(params, cfg, seq, imgs)
        else:
            state = ae.encode(params, cfg, seq)
        return ae.sample(params, cfg, state)[0]

    zero_imgs = jnp.zeros((opt.batch_size, cfg.input_encoding_size), jnp.float32)

    def eval_split(split: str):
        loader.reset_iterator(split)
        loss_sum, loss_evals, n = 0.0, 0, 0
        printed = 0
        predictions = []
        while True:
            labels, bounds = loader.get_batch(split, opt.batch_size)
            seq = jnp.asarray(labels)
            loss = float(val_step(params, seq, zero_imgs))
            loss_sum += loss
            loss_evals += 1
            n += labels.shape[1]
            if printed < opt.sample_print or opt.language_eval:
                toks = np.asarray(sample_step(params, seq, zero_imgs))
                preds = decode_sequence(loader.ix_to_word, toks)
                actuals = decode_sequence(loader.ix_to_word, labels)
                if opt.language_eval:
                    predictions += [
                        {"prediction": p, "actual": a}
                        for p, a in zip(preds, actuals)
                    ]
                for p, a in list(zip(preds, actuals))[: max(0, opt.sample_print - printed)]:
                    print(f"Prediction: {p} ||| Actual: {a}")
                    printed += 1
            if bounds["wrapped"]:
                break
            if 0 <= opt.val_sentences_use <= n:
                break
        lang_stats = None
        if opt.language_eval and predictions:
            from novel_vqa_tpu.eval.language_metrics import language_eval

            lang_stats = language_eval(predictions)
            print("language eval:", lang_stats)
        return loss_sum / max(1, loss_evals), lang_stats

    chunk = max(1, opt.steps_per_dispatch)
    mesh = repl = None
    dp_step = None
    if opt.data_parallel:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from novel_vqa_tpu.parallel import make_dp_train_step, make_mesh, replicated

        mesh = make_mesh()
        n_dev = int(mesh.devices.size)
        assert opt.batch_size % n_dev == 0, (
            f"batch_size {opt.batch_size} not divisible by {n_dev} devices"
        )
        repl = replicated(mesh)
        params = jax.device_put(params, repl)
        opt_state = jax.device_put(opt_state, repl)
        if chunk == 1:
            # per-step DP: the host-read batch is sharded over the mesh
            # (seq is time-major, so the batch axis is axis 1)
            if needs_imgs:
                dp_loss = lambda params, cfg_, seq, imgs, rng: ae.loss_fn(
                    params, cfg_, seq, rng, imgs=imgs
                )
                batch_specs = (P(None, "data"), P("data"))
            else:
                dp_loss = lambda params, cfg_, seq, rng: ae.loss_fn(
                    params, cfg_, seq, rng
                )
                batch_specs = (P(None, "data"),)
            dp_step = make_dp_train_step(
                cfg, tx, mesh, dp_loss, batch_specs=batch_specs
            )
            seq_sharding = NamedSharding(mesh, P(None, "data"))
            dp_zero_imgs = jax.device_put(
                np.zeros((opt.batch_size, cfg.input_encoding_size), np.float32),
                NamedSharding(mesh, P("data")),
            )
    if chunk > 1:
        # whole train split HBM-resident (as a runtime jit argument; replicated
        # over the mesh under --data_parallel); the scan implements the
        # sequential iterator with the reference's exact wrap semantics
        # (misc/DataLoader.lua:58-88)
        train_rows_h = loader.h5["labels/train"][()].astype(np.int32)  # (N, L)
        train_rows = (
            jax.device_put(train_rows_h, repl) if repl is not None
            else jnp.asarray(train_rows_h)
        )
        train_steps_scan = make_steps_scan(cfg, tx, chunk, opt.batch_size, mesh=mesh)
        scan_offset = jnp.asarray(0, jnp.int32)
        if repl is not None:
            scan_offset = jax.device_put(scan_offset, repl)

    rng = jax.random.PRNGKey(opt.seed)
    loss0 = None
    best_score = None
    loss_history = {}
    val_loss_history = {}
    it = 0

    import contextlib

    from novel_vqa_tpu.core.profiling import nan_guard, trace

    _stack = contextlib.ExitStack()
    _stack.enter_context(trace(opt.profile_dir or None))
    _stack.enter_context(nan_guard(bool(opt.debug_nans)))
    while True:
        rng, sub = jax.random.split(rng)
        if chunk > 1:
            if repl is not None:
                sub = jax.device_put(sub, repl)
            params, opt_state, scan_offset, losses = train_steps_scan(
                params, opt_state, train_rows, scan_offset, sub
            )
            loss = losses[-1]
            it += chunk - 1  # the loop tail below adds the final 1
        elif dp_step is not None:
            labels, _ = loader.get_batch("train", opt.batch_size)
            seq = jax.device_put(np.ascontiguousarray(labels), seq_sharding)
            batch = (seq,)
            if needs_imgs:
                batch += (dp_zero_imgs,)
            params, opt_state, loss = dp_step(
                params, opt_state, jax.device_put(sub, repl), *batch
            )
        else:
            labels, _ = loader.get_batch("train", opt.batch_size)
            params, opt_state, loss = train_step(
                params, opt_state, jnp.asarray(labels), zero_imgs, sub
            )

        # with chunked dispatch the modulo cadences fire when the window
        # [it-chunk+1, it] crosses the boundary
        if opt.losses_log_every > 0 and it % opt.losses_log_every < chunk:
            f = float(loss)
            loss_history[it] = f
            print(f"iter {it}: {f:.6f}")
            # loss-explosion watchdog (:369-373), checked at log cadence to
            # avoid a per-step device sync
            if loss0 is None:
                loss0 = f
            if f > loss0 * 20:
                print("loss seems to be exploding, quitting.")
                break

        if it % opt.save_checkpoint_every < chunk or it >= opt.max_iters - 1:
            val_loss, lang_stats = eval_split("val")
            val_loss_history[it] = val_loss
            print(f"validation loss: {val_loss}")

            ckpt_base = os.path.join(ckpt_dir, "model_id" + opt.id)
            with open(ckpt_base + ".json", "w") as f:
                json.dump(
                    {
                        "opt": dataclasses.asdict(opt),
                        "iter": it,
                        "loss_history": loss_history,
                        "val_loss_history": val_loss_history,
                    },
                    f,
                )
            # CIDEr gating when language eval is on, else -val_loss
            # (001_train_arch1_text_autoencoder.lua:296-318)
            current_score = (
                lang_stats["CIDEr"] if lang_stats is not None else -val_loss
            )
            if best_score is None or current_score > best_score:
                best_score = current_score
                save_npz(
                    ckpt_base + ".npz",
                    jax.device_get(params),
                    meta={"cfg": cfg._asdict(), "iter": it, "val_loss": val_loss},
                )
                print("wrote best checkpoint to " + ckpt_base + ".npz")

        it += 1
        if 0 < opt.max_iters <= it:
            break

    loader.close()


if __name__ == "__main__":
    main()
