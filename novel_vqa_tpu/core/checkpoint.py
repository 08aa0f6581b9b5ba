"""Checkpoint formats and Torch flat-vector interop.

The reference persists three kinds of artifacts (SURVEY.md section 5):
  1. rich t7 checkpoints ``{protos, vocab, opt, iter}``;
  2. flat-parameter dumps ``{encoder_w_q, embedding_w_q, multimodal_w}``
     (002_train_vqa_arch1/002_train_baseline.lua:419-420) / ``{cnn_w, ...}``
     (arch2);
  3. converted transfer dumps ``{lookup (transposed), encoder, [multimodal]}``
     as t7 or h5 (001_train_autoencoder/002_convert_text_model_arch1.lua:34-39,
     _as_h5.lua:39-42, 005_convert_weakpaired_model_arch1.lua:37-43).

The h5 export is the designated interchange: this module reads/writes flat
vectors with the documented Torch ``getParameters()`` ordering so weights are
checkpoint-convertible in both directions.  Native checkpoints are plain .npz
files keyed by pytree path.

Torch layout conventions encoded here:
  * ``nn.Linear(in, out)`` stores ``weight`` as (out, in) row-major followed
    by ``bias`` (out,); our params store the transpose (in, out), so flat
    export writes ``w.T`` flattened;
  * each LSTM layer contributes [i2h.weight, i2h.bias, h2h.weight, h2h.bias]
    in nngraph construction order (LSTM_encoder.lua:32-33), layers in order;
  * the packed-state LSTM gate order [i, f, o, g] matches ops/lstm.py so no
    gate permutation is needed;
  * the converted AE ``lookup`` is stored already transposed to
    (input_encoding_size, vocab+1) by the reference converter
    (002_convert_text_model_arch1.lua:31: ``lookup:t()``).
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Sequence, Tuple

import h5py
import numpy as np


# ---------------------------------------------------------------------------
# generic pytree <-> npz
# ---------------------------------------------------------------------------

def _flatten_tree(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k in sorted(tree):
            out.update(_flatten_tree(tree[k], f"{prefix}{k}/"))
    elif isinstance(tree, tuple) and hasattr(tree, "_fields"):
        # NamedTuple (e.g. optax states): key by field name
        for name, v in zip(tree._fields, tree):
            out.update(_flatten_tree(v, f"{prefix}{name}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten_tree(v, f"{prefix}{i}/"))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def save_npz(path: str, tree: Any, meta: Dict[str, Any] | None = None) -> None:
    flat = _flatten_tree(tree)
    if meta is not None:
        flat["__meta__"] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8
        )
    np.savez(path, **flat)


def load_npz(path: str) -> Tuple[Dict[str, np.ndarray], Dict[str, Any]]:
    """Returns (flat dict keyed by path, meta)."""
    data = dict(np.load(path))
    meta = {}
    if "__meta__" in data:
        meta = json.loads(bytes(data.pop("__meta__").tobytes()).decode())
    return data, meta


def unflatten_like(template: Any, flat: Dict[str, np.ndarray], prefix: str = "") -> Any:
    if isinstance(template, dict):
        return {
            k: unflatten_like(template[k], flat, f"{prefix}{k}/")
            for k in template
        }
    if isinstance(template, tuple) and hasattr(template, "_fields"):
        seq = [
            unflatten_like(v, flat, f"{prefix}{name}/")
            for name, v in zip(template._fields, template)
        ]
        return type(template)(*seq)
    if isinstance(template, (list, tuple)):
        seq = [
            unflatten_like(v, flat, f"{prefix}{i}/") for i, v in enumerate(template)
        ]
        return type(template)(seq)
    return flat[prefix.rstrip("/")]


# ---------------------------------------------------------------------------
# flat-vector (Torch getParameters) interop
# ---------------------------------------------------------------------------

def _linear_to_flat(w_in_out: np.ndarray, b: np.ndarray) -> List[np.ndarray]:
    """(in, out) weight + bias -> Torch [weight(out,in) row-major, bias]."""
    return [np.ascontiguousarray(np.asarray(w_in_out).T).ravel(), np.asarray(b).ravel()]


def _linear_from_flat(vec: np.ndarray, off: int, n_in: int, n_out: int):
    w = vec[off : off + n_out * n_in].reshape(n_out, n_in).T.copy()
    off += n_out * n_in
    b = vec[off : off + n_out].copy()
    off += n_out
    return w, b, off


def lstm_params_to_flat(layers: Sequence[Dict[str, np.ndarray]]) -> np.ndarray:
    """[i2h.w, i2h.b, h2h.w, h2h.b] per layer (LSTM_encoder.lua:32-33)."""
    parts: List[np.ndarray] = []
    for layer in layers:
        parts += _linear_to_flat(layer["wx"], layer["bx"])
        parts += _linear_to_flat(layer["wh"], layer["bh"])
    return np.concatenate([np.asarray(p, np.float32) for p in parts])


def lstm_params_from_flat(
    vec: np.ndarray, input_size: int, rnn_size: int, num_layers: int
) -> List[Dict[str, np.ndarray]]:
    off = 0
    layers = []
    for i in range(num_layers):
        in_size = input_size if i == 0 else rnn_size
        wx, bx, off = _linear_from_flat(vec, off, in_size, 4 * rnn_size)
        wh, bh, off = _linear_from_flat(vec, off, rnn_size, 4 * rnn_size)
        layers.append({"wx": wx, "bx": bx, "wh": wh, "bh": bh})
    assert off == vec.size, f"flat vector size mismatch: used {off} of {vec.size}"
    return layers


def arch1_to_flat(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Arch1 model -> the three flat vectors saved at
    002_train_baseline.lua:419-420."""
    emb = params["embedding"]
    embedding_w_q = np.concatenate(_linear_to_flat(emb["w"], emb["b"]))
    encoder_w_q = lstm_params_to_flat(params["encoder"])
    fus = params["fusion"]
    cls = params["classifier"]
    multimodal_w = np.concatenate(
        _linear_to_flat(fus["wq"], fus["bq"])
        + _linear_to_flat(fus["wi"], fus["bi"])
        + _linear_to_flat(cls["w"], cls["b"])
    )
    return {
        "encoder_w_q": encoder_w_q.astype(np.float32),
        "embedding_w_q": embedding_w_q.astype(np.float32),
        "multimodal_w": multimodal_w.astype(np.float32),
    }


def arch1_from_flat(vectors: Dict[str, np.ndarray], cfg) -> Dict[str, Any]:
    V, E = cfg.vocab_size, cfg.input_encoding_size
    H, L = cfg.rnn_size, cfg.rnn_layer
    C, F, O = cfg.common_embedding_size, cfg.nhimage, cfg.num_output

    ev = np.asarray(vectors["embedding_w_q"], np.float32)
    w, b, off = _linear_from_flat(ev, 0, V, E)
    assert off == ev.size
    embedding = {"w": w, "b": b}

    encoder = lstm_params_from_flat(
        np.asarray(vectors["encoder_w_q"], np.float32), E, H, L
    )

    mv = np.asarray(vectors["multimodal_w"], np.float32)
    wq, bq, off = _linear_from_flat(mv, 0, 2 * H * L, C)
    wi, bi, off = _linear_from_flat(mv, off, F, C)
    cw, cb, off = _linear_from_flat(mv, off, C, O)
    assert off == mv.size
    return {
        "embedding": embedding,
        "encoder": encoder,
        "fusion": {"wq": wq, "bq": bq, "wi": wi, "bi": bi},
        "classifier": {"w": cw, "b": cb},
    }


def save_flat_h5(path: str, vectors: Dict[str, np.ndarray]) -> None:
    with h5py.File(path, "w") as f:
        for k, v in vectors.items():
            f.create_dataset(k, dtype="float32", data=np.asarray(v, np.float32))


def load_flat_h5(path: str) -> Dict[str, np.ndarray]:
    with h5py.File(path, "r") as f:
        return {k: f[k][()] for k in f.keys()}


def arch2_to_flat(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Arch2 model -> {cnn_w, encoder_w_q, multimodal_w} flat vectors
    (003_train_vqa_arch2/003_train_ae_based.lua:406 pattern).  ``encoder_w_q``
    is the ``nn.Encoder`` getParameters order: LSTM layers then the lookup
    table weight (Encoder_lstm.lua builds encoder first, lookup second)."""
    cnn = params["cnn_proj"]
    cnn_w = np.concatenate(_linear_to_flat(cnn["w"], cnn["b"]))
    encoder_w_q = np.concatenate(
        [lstm_params_to_flat(params["encoder"]),
         np.asarray(params["lookup"], np.float32).ravel()]
    )
    cls = params["classifier"]
    multimodal_w = np.concatenate(_linear_to_flat(cls["w"], cls["b"]))
    return {
        "cnn_w": cnn_w.astype(np.float32),
        "encoder_w_q": encoder_w_q.astype(np.float32),
        "multimodal_w": multimodal_w.astype(np.float32),
    }


def arch2_from_flat(vectors: Dict[str, np.ndarray], cfg) -> Dict[str, Any]:
    V, E, H, L = cfg.vocab_size, cfg.input_encoding_size, cfg.rnn_size, cfg.num_layers
    F, O = cfg.nhimage, cfg.num_output

    cv = np.asarray(vectors["cnn_w"], np.float32)
    w, b, off = _linear_from_flat(cv, 0, F, E)
    assert off == cv.size

    ev = np.asarray(vectors["encoder_w_q"], np.float32)
    lstm_size = sum(
        (4 * H * (E if i == 0 else H) + 4 * H) + (4 * H * H + 4 * H)
        for i in range(L)
    )
    encoder = lstm_params_from_flat(ev[:lstm_size], E, H, L)
    lookup = ev[lstm_size:].reshape(V + 1, E).copy()

    mv = np.asarray(vectors["multimodal_w"], np.float32)
    cw, cb, off = _linear_from_flat(mv, 0, H, O)
    assert off == mv.size
    return {
        "cnn_proj": {"w": w, "b": b},
        "lookup": lookup,
        "encoder": encoder,
        "classifier": {"w": cw, "b": cb},
    }


# ---------------------------------------------------------------------------
# AE transfer dumps ({lookup^T, encoder, [multimodal]})
# ---------------------------------------------------------------------------

def ae_transfer_to_h5(
    path: str,
    lookup: np.ndarray,  # (vocab+1, E) embedding table
    encoder_layers: Sequence[Dict[str, np.ndarray]],
    multimodal_flat: np.ndarray | None = None,
) -> None:
    """Write the converted-AE interchange h5
    (002_convert_text_model_arch1_as_h5.lua:39-42): ``lookup`` is stored
    transposed to (E, vocab+1) like the reference converter's ``lookup:t()``;
    ``encoder`` is the flat LSTM vector."""
    with h5py.File(path, "w") as f:
        f.create_dataset(
            "lookup", dtype="float32", data=np.asarray(lookup, np.float32).T
        )
        f.create_dataset(
            "encoder", dtype="float32", data=lstm_params_to_flat(encoder_layers)
        )
        if multimodal_flat is not None:
            f.create_dataset(
                "multimodal", dtype="float32", data=np.asarray(multimodal_flat, np.float32)
            )


def ae_transfer_from_h5(
    path: str, input_size: int, rnn_size: int, num_layers: int
) -> Dict[str, Any]:
    with h5py.File(path, "r") as f:
        out: Dict[str, Any] = {
            "lookup": f["lookup"][()].T.copy(),  # back to (vocab+1, E)
            "encoder": lstm_params_from_flat(
                f["encoder"][()], input_size, rnn_size, num_layers
            ),
        }
        if "multimodal" in f:
            out["multimodal"] = f["multimodal"][()]
    return out


# ---------------------------------------------------------------------------
# orbax backend (optional production checkpointing)
# ---------------------------------------------------------------------------

def save_orbax(path: str, tree: Any) -> None:
    """Persist a pytree with orbax (atomic directory checkpoints, async-safe
    restore across processes).  The npz format stays the default interchange;
    orbax is the production option for large states and multi-host runs."""
    import orbax.checkpoint as ocp

    import os as _os

    path = _os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)


def load_orbax(path: str, template: Any) -> Any:
    import orbax.checkpoint as ocp

    import os as _os

    path = _os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, template)
