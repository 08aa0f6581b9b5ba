"""Criterion parity: sequence_nll vs. a direct loop port of
nn.LanguageModelCriterion (001_train_autoencoder/misc/AutoEncoder.lua:437-474)
and cross_entropy vs. manual log-softmax NLL."""

import numpy as np
import jax.numpy as jnp

from novel_vqa_tpu.ops import cross_entropy, sequence_nll


def lua_criterion(logprobs: np.ndarray, seq: np.ndarray):
    """Literal transcription of crit:updateOutput (AutoEncoder.lua:437-474)."""
    L, N, Mp1 = logprobs.shape
    D = seq.shape[0]
    assert D == L - 1
    loss = 0.0
    n = 0
    for b in range(N):
        first_time = True
        for t in range(L):
            target = 0 if t >= D else int(seq[t, b])
            if target == 0 and first_time:
                target = Mp1
                first_time = False
            if target != 0:
                loss -= logprobs[t, b, target - 1]
                n += 1
    return loss / n, n


def test_sequence_nll_matches_lua_loop():
    rs = np.random.RandomState(0)
    D, N, V = 5, 7, 11
    logits = rs.randn(D + 1, N, V + 1).astype(np.float32)
    logprobs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    lengths = rs.randint(1, D + 1, size=N)
    seq = np.zeros((D, N), np.int32)
    for b in range(N):
        seq[: lengths[b], b] = rs.randint(1, V + 1, size=lengths[b])

    loss_ref, n_ref = lua_criterion(logprobs, seq)
    loss, n = sequence_nll(jnp.asarray(logprobs), jnp.asarray(seq))
    assert int(n) == n_ref
    np.testing.assert_allclose(float(loss), loss_ref, rtol=1e-5)


def test_sequence_nll_full_length_sequences():
    """Full-length sequences get END scored at the final (t=D) step."""
    rs = np.random.RandomState(1)
    D, N, V = 4, 3, 6
    logits = rs.randn(D + 1, N, V + 1).astype(np.float32)
    logprobs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    seq = rs.randint(1, V + 1, size=(D, N)).astype(np.int32)
    loss_ref, n_ref = lua_criterion(logprobs, seq)
    loss, n = sequence_nll(jnp.asarray(logprobs), jnp.asarray(seq))
    assert int(n) == n_ref == N * (D + 1)
    np.testing.assert_allclose(float(loss), loss_ref, rtol=1e-5)


def test_cross_entropy_matches_manual():
    rs = np.random.RandomState(2)
    scores = rs.randn(5, 10).astype(np.float32)
    labels = rs.randint(1, 11, size=5).astype(np.uint32)  # 1-indexed
    logp = scores - np.log(np.exp(scores).sum(-1, keepdims=True))
    ref = -np.mean([logp[i, labels[i] - 1] for i in range(5)])
    got = float(cross_entropy(jnp.asarray(scores), jnp.asarray(labels)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)
