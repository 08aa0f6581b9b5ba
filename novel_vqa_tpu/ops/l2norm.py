"""Row-wise L2 normalization.

Reference: 001_train_autoencoder/misc/L2Normalize.lua:10-40 (forward x/||x||,
backward via an explicit bmm Jacobian).  Under ``jax.grad`` the hand-written
Jacobian is unnecessary — autodiff of the forward produces the same VJP and
XLA fuses the whole thing into one VPU pass.

Also covers the image-feature normalization at
002_train_vqa_arch1/002_train_baseline.lua:117-123, which divides by the raw
norm with no epsilon; ``eps=0.0`` reproduces that exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 0.0) -> jax.Array:
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / (norm + eps)
