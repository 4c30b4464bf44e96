"""Focal loss (reference /root/reference/FocalLoss.py:13-96 — present in
the codebase but unused on the main path; kept for surface parity).

loss(x, cls) = -alpha[cls] * (1 - softmax(x)[cls])^gamma * log softmax(x)[cls]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def focal_loss(
    logits: jax.Array,
    targets: jax.Array,
    gamma: float = 2.0,
    alpha: jax.Array | None = None,
    size_average: bool = True,
) -> jax.Array:
    """logits (N, C); targets (N,) int. gamma=0 with uniform alpha reduces
    to cross-entropy (the reference's own self-check, FocalLoss.py:80-105).
    """
    n, c = logits.shape
    logp = jax.nn.log_softmax(logits, axis=-1)
    logp_t = jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
    p_t = jnp.exp(logp_t)
    a = jnp.ones((c,)) if alpha is None else jnp.asarray(alpha).reshape(-1)
    a_t = a[targets]
    loss = -a_t * (1.0 - p_t) ** gamma * logp_t
    return loss.mean() if size_average else loss.sum()
