"""SGD + LR schedule with torch-0.3 semantics.

The reference optimizer (train_meta.py:143-147):
  optim.SGD(params, lr=learning_rate/batch_size, momentum=0.9, dampening=0,
            weight_decay=decay*batch_size*factor)
torch SGD update: d = g + wd*p; buf = mu*buf + d; p -= lr*buf.

BatchNorm running statistics live inside the same params pytree but are
STATE, not weights: the update skips any leaf whose path contains 'mean' or
'var' (they get overwritten from the forward pass's bn_updates instead).
The plain trainer additionally exempts BN affine + biases from weight decay
(train.py:132-138); the meta trainer decays everything, matching
train_meta.py:143-147.

The step-LR warmup schedule (cfg steps=-1,500,40000,60000 /
scales=0.1,10,.1,.1 — train_meta.py:150-163) and the neg-ratio LR factor
(train_meta.py:123-135) are reproduced as pure functions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _is_bn_stat(path) -> bool:
    keys = [getattr(k, "key", getattr(k, "name", None)) for k in path]
    return ("mean" in keys) or ("var" in keys)


def _is_no_decay(path) -> bool:
    """BN affine (gamma/beta inside a 'bn' dict) and biases."""
    keys = [getattr(k, "key", getattr(k, "name", None)) for k in path]
    return ("bn" in keys) or (keys and keys[-1] == "b")


def init_momentum(params):
    return jax.tree_util.tree_map(jnp.zeros_like, params)


def clip_by_global_norm(grads, max_norm: float):
    """Scale the gradient pytree so its global L2 norm is <= max_norm.

    NOT part of the reference (its recipes always start from a pretrained
    darknet19 backbone and never need it); opt-in via FSD_CLIP_NORM for
    from-scratch runs, where the early conf loss can diverge SGD."""
    leaves = jax.tree_util.tree_leaves(grads)
    gn = jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                      for g in leaves))
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(gn, 1e-12))
    return jax.tree_util.tree_map(lambda g: (g * scale).astype(g.dtype), grads)


def sgd_update(
    params,
    grads,
    momentum_buf,
    lr,
    *,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    decay_bn_and_bias: bool = True,
    clip_norm: float = 0.0,
):
    """One torch-semantics SGD step over the full params pytree; BN running
    stats pass through untouched. clip_norm > 0 applies global-norm gradient
    clipping first (an opt-in extension — see clip_by_global_norm)."""
    if clip_norm and clip_norm > 0:
        grads = clip_by_global_norm(grads, clip_norm)

    def upd(path, p, g, m):
        if _is_bn_stat(path):
            return p, m
        wd = weight_decay
        if not decay_bn_and_bias and _is_no_decay(path):
            wd = 0.0
        d = g + wd * p
        m2 = momentum * m + d
        return p - lr * m2, m2

    flat = jax.tree_util.tree_map_with_path(upd, params, grads, momentum_buf)
    new_params = jax.tree_util.tree_map(lambda t: t[0], flat, is_leaf=lambda t: isinstance(t, tuple))
    new_mom = jax.tree_util.tree_map(lambda t: t[1], flat, is_leaf=lambda t: isinstance(t, tuple))
    return new_params, new_mom


def lr_schedule(
    processed_batches: int | jax.Array,
    base_lr: float,
    steps: tuple[float, ...],
    scales: tuple[float, ...],
) -> float:
    """adjust_learning_rate (train_meta.py:150-163): multiply by scale[i]
    for each step threshold crossed; stop scanning at the first step the
    batch count hasn't reached (or exactly equals)."""
    lr = base_lr
    for i, step in enumerate(steps):
        scale = scales[i] if i < len(scales) else 1.0
        if processed_batches >= step:
            lr = lr * scale
            if processed_batches == step:
                break
        else:
            break
    return lr


def neg_ratio_lr_factor(neg_ratio, n_meta_classes: int) -> float:
    """LR divisor keyed to the neg sampling ratio (train_meta.py:123-135)."""
    if neg_ratio == "full":
        return 15.0
    if neg_ratio == 1:
        return 3.0
    if neg_ratio == 0:
        return 1.5
    if neg_ratio == 5:
        return 8.0
    return float(n_meta_classes)
