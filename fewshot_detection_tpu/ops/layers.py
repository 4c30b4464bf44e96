"""Core stateless layer ops (NHWC), XLA-friendly.

All functions are shape-static pure jnp transforms; XLA fuses the elementwise
pieces into neighboring convolutions, so no hand-written kernels are needed
for these (see /opt/skills/guides/pallas_guide.md on letting the compiler
fuse VPU work).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BN_EPS = 1e-5
BN_MOMENTUM = 0.1  # torch nn.BatchNorm2d default, what the reference trained with


def leaky_relu(x: jax.Array, slope: float = 0.1) -> jax.Array:
    return jnp.where(x >= 0, x, slope * x)


def reorg(x: jax.Array, stride: int = 2) -> jax.Array:
    """Darknet-fork reorg: (B, H, W, C) -> (B, H/s, W/s, s*s*C).

    Output channel layout is ``(hi*s + wj)*C + c`` for input pixel offset
    (hi, wj) within each s x s tile — the permutation of the reference's
    view/transpose chain (/root/reference/darknet_meta.py:55-74), which is
    NOT the same as darknet-C's reorg or XLA's space_to_depth.
    """
    b, h, w, c = x.shape
    s = stride
    if h % s or w % s:
        raise ValueError(f"reorg: spatial dims {(h, w)} not divisible by {s}")
    x = x.reshape(b, h // s, s, w // s, s, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, H/s, W/s, hi, wj, C)
    return x.reshape(b, h // s, w // s, s * s * c)


def maxpool(x: jax.Array, size: int, stride: int) -> jax.Array:
    """Standard max pooling, floor semantics (torch MaxPool2d default)."""
    b, h, w, c = x.shape
    # torch floors the output size; reduce_window with VALID padding matches
    # only when (h - size) % stride == 0 — trim the remainder explicitly.
    oh = (h - size) // stride + 1
    ow = (w - size) // stride + 1
    x = x[:, : (oh - 1) * stride + size, : (ow - 1) * stride + size, :]
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, size, size, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )


def maxpool_stride1(x: jax.Array) -> jax.Array:
    """2x2 stride-1 maxpool with replicate pad right/bottom.

    Keeps spatial dims; matches MaxPoolStride1
    (/root/reference/darknet_meta.py:47-53).
    """
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 1, 1, 1),
        padding="VALID",
    )


def global_maxpool(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, 1, 1, C) max over spatial dims."""
    return jnp.max(x, axis=(1, 2), keepdims=True)


def global_avgpool(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, 1, 1, C) mean over spatial dims."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)


# ---------------------------------------------------------------------------
# BatchNorm (torch semantics: the reference trained with nn.BatchNorm2d)
# ---------------------------------------------------------------------------


def batchnorm_apply(x: jax.Array, bn: dict) -> jax.Array:
    """Inference BN with running statistics (affine folded, cast to x dtype)."""
    inv = jax.lax.rsqrt(bn["var"] + BN_EPS) * bn["gamma"]
    bias = bn["beta"] - bn["mean"] * inv
    return x * inv.astype(x.dtype) + bias.astype(x.dtype)


def batchnorm_train(x: jax.Array, bn: dict) -> tuple[jax.Array, dict]:
    """Training BN: normalize with biased batch stats, return updated
    running stats (unbiased var in the running update — torch semantics).

    Under pjit with the batch axis sharded, the mean/var reductions below are
    global (XLA inserts the cross-replica collectives), i.e. sync-BN — a
    deliberate improvement over the reference's per-GPU unsynced
    DataParallel stats (SURVEY.md §7 "Stateful BN under DP").
    """
    reduce_axes = tuple(range(x.ndim - 1))
    n = 1
    for a in reduce_axes:
        n *= x.shape[a]
    xf = x.astype(jnp.float32)  # stats in fp32 even for bf16 activations
    mean = jnp.mean(xf, axis=reduce_axes)
    var = jnp.mean(jnp.square(xf), axis=reduce_axes) - jnp.square(mean)
    inv = jax.lax.rsqrt(var + BN_EPS) * bn["gamma"]
    bias = bn["beta"] - mean * inv
    y = x * inv.astype(x.dtype) + bias.astype(x.dtype)
    unbiased = var * (n / max(n - 1, 1))
    new_stats = {
        "mean": (1 - BN_MOMENTUM) * bn["mean"] + BN_MOMENTUM * mean,
        "var": (1 - BN_MOMENTUM) * bn["var"] + BN_MOMENTUM * unbiased,
    }
    return y, new_stats
