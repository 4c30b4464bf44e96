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


def bn_train_config() -> tuple[float, bool]:
    """(running-stat momentum, use-unbiased-variance-in-running-update).

    Default: torch nn.BatchNorm2d semantics — momentum 0.1, unbiased
    variance in the running update (the reference trained with torch BN;
    its native extension is commented out at darknet_meta.py:248).

    FSD_BN_DARKNET=1 selects the darknet extension's semantics instead
    (batchnorm.c:196-203: rolling = .99*rolling + .01*batch_stat with the
    BIASED batch variance) — for continuing/serving .weights files whose
    running stats were produced by that extension. The normalization math
    itself (biased batch stats, eps 1e-5) is identical in both modes. Set
    the env var before the first train step (it is read at trace time).
    """
    import os

    if os.environ.get("FSD_BN_DARKNET") == "1":
        return 0.01, False
    return BN_MOMENTUM, True


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
    # Measured and rejected: a reshape+reduce_max formulation for the
    # non-overlapping 2x2/s2 case (elementwise backward instead of
    # select_and_scatter) costs ~10% end-to-end on v5e — XLA fuses the
    # reduce_window chain better than the 6-D reshaped reduce. See PERF.md.
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
# space-to-depth stem (exact rewrite of conv3x3s1 [+BN+act] + maxpool2x2s2)
# ---------------------------------------------------------------------------


def space_to_depth(x: jax.Array, s: int = 2) -> jax.Array:
    """(B, H, W, C) -> (B, H/s, W/s, s*s*C), channel layout (v*s+u)*C + c
    for pixel offset (v, u) inside each s x s block."""
    b, h, w, c = x.shape
    if h % s or w % s:
        raise ValueError(f"space_to_depth: dims {(h, w)} not divisible by {s}")
    x = x.reshape(b, h // s, s, w // s, s, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // s, w // s, s * s * c)


def _s2d_selector() -> "np.ndarray":
    """Constant T[R,S,pi,po,a,b] mapping original 3x3 tap (a,b) of weight W
    into the (R,S) tap of the space-to-depth conv, for input phase pi=(vi,ui)
    and output phase po=(v,u). Derivation: output row 2i+v reads input row
    2i+v+dr (dr=a-1); the s2d tap (i+R-1, phase vi) holds input row
    2(i+R-1)+vi, so dr = 2R-2+vi-v (and likewise for columns)."""
    import numpy as np

    t = np.zeros((3, 3, 4, 4, 3, 3), np.float32)
    for R in range(3):
        for S in range(3):
            for vi in range(2):
                for ui in range(2):
                    for v in range(2):
                        for u in range(2):
                            dr = 2 * R - 2 + vi - v
                            ds = 2 * S - 2 + ui - u
                            if -1 <= dr <= 1 and -1 <= ds <= 1:
                                t[R, S, vi * 2 + ui, v * 2 + u, dr + 1, ds + 1] = 1.0
    return t


_S2D_T = None


def s2d_stem_weight(w: jax.Array) -> jax.Array:
    """Lift a (3, 3, C, K) stride-1 conv weight to the equivalent
    (3, 3, 4C, 4K) weight on space-to-depth(2) input, where output channel
    block po holds the conv result at pixel phase po of the original grid.
    Pure linear reindexing (einsum with a constant 0/1 tensor), so gradients
    flow back to the original weight."""
    global _S2D_T
    if _S2D_T is None:
        _S2D_T = _s2d_selector()
    kh, kw, c, k = w.shape
    if (kh, kw) != (3, 3):
        raise ValueError("s2d stem expects a 3x3 kernel")
    t = jnp.asarray(_S2D_T, w.dtype)
    ws = jnp.einsum("RSpqab,abck->RSpcqk", t, w)
    return ws.reshape(3, 3, 4 * c, 4 * k)


def stem_s2d_conv_pool(
    x: jax.Array,
    w: jax.Array,
    bn: dict | None,
    activation: str,
    bias: jax.Array | None,
    train: bool,
) -> tuple[jax.Array, dict | None]:
    """conv3x3(s1,p1)+[BN]+[act]+maxpool(2,2), computed without ever
    materializing the full-resolution conv output.

    The classic TPU stem trick (low-channel 3x3 convs waste the 128-lane
    MXU and their full-res activations dominate HBM traffic): run the conv
    on space-to-depth input producing all four pool-window phases as
    channel blocks, apply BN/activation per original channel with the phase
    axis folded into the statistics reduction (bit-equal population), and
    take the pool max across the phase axis — a cheap channel reduce that
    XLA fuses with the normalize pass. Exact (same math, reassociated).
    """
    b, h, wd, c = x.shape
    k = w.shape[-1]
    xs = space_to_depth(x, 2)
    ws = s2d_stem_weight(w)
    y = jax.lax.conv_general_dilated(
        xs,
        ws.astype(xs.dtype),
        window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y.reshape(b, h // 2, wd // 2, 4, k)
    new_stats = None
    if bn is not None:
        if train:
            y, new_stats = batchnorm_train(y, bn)
        else:
            y = batchnorm_apply(y, bn)
    elif bias is not None:
        y = y + bias.astype(y.dtype)
    if activation == "leaky":
        y = leaky_relu(y, 0.1)
    elif activation == "relu":
        y = jax.nn.relu(y)
    return jnp.max(y, axis=3), new_stats


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
    from jax.ad_checkpoint import checkpoint_name

    from .bn_pallas import bn_sums

    reduce_axes = tuple(range(x.ndim - 1))
    n = 1
    for a in reduce_axes:
        n *= x.shape[a]
    # single-pass fused sum/sum-sq (fp32 accumulation; Pallas kernel on TPU
    # — XLA's convert+reduce ran at ~22% of HBM bandwidth, see PERF.md)
    s, q = bn_sums(x)
    mean = s / n
    var = q / n - jnp.square(mean)
    # tag the (tiny) batch stats as remat-saveable: recomputing them in the
    # backward re-reads the full conv activation — one whole HBM pass per
    # BN layer the profiler showed we were paying for nothing
    mean = checkpoint_name(mean, "bn_stats")
    var = checkpoint_name(var, "bn_stats")
    inv = jax.lax.rsqrt(var + BN_EPS) * bn["gamma"]
    bias = bn["beta"] - mean * inv
    y = x * inv.astype(x.dtype) + bias.astype(x.dtype)
    momentum, use_unbiased = bn_train_config()
    running_var = var * (n / max(n - 1, 1)) if use_unbiased else var
    new_stats = {
        "mean": (1 - momentum) * bn["mean"] + momentum * mean,
        "var": (1 - momentum) * bn["var"] + momentum * running_var,
    }
    return y, new_stats
