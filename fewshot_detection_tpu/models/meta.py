"""Meta detector: reweighting learnet + dynamically-modulated YOLOv2 head.

Reference behavior being reproduced (file:line in /root/reference):
  * meta_forward — learnet over (support RGB [+ mask]) inputs, collecting one
    dynamic-weight tensor per [split] layer plus the final output
    (darknet_meta.py:107-128)
  * detect_forward — backbone walk where the dynamic conv consumes the class
    codes (darknet_meta.py:130-195) and routes broadcast across the class
    axis (maybe_repeat, darknet_meta.py:16-35)
  * dynamic conv semantics — grouped conv whose filters ARE the class codes
    (dynamic_conv.py:110-168); with the shipped 1024->1024 1x1 depthwise
    config this is per-class channel reweighting

TPU-first design: the shipped dconv+head pair is fused into a single
(B*H*W, C) x (C, N*K) matmul so the (B*n_cls, H, W, 1024) expansion is never
materialized (15x activation-memory saving at n_cls=15; see SURVEY.md §3.5).
The general grouped-conv path is kept for nonstandard cfgs (partial weights,
multi-split learnets).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.layers import leaky_relu
from .darknet import Params, _activate, apply_conv_layer, apply_network, conv2d
from .spec import LayerSpec, NetSpec


@dataclasses.dataclass(frozen=True)
class MetaSpec:
    darknet: NetSpec
    learnet: NetSpec

    @property
    def region(self):
        return self.darknet.region


def init_meta_params(spec: MetaSpec, rng: jax.Array | int = 0) -> dict[str, Params]:
    from .darknet import init_params

    if isinstance(rng, int):
        rng = jax.random.PRNGKey(rng)
    kd, kl = jax.random.split(rng)
    return {
        "darknet": init_params(spec.darknet, kd),
        "learnet": init_params(spec.learnet, kl),
    }


def class_broadcast(x: jax.Array, n_cls: int) -> jax.Array:
    """(B, ...) -> (B*n_cls, ...) b-major interleave: out[b*n+j] = x[b].

    Matches maybe_repeat's repeat/transpose/view (darknet_meta.py:16-35)."""
    return jnp.repeat(x, n_cls, axis=0)


def meta_forward(
    spec: MetaSpec,
    params: dict[str, Params],
    metax: jax.Array,
    mask: jax.Array | None,
    *,
    metain_type: int = 2,
    train: bool = False,
    s2d: bool = False,
    act_scales: dict[int, float] | None = None,
    observe=None,
) -> tuple[list[jax.Array], dict[str, Any]]:
    """Support branch: (N, Hm, Wm, 3|6) images + (N, Hmask, Wmask, 1) masks
    -> list of per-class code tensors (N, 1, 1, C) (one per learnet [split]
    plus the final output).

    ``act_scales``/``observe`` drive the int8 LEARNET path (ensemble eval
    phase 1 runs the learnet over EVERY support image); keys are learnet
    layer indices — the feat_layer backbone stem, when active, stays on the
    float path."""
    feat_layer = spec.learnet.feat_layer
    bn_updates: dict[str, dict] = {}
    if feat_layer > 0:
        # Run the first `feat_layer` backbone layers on the support image.
        # 6-channel inputs (metain_type 4: image + cropped object) are split
        # into two 3-channel stacks, run through the shared stem, and
        # re-concatenated channel-wise (darknet_meta.py:110-116).
        done_split = metax.shape[-1] == 6
        if done_split:
            metax = jnp.concatenate([metax[..., :3], metax[..., 3:]], axis=0)
        metax, aux = apply_network(
            spec.darknet, params["darknet"], metax, train=train,
            stop=feat_layer, s2d_stem=s2d,
        )
        bn_updates["darknet_stem"] = aux["bn_updates"]
        if done_split:
            half = metax.shape[0] // 2
            metax = jnp.concatenate([metax[:half], metax[half:]], axis=-1)
    if metain_type in (2, 3):
        if mask is None:
            raise ValueError(f"metain_type {metain_type} requires a mask input")
        metax = jnp.concatenate([metax, mask.astype(metax.dtype)], axis=-1)

    out, aux = apply_network(
        spec.learnet, params["learnet"], metax, train=train, s2d_stem=s2d,
        act_scales=act_scales, observe=observe,
    )
    bn_updates["learnet"] = aux["bn_updates"]
    dynamic_weights = list(aux["splits"]) + [out]
    return dynamic_weights, {"bn_updates": bn_updates}


# ---------------------------------------------------------------------------
# dynamic conv
# ---------------------------------------------------------------------------


def _full_dynamic_weight(
    layer: LayerSpec, p: dict | None, dw: jax.Array, n_cls: int
) -> jax.Array:
    """Prepend the shared `partial` weight (broadcast per class) to the
    per-class codes (dynamic_conv.py:133-136). dw: (N, kh, kw, Cd)."""
    if layer.partial is None:
        return dw
    shared = p["w"]  # (kh, kw, partial)
    shared = jnp.broadcast_to(
        shared[None], (n_cls,) + shared.shape
    )
    return jnp.concatenate([shared, dw], axis=-1)


def dynamic_conv_general(
    x: jax.Array,
    dw: jax.Array,
    layer: LayerSpec,
    *,
    is_first: bool,
) -> jax.Array:
    """Materializing grouped dynamic conv, replicating dynamic_conv.py:125-164.

    x: (B, H, W, C) when is_first else (B*n_cls, H, W, C)
    dw: (n_cls, kh, kw, Cd) with Cd % C == 0
    returns (B*n_cls, H', W', C)
    """
    n_cls, kh, kw, cd = dw.shape
    c = x.shape[-1]
    if cd % c:
        raise ValueError(f"dynamic weight channels {cd} not divisible by input {c}")
    group_size = cd // c

    if is_first:
        b = x.shape[0]
        # (B, H, W, C) -> (B, H, W, n_cls*C): class-major channel tiling
        # (torch input.repeat(1, n_cls, 1, 1) tiles the channel dim)
        x = jnp.tile(x, (1, 1, 1, n_cls))
    else:
        bn_, h, w, _ = x.shape
        b = bn_ // n_cls
        # (B*n_cls, H, W, C) -> (B, H, W, n_cls*C); batch is b-major so the
        # class id becomes the leading channel factor
        x = x.reshape(b, n_cls, h, w, c).transpose(0, 2, 3, 1, 4).reshape(b, h, w, n_cls * c)

    # dw (n_cls, kh, kw, Cd) -> torch filter rows (n_cls*Cd/g, g, kh, kw)
    rows = n_cls * cd // group_size
    w_oihw = dw.transpose(0, 3, 1, 2).reshape(rows, group_size, kh, kw)
    w_hwio = w_oihw.transpose(2, 3, 1, 0)  # (kh, kw, g, rows)

    groups = n_cls * c // group_size
    y = conv2d(x, w_hwio, layer.stride, layer.pad, groups=groups)
    bh, hh, wh, _ = y.shape
    return y.reshape(bh, hh, wh, n_cls, c).transpose(0, 3, 1, 2, 4).reshape(
        bh * n_cls, hh, wh, c
    )


def _can_fuse(layer: LayerSpec, nxt: LayerSpec | None, dw: jax.Array, x: jax.Array) -> bool:
    """Fusable pattern: first dconv, 1x1 depthwise (group_size 1), linear
    activation, no BN, immediately followed by a static 1x1 conv (the
    30-ch head)."""
    return (
        nxt is not None
        and layer.size == 1
        and layer.partial is None
        and not layer.batch_normalize
        and layer.activation == "linear"
        and dw.shape[1] == 1
        and dw.shape[2] == 1
        and dw.shape[3] == x.shape[-1]
        and nxt.kind == "conv"
        and not nxt.dynamic
        and nxt.size == 1
        and nxt.groups == 1
        and not nxt.batch_normalize
        and nxt.stride == 1
    )


def fused_reweight_head(
    x: jax.Array,
    dw: jax.Array,
    head_w: jax.Array,
    head_b: jax.Array | None,
    activation: str,
) -> jax.Array:
    """y[b,n,:,:,k] = head(x[b] * dw[n]) as ONE matmul.

    x: (B, H, W, C); dw: (N, 1, 1, C); head_w: (1, 1, C, K) ->
    (B*N, H, W, K) without materializing (B*N, H, W, C).

    eff[c, n*K+k] = dw[n,c] * head_w[c,k]; y = x @ eff  — a
    (B*H*W, C) x (C, N*K) contraction that tiles well on the MXU
    (N*K lanes instead of K)."""
    b, h, w, c = x.shape
    n = dw.shape[0]
    k = head_w.shape[-1]
    w_cls = dw.reshape(n, c)
    eff = (w_cls.T[:, :, None] * head_w.reshape(c, 1, k)).reshape(c, n * k)
    y = jnp.einsum("bhwc,cm->bhwm", x, eff.astype(x.dtype))
    y = y.reshape(b, h, w, n, k).transpose(0, 3, 1, 2, 4).reshape(b * n, h, w, k)
    if head_b is not None:
        y = y + head_b.astype(y.dtype)
    return _activate(y, activation)


def fused_reweight_head_int8(
    x: jax.Array,
    dw: jax.Array,
    head_w: jax.Array,
    head_b: jax.Array | None,
    activation: str,
    sx: float,
) -> jax.Array:
    """int8 MXU variant of fused_reweight_head (models/quant.py scheme).

    The effective weight eff[c, n*K+k] = dw[n,c] * head_w[c,k] depends on
    the per-sweep class codes, so it is quantized ON DEVICE inside the jit
    (per output column, symmetric absmax — a (C, N*K) reduction, trivial
    next to the (B*H*W, C) x (C, N*K) contraction it feeds); the input uses
    the calibrated per-tensor scale `sx`. int32 accumulation, dequantize
    fused into the bias add."""
    b, h, w, c = x.shape
    n = dw.shape[0]
    k = head_w.shape[-1]
    w_cls = dw.reshape(n, c)
    eff = (
        w_cls.T[:, :, None] * head_w.reshape(c, 1, k)
    ).reshape(c, n * k).astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(eff), axis=0), 1e-12) / 127.0
    effq = jnp.clip(jnp.round(eff / scale), -127, 127).astype(jnp.int8)
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) / sx), -127, 127
    ).astype(jnp.int8)
    y = jnp.einsum("bhwc,cm->bhwm", xq, effq,
                   preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (sx * scale)
    y = y.reshape(b, h, w, n, k).transpose(0, 3, 1, 2, 4).reshape(b * n, h, w, k)
    if head_b is not None:
        y = y + head_b.astype(y.dtype)
    return _activate(y.astype(x.dtype), activation)


# ---------------------------------------------------------------------------
# detection forward
# ---------------------------------------------------------------------------


def detect_forward(
    spec: MetaSpec,
    params: dict[str, Params],
    x: jax.Array,
    dynamic_weights: list[jax.Array],
    *,
    train: bool = False,
    fuse: bool = True,
    s2d: bool = False,
    act_scales: dict[int, float] | None = None,
    observe=None,
) -> tuple[jax.Array, dict[str, Any]]:
    """Backbone + dynamic reweighting + head.

    ``act_scales``/``observe`` serve the int8 path (models/quant.py): static
    convs whose params carry ``wq`` run on the int8 MXU with the given
    activation scales; ``observe(idx, x)`` records calibration inputs.

    x: (B, H, W, 3); dynamic_weights: list of (n_cls, kh, kw, Cd).
    Returns ((B*n_cls, H/32, W/32, A*(5+nC)), aux).

    Tuple routes (``concat=0``, darknet_meta.py:166-168) emit ``(x1, x2)``
    unchanged; a downstream dynamic conv consumes the pair as
    (input, dynamic_weight) — the in-graph counterpart of meta_forward's
    collected weight list. (The reference stores the tuple but its
    interpreter re-wraps dynamic inputs, so no consumer actually runs
    there; this completes the cfg language with the one coherent reading.)
    """
    dparams = params["darknet"]
    layers = spec.darknet.layers
    outputs: dict[int, jax.Array] = {}
    bn_updates: dict[int, dict] = {}

    from ..ops.layers import (
        global_avgpool,
        global_maxpool,
        maxpool,
        maxpool_stride1,
        reorg,
        stem_s2d_conv_pool,
    )
    from .darknet import can_fuse_s2d_stem

    start_li = 0
    if s2d and can_fuse_s2d_stem(spec.darknet):
        c0 = layers[0]
        p0 = dparams[0]
        x, stats = stem_s2d_conv_pool(
            x, p0["w"], p0.get("bn"), c0.activation, p0.get("b"), train
        )
        if stats is not None:
            bn_updates[0] = stats
        outputs[1] = x
        start_li = 2

    dyn_cnt = 0
    dw_cursor = 0
    skip_next = False
    for li, layer in enumerate(layers):
        if li < start_li:
            continue
        if skip_next:
            skip_next = False
            outputs[layer.index] = x
            continue
        kind = layer.kind
        if kind == "conv":
            if layer.dynamic:
                if isinstance(x, tuple):
                    # tuple route output (concat=0, darknet_meta.py:166-168):
                    # the second element IS the dynamic weight, supplied
                    # in-graph instead of from meta_forward's list
                    x, dw_in = x
                else:
                    dw_in = dynamic_weights[dw_cursor]
                    dw_cursor += 1
                dw = _full_dynamic_weight(
                    layer, dparams[layer.index], dw_in, dw_in.shape[0]
                )
                is_first = dyn_cnt == 0
                nxt = layers[li + 1] if li + 1 < len(layers) else None
                if fuse and is_first and _can_fuse(layer, nxt, dw, x):
                    if observe is not None:
                        observe(layer.index, x)
                    head_p = dparams[nxt.index]
                    if act_scales is not None and layer.index in act_scales:
                        x = fused_reweight_head_int8(
                            x, dw, head_p["w"], head_p.get("b"),
                            nxt.activation, act_scales[layer.index],
                        )
                    else:
                        x = fused_reweight_head(
                            x, dw, head_p["w"], head_p.get("b"), nxt.activation
                        )
                    skip_next = True
                else:
                    x = dynamic_conv_general(x, dw, layer, is_first=is_first)
                    if layer.batch_normalize:
                        from ..ops.layers import batchnorm_apply, batchnorm_train

                        bn_p = dparams[layer.index]["bn"]
                        if train:
                            x, stats = batchnorm_train(x, bn_p)
                            bn_updates[layer.index] = stats
                        else:
                            x = batchnorm_apply(x, bn_p)
                    x = _activate(x, layer.activation)
                dyn_cnt += 1
            else:
                p = dparams[layer.index]
                if observe is not None:
                    observe(layer.index, x)
                if not train and p is not None and "wq" in p:
                    from .quant import conv_int8

                    x = conv_int8(layer, p, x, act_scales[layer.index])
                else:
                    x, stats = apply_conv_layer(layer, p, x, train)
                    if stats is not None:
                        bn_updates[layer.index] = stats
        elif kind == "maxpool":
            x = maxpool_stride1(x) if layer.stride == 1 else maxpool(x, layer.size, layer.stride)
        elif kind == "reorg":
            x = reorg(x, layer.stride)
        elif kind == "route":
            if len(layer.sources) == 1:
                x = outputs[layer.sources[0]]
            else:
                a, b = (outputs[s] for s in layer.sources)
                if not layer.concat:
                    # tuple passthrough, no broadcast (darknet_meta.py:166-168);
                    # consumed by a downstream dynamic conv as
                    # (input, dynamic_weight)
                    x = (a, b)
                    outputs[layer.index] = x
                    continue
                # class-broadcast the smaller batch (maybe_repeat semantics)
                if a.shape[0] != b.shape[0]:
                    if a.shape[0] < b.shape[0]:
                        a = class_broadcast(a, b.shape[0] // a.shape[0])
                    else:
                        b = class_broadcast(b, a.shape[0] // b.shape[0])
                x = jnp.concatenate([a, b], axis=-1)
        elif kind == "shortcut":
            x = outputs[layer.sources[0]] + outputs[layer.sources[1]]
            x = _activate(x, layer.activation)
        elif kind == "globalmax":
            x = global_maxpool(x)
        elif kind in ("globalavg", "avgpool"):
            x = global_avgpool(x)
        elif kind == "softmax":
            x = jax.nn.softmax(x, axis=-1)
        elif kind in ("region", "cost"):
            pass
        else:
            raise ValueError(f"unhandled layer kind {kind!r} in detect_forward")
        outputs[layer.index] = x

    return x, {"bn_updates": bn_updates}


def forward(
    spec: MetaSpec,
    params: dict[str, Params],
    x: jax.Array,
    metax: jax.Array,
    mask: jax.Array | None,
    *,
    metain_type: int = 2,
    train: bool = False,
    fuse: bool = True,
    s2d: bool = False,
) -> tuple[jax.Array, dict[str, Any]]:
    """Full episodic forward (darknet_meta.py:197-201)."""
    dynamic_weights, maux = meta_forward(
        spec, params, metax, mask, metain_type=metain_type, train=train,
        s2d=s2d,
    )
    y, daux = detect_forward(
        spec, params, x, dynamic_weights, train=train, fuse=fuse, s2d=s2d
    )
    return y, {
        "bn_updates": {
            "darknet": daux["bn_updates"],
            **{k: v for k, v in maux["bn_updates"].items()},
        },
        "dynamic_weights": dynamic_weights,
    }
