"""Functional executor for static (non-dynamic) darknet graphs.

`init_params` / `apply_network` are the pure init/apply pair for a compiled
`NetSpec`: plain YOLOv2 backbones (cfg/yolo-voc.cfg, cfg/tiny-yolo-voc.cfg)
and the reweighting learnet (cfg/reweighting_net.cfg). The meta detection
path (dynamic convs, class-broadcast routes) lives in models/meta.py.

Layouts are TPU-native: NHWC activations, HWIO conv weights, channels-last
BN params. The reference's interpreter forward is darknet.py:80-129 /
darknet_meta.py:107-128 in /root/reference; here the walk happens at trace
time so XLA sees a straight-line graph.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from ..ops.layers import (
    batchnorm_apply,
    batchnorm_train,
    global_avgpool,
    global_maxpool,
    leaky_relu,
    maxpool,
    maxpool_stride1,
    reorg,
    stem_s2d_conv_pool,
)
from .spec import LayerSpec, NetSpec

Params = list[dict[str, Any] | None]


def _activate(x: jax.Array, activation: str) -> jax.Array:
    if activation == "leaky":
        return leaky_relu(x, 0.1)
    if activation == "relu":
        return jax.nn.relu(x)
    return x


def conv2d(
    x: jax.Array,
    w: jax.Array,
    stride: int,
    pad: int,
    groups: int = 1,
) -> jax.Array:
    """Grouped 2D convolution, NHWC x HWIO -> NHWC.

    Output keeps the input dtype: on TPU the MXU accumulates bf16 inputs in
    fp32 internally, and a fp32 preferred_element_type would break the
    transpose (grad) rule under mixed precision."""
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def apply_conv_layer(
    layer: LayerSpec,
    p: dict[str, Any],
    x: jax.Array,
    train: bool,
) -> tuple[jax.Array, dict | None]:
    """conv [+ BN] [+ activation]; returns (y, new_bn_stats|None).

    Conv outputs are tagged "conv_out" so rematerialization policies can
    save exactly them and recompute the cheap BN/activation epilogues
    (see train.trainer REMAT_POLICY)."""
    y = conv2d(x, p["w"], layer.stride, layer.pad, layer.groups)
    y = checkpoint_name(y, "conv_out")
    new_stats = None
    if layer.batch_normalize:
        if train:
            y, new_stats = batchnorm_train(y, p["bn"])
        else:
            y = batchnorm_apply(y, p["bn"])
    elif "b" in p:
        y = y + p["b"].astype(y.dtype)
    return _activate(y, layer.activation), new_stats


def init_params(spec: NetSpec, rng: jax.Array | int = 0) -> Params:
    """Initialize parameters (torch-0.3-style uniform fan-in for conv/fc,
    ones/zeros for BN — the reference always fine-tuned from pretrained
    weights, so BN init is not load-bearing)."""
    if isinstance(rng, int):
        rng = jax.random.PRNGKey(rng)
    params: Params = []
    for layer in spec.layers:
        if layer.kind == "conv":
            if layer.dynamic:
                p: dict[str, Any] = {}
                if layer.partial is not None:
                    # shared partial weight: (kh, kw, partial)
                    rng, k = jax.random.split(rng)
                    n = layer.partial * layer.size * layer.size
                    stdv = 1.0 / float(np.sqrt(n))
                    p["w"] = jax.random.uniform(
                        k, (layer.size, layer.size, layer.partial),
                        jnp.float32, -stdv, stdv,
                    )
                if layer.batch_normalize:
                    p["bn"] = {
                        "gamma": jnp.ones((layer.out_channels,), jnp.float32),
                        "beta": jnp.zeros((layer.out_channels,), jnp.float32),
                        "mean": jnp.zeros((layer.out_channels,), jnp.float32),
                        "var": jnp.ones((layer.out_channels,), jnp.float32),
                    }
                params.append(p or None)
                continue
            cin = layer.in_channels // layer.groups
            fan_in = cin * layer.size * layer.size
            stdv = 1.0 / float(np.sqrt(fan_in))
            rng, kw, kb = jax.random.split(rng, 3)
            p: dict[str, Any] = {
                "w": jax.random.uniform(
                    kw,
                    (layer.size, layer.size, cin, layer.out_channels),
                    jnp.float32,
                    -stdv,
                    stdv,
                )
            }
            if layer.batch_normalize:
                p["bn"] = {
                    "gamma": jnp.ones((layer.out_channels,), jnp.float32),
                    "beta": jnp.zeros((layer.out_channels,), jnp.float32),
                    "mean": jnp.zeros((layer.out_channels,), jnp.float32),
                    "var": jnp.ones((layer.out_channels,), jnp.float32),
                }
            elif layer.bias:
                p["b"] = jax.random.uniform(
                    kb, (layer.out_channels,), jnp.float32, -stdv, stdv
                )
            params.append(p)
        elif layer.kind == "connected":
            stdv = 1.0 / float(np.sqrt(layer.in_channels))
            rng, kw, kb = jax.random.split(rng, 3)
            params.append(
                {
                    "w": jax.random.uniform(
                        kw,
                        (layer.in_channels, layer.out_channels),
                        jnp.float32,
                        -stdv,
                        stdv,
                    ),
                    "b": jax.random.uniform(
                        kb, (layer.out_channels,), jnp.float32, -stdv, stdv
                    ),
                }
            )
        else:
            params.append(None)
    return params


def can_fuse_s2d_stem(spec: NetSpec) -> bool:
    """True when layers 0-1 are the conv3x3(s1,p1)+maxpool(2,2) pattern the
    space-to-depth stem rewrite handles, and nothing routes back into them
    (the full-resolution conv output is never materialized)."""
    if len(spec.layers) < 2:
        return False
    c0, p1 = spec.layers[0], spec.layers[1]
    ok = (
        c0.kind == "conv"
        and not c0.dynamic
        and c0.size == 3
        and c0.stride == 1
        and c0.pad == 1
        and c0.groups == 1
        and c0.activation in ("leaky", "relu", "linear")
        and p1.kind == "maxpool"
        and p1.size == 2
        and p1.stride == 2
    )
    if not ok:
        return False
    return not any(
        s in (0, 1) for l in spec.layers[2:] for s in l.sources
    )


def apply_network(
    spec: NetSpec,
    params: Params,
    x: jax.Array,
    *,
    train: bool = False,
    start: int = 0,
    stop: int | None = None,
    s2d_stem: bool = False,
    observe=None,
    act_scales=None,
) -> tuple[jax.Array, dict[str, Any]]:
    """Run a static network. Returns (output, aux) where aux carries
    ``bn_updates`` ({layer_index: new stats} when train=True) and
    ``splits`` (tensors emitted by [split] layers, in order — the learnet's
    per-split dynamic-weight outputs, darknet_meta.py:120-126).

    ``start``/``stop`` run a sub-range of layers (used for feat_layer>0
    learnet stems and partial-backbone extraction).

    ``s2d_stem=True`` computes an eligible conv+pool stem (see
    can_fuse_s2d_stem) in space-to-depth form — exact same math, but the
    full-resolution stem activation never touches HBM (see
    ops.layers.stem_s2d_conv_pool).

    ``observe(layer_index, x)`` is called with every static conv's input
    (int8 calibration hook); conv params carrying ``wq`` run on the int8
    MXU path with ``act_scales[layer_index]`` (models.quant).
    """
    outputs: dict[int, jax.Array] = {}
    bn_updates: dict[int, dict] = {}
    splits: list[jax.Array] = []
    end = stop if stop is not None else len(spec.layers)
    layers = spec.layers[start:end]

    if s2d_stem and start == 0 and end >= 2 and can_fuse_s2d_stem(spec):
        c0 = spec.layers[0]
        p = params[0]
        x, stats = stem_s2d_conv_pool(
            x, p["w"], p.get("bn"), c0.activation, p.get("b"), train
        )
        if stats is not None:
            bn_updates[0] = stats
        outputs[1] = x
        layers = layers[2:]

    for layer in layers:
        kind = layer.kind
        if kind == "conv":
            if layer.dynamic:
                raise ValueError(
                    "dynamic conv in a static network — use models.meta"
                )
            p = params[layer.index]
            if observe is not None:
                observe(layer.index, x)
            if p is not None and "wq" in p:
                from .quant import conv_int8  # lazy: quant imports darknet

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
                x = jnp.concatenate([a, b], axis=-1)
        elif kind == "shortcut":
            x = outputs[layer.sources[0]] + outputs[layer.sources[1]]
            x = _activate(x, layer.activation)
        elif kind == "globalmax":
            x = global_maxpool(x)
        elif kind == "globalavg" or kind == "avgpool":
            x = global_avgpool(x)
        elif kind == "softmax":
            x = jax.nn.softmax(x, axis=-1)
        elif kind == "connected":
            w = params[layer.index]["w"]
            b = params[layer.index]["b"]
            x = x.reshape(x.shape[0], -1) @ w.astype(x.dtype) + b.astype(x.dtype)
            x = _activate(x, layer.activation)
        elif kind == "split":
            bounds = np.cumsum((0,) + layer.splits)
            xs = [x[..., bounds[i] : bounds[i + 1]] for i in range(len(layer.splits))]
            splits.append(xs[0])
            x = xs[-1]
        elif kind in ("region", "cost"):
            pass  # loss metadata only; output is the preceding conv
        else:
            raise ValueError(f"unhandled layer kind {kind!r}")
        outputs[layer.index] = x

    return x, {"bn_updates": bn_updates, "splits": splits}


def fold_batchnorm(spec: NetSpec, params: Params) -> Params:
    """Fold BN running stats into conv weights for inference.

    w' = w * gamma/sqrt(var+eps); b' = beta - mean*gamma/sqrt(var+eps).
    Returns new params with `bn` removed and `b` added; layers without BN
    are passed through unchanged.
    """
    from ..ops.layers import BN_EPS

    folded: Params = []
    for layer, p in zip(spec.layers, params):
        # dynamic convs are not static-foldable (their effective weights are
        # the per-episode class codes); leave their params untouched
        if (p is None or layer.kind != "conv" or layer.dynamic
                or not layer.batch_normalize):
            folded.append(p)
            continue
        bn = p["bn"]
        scale = bn["gamma"] / jnp.sqrt(bn["var"] + BN_EPS)
        folded.append(
            {
                "w": p["w"] * scale[None, None, None, :],
                "b": bn["beta"] - bn["mean"] * scale,
            }
        )
    return folded


def folded_spec(spec: NetSpec) -> NetSpec:
    """Spec view matching fold_batchnorm output (BN flags cleared)."""
    import dataclasses

    layers = tuple(
        dataclasses.replace(l, batch_normalize=False, bias=True)
        if l.kind == "conv" and l.batch_normalize and not l.dynamic
        else l
        for l in spec.layers
    )
    return dataclasses.replace(spec, layers=layers)
