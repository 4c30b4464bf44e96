"""Post-training int8 quantization for the serving (inference) path.

The reference has no quantized path; this is a TPU-native extension: the
v5e MXU runs int8 at up to 2x bf16 throughput, and the folded inference
graph (conv+bias+leaky after fold_batchnorm) quantizes cleanly:

  * weights: symmetric per-output-channel int8, scale = absmax/127
    (computed from the FOLDED weights, so BN is inside the scales)
  * activations: symmetric per-tensor int8 with scales calibrated as the
    running absmax of each conv's input over calibration batches
  * accumulation in int32 (preferred_element_type), dequantize with
    sx * sw[k] fused into the bias add by XLA
  * the stem conv (3-channel input) and the detection head (box regressor)
    stay in bf16 — the standard first/last-layer exemption; everything
    between runs on the int8 MXU path

Use via PlainDetector(..., quant="int8") + .calibrate(images), or the
functional API below.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .darknet import _activate, apply_network
from .spec import LayerSpec, NetSpec


def _is_quantizable(spec: NetSpec, layer: LayerSpec) -> bool:
    """Static convs between the stem and the head, on the folded graph."""
    if layer.kind != "conv" or layer.dynamic or layer.groups != 1:
        return False
    if layer.in_channels < 8:
        return False  # the 3-channel stem stays bf16
    last_conv = max(
        (l.index for l in spec.layers if l.kind == "conv" and not l.dynamic),
        default=-1,
    )
    return layer.index != last_conv  # the head stays bf16


def quantize_weights(spec: NetSpec, folded_params: list) -> list:
    """Folded params -> mixed params: quantized convs get
    {"wq" int8 (kh,kw,cin,K), "wscale" f32 (K,), "b" f32}; everything else
    passes through unchanged."""
    out = []
    for layer, p in zip(spec.layers, folded_params):
        if p is None or not _is_quantizable(spec, layer) or "w" not in p:
            out.append(p)
            continue
        w = np.asarray(p["w"], np.float32)
        scale = np.abs(w).max(axis=(0, 1, 2)) / 127.0
        scale = np.where(scale == 0, 1.0, scale).astype(np.float32)
        wq = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
        out.append({
            "wq": jnp.asarray(wq),
            "wscale": jnp.asarray(scale),
            "b": p.get("b"),
        })
    return out


def conv_int8(layer: LayerSpec, p: dict, x: jax.Array, sx: float) -> jax.Array:
    """Quantize x with scale sx, run the int8 conv, dequantize + bias +
    activation (shared by the plain walk and the meta detect path)."""
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) / sx), -127, 127
    ).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, p["wq"],
        window_strides=(layer.stride, layer.stride),
        padding=[(layer.pad, layer.pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (sx * p["wscale"])
    if p.get("b") is not None:
        y = y + p["b"]
    return _activate(y.astype(x.dtype), layer.activation)


def calibrate_act_scales(
    spec: NetSpec, folded_params: list, images: np.ndarray,
    batch: int = 8,
) -> dict[int, float]:
    """Per-quantized-conv-input symmetric scales: absmax/127 over the
    calibration images, run through the folded fp graph."""
    absmax: dict[int, float] = {}

    def observe(idx, x):
        if _is_quantizable(spec, spec.layers[idx]):
            m = float(jnp.max(jnp.abs(x.astype(jnp.float32))))
            absmax[idx] = max(absmax.get(idx, 0.0), m)

    for s in range(0, len(images), batch):
        apply_network(spec, folded_params, jnp.asarray(images[s:s + batch]),
                      observe=observe)
    return {k: (v / 127.0 if v > 0 else 1.0) for k, v in absmax.items()}


def apply_network_int8(
    spec: NetSpec, qparams: list, act_scales: dict[int, float], x: jax.Array
) -> jax.Array:
    """Folded inference with int8 MXU convs (jit-compatible; act_scales are
    python floats baked in at trace time)."""
    return apply_network(spec, qparams, x, act_scales=act_scales)[0]
