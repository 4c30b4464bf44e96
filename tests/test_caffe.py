"""Caffe prototxt import."""

import numpy as np

import jax.numpy as jnp

from fewshot_detection_tpu.models.caffe_net import build_caffe_spec, parse_prototxt
from fewshot_detection_tpu.models.darknet import apply_network, init_params

PROTO = """
name: "toy"
layer { name: "data" type: "Input" top: "data" }
layer {
  name: "conv1" type: "Convolution" bottom: "data" top: "conv1"
  convolution_param { num_output: 8 kernel_size: 3 stride: 1 pad: 1 }
}
layer { name: "relu1" type: "ReLU" bottom: "conv1" top: "conv1" }
layer {
  name: "pool1" type: "Pooling" bottom: "conv1" top: "pool1"
  pooling_param { pool: MAX kernel_size: 2 stride: 2 }
}
layer {
  name: "conv2" type: "Convolution" bottom: "pool1" top: "conv2"
  convolution_param { num_output: 16 kernel_size: 3 stride: 1 pad: 1 }
}
layer {
  name: "gap" type: "Pooling" bottom: "conv2" top: "gap"
  pooling_param { pool: AVE global_pooling: true }
}
layer {
  name: "fc" type: "InnerProduct" bottom: "gap" top: "fc"
  inner_product_param { num_output: 10 }
}
layer { name: "prob" type: "Softmax" bottom: "fc" top: "prob" }
"""


def test_parse_prototxt(tmp_path):
    p = tmp_path / "toy.prototxt"
    p.write_text(PROTO)
    net = parse_prototxt(str(p))
    assert net["props"]["name"] == "toy"
    assert len(net["layers"]) == 8
    assert net["layers"][1]["convolution_param"]["num_output"] == "8"


def test_caffe_spec_forward(tmp_path):
    p = tmp_path / "toy.prototxt"
    p.write_text(PROTO)
    spec = build_caffe_spec(str(p), height=32, width=32)
    kinds = [l.kind for l in spec.layers]
    assert kinds == ["conv", "maxpool", "conv", "globalavg", "connected",
                     "softmax"]
    assert spec.layers[0].activation == "relu"
    params = init_params(spec, 0)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    y, _ = apply_network(spec, params, x)
    assert y.shape == (2, 10)
    np.testing.assert_allclose(np.asarray(y.sum(-1)), 1.0, rtol=1e-5)


# ---------------------------------------------------------------------------
# .caffemodel import (pure-python protobuf decode)
# ---------------------------------------------------------------------------

PROTO_BN = """
name: "toybn"
layer { name: "data" type: "Input" top: "data" }
layer {
  name: "conv1" type: "Convolution" bottom: "data" top: "conv1"
  convolution_param { num_output: 4 kernel_size: 3 stride: 1 pad: 1 }
}
layer { name: "bn1" type: "BatchNorm" bottom: "conv1" top: "conv1" }
layer { name: "scale1" type: "Scale" bottom: "conv1" top: "conv1" }
layer { name: "relu1" type: "ReLU" bottom: "conv1" top: "conv1" }
layer {
  name: "gap" type: "Pooling" bottom: "conv1" top: "gap"
  pooling_param { pool: AVE global_pooling: true }
}
layer {
  name: "fc" type: "InnerProduct" bottom: "gap" top: "fc"
  inner_product_param { num_output: 3 }
}
"""


def _varint(n):
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num, wire, payload):
    return _varint((num << 3) | wire) + payload


def _ld(num, payload):  # length-delimited
    return _field(num, 2, _varint(len(payload)) + payload)


def _blob(arr, legacy_dims=False):
    arr = np.asarray(arr, np.float32)
    msg = b""
    if legacy_dims:
        dims = ([1] * (4 - arr.ndim)) + list(arr.shape)
        for i, d in enumerate(dims):
            msg += _field(i + 1, 0, _varint(d))
    else:
        shape = b"".join(_field(1, 0, _varint(d)) for d in arr.shape)
        msg += _ld(7, shape)
    msg += _ld(5, arr.ravel().tobytes())  # packed floats
    return msg


def _layer_new(name, ltype, blobs):
    msg = _ld(1, name.encode()) + _ld(2, ltype.encode())
    for b in blobs:
        msg += _ld(7, _blob(b))
    return _ld(100, msg)  # NetParameter.layer


def _layer_v1(name, type_enum, blobs):
    msg = _ld(4, name.encode()) + _field(5, 0, _varint(type_enum))
    for b in blobs:
        msg += _ld(6, _blob(b, legacy_dims=True))
    return _ld(2, msg)  # NetParameter.layers (legacy)


def _make_blobs(rng):
    return {
        "conv_w": rng.randn(4, 3, 3, 3).astype(np.float32),
        "bn_mean": rng.randn(4).astype(np.float32),
        "bn_var": rng.rand(4).astype(np.float32) + 0.5,
        "sf": np.array([2.0], np.float32),
        "gamma": rng.randn(4).astype(np.float32),
        "beta": rng.randn(4).astype(np.float32),
        "fc_w": rng.randn(3, 4).astype(np.float32),
        "fc_b": rng.randn(3).astype(np.float32),
    }


def _check_loaded(tmp_path, model_bytes, blobs):
    from fewshot_detection_tpu.models.caffe_net import load_caffemodel

    proto = tmp_path / "toybn.prototxt"
    proto.write_text(PROTO_BN)
    cm = tmp_path / "toybn.caffemodel"
    cm.write_bytes(model_bytes)

    spec = build_caffe_spec(str(proto), height=8, width=8)
    params = init_params(spec, 0)
    params = load_caffemodel(str(proto), str(cm), params, height=8, width=8)

    conv = params[0]
    np.testing.assert_allclose(
        np.asarray(conv["w"]), blobs["conv_w"].transpose(2, 3, 1, 0)
    )
    # BatchNorm running stats are blob/scale_factor (caffe semantics)
    np.testing.assert_allclose(np.asarray(conv["bn"]["mean"]),
                               blobs["bn_mean"] / 2.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(conv["bn"]["var"]),
                               blobs["bn_var"] / 2.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(conv["bn"]["gamma"]), blobs["gamma"])
    np.testing.assert_allclose(np.asarray(conv["bn"]["beta"]), blobs["beta"])
    fc = next(p for p in params if p and p["w"].ndim == 2)
    np.testing.assert_allclose(np.asarray(fc["w"]), blobs["fc_w"].T)
    np.testing.assert_allclose(np.asarray(fc["b"]), blobs["fc_b"])

    # the filled graph must still run
    x = jnp.zeros((1, 8, 8, 3), jnp.float32)
    y = apply_network(spec, [
        {k: (jnp.asarray(v) if not isinstance(v, dict)
             else {k2: jnp.asarray(v2) for k2, v2 in v.items()})
         for k, v in p.items()} if p else None
        for p in params
    ], x, train=False)
    if isinstance(y, tuple):  # executor returns (out, aux) for some graphs
        y = y[0]
    assert y.shape[-1] == 3


def test_caffemodel_roundtrip_modern(tmp_path):
    """Modern `layer` (field 100) encoding with BlobShape dims."""
    rng = np.random.RandomState(0)
    blobs = _make_blobs(rng)
    model = (
        _layer_new("conv1", "Convolution", [blobs["conv_w"]])
        + _layer_new("bn1", "BatchNorm",
                     [blobs["bn_mean"], blobs["bn_var"], blobs["sf"]])
        + _layer_new("scale1", "Scale", [blobs["gamma"], blobs["beta"]])
        + _layer_new("fc", "InnerProduct", [blobs["fc_w"], blobs["fc_b"]])
    )
    _check_loaded(tmp_path, model, blobs)


def test_caffemodel_roundtrip_legacy_v1(tmp_path):
    """Legacy V1 `layers` (field 2) encoding with num/ch/h/w dims."""
    rng = np.random.RandomState(1)
    blobs = _make_blobs(rng)
    model = (
        _layer_v1("conv1", 4, [blobs["conv_w"]])
        + _layer_v1("bn1", 0, [blobs["bn_mean"], blobs["bn_var"], blobs["sf"]])
        + _layer_v1("scale1", 0, [blobs["gamma"], blobs["beta"]])
        + _layer_v1("fc", 14, [blobs["fc_w"], blobs["fc_b"]])
    )
    _check_loaded(tmp_path, model, blobs)
