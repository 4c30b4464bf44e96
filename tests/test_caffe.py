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
