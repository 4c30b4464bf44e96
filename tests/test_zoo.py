"""Aux model zoo + focal loss."""

import numpy as np
import pytest

import jax.numpy as jnp

from fewshot_detection_tpu.models.darknet import apply_network, init_params
from fewshot_detection_tpu.models.zoo import (
    resnet_blocks,
    resnet_spec,
    tiny_yolo_spec,
)
from fewshot_detection_tpu.ops.focal_loss import focal_loss


def test_tiny_yolo_spec_forward():
    spec = tiny_yolo_spec()
    params = init_params(spec, 0)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    y, _ = apply_network(spec, params, x)
    assert y.shape == (1, 2, 2, 125)
    assert spec.region.num_classes == 20


@pytest.mark.parametrize("depth,expansion", [(18, 1), (50, 4)])
def test_resnet_spec_forward(depth, expansion):
    spec = resnet_spec(depth, num_classes=10)
    params = init_params(spec, 1)
    x = jnp.asarray(np.random.RandomState(1).rand(2, 64, 64, 3), jnp.float32)
    y, _ = apply_network(spec, params, x)
    assert y.shape == (2, 10)
    np.testing.assert_allclose(np.asarray(y.sum(-1)), 1.0, rtol=1e-5)


def test_focal_loss_gamma0_is_cross_entropy():
    import torch

    rng = np.random.RandomState(2)
    logits = rng.randn(6, 5).astype(np.float32)
    targets = rng.randint(0, 5, 6)
    fl = focal_loss(jnp.asarray(logits), jnp.asarray(targets), gamma=0.0)
    ce = torch.nn.CrossEntropyLoss()(
        torch.from_numpy(logits), torch.from_numpy(targets)
    )
    np.testing.assert_allclose(float(fl), float(ce), rtol=1e-5)


def test_focal_loss_downweights_easy():
    logits = jnp.asarray([[4.0, -4.0], [4.0, -4.0]])
    targets = jnp.asarray([0, 0])
    hard = focal_loss(logits, 1 - targets, gamma=2.0)
    easy = focal_loss(logits, targets, gamma=2.0)
    assert float(easy) < float(hard)
