"""FSD_INPUT_U8: uint8-shipped image tensors decode to the same step as
fp32 (halves tunnel H2D bytes AND the remote-transport buffer leak —
PERF.md round 3)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fewshot_detection_tpu.config import parse_cfg
from fewshot_detection_tpu.models.meta import MetaSpec, init_meta_params
from fewshot_detection_tpu.models.spec import build_spec
from fewshot_detection_tpu.train import MetaTrainer, init_momentum


@pytest.fixture(scope="module")
def tiny_spec():
    return MetaSpec(
        build_spec(parse_cfg("cfg/tiny_darknet_dynamic.cfg")),
        build_spec(parse_cfg("cfg/tiny_reweighting.cfg")),
    )


def _batch(as_u8):
    rng = np.random.RandomState(0)
    # u8-quantized sources so both paths see bit-identical pixel values
    imgs = np.round(rng.rand(1, 2, 128, 128, 3) * 255) / 255.0
    metax = np.round(rng.rand(1, 15, 128, 128, 3) * 255) / 255.0
    mask = (rng.rand(1, 15, 128, 128, 1) > 0.5).astype(np.float32)
    target = np.zeros((1, 2, 15, 50, 5), np.float32)
    for i in range(2):
        target[0, i, i % 15, 0] = [i % 15, 0.5, 0.5, 0.3, 0.3]
    enc = (lambda a: jnp.asarray(np.round(a * 255).astype(np.uint8))) \
        if as_u8 else (lambda a: jnp.asarray(a, jnp.float32))
    return {
        "x": enc(imgs), "metax": enc(metax), "mask": enc(mask),
        "target": jnp.asarray(target),
        "keep": jnp.ones((1, 30), jnp.float32),
    }


def test_u8_inputs_match_fp32(tiny_spec):
    params = init_meta_params(tiny_spec, 0)
    losses = []
    for as_u8 in (False, True):
        t = MetaTrainer(tiny_spec, momentum=0.9, weight_decay=0.0,
                        donate=False, image_dtype=jnp.float32)
        _, _, metrics = t.step(params, init_momentum(params),
                               _batch(as_u8), seen=20000, lr=1e-4)
        losses.append(float(metrics["loss"]))
    assert losses[0] == pytest.approx(losses[1], rel=1e-5)
