"""Device detection pipeline (decode -> top-k -> on-device NMS) parity.

Must produce exactly the host path's kept boxes
(ops.boxes.get_region_boxes + nms) whenever candidate counts fit the
buffer — for both the lax-loop NMS and the Pallas kernel (interpret mode
on CPU; the compiled-on-TPU evidence lives in PERF.md)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fewshot_detection_tpu.eval.device_pipeline import DevicePipeline
from fewshot_detection_tpu.ops.boxes import get_region_boxes, nms


class _Region:
    anchor_wh = ((1.08, 1.19), (3.42, 4.41), (6.63, 11.38))
    num_classes = 20


def _random_output(rng, b=3, h=5, w=5):
    a = len(_Region.anchor_wh)
    out = rng.randn(b, h, w, a * (5 + _Region.num_classes)).astype(np.float32)
    return jnp.asarray(out)


def _host_path(output, conf, nms_t):
    lists = get_region_boxes(output, conf, _Region.num_classes, _Region.anchor_wh)
    return [nms(bl, nms_t) for bl in lists]


@pytest.mark.parametrize("use_pallas", [False, True], ids=["lax", "pallas"])
def test_device_pipeline_matches_host(use_pallas):
    rng = np.random.RandomState(0)
    output = _random_output(rng)
    host = _host_path(output, 0.5, 0.4)
    pipe = DevicePipeline(
        _Region, conf_thresh=0.5, nms_thresh=0.4, top_k=64,
        use_pallas=use_pallas, interpret=True,
    )
    dev = pipe(output)
    assert len(dev) == len(host)
    total = sum(len(bl) for bl in host)
    assert total > 0, "degenerate scenario: nothing above threshold"
    for hb, db in zip(host, dev):
        assert len(hb) == len(db)
        for hr, dr in zip(hb, db):
            assert int(hr[6]) == int(dr[6])
            np.testing.assert_allclose(dr[:6], [float(v) for v in hr[:6]],
                                       rtol=1e-5, atol=1e-6)


def test_device_pipeline_empty_image():
    rng = np.random.RandomState(1)
    output = _random_output(rng, b=1)
    # threshold above max sigmoid -> nothing survives
    pipe = DevicePipeline(_Region, conf_thresh=0.999, nms_thresh=0.4,
                          top_k=16, use_pallas=False, interpret=True)
    out = pipe(output)
    assert out == [[]]


def test_device_pipeline_truncates_to_top_k():
    rng = np.random.RandomState(2)
    output = _random_output(rng, b=1)
    # conf -1: every anchor passes; K=8 keeps the 8 highest-objectness
    pipe = DevicePipeline(_Region, conf_thresh=-1.0, nms_thresh=2.0,
                          top_k=8, use_pallas=False, interpret=True)
    out = pipe(output)
    assert len(out[0]) == 8
    host = _host_path(output, -1.0, 2.0)[0]  # nms_t 2.0: nothing suppressed
    top8 = sorted(host, key=lambda r: -r[4])[:8]
    got = sorted(out[0], key=lambda r: -r[4])
    for hr, dr in zip(top8, got):
        np.testing.assert_allclose(dr[:5], [float(v) for v in hr[:5]],
                                   rtol=1e-5, atol=1e-6)
