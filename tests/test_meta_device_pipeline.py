"""Meta on-device detection pipeline parity.

MetaDevicePipeline (cross-copy softmax decode -> per-(image,class) top-k ->
device NMS) must keep exactly the host path's boxes
(ops.boxes.get_region_boxes_v2 with validation=False semantics + host nms)
whenever candidate counts fit the buffer. Reference contract:
utils.py:195-290 + 85-104 in /root/reference (the valid_ensemble sweep)."""

import numpy as np
import pytest

import jax.numpy as jnp

from fewshot_detection_tpu.eval.device_pipeline import MetaDevicePipeline
from fewshot_detection_tpu.ops.boxes import get_region_boxes_v2, nms

N_CLS = 4


class _Region:
    anchor_wh = ((1.08, 1.19), (3.42, 4.41), (6.63, 11.38))
    num_classes = 1  # metayolo single-class head per copy


def _random_output(rng, b=2, h=5, w=5):
    a = len(_Region.anchor_wh)
    out = rng.randn(
        b * N_CLS, h, w, a * (5 + _Region.num_classes)
    ).astype(np.float32)
    return jnp.asarray(out)


def _host_path(output, conf, nms_t):
    lists = get_region_boxes_v2(
        output, N_CLS, conf, _Region.num_classes, _Region.anchor_wh,
        only_objectness=False, validation=False,
    )
    return [nms(bl, nms_t) for bl in lists]


@pytest.mark.parametrize("use_pallas", [False, True], ids=["lax", "pallas"])
def test_meta_device_pipeline_matches_host(use_pallas):
    rng = np.random.RandomState(0)
    output = _random_output(rng)
    host = _host_path(output, 0.15, 0.45)
    pipe = MetaDevicePipeline(
        _Region, N_CLS, conf_thresh=0.15, nms_thresh=0.45, top_k=64,
        use_pallas=use_pallas, interpret=True,
    )
    dev = pipe(output)
    assert len(dev) == len(host) == output.shape[0]
    total = sum(len(bl) for bl in host)
    assert total > 0, "degenerate scenario: nothing above threshold"
    for r, (hb, db) in enumerate(zip(host, dev)):
        assert len(hb) == len(db)
        for hr, dr in zip(hb, db):
            # device pipeline emits the row's class position as column 6
            assert int(dr[6]) == r % N_CLS
            np.testing.assert_allclose(dr[:6], [float(v) for v in hr[:6]],
                                       rtol=1e-5, atol=1e-6)


def test_meta_device_pipeline_empty_rows():
    rng = np.random.RandomState(1)
    output = _random_output(rng, b=1)
    pipe = MetaDevicePipeline(_Region, N_CLS, conf_thresh=0.999,
                              nms_thresh=0.45, top_k=16,
                              use_pallas=False, interpret=True)
    out = pipe(output)
    assert out == [[] for _ in range(N_CLS)]


def test_meta_device_pipeline_cross_copy_softmax_sums_to_one():
    """The class confidences of one (image, anchor, cell) across the N_CLS
    copies are a softmax — their kept-box confidences must sum <= 1 and the
    per-copy values must match the host's exactly (pinned via parity above);
    here: perturbing one copy's logits changes the OTHER copies' cls_conf
    (the cross-copy coupling the plain decode does not have)."""
    rng = np.random.RandomState(2)
    output = np.asarray(_random_output(rng, b=1))
    pipe = MetaDevicePipeline(_Region, N_CLS, conf_thresh=-1.0,
                              nms_thresh=2.0, top_k=8,
                              use_pallas=False, interpret=True)
    base = pipe(jnp.asarray(output))
    bumped = output.copy()
    bumped[0, ..., 5::5 + _Region.num_classes] += 3.0  # copy 0 class logits
    out2 = pipe(jnp.asarray(bumped))
    # some other-copy row must see its cls_conf change
    changed = any(
        abs(a[5] - b[5]) > 1e-6
        for r in range(1, N_CLS)
        for a, b in zip(base[r], out2[r])
    )
    assert changed
