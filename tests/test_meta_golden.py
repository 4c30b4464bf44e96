"""Full-scale meta-path golden parity vs an independent torch oracle.

The reference hits paper mAP with the exact composition
meta_forward -> detect_forward -> get_region_boxes_v2 -> nms
(/root/reference/darknet_meta.py:107-195, utils.py:195-290, 85-104). With no
VOC data or pretrained weights in this environment, end-to-end numerical
parity at flagship scale (cfg/darknet_dynamic.cfg + cfg/reweighting_net.cfg,
416x416, 15-way) against a torch port of those reference semantics is the
strongest available accuracy-parity evidence: identical random weights in,
identical decoded boxes out, for BOTH the fused and the general dynamic-conv
paths.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from fewshot_detection_tpu.config import parse_cfg
from fewshot_detection_tpu.models.meta import (
    MetaSpec,
    detect_forward,
    init_meta_params,
    meta_forward,
)
from fewshot_detection_tpu.models.spec import build_spec
from fewshot_detection_tpu.ops.boxes import get_region_boxes_v2, nms

from torch_ref import (
    get_region_boxes_v2_torch,
    torch_detect_forward,
    torch_meta_forward,
)

B, N_CLS, S = 1, 15, 416


def _nchw(x_nhwc):
    return torch.from_numpy(
        np.ascontiguousarray(np.asarray(x_nhwc, np.float32).transpose(0, 3, 1, 2))
    )


def _gain(params, g):
    """Scale conv/fc weights so activations keep O(1) variance through the
    19-layer backbone (plain fan-in uniform init collapses to ~0 at depth,
    which makes every decoded confidence identical — a degenerate golden)."""
    out = []
    for p in params:
        if p is None or "w" not in p:
            out.append(p)
        else:
            out.append({**p, "w": p["w"] * g})
    return out


@pytest.fixture(scope="module")
def golden():
    spec = MetaSpec(
        build_spec(parse_cfg("cfg/darknet_dynamic.cfg")),
        build_spec(parse_cfg("cfg/reweighting_net.cfg")),
    )
    params = init_meta_params(spec, 7)
    params = {
        "darknet": _gain(params["darknet"], 2.45),
        "learnet": _gain(params["learnet"], 2.45),
    }
    rng = np.random.RandomState(42)
    x = rng.rand(B, S, S, 3).astype(np.float32)
    metax = rng.rand(N_CLS, S, S, 3).astype(np.float32)
    mask = (rng.rand(N_CLS, S, S, 1) > 0.5).astype(np.float32)

    dws_j, _ = meta_forward(spec, params, jnp.asarray(metax), jnp.asarray(mask))
    y_fused, _ = detect_forward(spec, params, jnp.asarray(x), dws_j, fuse=True)
    y_gen, _ = detect_forward(spec, params, jnp.asarray(x), dws_j, fuse=False)

    with torch.no_grad():
        dws_t = torch_meta_forward(
            spec, params, _nchw(metax), _nchw(mask), metain_type=2
        )
        y_t = torch_detect_forward(spec, params, _nchw(x), dws_t)

    return spec, params, dws_j, dws_t, np.asarray(y_fused), np.asarray(y_gen), y_t


def test_class_codes_match_torch(golden):
    _, _, dws_j, dws_t, *_ = golden
    assert len(dws_j) == len(dws_t) == 1
    ours = np.asarray(dws_j[0])  # (N, 1, 1, 1024) NHWC
    ref = dws_t[0].numpy().transpose(0, 2, 3, 1)
    assert ours.shape == ref.shape == (N_CLS, 1, 1, 1024)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_detect_output_matches_torch_fused_and_general(golden):
    *_, y_fused, y_gen, y_t = golden
    ref = y_t.numpy().transpose(0, 2, 3, 1)
    assert y_fused.shape == ref.shape == (B * N_CLS, 13, 13, 30)
    np.testing.assert_allclose(y_fused, ref, rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(y_gen, ref, rtol=1e-4, atol=2e-4)


def test_decoded_boxes_match_reference_decode(golden):
    spec, *_, y_fused, _, y_t = golden
    region = spec.region
    anchors = region.anchor_wh

    # Pick the threshold from the data: midpoint between the 150th and 151st
    # largest det*cls_max conf, so ~150 boxes pass and no value sits within
    # float noise of the boundary (seeds are fixed; this is deterministic).
    all_t = get_region_boxes_v2_torch(
        y_t, N_CLS, -1.0, region.num_classes,
        [a for wh in anchors for a in wh], region.num_anchors,
        only_objectness=0, validation=False,
    )
    confs = np.sort(
        np.array([bx[4] * bx[5] for bl in all_t for bx in bl], np.float64)
    )[::-1]
    cut = next(
        k for k in range(150, 400) if confs[k - 1] - confs[k] > 1e-6
    )
    conf_thresh = float((confs[cut - 1] + confs[cut]) / 2)

    boxes_j = get_region_boxes_v2(
        y_fused, N_CLS, conf_thresh, region.num_classes, anchors,
        only_objectness=False, validation=True,
    )
    boxes_t = get_region_boxes_v2_torch(
        y_t, N_CLS, conf_thresh, region.num_classes,
        [a for wh in anchors for a in wh], region.num_anchors,
        only_objectness=0, validation=True,
    )
    assert len(boxes_j) == len(boxes_t) == B * N_CLS
    assert sum(len(bl) for bl in boxes_t) == cut

    for bj, bt in zip(boxes_j, boxes_t):
        assert len(bj) == len(bt)
        for rj, rt in zip(bj, bt):
            assert len(rj) == len(rt)  # incl. validation extra (conf, id) pairs
            assert int(rj[6]) == int(rt[6])  # cls_id
            np.testing.assert_allclose(
                [float(v) for v in rj[:6]], rt[:6], rtol=1e-4, atol=1e-5
            )

    # NMS on the merged per-image candidate lists must keep the same boxes
    for bj, bt in zip(boxes_j, boxes_t):
        kept_j = nms(bj, 0.45)
        kept_t = nms(bt, 0.45)
        assert len(kept_j) == len(kept_t)
        for rj, rt in zip(kept_j, kept_t):
            np.testing.assert_allclose(
                [float(v) for v in rj[:6]], [float(v) for v in rt[:6]],
                rtol=1e-4, atol=1e-5,
            )
