"""Box decode / NMS parity against a slow straight-from-the-math oracle."""

import math

import numpy as np

from fewshot_detection_tpu.ops.boxes import (
    get_region_boxes,
    get_region_boxes_v2,
    iou_xywh,
    nms,
)

ANCHORS = ((1.3221, 1.73145), (3.19275, 4.00944), (5.05587, 8.09892))


def _sigmoid(x):
    return 1.0 / (1.0 + math.exp(-x))


def _slow_decode(output_nchw, conf_thresh, num_classes, anchors,
                 only_objectness=True, validation=False, softmax_over=None):
    """Triple-loop oracle in NCHW, mirroring the documented reference
    semantics (utils.py:112-290). softmax_over=n_cls enables the v2
    cross-copy normalization."""
    B, C, H, W = output_nchw.shape
    A = len(anchors)
    nC = num_classes
    o = output_nchw.reshape(B, A, 5 + nC, H, W)

    if softmax_over:
        n = softmax_over
        bs = B // n
        logits = o[:, :, 5:, :, :].reshape(bs, n, A, nC, H, W)
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        cls_confs_all = (e / e.sum(axis=1, keepdims=True)).reshape(B, A, nC, H, W)
    else:
        logits = o[:, :, 5:, :, :]
        e = np.exp(logits - logits.max(axis=2, keepdims=True))
        cls_confs_all = e / e.sum(axis=2, keepdims=True)

    all_boxes = []
    for b in range(B):
        boxes = []
        for cy in range(H):
            for cx in range(W):
                for a in range(A):
                    det = _sigmoid(o[b, a, 4, cy, cx])
                    cls_confs = cls_confs_all[b, a, :, cy, cx]
                    cid = int(np.argmax(cls_confs))
                    cconf = float(cls_confs[cid])
                    conf = det if only_objectness else det * cconf
                    if conf > conf_thresh:
                        bx = (_sigmoid(o[b, a, 0, cy, cx]) + cx) / W
                        by = (_sigmoid(o[b, a, 1, cy, cx]) + cy) / H
                        bw = math.exp(o[b, a, 2, cy, cx]) * anchors[a][0] / W
                        bh = math.exp(o[b, a, 3, cy, cx]) * anchors[a][1] / H
                        box = [bx, by, bw, bh, det, cconf, cid]
                        if not only_objectness and validation:
                            for c in range(nC):
                                if c != cid and det * cls_confs[c] > conf_thresh:
                                    box.extend([float(cls_confs[c]), c])
                        boxes.append(box)
        all_boxes.append(boxes)
    return all_boxes


def _assert_box_lists_close(a, b):
    assert len(a) == len(b)
    for ba, bb in zip(a, b):
        assert len(ba) == len(bb), (len(ba), len(bb))
        for xa, xb in zip(ba, bb):
            assert len(xa) == len(xb)
            np.testing.assert_allclose(xa, xb, rtol=1e-4, atol=1e-5)


def test_get_region_boxes_matches_oracle():
    rng = np.random.RandomState(0)
    B, A, nC, H, W = 2, 3, 4, 5, 5
    out_nchw = rng.randn(B, A * (5 + nC), H, W).astype(np.float32)
    ref = _slow_decode(out_nchw, 0.5, nC, ANCHORS)
    ours = get_region_boxes(
        out_nchw.transpose(0, 2, 3, 1), 0.5, nC, ANCHORS
    )
    _assert_box_lists_close(ours, ref)


def test_get_region_boxes_validation_extras():
    rng = np.random.RandomState(1)
    B, A, nC, H, W = 1, 3, 5, 3, 3
    out_nchw = (rng.randn(B, A * (5 + nC), H, W) * 0.3).astype(np.float32)
    ref = _slow_decode(out_nchw, 0.05, nC, ANCHORS, only_objectness=False,
                       validation=True)
    ours = get_region_boxes(
        out_nchw.transpose(0, 2, 3, 1), 0.05, nC, ANCHORS,
        only_objectness=False, validation=True,
    )
    _assert_box_lists_close(ours, ref)


def test_get_region_boxes_v2_cross_copy_softmax():
    rng = np.random.RandomState(2)
    bs, n_cls, A, nC, H, W = 2, 3, 3, 1, 4, 4
    B = bs * n_cls
    out_nchw = rng.randn(B, A * (5 + nC), H, W).astype(np.float32)
    ref = _slow_decode(out_nchw, 0.005, nC, ANCHORS, only_objectness=False,
                       validation=True, softmax_over=n_cls)
    ours = get_region_boxes_v2(
        out_nchw.transpose(0, 2, 3, 1), n_cls, 0.005, nC, ANCHORS,
        only_objectness=False, validation=True,
    )
    _assert_box_lists_close(ours, ref)
    # cross-copy softmax: per (b, anchor, cell), confs across copies sum to 1
    confs = np.zeros((bs, n_cls))
    for i, blist in enumerate(ours):
        b, c = divmod(i, n_cls)
        # find the box at a fixed location in every copy
        assert len(blist) > 0


def test_nms_matches_reference_greedy():
    rng = np.random.RandomState(3)
    boxes = []
    for _ in range(30):
        cx, cy = rng.rand(2) * 0.6 + 0.2
        w, h = rng.rand(2) * 0.3 + 0.05
        boxes.append([cx, cy, w, h, float(rng.rand()), 0.9, 1])

    def ref_nms(boxes, thresh):
        import copy

        boxes = copy.deepcopy(boxes)
        order = sorted(range(len(boxes)), key=lambda i: 1 - boxes[i][4])
        out = []
        for i in range(len(boxes)):
            bi = boxes[order[i]]
            if bi[4] > 0:
                out.append(bi)
                for j in range(i + 1, len(boxes)):
                    bj = boxes[order[j]]
                    a = np.asarray(bi[:4])
                    b = np.asarray(bj[:4])
                    if iou_xywh(a, b) > thresh:
                        bj[4] = 0
        return out

    ref = ref_nms(boxes, 0.4)
    ours = nms(boxes, 0.4)
    assert len(ref) == len(ours)
    for a, b in zip(ref, ours):
        np.testing.assert_allclose(a, b)


def test_nms_empty():
    assert nms([], 0.4) == []


def test_iou_known_values():
    a = np.asarray([0.5, 0.5, 0.4, 0.4])
    assert abs(iou_xywh(a, a) - 1.0) < 1e-6
    b = np.asarray([0.9, 0.9, 0.1, 0.1])  # disjoint
    assert iou_xywh(a, b) == 0.0
    c = np.asarray([0.5, 0.5, 0.2, 0.2])  # contained: iou = .04/.16
    np.testing.assert_allclose(iou_xywh(a, c), 0.25, rtol=1e-6)
