"""Slow numpy oracle for the YOLOv2 region loss (test-only).

Implements the documented semantics of /root/reference/region_loss.py with
explicit python loops — including the per-image target-building loop, conf
silencing, seen<12800 warm-up, neg-filter row dropping, and RegionLossV2's
cross-copy softmax with per-image histogram merge — so the vectorized
on-device implementation can be checked against it bit-for-bit(ish).
"""

import math

import numpy as np


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def iou_xywh(b1, b2):
    mx = min(b1[0] - b1[2] / 2, b2[0] - b2[2] / 2)
    Mx = max(b1[0] + b1[2] / 2, b2[0] + b2[2] / 2)
    my = min(b1[1] - b1[3] / 2, b2[1] - b2[3] / 2)
    My = max(b1[1] + b1[3] / 2, b2[1] + b2[3] / 2)
    uw, uh = Mx - mx, My - my
    cw = b1[2] + b2[2] - uw
    ch = b1[3] + b2[3] - uh
    if cw <= 0 or ch <= 0:
        return 0.0
    inter = cw * ch
    return inter / (b1[2] * b1[3] + b2[2] * b2[3] - inter)


def decode_pred_boxes(o, anchors):
    """o: (nB, A, 5+nC, H, W) raw -> (nB, A, H, W, 4) grid units."""
    nB, A, _, H, W = o.shape
    out = np.zeros((nB, A, H, W, 4))
    for b in range(nB):
        for a in range(A):
            for j in range(H):
                for i in range(W):
                    out[b, a, j, i, 0] = sigmoid(o[b, a, 0, j, i]) + i
                    out[b, a, j, i, 1] = sigmoid(o[b, a, 1, j, i]) + j
                    out[b, a, j, i, 2] = math.exp(o[b, a, 2, j, i]) * anchors[a][0]
                    out[b, a, j, i, 3] = math.exp(o[b, a, 3, j, i]) * anchors[a][1]
    return out


def build_targets(pred_boxes, target, anchors, H, W, noobj, obj, sil, seen):
    """pred_boxes: (nB, A, H, W, 4); target: (nB, 50, 5) normalized."""
    nB, A = pred_boxes.shape[:2]
    conf_mask = np.full((nB, A, H, W), noobj, np.float64)
    coord_mask = np.zeros((nB, A, H, W))
    cls_mask = np.zeros((nB, A, H, W))
    tx = np.zeros((nB, A, H, W))
    ty = np.zeros((nB, A, H, W))
    tw = np.zeros((nB, A, H, W))
    th = np.zeros((nB, A, H, W))
    tconf = np.zeros((nB, A, H, W))
    tcls = np.zeros((nB, A, H, W))

    for b in range(nB):
        cur = np.zeros((A, H, W))
        for t in range(50):
            if target[b, t, 1] == 0:
                break
            g = [target[b, t, 1] * W, target[b, t, 2] * H,
                 target[b, t, 3] * W, target[b, t, 4] * H]
            for a in range(A):
                for j in range(H):
                    for i in range(W):
                        cur[a, j, i] = max(
                            cur[a, j, i], iou_xywh(pred_boxes[b, a, j, i], g)
                        )
        conf_mask[b][cur > sil] = 0

    if seen < 12800:
        tx[:] = 0.5
        ty[:] = 0.5
        coord_mask[:] = 1

    nGT = 0
    nCorrect = 0
    for b in range(nB):
        for t in range(50):
            if target[b, t, 1] == 0:
                break
            nGT += 1
            gx, gy = target[b, t, 1] * W, target[b, t, 2] * H
            gw, gh = target[b, t, 3] * W, target[b, t, 4] * H
            gi, gj = int(gx), int(gy)
            best_iou, best_n = 0.0, -1
            for n, (aw, ah) in enumerate(anchors):
                iou = iou_xywh([0, 0, aw, ah], [0, 0, gw, gh])
                if iou > best_iou:
                    best_iou, best_n = iou, n
            coord_mask[b, best_n, gj, gi] = 1
            cls_mask[b, best_n, gj, gi] = 1
            conf_mask[b, best_n, gj, gi] = obj
            tx[b, best_n, gj, gi] = gx - gi
            ty[b, best_n, gj, gi] = gy - gj
            tw[b, best_n, gj, gi] = math.log(gw / anchors[best_n][0])
            th[b, best_n, gj, gi] = math.log(gh / anchors[best_n][1])
            iou = iou_xywh([gx, gy, gw, gh], pred_boxes[b, best_n, gj, gi])
            tconf[b, best_n, gj, gi] = iou
            tcls[b, best_n, gj, gi] = target[b, t, 0]
            if iou > 0.5:
                nCorrect += 1

    return dict(conf_mask=conf_mask, coord_mask=coord_mask, cls_mask=cls_mask,
                tx=tx, ty=ty, tw=tw, th=th, tconf=tconf, tcls=tcls,
                nGT=nGT, nCorrect=nCorrect)


def _ce_sum(logit_rows, labels):
    """sum of cross entropies; logit_rows (N, C), labels (N,)."""
    if len(logit_rows) == 0:
        return 0.0
    m = logit_rows.max(axis=1, keepdims=True)
    logp = logit_rows - m - np.log(np.exp(logit_rows - m).sum(1, keepdims=True))
    return float(-logp[np.arange(len(labels)), labels].sum())


def region_loss_oracle(output, target, kept_rows, seen, anchors, nC,
                       scales=(1.0, 5.0, 1.0, 1.0), zero_tcls=False):
    """Plain RegionLoss on the KEPT rows only (row-dropping semantics).

    output: (nB, A*(5+nC), H, W); target: (nB, 50, 5); kept_rows: index list.
    scales: (coord, object, noobject... ) order: coord, object, noobject,
    class."""
    coord_scale, object_scale, noobject_scale, class_scale = (
        scales[0], scales[1], scales[2], scales[3],
    )
    output = output[kept_rows]
    target = target[kept_rows]
    nB, _, H, W = output.shape
    A = len(anchors)
    o = output.reshape(nB, A, 5 + nC, H, W)
    x = sigmoid(o[:, :, 0])
    y = sigmoid(o[:, :, 1])
    w = o[:, :, 2]
    h = o[:, :, 3]
    conf = sigmoid(o[:, :, 4])
    pred = decode_pred_boxes(o, anchors)
    t = build_targets(pred, target, anchors, H, W, noobject_scale,
                      object_scale, 0.6, seen)
    loss_x = coord_scale * np.sum((t["coord_mask"] * (x - t["tx"])) ** 2) / 2
    loss_y = coord_scale * np.sum((t["coord_mask"] * (y - t["ty"])) ** 2) / 2
    loss_w = coord_scale * np.sum((t["coord_mask"] * (w - t["tw"])) ** 2) / 2
    loss_h = coord_scale * np.sum((t["coord_mask"] * (h - t["th"])) ** 2) / 2
    loss_conf = np.sum(t["conf_mask"] * (conf - t["tconf"]) ** 2) / 2

    cls_rows = o[:, :, 5:].transpose(0, 1, 3, 4, 2).reshape(-1, nC)
    mask = t["cls_mask"].reshape(-1) == 1
    labels = t["tcls"].reshape(-1).astype(int)
    if zero_tcls:
        labels = np.zeros_like(labels)
    loss_cls = class_scale * _ce_sum(cls_rows[mask], labels[mask])

    total = loss_x + loss_y + loss_w + loss_h + loss_conf + loss_cls
    return dict(loss_x=loss_x, loss_y=loss_y, loss_w=loss_w, loss_h=loss_h,
                loss_conf=loss_conf, loss_cls=loss_cls, loss=total,
                nGT=t["nGT"], nCorrect=t["nCorrect"])


def region_loss_v2_oracle(output, target, kept_rows, seen, anchors,
                          scales=(1.0, 5.0, 1.0, 1.0)):
    """RegionLossV2: cls softmax across copies from the FULL output, the
    rest on kept rows; per-image histogram merge of cls masks
    (region_loss.py:252-366). nC == 1.

    output: (bs*cs, A*6, H, W); target: (bs, cs, 50, 5)."""
    coord_scale, object_scale, noobject_scale, class_scale = (
        scales[0], scales[1], scales[2], scales[3],
    )
    bs, cs = target.shape[:2]
    nB_all, _, H, W = output.shape
    A = len(anchors)
    nC = 1

    # class logits from full output, arranged (bs, A*nC*H*W, cs)
    o_all = output.reshape(bs, cs, A, 5 + nC, H, W)
    cls_full = o_all[:, :, :, 5, :, :].reshape(bs, cs, A * H * W).transpose(0, 2, 1)

    flat_t = target.reshape(bs * cs, 50, 5)
    out_kept = output[kept_rows]
    t_kept = flat_t[kept_rows]
    nB = len(kept_rows)
    o = out_kept.reshape(nB, A, 5 + nC, H, W)
    x = sigmoid(o[:, :, 0])
    y = sigmoid(o[:, :, 1])
    w = o[:, :, 2]
    h = o[:, :, 3]
    conf = sigmoid(o[:, :, 4])
    pred = decode_pred_boxes(o, anchors)
    t = build_targets(pred, t_kept, anchors, H, W, noobject_scale,
                      object_scale, 0.6, seen)

    loss_x = coord_scale * np.sum((t["coord_mask"] * (x - t["tx"])) ** 2) / 2
    loss_y = coord_scale * np.sum((t["coord_mask"] * (y - t["ty"])) ** 2) / 2
    loss_w = coord_scale * np.sum((t["coord_mask"] * (w - t["tw"])) ** 2) / 2
    loss_h = coord_scale * np.sum((t["coord_mask"] * (h - t["th"])) ** 2) / 2
    loss_conf = np.sum(t["conf_mask"] * (conf - t["tconf"]) ** 2) / 2

    # histogram merge: counts of kept rows per image
    counts = np.histogram(kept_rows, bins=bs, range=(0, bs * cs))[0]
    merged_mask = np.zeros((bs, A, H, W))
    merged_tcls = np.zeros((bs, A, H, W))
    start = 0
    for i in range(bs):
        if counts[i]:
            merged_mask[i] = t["cls_mask"][start : start + counts[i]].sum(0)
            merged_tcls[i] = t["tcls"][start : start + counts[i]].sum(0)
        start += counts[i]
    sel = merged_mask == 1

    rows = cls_full.reshape(bs, A, H, W, cs)[sel]
    labels = merged_tcls[sel].astype(int)
    loss_cls = class_scale * _ce_sum(rows, labels)

    total = loss_x + loss_y + loss_w + loss_h + loss_conf + loss_cls
    return dict(loss_x=loss_x, loss_y=loss_y, loss_w=loss_w, loss_h=loss_h,
                loss_conf=loss_conf, loss_cls=loss_cls, loss=total,
                nGT=t["nGT"], nCorrect=t["nCorrect"])
