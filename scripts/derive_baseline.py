#!/usr/bin/env python3
"""Derive the reference per-GPU training throughput estimate (BASELINE.md).

The reference repo publishes no throughput number (SURVEY.md §6), so
bench.py's `vs_baseline` needs a derived estimate. The reference step
(train_meta.py:201-225) decomposes into:

  t_step = t_device(per-GPU batch fwd+bwd) + t_host(serial loss work)

t_host is MEASURED here with a faithful torch-CPU replica of the host-
serial section of RegionLossV2.forward (/root/reference/region_loss.py:
262-320): the build_targets python loop (:37-132) over the neg_filter-kept
rows, the per-image histogram class-mask merge (:303-319), and the
pred_boxes D2H volume. This python work cannot overlap the GPU: it sits
between the forward and the backward on the gathered DataParallel output.

t_device is ESTIMATED from published FLOP counts: YOLOv2-416 forward is
34.90 GFLOP (YOLO9000 paper, Table "34.90 Bn ops"); the learnet stack and
reweighted head add ~10%/img at the reference's 64-image global batch with
15 support images (consistent with the 107 GFLOP/img fwd+bwd XLA cost
analysis in PERF.md); fwd+bwd+update ~ 3x forward. Era hardware
(gpus=1,2,3,4, README.md:100; 2018-class Titan X Pascal / 1080 Ti) peaks
at 10.6-11.3 fp32 TFLOP/s; PyTorch-0.3-era cuDNN conv sustains 30-50% of
peak on these channel widths.

Prints one JSON line with measured t_host and the derived per-GPU rate
(central + optimistic/pessimistic bounds). bench.py uses the CENTRAL
estimate (30.0 ~ the derived 29.4) as REF_IMG_PER_SEC_PER_GPU — see
BASELINE.md; the optimistic bound (40.2) is reported as the error bar that
a best-case reference setup could reach.
"""

import json
import math
import time

import numpy as np
import torch

# reference protocol constants (train_meta.py, cfg/darknet_dynamic.cfg)
GLOBAL_BATCH = 64
N_GPUS = 4
PER_GPU = GLOBAL_BATCH // N_GPUS
N_CLS = 15
NA, NH, NW = 5, 13, 13
ANCHORS = [1.3221, 1.73145, 3.19275, 4.00944, 5.05587,
           8.09892, 9.47112, 4.84053, 11.2364, 10.0071]

FWD_GFLOP_PER_IMG = 34.90 * 1.10   # YOLOv2-416 + learnet/head share
TRAIN_FLOP_FACTOR = 3.0            # fwd + bwd + update ~ 3x fwd
PEAK_TFLOPS = 11.0                 # Titan X Pascal / 1080 Ti class
EFFICIENCY = (0.30, 0.40, 0.50)    # pessimistic / central / optimistic


def bbox_ious(boxes1, boxes2):
    """Vectorized IoU, xywh, as /root/reference/utils.py:54-83."""
    mx = torch.min(boxes1[0] - boxes1[2] / 2, boxes2[0] - boxes2[2] / 2)
    Mx = torch.max(boxes1[0] + boxes1[2] / 2, boxes2[0] + boxes2[2] / 2)
    my = torch.min(boxes1[1] - boxes1[3] / 2, boxes2[1] - boxes2[3] / 2)
    My = torch.max(boxes1[1] + boxes1[3] / 2, boxes2[1] + boxes2[3] / 2)
    w1, h1 = boxes1[2], boxes1[3]
    w2, h2 = boxes2[2], boxes2[3]
    uw, uh = Mx - mx, My - my
    cw, ch = w1 + w2 - uw, h1 + h2 - uh
    mask = ((cw <= 0) + (ch <= 0) > 0)
    area1, area2 = w1 * h1, w2 * h2
    carea = cw * ch
    carea[mask] = 0
    uarea = area1 + area2 - carea
    return carea / uarea


def bbox_iou_scalar(b1, b2):
    mx = min(b1[0] - b1[2] / 2, b2[0] - b2[2] / 2)
    Mx = max(b1[0] + b1[2] / 2, b2[0] + b2[2] / 2)
    my = min(b1[1] - b1[3] / 2, b2[1] - b2[3] / 2)
    My = max(b1[1] + b1[3] / 2, b2[1] + b2[3] / 2)
    w1, h1, w2, h2 = b1[2], b1[3], b2[2], b2[3]
    uw, uh = Mx - mx, My - my
    cw, ch = w1 + w2 - uw, h1 + h2 - uh
    if cw <= 0 or ch <= 0:
        return 0.0
    carea = cw * ch
    return carea / (w1 * h1 + w2 * h2 - carea)


def build_targets_replica(pred_boxes, target, seen=20000):
    """Line-faithful torch-CPU replica of region_loss.py:37-132."""
    nB = target.size(0)
    conf_mask = torch.ones(nB, NA, NH, NW) * 1.0
    coord_mask = torch.zeros(nB, NA, NH, NW)
    cls_mask = torch.zeros(nB, NA, NH, NW)
    tx = torch.zeros(nB, NA, NH, NW)
    ty = torch.zeros(nB, NA, NH, NW)
    tw = torch.zeros(nB, NA, NH, NW)
    th = torch.zeros(nB, NA, NH, NW)
    tconf = torch.zeros(nB, NA, NH, NW)
    tcls = torch.zeros(nB, NA, NH, NW)
    nAnchors = NA * NH * NW
    nPixels = NH * NW

    for b in range(nB):
        cur_pred_boxes = pred_boxes[b * nAnchors:(b + 1) * nAnchors].t()
        cur_ious = torch.zeros(nAnchors)
        for t in range(50):
            if target[b][t * 5 + 1] == 0:
                break
            gx = target[b][t * 5 + 1] * NW
            gy = target[b][t * 5 + 2] * NH
            gw = target[b][t * 5 + 3] * NW
            gh = target[b][t * 5 + 4] * NH
            cur_gt = torch.FloatTensor([gx, gy, gw, gh]).repeat(nAnchors, 1).t()
            cur_ious = torch.max(cur_ious, bbox_ious(cur_pred_boxes, cur_gt))
        conf_mask[b][(cur_ious > 0.6).view(NA, NH, NW)] = 0

    nGT = nCorrect = 0
    for b in range(nB):
        for t in range(50):
            if target[b][t * 5 + 1] == 0:
                break
            nGT += 1
            best_iou, best_n = 0.0, -1
            gx = float(target[b][t * 5 + 1]) * NW
            gy = float(target[b][t * 5 + 2]) * NH
            gi, gj = int(gx), int(gy)
            gw = float(target[b][t * 5 + 3]) * NW
            gh = float(target[b][t * 5 + 4]) * NH
            for n in range(NA):
                iou = bbox_iou_scalar([0, 0, ANCHORS[2 * n], ANCHORS[2 * n + 1]],
                                      [0, 0, gw, gh])
                if iou > best_iou:
                    best_iou, best_n = iou, n
            pred_box = pred_boxes[b * nAnchors + best_n * nPixels + gj * NW + gi]
            coord_mask[b][best_n][gj][gi] = 1
            cls_mask[b][best_n][gj][gi] = 1
            conf_mask[b][best_n][gj][gi] = 5.0
            tx[b][best_n][gj][gi] = gx - gi
            ty[b][best_n][gj][gi] = gy - gj
            tw[b][best_n][gj][gi] = math.log(gw / ANCHORS[2 * best_n])
            th[b][best_n][gj][gi] = math.log(gh / ANCHORS[2 * best_n + 1])
            iou = bbox_iou_scalar([gx, gy, gw, gh], list(pred_box))
            tconf[b][best_n][gj][gi] = iou
            tcls[b][best_n][gj][gi] = float(target[b][t * 5])
            if iou > 0.5:
                nCorrect += 1
    return nGT, nCorrect, cls_mask, tcls


def measure_host(reps=5):
    """t_host for ONE step: build_targets over the neg_filter-kept rows
    (neg=1: positive (image,class) pairs + as many negatives ~ 2 * 96 for
    VOC's ~1.5 distinct classes/image at bs=64) + the per-image histogram
    merge (region_loss.py:303-319)."""
    rng = np.random.RandomState(0)
    n_pos = int(GLOBAL_BATCH * 1.5)
    nB = 2 * n_pos  # neg_ratio=1
    target = torch.zeros(nB, 250)
    for b in range(n_pos):  # positive rows carry 1-2 boxes
        for t in range(rng.randint(1, 3)):
            target[b][t * 5 + 0] = rng.randint(0, 15)
            target[b][t * 5 + 1] = rng.uniform(0.2, 0.8)
            target[b][t * 5 + 2] = rng.uniform(0.2, 0.8)
            target[b][t * 5 + 3] = rng.uniform(0.1, 0.4)
            target[b][t * 5 + 4] = rng.uniform(0.1, 0.4)
    pred = torch.rand(nB * NA * NH * NW, 4) * 13

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        nGT, nCorrect, cls_mask, tcls = build_targets_replica(pred, target)
        # histogram merge over the bs images (region_loss.py:303-319)
        counts = np.histogram(rng.randint(0, GLOBAL_BATCH * N_CLS, nB),
                              bins=GLOBAL_BATCH,
                              range=(0, GLOBAL_BATCH * N_CLS))[0]
        idx = 0
        merged = []
        for c in counts:
            merged.append(cls_mask[idx:idx + c].sum(0) if c else
                          torch.zeros(NA, NH, NW))
            idx += c
        torch.stack(merged)
        times.append(time.perf_counter() - t0)
    return min(times), nB


def main():
    t_host, nB = measure_host()
    # pred_boxes D2H (region_loss.py:298): nB*845 boxes * 16 B over PCIe3
    d2h = nB * NA * NH * NW * 16 / 6e9 + 50e-6

    flop_per_img = FWD_GFLOP_PER_IMG * TRAIN_FLOP_FACTOR * 1e9
    rates = {}
    for label, eff, host_scale in (
        ("pessimistic", EFFICIENCY[0], 2.0),   # slower host than ours
        ("central", EFFICIENCY[1], 1.0),
        ("optimistic", EFFICIENCY[2], 0.5),    # faster host, best cuDNN
    ):
        t_dev = PER_GPU * flop_per_img / (PEAK_TFLOPS * 1e12 * eff)
        t_step = t_dev + t_host * host_scale + d2h
        rates[label] = {
            "t_device_s": round(t_dev, 4),
            "t_host_s": round(t_host * host_scale, 4),
            "img_per_sec_per_gpu": round(PER_GPU / t_step, 2),
        }
    print(json.dumps({
        "measured_t_host_s": round(t_host, 4),
        "host_rows_nB": nB,
        "d2h_s": round(d2h, 5),
        "fwd_gflop_per_img": FWD_GFLOP_PER_IMG,
        "estimates": rates,
    }, indent=2))


if __name__ == "__main__":
    main()
