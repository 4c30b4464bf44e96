"""YOLOv2 region loss — targets built ON DEVICE, fully vectorized.

The reference (/root/reference/region_loss.py) decoded predictions on GPU,
copied them to CPU every step (region_loss.py:298), and built targets with a
python double loop over images x 50 gt slots (region_loss.py:37-132). Here
everything stays on device with static shapes:

  * silence-mask: one broadcast IoU (nB, A*H*W, 50) + max-reduce
  * best-anchor assignment: argmax over anchor IoUs per gt slot
  * target planes: ONE batched scatter per plane after an up-front
    duplicate-cell deduplication that preserves the reference's
    LAST-WRITE-WINS ordering (mode="drop" turns padded slots into no-ops)
  * neg_filter (region_loss.py:15-34) becomes a per-copy 0/1 `keep` weight
    sampled on host (sample_neg_keep) so shapes stay static; positives are
    always kept, so loss values match the reference's row-dropping exactly

Loss terms replicate region_loss.py:340-355: MSE/2 on sigmoid(x),sigmoid(y),
w,h with 0/1 coord mask (all-ones warm-up while seen<12800), MSE/2 on conf
weighted by conf_mask (noobject_scale baseline, 0 where a pred overlaps any
gt above sil_thresh, object_scale at assigned cells), and cross-entropy for
classification — per-anchor over nC for the plain loss, ACROSS the n_cls
batch copies for the meta loss (RegionLossV2, region_loss.py:252-366).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..models.spec import RegionSpec
from .boxes import iou_xywh_jnp

# seen < warmup_seen trains EVERY cell of EVERY copy toward the constant
# box prior (tx=ty=0.5, tw=th=0, region_loss.py:70-79). The reference
# hardcodes 12800; here it is a Settings field (settings.warmup_seen,
# FSD_WARMUP_SEEN CLI override) threaded through the trainers, because at
# compressed schedules the all-cells pressure drowns the few-cell
# classification signal and collapses the meta class copies (PERF.md
# "warm-up collapse").
WARMUP_SEEN_DEFAULT = 12800


# ---------------------------------------------------------------------------
# host-side negative-copy sampling (replaces neg_filter's row dropping)
# ---------------------------------------------------------------------------


def sample_neg_keep(
    target: np.ndarray, neg_ratio, rng: np.random.RandomState | None = None
) -> np.ndarray:
    """0/1 keep weight per (image, class) copy.

    target: (nB, 50*5). 'full' keeps everything; a numeric ratio keeps all
    positive copies and negatives with prob ratio*npos/nneg
    (region_loss.py:15-34)."""
    n = target.shape[0]
    if neg_ratio == "full":
        return np.ones(n, np.float32)
    rng = rng or np.random
    pos = (np.abs(target).sum(1) != 0).astype(np.float32)
    npos = pos.sum()
    nneg = n - npos
    if nneg == 0:
        return np.ones(n, np.float32)
    ratio = float(neg_ratio) * npos / nneg
    if ratio >= 1:
        return np.ones(n, np.float32)
    u = rng.rand(n)
    return np.where(pos > 0, 1.0, (u <= ratio).astype(np.float32)).astype(np.float32)


# ---------------------------------------------------------------------------
# on-device target building
# ---------------------------------------------------------------------------


def _decode_pred_boxes(o: jax.Array, region: RegionSpec):
    """o: (nB, A, 5+nC, H, W) raw. Returns grid-unit boxes (nB, A, H, W, 4)
    (stop-gradient: targets never backprop)."""
    nB, A, _, H, W = o.shape
    grid_x = jnp.arange(W, dtype=jnp.float32)[None, None, None, :]
    grid_y = jnp.arange(H, dtype=jnp.float32)[None, None, :, None]
    aw = jnp.asarray([a[0] for a in region.anchor_wh])[None, :, None, None]
    ah = jnp.asarray([a[1] for a in region.anchor_wh])[None, :, None, None]
    px = jax.nn.sigmoid(o[:, :, 0]) + grid_x
    py = jax.nn.sigmoid(o[:, :, 1]) + grid_y
    pw = jnp.exp(o[:, :, 2]) * aw
    ph = jnp.exp(o[:, :, 3]) * ah
    return jax.lax.stop_gradient(jnp.stack([px, py, pw, ph], axis=-1))


def build_targets(
    pred_boxes: jax.Array,
    target: jax.Array,
    region: RegionSpec,
    H: int,
    W: int,
    seen: jax.Array,
    warmup_seen: int = WARMUP_SEEN_DEFAULT,
):
    """Vectorized equivalent of region_loss.py:37-132.

    pred_boxes: (nB, A, H, W, 4) in grid units; target: (nB, 50, 5)
    normalized [cls, cx, cy, w, h], zero-padded.

    Returns dict of (nB, A, H, W) planes + counters.
    """
    nB, A = pred_boxes.shape[:2]
    anchors = jnp.asarray(region.anchor_wh)  # (A, 2)

    t = target.astype(jnp.float32)
    valid = t[:, :, 1] > 0  # (nB, 50) — packed rows, 0-pad tail
    gx = t[:, :, 1] * W
    gy = t[:, :, 2] * H
    gw = t[:, :, 3] * W
    gh = t[:, :, 4] * H
    gt_boxes = jnp.stack([gx, gy, gw, gh], axis=-1)  # (nB, 50, 4)

    # --- conf silencing: any pred with IoU > sil_thresh vs any gt ---
    pb_flat = pred_boxes.reshape(nB, -1, 4)  # (nB, AHW, 4)
    ious = iou_xywh_jnp(pb_flat[:, :, None, :], gt_boxes[:, None, :, :])
    ious = jnp.where(valid[:, None, :], ious, 0.0)
    cur_ious = ious.max(axis=2).reshape(nB, A, H, W)
    warmup = seen < warmup_seen

    conf_mask = jnp.where(
        cur_ious > region.thresh, 0.0, region.noobject_scale
    ).astype(jnp.float32)
    coord_mask = jnp.where(warmup, 1.0, 0.0) * jnp.ones((nB, A, H, W), jnp.float32)
    cls_mask = jnp.zeros((nB, A, H, W), jnp.float32)
    tx = jnp.where(warmup, 0.5, 0.0) * jnp.ones((nB, A, H, W), jnp.float32)
    ty = jnp.where(warmup, 0.5, 0.0) * jnp.ones((nB, A, H, W), jnp.float32)
    tw = jnp.zeros((nB, A, H, W), jnp.float32)
    th = jnp.zeros((nB, A, H, W), jnp.float32)
    tconf = jnp.zeros((nB, A, H, W), jnp.float32)
    tcls = jnp.zeros((nB, A, H, W), jnp.float32)

    # --- best anchor per gt: IoU of (0,0,gw,gh) vs (0,0,aw,ah) ---
    wh_gt = jnp.stack([jnp.zeros_like(gw), jnp.zeros_like(gh), gw, gh], -1)
    wh_anchor = jnp.concatenate(
        [jnp.zeros((A, 2)), anchors], axis=-1
    )  # (A, 4)
    anchor_ious = iou_xywh_jnp(
        wh_gt[:, :, None, :], wh_anchor[None, None, :, :]
    )  # (nB, 50, A)
    best_n = jnp.argmax(anchor_ious, axis=-1)  # first max, like the ref loop

    gi = jnp.clip(gx.astype(jnp.int32), 0, W - 1)
    gj = jnp.clip(gy.astype(jnp.int32), 0, H - 1)

    # pred box at the assigned cell, IoU with gt -> tconf
    b_idx = jnp.arange(nB)[:, None]
    assigned_pred = pred_boxes[b_idx, best_n, gj, gi]  # (nB, 50, 4)
    assigned_iou = iou_xywh_jnp(gt_boxes, assigned_pred)  # (nB, 50)

    aw_sel = anchors[best_n, 0]
    ah_sel = anchors[best_n, 1]
    val_tx = gx - gi
    val_ty = gy - gj
    val_tw = jnp.log(jnp.maximum(gw, 1e-12) / aw_sel)
    val_th = jnp.log(jnp.maximum(gh, 1e-12) / ah_sel)

    nGT = valid.sum()
    nCorrect = (valid & (assigned_iou > 0.5)).sum()

    # The reference assigns gts sequentially, so when two gts land on the
    # same (anchor, cell) the LAST write wins. Instead of 50 sequential
    # scatters (50 x 9 tiny kernels), deduplicate up front — mask any slot
    # that a LATER valid slot overwrites — then do ONE batched scatter per
    # plane; with unique indices the scatter order is irrelevant.
    n_slots = target.shape[1]
    lin = (best_n * H + gj) * W + gi  # (nB, 50) linearized cell index
    eq = lin[:, :, None] == lin[:, None, :]
    later = jnp.triu(jnp.ones((n_slots, n_slots), bool), k=1)[None]
    overwritten = jnp.any(eq & later & valid[:, None, :], axis=2)
    keep = valid & ~overwritten

    # dropped slots scatter out of bounds (NOTE: must be a positive OOB
    # sentinel — negative indices WRAP under jax indexing)
    gj_s = jnp.where(keep, gj, H)
    gi_s = jnp.where(keep, gi, W)
    bb = jnp.broadcast_to(jnp.arange(nB)[:, None], (nB, n_slots))

    idx = (bb, best_n, gj_s, gi_s)
    planes = (coord_mask, cls_mask, conf_mask, tx, ty, tw, th, tconf, tcls)
    vals_seq = (
        jnp.ones_like(val_tx),  # coord_mask
        jnp.ones_like(val_tx),  # cls_mask
        jnp.full_like(val_tx, region.object_scale),  # conf_mask
        val_tx,
        val_ty,
        val_tw,
        val_th,
        assigned_iou,
        t[:, :, 0],  # tcls
    )
    planes = tuple(
        p.at[idx].set(v, mode="drop") for p, v in zip(planes, vals_seq)
    )
    coord_mask, cls_mask, conf_mask, tx, ty, tw, th, tconf, tcls = planes

    return {
        "coord_mask": coord_mask,
        "cls_mask": cls_mask,
        "conf_mask": conf_mask,
        "tx": tx,
        "ty": ty,
        "tw": tw,
        "th": th,
        "tconf": tconf,
        "tcls": tcls,
        "nGT": nGT,
        "nCorrect": nCorrect,
    }


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------


def _split_output(output: jax.Array, region: RegionSpec):
    """(nB, H, W, A*(5+nC)) -> raw (nB, A, 5+nC, H, W) + activated parts."""
    nB, H, W, _ = output.shape
    A = region.num_anchors
    nC = region.num_classes
    # loss math in fp32 regardless of the network's compute dtype
    o = output.astype(jnp.float32).reshape(nB, H, W, A, 5 + nC).transpose(0, 3, 4, 1, 2)
    x = jax.nn.sigmoid(o[:, :, 0])
    y = jax.nn.sigmoid(o[:, :, 1])
    w = o[:, :, 2]
    h = o[:, :, 3]
    conf = jax.nn.sigmoid(o[:, :, 4])
    cls_logits = o[:, :, 5:]  # (nB, A, nC, H, W)
    return o, x, y, w, h, conf, cls_logits


def _coord_conf_losses(parts, tgt, keep, region: RegionSpec):
    _, x, y, w, h, conf, _ = parts
    km = keep[:, None, None, None]
    cm = tgt["coord_mask"] * km
    cfm = tgt["conf_mask"] * km  # == sqrt(conf_mask)^2 in the MSE
    cs = region.coord_scale
    loss_x = cs * jnp.sum(cm * jnp.square(x - tgt["tx"])) / 2.0
    loss_y = cs * jnp.sum(cm * jnp.square(y - tgt["ty"])) / 2.0
    loss_w = cs * jnp.sum(cm * jnp.square(w - tgt["tw"])) / 2.0
    loss_h = cs * jnp.sum(cm * jnp.square(h - tgt["th"])) / 2.0
    loss_conf = jnp.sum(cfm * jnp.square(conf - tgt["tconf"])) / 2.0
    return loss_x, loss_y, loss_w, loss_h, loss_conf


def region_loss(
    output: jax.Array,
    target: jax.Array,
    keep: jax.Array,
    seen: jax.Array,
    region: RegionSpec,
    *,
    zero_tcls: bool = False,
    warmup_seen: int = WARMUP_SEEN_DEFAULT,
) -> tuple[jax.Array, dict[str, Any]]:
    """Plain YOLOv2 loss (RegionLoss, region_loss.py:134-232).

    output: (nB, H, W, A*(5+nC)); target: (nB, 50, 5); keep: (nB,) 0/1;
    seen: scalar int. zero_tcls replicates the `cfg.metayolo` tcls.zero_()
    branch (region_loss.py:198-199)."""
    nB, H, W, _ = output.shape
    parts = _split_output(output, region)
    o = parts[0]
    pred_boxes = _decode_pred_boxes(o, region)
    tgt = build_targets(pred_boxes, target, region, H, W, seen, warmup_seen)

    loss_x, loss_y, loss_w, loss_h, loss_conf = _coord_conf_losses(
        parts, tgt, keep, region
    )

    cls_logits = parts[6]  # (nB, A, nC, H, W)
    nC = region.num_classes
    rows = cls_logits.transpose(0, 1, 3, 4, 2).reshape(-1, nC)
    mask = (tgt["cls_mask"] * keep[:, None, None, None]).reshape(-1)
    labels = tgt["tcls"].reshape(-1).astype(jnp.int32)
    if zero_tcls:
        labels = jnp.zeros_like(labels)
    logp = jax.nn.log_softmax(rows, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    loss_cls = region.class_scale * jnp.sum(ce * mask)

    total = loss_x + loss_y + loss_w + loss_h + loss_conf + loss_cls
    n_proposals = jnp.sum((parts[5] > 0.25) * keep[:, None, None, None])
    metrics = {
        "nGT": tgt["nGT"],
        "nCorrect": tgt["nCorrect"],
        "nProposals": n_proposals,
        "loss_x": loss_x,
        "loss_y": loss_y,
        "loss_w": loss_w,
        "loss_h": loss_h,
        "loss_conf": loss_conf,
        "loss_cls": loss_cls,
        "loss": total,
    }
    return total, metrics


def region_loss_v2(
    output: jax.Array,
    target: jax.Array,
    keep: jax.Array,
    seen: jax.Array,
    region: RegionSpec,
    n_cls: int,
    *,
    warmup_seen: int = WARMUP_SEEN_DEFAULT,
) -> tuple[jax.Array, dict[str, Any]]:
    """Meta region loss (RegionLossV2, region_loss.py:234-366).

    output: (bs*n_cls, H, W, A*(5+1)) b-major; target: (bs, n_cls, 50, 5);
    keep: (bs*n_cls,) 0/1 per copy. Classification is a softmax ACROSS the
    n_cls copies of each anchor: per (image, anchor, cell) location marked
    by exactly one kept copy's gt, CE over copies with the copy index as
    label (the merged-histogram logic of region_loss.py:303-335)."""
    if region.num_classes != 1:
        raise NotImplementedError("RegionLossV2 expects single-class copies")
    bs = target.shape[0]
    nB = output.shape[0]
    assert nB == bs * n_cls, (nB, bs, n_cls)
    H, W = output.shape[1:3]

    parts = _split_output(output, region)
    o = parts[0]
    pred_boxes = _decode_pred_boxes(o, region)
    tgt = build_targets(
        pred_boxes, target.reshape(nB, *target.shape[2:]), region, H, W,
        seen, warmup_seen,
    )

    loss_x, loss_y, loss_w, loss_h, loss_conf = _coord_conf_losses(
        parts, tgt, keep, region
    )

    # ---- cross-copy classification ----
    A = region.num_anchors
    cls_logits = parts[6][:, :, 0]  # (bs*n_cls, A, H, W), nC == 1
    rows = cls_logits.reshape(bs, n_cls, A, H, W).transpose(0, 2, 3, 4, 1)
    # merged per-image mask / labels over KEPT copies (histogram merge)
    km = keep[:, None, None, None]
    cm = (tgt["cls_mask"] * km).reshape(bs, n_cls, A, H, W).sum(axis=1)
    tc = (tgt["tcls"] * tgt["cls_mask"] * km).reshape(bs, n_cls, A, H, W).sum(axis=1)
    mask = (cm == 1).astype(jnp.float32)  # (bs, A, H, W)
    labels = tc.astype(jnp.int32)
    logp = jax.nn.log_softmax(rows, axis=-1)  # (bs, A, H, W, n_cls)
    ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    loss_cls = region.class_scale * jnp.sum(ce * mask)

    total = loss_x + loss_y + loss_w + loss_h + loss_conf + loss_cls
    n_proposals = jnp.sum((parts[5] > 0.25) * keep[:, None, None, None])
    metrics = {
        "nGT": (tgt["nGT"]),
        "nCorrect": tgt["nCorrect"],
        "nProposals": n_proposals,
        "loss_x": loss_x,
        "loss_y": loss_y,
        "loss_w": loss_w,
        "loss_h": loss_h,
        "loss_conf": loss_conf,
        "loss_cls": loss_cls,
        "loss": total,
    }
    return total, metrics
