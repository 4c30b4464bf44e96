"""On-device greedy NMS.

The reference ran NMS on host python lists (utils.py:85-104). For serving,
keeping the decoded boxes on device avoids a D2H copy per image; greedy NMS
is sequential and data-dependent — the canonical XLA-unfriendly op — so two
device implementations are provided:

  * nms_jax     — lax.fori_loop over candidates with vectorized suppression
                  (portable: CPU/TPU, differentiably irrelevant)
  * nms_pallas  — a Pallas TPU kernel holding scores + the IoU matrix in
                  VMEM and running the suppression loop on-core (one kernel
                  instead of N fused loop steps)

Both return a keep mask over score-sorted candidates, matching the host
reference `ops.boxes.nms` exactly (ties broken by original order via stable
sort)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .boxes import iou_xywh_jnp


def _iou_matrix(boxes: jax.Array) -> jax.Array:
    """(N, 4) cxcywh -> (N, N) IoU."""
    return iou_xywh_jnp(boxes[:, None, :], boxes[None, :, :])


def _sort_by_conf(boxes: jax.Array, confs: jax.Array):
    order = jnp.argsort(1.0 - confs, stable=True)
    return boxes[order], confs[order], order


def nms_jax(boxes: jax.Array, confs: jax.Array, thresh: float) -> tuple[jax.Array, jax.Array]:
    """boxes (N, 4) normalized cxcywh; confs (N,). Returns (keep_mask, order)
    where keep_mask aligns with the ORIGINAL box order."""
    n = boxes.shape[0]
    b, c, order = _sort_by_conf(boxes, confs)
    ious = _iou_matrix(b)
    idx = jnp.arange(n)

    def body(i, conf):
        alive = conf[i] > 0
        suppress = alive & (idx > i) & (ious[i] > thresh)
        return jnp.where(suppress, 0.0, conf)

    final = jax.lax.fori_loop(0, n, body, c)
    keep_sorted = final > 0
    keep = jnp.zeros(n, bool).at[order].set(keep_sorted)
    return keep, order


def _nms_kernel(ious_ref, conf_ref, keep_ref, *, thresh: float):
    """Pallas kernel: sequential greedy suppression entirely in VMEM.

    ious: (N, N) fp32; conf: (1, N) fp32 -> keep: (1, N) fp32 (0/1).
    Mosaic cannot dynamic-slice loop-carried VALUES, so the per-step scalar
    `conf[i]` is read with a one-hot reduction; the IoU row is a dynamic
    ref read (pl.ds), which is a supported memory op."""
    from jax.experimental import pallas as pl

    n = ious_ref.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def body(i, conf):
        alive = jnp.sum(jnp.where(col == i, conf, 0.0)) > 0
        row = ious_ref[pl.ds(i, 1), :]  # (1, N)
        suppress = alive & (col > i) & (row > thresh)
        return jnp.where(suppress, 0.0, conf)

    final = jax.lax.fori_loop(0, n, body, conf_ref[:])
    keep_ref[:] = (final > 0).astype(jnp.float32)


def nms_pallas(
    boxes: jax.Array, confs: jax.Array, thresh: float, interpret: bool = False
) -> tuple[jax.Array, jax.Array]:
    """Same contract as nms_jax, with the suppression loop as one Pallas
    TPU kernel (pass interpret=True off-TPU)."""
    from jax.experimental import pallas as pl

    n = boxes.shape[0]
    b, c, order = _sort_by_conf(boxes, confs)
    ious = _iou_matrix(b).astype(jnp.float32)

    keep_sorted = pl.pallas_call(
        functools.partial(_nms_kernel, thresh=thresh),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        interpret=interpret,
    )(ious, c.astype(jnp.float32)[None, :])[0] > 0

    keep = jnp.zeros(n, bool).at[order].set(keep_sorted)
    return keep, order


def nms_device_boxes(
    box_list: list[list[float]], thresh: float, use_pallas: bool = False,
    interpret: bool = False,
) -> list[list[float]]:
    """Host-list adapter matching ops.boxes.nms output ordering (kept boxes
    in descending-confidence order)."""
    import numpy as np

    if not box_list:
        return box_list
    arr = np.asarray([b[:5] for b in box_list], np.float32)
    fn = nms_pallas if use_pallas else nms_jax
    kwargs = {"interpret": interpret} if use_pallas else {}
    keep, order = fn(jnp.asarray(arr[:, :4]), jnp.asarray(arr[:, 4]), thresh,
                     **kwargs)
    keep = np.asarray(keep)
    order = np.asarray(order)
    return [box_list[int(i)] for i in order if keep[int(i)]]
