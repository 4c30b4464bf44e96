"""Jitted fixed-buffer detection pipeline: decode -> top-k -> device NMS.

The reference's inference path decoded on GPU then filtered + NMS'd with
python loops on host (utils.py:112-193, 85-104 in /root/reference). This
variant keeps EVERYTHING on device with static shapes: raw head output in,
a fixed-size (B, K, 7) box buffer + keep mask out, one D2H copy of a few KB
per batch. The NMS inside is ops.nms_device (lax loop or the Pallas VMEM
kernel), so the whole sweep is a single XLA program — the serving-path
counterpart of the host eval used for protocol-exact mAP scoring.

Parity: for images whose candidate count above conf_thresh is <= top_k,
the kept boxes equal the host path's (same decode, same greedy NMS order,
ties broken identically by the stable sort). Images with more candidates
are truncated to the top_k highest-objectness ones first — at serving
thresholds (0.25-0.5) counts are far below the default K=128.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.boxes import decode_region_output
from ..ops.nms_device import nms_jax, nms_pallas


def _nms_rows(bsel, dsel, cconf, cid, nms_thresh, use_pallas, interpret):
    """Shared per-row tail: greedy NMS over a conf-descending candidate
    buffer, emitting reference-format rows + keep mask."""
    if use_pallas:
        keep, _ = nms_pallas(bsel, dsel, nms_thresh, interpret=interpret)
    else:
        keep, _ = nms_jax(bsel, dsel, nms_thresh)
    rows = jnp.concatenate(
        [bsel, dsel[:, None], cconf[:, None], cid[:, None].astype(bsel.dtype)],
        axis=-1,
    )
    return rows, keep & (dsel > 0)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6, 7, 8))
def _pipeline(
    output: jax.Array,
    anchors: tuple[tuple[float, float], ...],
    num_classes: int,
    conf_thresh: float,
    nms_thresh: float,
    top_k: int,
    use_pallas: bool,
    interpret: bool,
    validation: bool = False,
):
    """validation=False: serving semantics — threshold on objectness alone
    (utils.py:112-193 only_objectness default). validation=True: the mAP
    sweeps' semantics — threshold on det*max_cls_conf (valid.py:60 passes
    only_objectness=False) — and additionally return per-image candidate
    counts plus the full per-candidate class-confidence rows so the host
    can (a) fall back when the fixed buffer would truncate and (b) emit the
    reference's extra (cls_conf, cls_id) validation pairs."""
    decoded = decode_region_output(output, anchors, num_classes)
    b = output.shape[0]
    # flatten candidates in the host loop order (cy, cx, anchor) so NMS
    # tie-breaking matches ops.boxes.filter_boxes + nms exactly
    boxes = decoded["boxes"].transpose(0, 2, 3, 1, 4).reshape(b, -1, 4)
    det = decoded["det_conf"].transpose(0, 2, 3, 1).reshape(b, -1)
    cls = jax.nn.softmax(decoded["cls_logits"], axis=-1)
    cls_full = cls.transpose(0, 2, 3, 1, 4).reshape(b, -1, cls.shape[-1])
    cls_max = cls_full.max(axis=-1)
    cls_id = cls_full.argmax(axis=-1)

    conf = det * cls_max if validation else det
    mask = conf > conf_thresh
    # rank + NMS on objectness. The host sorts ascending on the fp32 key
    # (1 - det) with a STABLE argsort (ops.boxes.nms, utils.py:85-104);
    # dets that collide after that rounding must stay ties here too, so
    # rank on -(1 - det) rather than raw det. Masked-out candidates get a
    # sentinel below any real key (keys live in (-1, 0]).
    scores = jnp.where(mask, -(jnp.float32(1.0) - det.astype(jnp.float32)),
                       jnp.float32(-2.0))
    top_k = min(top_k, scores.shape[-1])  # buffer can cover ALL candidates
    top_scores, idx = jax.lax.top_k(scores, top_k)  # descending, stable
    counts = mask.sum(axis=-1, dtype=jnp.int32)

    def per_image(bx, dt, cm, ci, cf, sc, ix):
        bsel = bx[ix]
        dsel = jnp.where(sc > -1.5, dt[ix], 0.0)
        # top_k output is already conf-descending, so NMS order == identity
        # and `keep` aligns with the buffer rows
        rows, keep = _nms_rows(bsel, dsel, cm[ix], ci[ix], nms_thresh,
                               use_pallas, interpret)
        return rows, keep, cf[ix]

    rows, keep, csel = jax.vmap(per_image)(
        boxes, det, cls_max, cls_id, cls_full, top_scores, idx
    )
    return rows, keep, counts, csel


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6, 7, 8))
def _pipeline_v2(
    output: jax.Array,
    n_cls: int,
    anchors: tuple[tuple[float, float], ...],
    num_classes: int,
    conf_thresh: float,
    nms_thresh: float,
    top_k: int,
    use_pallas: bool,
    interpret: bool,
):
    """Meta-detector decode: cross-copy class softmax (utils.py:212-219 in
    /root/reference) normalizes class confidence ACROSS the n_cls batch
    copies, then each (image, class) row is thresholded on det*cls and
    greedily NMS'd on objectness — all on device with fixed buffers.

    output: (B*n_cls, H, W, A*(5+nC)) image-major. Returns (rows, keep)
    with leading dim B*n_cls; rows are [cx cy w h det cls_conf class_idx]
    (class_idx = the row's class position, which is what routes boxes to
    per-class result files in the meta sweeps)."""
    decoded = decode_region_output(output, anchors, num_classes)
    bn = output.shape[0]
    logits = decoded["cls_logits"]  # (B*n, A, H, W, nC)
    sm = jax.nn.softmax(
        logits.reshape(bn // n_cls, n_cls, *logits.shape[1:]), axis=1
    ).reshape(logits.shape)
    # metayolo heads are single-class per copy; rank by the max class conf
    cls_conf = sm.max(axis=-1)

    boxes = decoded["boxes"].transpose(0, 2, 3, 1, 4).reshape(bn, -1, 4)
    det = decoded["det_conf"].transpose(0, 2, 3, 1).reshape(bn, -1)
    cls = cls_conf.transpose(0, 2, 3, 1).reshape(bn, -1)
    cls_full = sm.transpose(0, 2, 3, 1, 4).reshape(bn, -1, sm.shape[-1])
    # int32 arange: an output.dtype (e.g. bfloat16) index would go inexact
    # past 256 rows and misroute boxes to the wrong per-class file; cast to
    # the box dtype only at the concatenate inside _nms_rows
    cls_idx = jnp.repeat(
        jnp.arange(bn, dtype=jnp.int32) % n_cls, boxes.shape[1]
    ).reshape(bn, -1)

    # threshold on det*cls (validation semantics, utils.py:255-282) but rank
    # and NMS on objectness — the host nms key (utils.py:85-104)
    mask = det * cls > conf_thresh
    # same stable ranking key as the host nms: -(1 - det) in fp32 (see
    # _pipeline); sentinel -2 pushes masked-out candidates past the end
    scores = jnp.where(mask, -(jnp.float32(1.0) - det.astype(jnp.float32)),
                       jnp.float32(-2.0))
    top_k = min(top_k, scores.shape[-1])  # buffer can cover ALL candidates
    top_scores, idx = jax.lax.top_k(scores, top_k)
    counts = mask.sum(axis=-1, dtype=jnp.int32)

    def per_row(bx, dt, cl, cidx, cf, sc, ix):
        bsel = bx[ix]
        dsel = jnp.where(sc > -1.5, dt[ix], 0.0)
        rows, keep = _nms_rows(bsel, dsel, cl[ix], cidx[ix], nms_thresh,
                               use_pallas, interpret)
        return rows, keep, cf[ix]

    rows, keep, csel = jax.vmap(per_row)(
        boxes, det, cls, cls_idx, cls_full, top_scores, idx
    )
    return rows, keep, counts, csel


class DevicePipeline:
    """Reusable jitted decode+NMS with a fixed candidate buffer.

    `__call__(raw_output) -> list of per-image reference-format box lists`
    (``[cx, cy, w, h, det_conf, cls_conf, cls_id]``, kept boxes in
    confidence-descending order — the ops.boxes.nms contract).
    """

    def __init__(
        self,
        region,
        conf_thresh: float = 0.5,
        nms_thresh: float = 0.4,
        top_k: int = 128,
        use_pallas: bool | None = None,
        interpret: bool | None = None,
        validation: bool = False,
    ):
        self.anchors = region.anchor_wh
        self.num_classes = region.num_classes
        self.conf_thresh = conf_thresh
        self.nms_thresh = nms_thresh
        self.top_k = top_k
        self.validation = validation
        on_tpu = jax.default_backend() == "tpu"
        self.use_pallas = on_tpu if use_pallas is None else use_pallas
        self.interpret = (not on_tpu) if interpret is None else interpret

    def eval_call(self, output: jax.Array):
        """(rows, keep, counts, csel) device arrays."""
        return _pipeline(
            output, self.anchors, self.num_classes, self.conf_thresh,
            self.nms_thresh, self.top_k, self.use_pallas, self.interpret,
            self.validation,
        )

    def device_call(self, output: jax.Array):
        """(rows, keep) device arrays — for fully on-device consumers."""
        return self.eval_call(output)[:2]

    def eval_boxes(self, output: jax.Array):
        """Post-NMS per-image box lists in the host sweep's exact format
        (incl. the reference's extra validation (cls_conf, cls_id) pairs),
        or None when any image's candidate count exceeds the fixed buffer
        — the caller then redoes that batch on the host path so the result
        files stay bit-identical in every regime."""
        return _rows_to_eval_boxes(*self.eval_call(output),
                                   self.conf_thresh, self.top_k)

    def __call__(self, output: jax.Array) -> list[list[list[float]]]:
        rows, keep = self.device_call(output)
        return _to_box_lists(rows, keep)


def _to_box_lists(rows, keep) -> list[list[list[float]]]:
    rows = np.asarray(rows)
    keep = np.asarray(keep)
    out = []
    for b in range(rows.shape[0]):
        img = []
        for r in range(rows.shape[1]):
            if keep[b, r]:
                row = rows[b, r]
                img.append(
                    [float(v) for v in row[:6]] + [int(round(float(row[6])))]
                )
        out.append(img)
    return out


def _rows_to_eval_boxes(rows, keep, counts, csel, conf_thresh, top_k):
    """Convert eval_call output into the host sweep's box-list format:
    [cx, cy, w, h, det, cls_conf, cls_id, (extra cls_conf, cls_id)...] per
    kept box — the `validation=True` contract of ops.boxes.filter_boxes
    (utils.py:160-184 in /root/reference). Returns None when the fixed
    buffer truncated (any candidate count > top_k)."""
    counts = np.asarray(counts)
    if counts.size and counts.max() > top_k:
        return None
    rows = np.asarray(rows)
    keep = np.asarray(keep)
    csel = np.asarray(csel)
    n_classes = csel.shape[-1]
    out = []
    for b in range(rows.shape[0]):
        img = []
        for r in range(rows.shape[1]):
            if not keep[b, r]:
                continue
            row = rows[b, r]
            box = [float(v) for v in row[:6]] + [int(round(float(row[6])))]
            if n_classes > 1:
                # `best` from the class-conf row itself: box[6] is the
                # argmax id for the plain pipeline but the class-COPY index
                # for the meta one (the writers key on row position there)
                det, best = box[4], int(np.argmax(csel[b, r]))
                for c in range(n_classes):
                    tc = float(csel[b, r, c])
                    if c != best and det * tc > conf_thresh:
                        box.extend([tc, c])
            img.append(box)
        out.append(img)
    return out


class MetaDevicePipeline:
    """On-device decode + per-(image, class) NMS for the META detector.

    The serving counterpart of the get_region_boxes_v2 + host-nms eval path
    (valid_ensemble.py:137-178 in /root/reference): raw detect_forward
    output in (image-major B*n_cls rows), kept boxes out, one small D2H
    copy per batch. Same truncation caveat as DevicePipeline: rows with
    more than top_k candidates above conf_thresh keep the top_k
    highest-objectness ones.
    """

    def __init__(
        self,
        region,
        n_cls: int,
        conf_thresh: float = 0.25,
        nms_thresh: float = 0.45,
        top_k: int = 128,
        use_pallas: bool | None = None,
        interpret: bool | None = None,
    ):
        self.anchors = region.anchor_wh
        self.num_classes = region.num_classes
        self.n_cls = n_cls
        self.conf_thresh = conf_thresh
        self.nms_thresh = nms_thresh
        self.top_k = top_k
        on_tpu = jax.default_backend() == "tpu"
        self.use_pallas = on_tpu if use_pallas is None else use_pallas
        self.interpret = (not on_tpu) if interpret is None else interpret

    def eval_call(self, output: jax.Array):
        """(rows, keep, counts, csel) device arrays, leading dim B*n_cls
        image-major."""
        return _pipeline_v2(
            output, self.n_cls, self.anchors, self.num_classes,
            self.conf_thresh, self.nms_thresh, self.top_k,
            self.use_pallas, self.interpret,
        )

    def device_call(self, output: jax.Array):
        """(rows, keep) device arrays, leading dim B*n_cls image-major."""
        return self.eval_call(output)[:2]

    def eval_boxes(self, output: jax.Array):
        """Post-NMS per-(image, class) box lists in the host sweep's exact
        format, or None when the fixed buffer truncated (host fallback)."""
        return _rows_to_eval_boxes(*self.eval_call(output),
                                   self.conf_thresh, self.top_k)

    def __call__(self, output: jax.Array) -> list[list[list[float]]]:
        """B*n_cls per-(image, class) box lists, ``[cx, cy, w, h, det_conf,
        cls_conf, class_idx]``, kept boxes in objectness-descending order."""
        rows, keep = self.device_call(output)
        return _to_box_lists(rows, keep)
