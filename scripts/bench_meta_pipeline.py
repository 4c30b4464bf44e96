"""Bench MetaDevicePipeline vs the host v2 decode+NMS path (PERF.md).

The meta sweep's per-(image, class) row structure multiplies NMS calls by
n_cls, which is exactly where the on-device pipeline pays: one jitted
program per batch vs B*n_cls python NMS invocations on host. Reference
contract being accelerated: utils.py:195-290 + 85-104 in /root/reference.

Run on the target device (compiled Pallas on TPU; pass --interpret on CPU).
"""

import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from fewshot_detection_tpu.eval.device_pipeline import MetaDevicePipeline
from fewshot_detection_tpu.ops.boxes import get_region_boxes_v2, nms


class _Region:
    # yolo-voc anchor set (cfg/darknet_dynamic.cfg), single-class meta head
    anchor_wh = ((1.3221, 1.73145), (3.19275, 4.00944), (5.05587, 8.09892),
                 (9.47112, 4.84053), (11.2364, 10.0071))
    num_classes = 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--n-cls", type=int, default=15)
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--skip-host", action="store_true",
                    help="skip the (very slow) host reference sweep")
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    out = jax.device_put(jnp.asarray(rng.randn(
        args.batch * args.n_cls, 13, 13,
        5 * (5 + _Region.num_classes)).astype(np.float32)))

    results = {}
    for use_pallas in (False, True):
        pipe = MetaDevicePipeline(
            _Region, args.n_cls, conf_thresh=args.conf, nms_thresh=0.45,
            top_k=128, use_pallas=use_pallas, interpret=args.interpret,
        )
        res = pipe(out)  # compile + host-format once
        t0 = time.perf_counter()
        for _ in range(args.iters):
            rows, keep = pipe.device_call(out)
        _ = float(rows[0, 0, 0])  # fence (block_until_ready acks early
        # through the TPU tunnel)
        dt = (time.perf_counter() - t0) / args.iters
        kept = sum(len(r) for r in res)
        results[use_pallas] = kept
        print(f"device pipeline pallas={use_pallas}: {dt * 1000:.1f} "
              f"ms/batch ({args.batch} imgs x {args.n_cls} cls), kept={kept}")

    if not args.skip_host:
        t0 = time.perf_counter()
        lists = get_region_boxes_v2(
            out, args.n_cls, args.conf, _Region.num_classes,
            _Region.anchor_wh, only_objectness=False, validation=False,
        )
        host = [nms(bl, 0.45) for bl in lists]
        dt = time.perf_counter() - t0
        kept = sum(len(r) for r in host)
        print(f"host v2 decode+nms: {dt * 1000:.1f} ms/batch, kept={kept}")
        pipe = MetaDevicePipeline(
            _Region, args.n_cls, conf_thresh=args.conf, nms_thresh=0.45,
            top_k=128, interpret=args.interpret,
        )
        dev = pipe(out)
        mism = sum(1 for a, b in zip(host, dev) if len(a) != len(b))
        print(f"rows with count mismatch vs host: {mism}")
        if mism:
            sys.exit(1)


if __name__ == "__main__":
    main()
