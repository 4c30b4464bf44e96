#!/usr/bin/env python3
"""int8 meta-serving benchmark: learnet phase-1 codes + detection sweep.

Ensemble eval (valid_ensemble.py:76-178 in /root/reference) has two hot
phases: (1) the learnet over EVERY support image per checkpoint, (2) the
fixed-code detection sweep over every test image. Measures both at the
flagship 416px 15-way config, bf16 vs int8 (backbone), vs int8+head
(fused reweight+head on the int8 MXU), vs int8 learnet for phase 1.

Run alone on the chip (single tunnel client). Prints one JSON line.
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_CLS = 15
SIZE = 416


def fence(x):
    import numpy as np
    return float(np.asarray(x).ravel()[0])


def rate(fn, n_items, iters=40, warmup=3):
    for _ in range(warmup):
        out = fn()
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    fence(out)
    return n_items * iters / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--support-batch", type=int, default=64)
    ap.add_argument("--weights", default=None,
                    help="trained .weights checkpoint — random init collapses "
                    "activations through 31 layers and underreports "
                    "quantization deviation")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fewshot_detection_tpu.eval.detector import MetaDetector
    from fewshot_detection_tpu.models import meta as meta_mod
    from fewshot_detection_tpu.models.darknet import fold_batchnorm, folded_spec
    from fewshot_detection_tpu.models.meta import MetaSpec

    rng = np.random.RandomState(0)
    m = MetaDetector(
        os.path.join(REPO, "cfg/darknet_dynamic.cfg"),
        os.path.join(REPO, "cfg/reweighting_net.cfg"),
        args.weights,
        compute_dtype=jnp.bfloat16,
    )

    sb = args.support_batch
    metax = rng.rand(sb, SIZE, SIZE, 3).astype(np.float32)
    mask = (rng.rand(sb, SIZE, SIZE, 1) > 0.5).astype(np.float32)
    imgs = rng.rand(args.batch, SIZE, SIZE, 3).astype(np.float32)

    codes = m.class_codes(metax[:N_CLS], mask[:N_CLS])
    committed = m.commit_codes(codes)

    def dev_pct(ref, q):
        """max |q - ref| as % of ref's activation range."""
        ref = np.asarray(ref, np.float32)
        q = np.asarray(q, np.float32)
        rng_ = float(ref.max() - ref.min()) or 1.0
        return round(100.0 * float(np.abs(q - ref).max()) / rng_, 2)

    results = {}
    # phase 1: learnet codes, bf16
    mx, mk = jnp.asarray(metax), jnp.asarray(mask)
    codes_ref = np.asarray(m._codes(m.params, mx, mk)[0])
    results["codes_bf16_img_s"] = round(
        rate(lambda: m._codes(m.params, mx, mk)[0], sb), 1)
    # phase 2: detection sweep, bf16 (BN applied per layer at inference)
    xi = jnp.asarray(imgs)
    det_ref = np.asarray(m._detect(m.params, xi, committed))
    results["detect_bf16_img_s"] = round(
        rate(lambda: m._detect(m.params, xi, committed), args.batch), 1)

    # bf16 on the BN-FOLDED graph — the apples-to-apples serving baseline
    # for the int8 rows (quantization starts from the folded weights)
    fspec = MetaSpec(folded_spec(m.spec.darknet), m.spec.learnet)
    fparams = {
        "darknet": [jax.device_put(p) if p is not None else None
                    for p in fold_batchnorm(m.spec.darknet,
                                            m.params["darknet"])],
        "learnet": None,
    }
    detect_fold = jax.jit(
        lambda p, x, dw: meta_mod.detect_forward(
            fspec, p, x.astype(jnp.bfloat16),
            [d.astype(jnp.bfloat16) for d in dw],
            train=False, fuse=True,
        )[0].astype(jnp.float32))
    results["detect_bf16_folded_img_s"] = round(
        rate(lambda: detect_fold(fparams, xi, committed), args.batch), 1)
    results["detect_bf16_folded_dev_pct"] = dev_pct(
        det_ref, detect_fold(fparams, xi, committed))

    # quantize: backbone + learnet, head still bf16
    m.quantize_int8(imgs, codes, calib_support=(metax[:N_CLS], mask[:N_CLS]))
    results["codes_int8_img_s"] = round(
        rate(lambda: m._codes_int8(m.lqparams, mx, mk)[0], sb), 1)
    results["codes_int8_dev_pct"] = dev_pct(
        codes_ref, m._codes_int8(m.lqparams, mx, mk)[0])
    results["detect_int8_img_s"] = round(
        rate(lambda: m._detect_int8(m.qparams, xi, committed), args.batch), 1)
    results["detect_int8_dev_pct"] = dev_pct(
        det_ref, m._detect_int8(m.qparams, xi, committed))

    # + int8 fused reweight+head
    m.quantize_int8(imgs, codes, calib_support=None, quant_head=True)
    results["detect_int8_head_img_s"] = round(
        rate(lambda: m._detect_int8(m.qparams, xi, committed), args.batch), 1)
    results["detect_int8_head_dev_pct"] = dev_pct(
        det_ref, m._detect_int8(m.qparams, xi, committed))

    print(json.dumps({"metric": "int8_meta_serving", "batch": args.batch,
                      "support_batch": sb, **results}))


if __name__ == "__main__":
    main()
