#!/usr/bin/env python3
"""Roofline restated at the shipped bench config (b384 + remat, bf16).

Compiles the exact bench.py train step for the attached TPU, pulls XLA's
cost analysis (flops / bytes accessed) from the compiled executable, and
combines it with the measured step rate to report achieved HBM bandwidth
and MXU utilization. Run on the real chip; one tunnel client at a time.
"""

import json
import sys
import time

import numpy as np

SIZE, N_CLS, BATCH = 416, 15, 384
V5E_HBM_GBS = 819.0      # v5e HBM bandwidth
V5E_BF16_TFS = 197.0     # v5e bf16 peak


def main():
    import jax
    import jax.numpy as jnp

    from fewshot_detection_tpu.config import parse_cfg
    from fewshot_detection_tpu.models.meta import MetaSpec, init_meta_params
    from fewshot_detection_tpu.models.spec import build_spec
    from fewshot_detection_tpu.train import MetaTrainer, init_momentum

    spec = MetaSpec(
        build_spec(parse_cfg("cfg/darknet_dynamic.cfg")),
        build_spec(parse_cfg("cfg/reweighting_net.cfg")),
    )
    params = init_meta_params(spec, 0)
    trainer = MetaTrainer(
        spec, momentum=0.9, weight_decay=0.0005, donate=False, remat=True
    )
    mom = init_momentum(params)

    rng = np.random.RandomState(0)
    R, b = 1, BATCH
    target = np.zeros((R, b, N_CLS, 50, 5), np.float32)
    for i in range(b):
        target[0, i, i % N_CLS, 0] = [i % N_CLS, 0.5, 0.5, 0.3, 0.3]
    batch = {
        "x": jnp.asarray(rng.rand(R, b, SIZE, SIZE, 3), jnp.bfloat16),
        "metax": jnp.asarray(rng.rand(R, N_CLS, SIZE, SIZE, 3), jnp.bfloat16),
        "mask": jnp.asarray(
            (rng.rand(R, N_CLS, SIZE, SIZE, 1) > 0.5), jnp.bfloat16
        ),
        "target": jnp.asarray(target),
        "keep": jnp.ones((R, b * N_CLS), jnp.float32),
    }

    lowered = trainer._step.lower(
        params, mom, batch["x"], batch["metax"], batch["mask"],
        batch["target"], batch["keep"],
        jnp.asarray(20000, jnp.int32), jnp.asarray(1e-5, jnp.float32),
    )
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))

    # measured step time: run a few steps with a value-fetch fence
    p, m = params, mom
    for i in range(2):
        p, m, metrics = trainer.step(p, m, batch, seen=20000 + i, lr=1e-5)
    float(metrics["loss"])
    iters = 5
    t0 = time.monotonic()
    for i in range(iters):
        p, m, metrics = trainer.step(p, m, batch, seen=20100 + i, lr=1e-5)
    float(metrics["loss"])
    dt = (time.monotonic() - t0) / iters

    out = {
        "batch": BATCH,
        "step_ms": round(dt * 1e3, 1),
        "img_per_s": round(BATCH / dt, 1),
        "cost_flops_per_step": flops,
        "cost_bytes_per_step": bytes_acc,
        "gflop_per_image": round(flops / BATCH / 1e9, 1),
        "hbm_mb_per_image": round(bytes_acc / BATCH / 1e6, 1),
        "arith_intensity_flop_per_byte": round(flops / bytes_acc, 1),
        "achieved_tflops": round(flops / dt / 1e12, 1),
        "achieved_gbs": round(bytes_acc / dt / 1e9, 1),
        "mxu_util_pct": round(100 * flops / dt / 1e12 / V5E_BF16_TFS, 1),
        "hbm_util_pct": round(100 * bytes_acc / dt / 1e9 / V5E_HBM_GBS, 1),
    }
    print("ROOFLINE " + json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
