"""Benchmark: meta-YOLO episodic train step (fwd+bwd+update), images/sec/chip.

Matches the reference's hot loop (train_meta.py:201-225): the reference's
FULL global batch (64 detection images at 416x416, cfg/darknet_dynamic.cfg:3,
spread over 4 GPUs there) with a 15-class support set, on ONE chip. Compute
in bfloat16 with fp32 accumulation/params; rematerialization (conv outputs,
matmuls, and BN batch stats saved; epilogues recomputed) keeps the step
inside 16 GB HBM (the step is HBM-bandwidth-bound, so large batch + remat
beats small batch + full activations). Measured scaling on v5e-1:
b16 329 / b32 408 / b64+remat 546 / b128+remat 786 / b256+remat 836 /
b384+remat 861 img/s (b448 OOMs); the bench runs b384 (6x the reference's
full global batch per chip) and falls back for smaller-memory chips.

`vs_baseline` is measured against REF_IMG_PER_SEC_PER_GPU, an estimate of
the PyTorch-0.3 reference's per-GPU throughput (the repo publishes no
number — SURVEY.md §6; the training stack did per-step CPU target building
and a D2H sync, region_loss.py:298). The driver records the raw value
either way.
"""

import json
import time

import numpy as np

# Derived torch-0.3 per-GPU fwd+bwd rate: central estimate 29.4 img/s/GPU,
# bounds [19.8, 40.2] — see BASELINE.md "Derived reference throughput" and
# scripts/derive_baseline.py (measured host build_targets cost + published
# YOLOv2 FLOPs / era-GPU efficiency).
REF_IMG_PER_SEC_PER_GPU = 30.0

BATCH = 384
N_CLS = 15
SIZE = 416
WARMUP = 3
ITERS = 10


def _run(batch_size: int) -> float:
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
    # donate params/momentum (no full-model copies per step); remat trades
    # cheap recompute for HBM capacity so large batches fit on one chip
    trainer = MetaTrainer(
        spec, momentum=0.9, weight_decay=0.0005, donate=True, remat=True
    )
    mom = init_momentum(params)

    rng = np.random.RandomState(0)
    R, b = 1, batch_size
    target = np.zeros((R, b, N_CLS, 50, 5), np.float32)
    for i in range(b):
        c = i % N_CLS
        target[0, i, c, 0] = [c, 0.5, 0.5, 0.3, 0.3]
    batch = {
        "x": jnp.asarray(rng.rand(R, b, SIZE, SIZE, 3), jnp.bfloat16),
        "metax": jnp.asarray(rng.rand(R, N_CLS, SIZE, SIZE, 3), jnp.bfloat16),
        "mask": jnp.asarray(
            (rng.rand(R, N_CLS, SIZE, SIZE, 1) > 0.5), jnp.bfloat16
        ),
        "target": jnp.asarray(target),
        "keep": jnp.ones((R, b * N_CLS), jnp.float32),
    }

    p, m = params, mom
    for i in range(WARMUP):
        p, m, metrics = trainer.step(p, m, batch, seen=20000 + i, lr=1e-5)
    float(metrics["loss"])  # NOT block_until_ready: the tunneled platform
    # reports readiness early; a host transfer is the reliable fence

    t0 = time.perf_counter()
    for i in range(ITERS):
        p, m, metrics = trainer.step(p, m, batch, seen=30000 + i, lr=1e-5)
    float(metrics["loss"])
    dt = time.perf_counter() - t0
    return batch_size * ITERS / dt


def _is_oom(e: Exception) -> bool:
    msg = str(e)
    return (
        "RESOURCE_EXHAUSTED" in msg
        or "Out of memory" in msg
        or "OOM" in msg
        # allocation failures can also surface as compile-service errors
        # (observed for over-memory batches through the TPU tunnel) — but
        # a genuine bad-input compile failure (e.g. an invalid
        # FSD_XLA_OPTS flag) reports INVALID_ARGUMENT and must NOT be
        # silently downgraded to a smaller-batch fallback
        or ("tpu_compile_helper" in msg and "INVALID_ARGUMENT" not in msg)
        or "ran out of memory" in msg.lower()
    )


def main():
    import sys
    import traceback

    img_per_sec = None
    used_batch = None
    for b in (BATCH, 128, 64, 16):  # fall back on smaller-memory chips
        try:
            img_per_sec = _run(b)
            used_batch = b
            break
        except Exception as e:
            if not _is_oom(e):
                raise  # real failures surface with their traceback
            traceback.print_exc(file=sys.stderr)
            print(f"bench at batch {b} hit OOM; retrying smaller",
                  file=sys.stderr)
    assert img_per_sec is not None, "bench OOM'd at every batch size"
    print(
        json.dumps(
            {
                "metric": "meta_yolo_train_images_per_sec_per_chip",
                "value": round(img_per_sec, 2),
                "unit": (
                    f"images/sec/chip (fwd+bwd+update, 416px, 15-way, "
                    f"batch {used_batch})"
                ),
                "vs_baseline": round(img_per_sec / REF_IMG_PER_SEC_PER_GPU, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
