#!/usr/bin/env python3
"""Multiscale training on REAL hardware: bucket compiles, HBM, switches.

The reference resizes its training input every 64 samples once seen >=
256k (dataset.py:223-245 in /root/reference, {320..608 step 32}); on TPU
each size is a separate jit specialization (1-3 min compile through the
tunnel, OOM risk at 608^2). The CPU-mesh scale-switch test
(tests/test_multiscale_mesh.py) proves correctness; THIS script produces
the hardware evidence (VERDICT r2 #7):

  phase A  per-bucket first-step (compile+run) and cached step times, plus
           per-bucket device memory stats where the runtime exposes them
           (FSD_WARM-style warmup = running phase A itself; with
           FSD_COMPILE_CACHE set, a second run shows the cached times)
  phase B  a streaming "epoch" with `seen` pinned past the 256k threshold
           so every 64-sample block draws a random size from the full
           range — real decode+augment, real scale switches, steady
           throughput measured across them

Usage: python scripts/multiscale_epoch.py [--batch 32] [--batches 30]
       [--root DIR]   (run alone: single TPU-tunnel client rule)
"""

import argparse
import json
import os
import random
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

N_CLS = 15
SIZES = [320 + 32 * i for i in range(10)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--batches", type=int, default=30)
    ap.add_argument("--root", default=None)
    ap.add_argument("--skip-epoch", action="store_true")
    args = ap.parse_args()

    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fewshot_detection_tpu.cli.common import enable_compile_cache
    from fewshot_detection_tpu.cli.train_meta_cli import make_episode_batch
    from fewshot_detection_tpu.config import parse_cfg
    from fewshot_detection_tpu.models.meta import MetaSpec, init_meta_params
    from fewshot_detection_tpu.models.spec import build_spec
    from fewshot_detection_tpu.train import MetaTrainer, init_momentum

    enable_compile_cache()
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          flush=True)

    spec = MetaSpec(
        build_spec(parse_cfg(os.path.join(REPO, "cfg/darknet_dynamic.cfg"))),
        build_spec(parse_cfg(os.path.join(REPO, "cfg/reweighting_net.cfg"))),
    )
    params = init_meta_params(spec, 0)
    trainer = MetaTrainer(spec, momentum=0.9, weight_decay=0.0005, remat=True)
    mom = init_momentum(params)
    rng = np.random.RandomState(0)

    def batch_for(size):
        target = np.zeros((1, args.batch, N_CLS, 50, 5), np.float32)
        for i in range(args.batch):
            target[0, i, i % N_CLS, 0] = [i % N_CLS, 0.5, 0.5, 0.3, 0.3]
        return {
            "x": jnp.asarray(
                rng.rand(1, args.batch, size, size, 3), jnp.bfloat16),
            "metax": jnp.asarray(
                rng.rand(1, N_CLS, 416, 416, 3), jnp.bfloat16),
            "mask": jnp.asarray(
                (rng.rand(1, N_CLS, 416, 416, 1) > 0.5), jnp.bfloat16),
            "target": jnp.asarray(target),
            "keep": jnp.ones((1, args.batch * N_CLS), jnp.float32),
        }

    # ---- phase A: per-bucket compile + cached step + memory
    buckets = {}
    p, m = params, mom
    for size in SIZES:
        b = batch_for(size)
        t0 = time.perf_counter()
        p, m, metrics = trainer.step(p, m, b, seen=300000, lr=1e-5)
        float(metrics["loss"])
        first = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(3):
            p, m, metrics = trainer.step(p, m, b, seen=300001 + i, lr=1e-5)
        float(metrics["loss"])
        cached = (time.perf_counter() - t0) / 3
        mem = None
        try:
            stats = jax.local_devices()[0].memory_stats()
            if stats:
                mem = round(stats.get("peak_bytes_in_use", 0) / 2**30, 2)
        except Exception:
            pass
        buckets[size] = {
            "first_step_s": round(first, 1),
            "cached_step_ms": round(cached * 1000, 1),
            "img_per_s": round(args.batch / cached, 1),
            "peak_hbm_gib": mem,
        }
        print(f"bucket {size}: {buckets[size]}", flush=True)

    result = {"metric": "multiscale_hardware", "batch": args.batch,
              "buckets": buckets}

    # ---- phase B: streaming epoch across scale switches (real data)
    if not args.skip_epoch:
        from synth import make_voc_like

        from fewshot_detection_tpu.config import Settings, read_data_cfg
        from fewshot_detection_tpu.data.datasets import (
            DetectionDataset,
            MetaDataset,
        )
        from fewshot_detection_tpu.data.loader import prefetch

        root = args.root or tempfile.mkdtemp(prefix="fsd_ms_")
        d = make_voc_like(os.path.join(root, "voc"), n_images=192,
                          size=(256, 256), seed=5, style="shape")
        datacfg = os.path.join(root, "m.data")
        with open(datacfg, "w") as f:
            f.write(
                f"metayolo=1\nmetain_type=2\ndata=voc\nneg=1\nrand=0\n"
                f"novel={REPO}/data/voc_novels.txt\nnovelid=0\n"
                f"meta={d['traindict']}\ntrain={d['train_list']}\n"
                f"backup={root}/backup\ngpus=0\n"
            )
        data_options = read_data_cfg(datacfg)
        blocks = parse_cfg(os.path.join(REPO, "cfg/darknet_dynamic.cfg"))
        settings = Settings.configure(data_options, blocks[0], None)
        seen0 = 5 * 4000 * 64  # full 320-608 range active

        def episodes():
            prng = random.Random(9)
            while True:
                ds = DetectionDataset(
                    open(d["train_list"]).read().split(), settings,
                    train=True, seen=seen0, shuffle=False, rng=prng,
                    filter_valid=False,
                )
                metaset = MetaDataset(d["traindict"], settings, train=True,
                                      num_replicas=1, rng=prng)
                meta_iter = metaset.batches(N_CLS)
                for imgs, labels in ds.batches(args.batch):
                    yield imgs, labels, next(meta_iter)

        nprng = np.random.RandomState(1)
        it = prefetch(episodes())
        sizes_seen = []
        n_done = 0
        t0 = time.perf_counter()
        t_first = None
        for i in range(args.batches):
            imgs, labels, (metax, mask) = next(it)
            sizes_seen.append(imgs.shape[1])
            batch = make_episode_batch(imgs, labels, metax, mask, 1, 1,
                                       nprng, dtype="bfloat16")
            p, m, metrics = trainer.step(p, m, batch, seen=seen0 + i,
                                         lr=1e-5)
            if i == 0:
                float(metrics["loss"])
                t_first = time.perf_counter() - t0
                t0 = time.perf_counter()
            else:
                n_done += imgs.shape[0]
        float(metrics["loss"])
        dt = time.perf_counter() - t0
        result["epoch"] = {
            "batches": args.batches,
            "sizes_crossed": sorted(set(sizes_seen)),
            "n_switches": sum(1 for a, b2 in zip(sizes_seen, sizes_seen[1:])
                              if a != b2),
            "first_batch_s": round(t_first, 1),
            "steady_img_per_s": round(n_done / dt, 1),
        }
        print(f"epoch: {result['epoch']}", flush=True)

    print("MSJSON " + json.dumps(result))


if __name__ == "__main__":
    main()
