#!/usr/bin/env python3
"""Host input-pipeline throughput: PIL vs native vs threaded vs workers.

Measures the decode+augment supply rate against the device step's demand
(PERF.md: the 416px episodic step consumes up to ~865 img/s/chip at b384)
and, with --train, the END-TO-END trained throughput with real data in
the loop — the number the bench.py headline (device-resident batches)
deliberately excludes. VERDICT r2 weak #3.

Modes measured (detection images; episodic adds n_cls support images per
batch through the same path):
  pil            sequential PIL decode+augment (reference image.py parity path)
  native         sequential C++ (FSD_NATIVE=1)
  native-batch   C++ pthread batch API, one call per batch (FSD_NATIVE_BATCH=1)
  mp-N           N loader worker processes (MPLoader, torch num_workers analogue)

Usage:
  python scripts/bench_input_pipeline.py [--images N] [--batch B] [--size S]
                                         [--workers N] [--train] [--root DIR]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def build_dataset(d, settings, lines, seed=3):
    import random

    from fewshot_detection_tpu.data.datasets import DetectionDataset

    return DetectionDataset(list(lines), settings, train=True, seen=0,
                            shuffle=False, rng=random.Random(seed),
                            filter_valid=False)


def drain(batches, limit=None):
    n = 0
    t0 = time.perf_counter()
    for imgs, _labels in batches:
        n += imgs.shape[0]
        if limit and n >= limit:
            break
    return n / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=256)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=256, help="source image size")
    ap.add_argument("--workers", type=int, default=max(os.cpu_count(), 2))
    ap.add_argument("--train", action="store_true",
                    help="also run REAL episodic train steps (uses the TPU "
                    "unless JAX_PLATFORMS forces cpu) with data in the loop")
    ap.add_argument("--train-batches", type=int, default=30)
    ap.add_argument("--root", default=None)
    args = ap.parse_args()

    import tempfile

    from synth import make_voc_like

    from fewshot_detection_tpu.config import Settings, parse_cfg, read_data_cfg

    root = args.root or tempfile.mkdtemp(prefix="fsd_inbench_")
    d = make_voc_like(os.path.join(root, "voc"), n_images=args.images,
                      size=(args.size, args.size), seed=3, style="shape")
    datacfg = os.path.join(root, "m.data")
    with open(datacfg, "w") as f:
        f.write(
            f"metayolo=1\nmetain_type=2\ndata=voc\nneg=1\nrand=0\nscale=0\n"
            f"novel={REPO}/data/voc_novels.txt\nnovelid=0\n"
            f"meta={d['traindict']}\ntrain={d['train_list']}\n"
            f"backup={root}/backup\ngpus=0\n"
        )
    data_options = read_data_cfg(datacfg)
    blocks = parse_cfg(os.path.join(REPO, "cfg/darknet_dynamic.cfg"))
    settings = Settings.configure(data_options, blocks[0], None)
    lines = open(d["train_list"]).read().split()

    results = {}

    os.environ.pop("FSD_NATIVE", None)
    os.environ.pop("FSD_NATIVE_BATCH", None)
    results["pil"] = round(drain(
        build_dataset(d, settings, lines).batches(args.batch)), 1)

    from fewshot_detection_tpu.native import native_available

    if native_available():
        os.environ["FSD_NATIVE"] = "1"
        results["native"] = round(drain(
            build_dataset(d, settings, lines).batches(args.batch)), 1)
        os.environ["FSD_NATIVE_BATCH"] = "1"
        results["native-batch"] = round(drain(
            build_dataset(d, settings, lines).batches(args.batch)), 1)
        os.environ.pop("FSD_NATIVE", None)
        os.environ.pop("FSD_NATIVE_BATCH", None)

    from fewshot_detection_tpu.data.mploader import MPLoader, episode_stream

    for w in sorted({1, 2, args.workers}):
        loader = MPLoader(
            episode_stream,
            (lines, data_options["meta"], settings, args.batch, 0),
            num_workers=w, seed=3,
        )
        # episodes carry n_cls extra support images each; count both
        n = 0
        t0 = time.perf_counter()
        for imgs, _l, metax, _m in loader:
            n += imgs.shape[0] + metax.shape[0]
        dt = time.perf_counter() - t0
        loader.close()
        results[f"mp-{w}-episodic"] = round(n / dt, 1)

    if args.train:
        results["trained"] = round(bench_trained(
            d, data_options, settings, lines, args.batch,
            args.train_batches), 1)

    results["host_cores"] = os.cpu_count()
    print(json.dumps({"metric": "input_pipeline_images_per_sec", **results}))


def bench_trained(d, data_options, settings, lines, batch_size, n_batches):
    """Real episodic train steps with REAL decode+augment in the loop."""
    import random

    import jax.numpy as jnp
    import numpy as np

    from fewshot_detection_tpu.cli.train_meta_cli import make_episode_batch
    from fewshot_detection_tpu.config import parse_cfg
    from fewshot_detection_tpu.data.datasets import MetaDataset
    from fewshot_detection_tpu.data.loader import prefetch
    from fewshot_detection_tpu.models.meta import MetaSpec, init_meta_params
    from fewshot_detection_tpu.models.spec import build_spec
    from fewshot_detection_tpu.train import MetaTrainer, init_momentum

    spec = MetaSpec(
        build_spec(parse_cfg(os.path.join(REPO, "cfg/darknet_dynamic.cfg"))),
        build_spec(parse_cfg(os.path.join(REPO, "cfg/reweighting_net.cfg"))),
    )
    params = init_meta_params(spec, 0)
    trainer = MetaTrainer(spec, momentum=0.9, weight_decay=0.0005,
                          remat=os.environ.get("FSD_REMAT", "0") == "1")
    mom = init_momentum(params)
    nprng = np.random.RandomState(0)

    def episodes():
        rng = random.Random(5)
        while True:
            ds = build_dataset(d, settings, lines, seed=rng.randrange(2**31))
            metaset = MetaDataset(data_options["meta"], settings, train=True,
                                  num_replicas=1, rng=rng)
            meta_iter = metaset.batches(len(metaset.classes))
            for imgs, labels in ds.batches(batch_size):
                metax, mask = next(meta_iter)
                yield imgs, labels, metax, mask

    it = prefetch(episodes())
    p, m = params, mom
    metrics = None
    for i in range(3):  # warmup/compile
        imgs, labels, metax, mask = next(it)
        batch = make_episode_batch(imgs, labels, metax, mask, 1, 1, nprng,
                                   dtype=os.environ.get("FSD_DTYPE",
                                                        "float32"))
        p, m, metrics = trainer.step(p, m, batch, seen=20000 + i, lr=1e-5)
    float(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(n_batches):
        imgs, labels, metax, mask = next(it)
        batch = make_episode_batch(imgs, labels, metax, mask, 1, 1, nprng,
                                   dtype=os.environ.get("FSD_DTYPE",
                                                        "float32"))
        p, m, metrics = trainer.step(p, m, batch, seen=30000 + i, lr=1e-5)
    float(metrics["loss"])
    return batch_size * n_batches / (time.perf_counter() - t0)


if __name__ == "__main__":
    main()
