"""Baseline YOLOv2 training driver (train.py CLI contract).

Usage: python train.py datacfg cfgfile weightfile

Mirrors /root/reference/train.py:28-230: optional yolo_joint few-shot list
merge (train.py:94-103), per-param weight-decay exemption for BN/bias
(train.py:132-138), step-LR schedule, .weights checkpoints."""

from __future__ import annotations

import os
import random
import time

import numpy as np

from ..data.datasets import DetectionDataset
from ..data.loader import prefetch
from ..data.lists import load_lines
from ..models import weights_io
from ..models.darknet import init_params
from ..models.spec import build_spec
from ..ops.region_loss import sample_neg_keep
from ..train import PlainTrainer, init_momentum, lr_schedule
from ..utils import format_loss_line, log
from .common import ensure_backup_dir, replica_layout, resolve_configs
from .train_meta_cli import _free_batch, _jnp_dtype


def main(datacfg, cfgfile, weightfile):
    data_options, blocks, _, settings = resolve_configs(datacfg, cfgfile)
    net_options = blocks[0]
    batch_size = int(net_options["batch"])
    max_batches = int(net_options["max_batches"])
    learning_rate = float(net_options["learning_rate"])
    momentum = float(net_options["momentum"])
    decay = float(net_options["decay"])
    steps = tuple(float(s) for s in net_options["steps"].split(","))
    scales = tuple(float(s) for s in net_options["scales"].split(","))

    backupdir = ensure_backup_dir(settings)
    log("logging to " + backupdir)

    spec = build_spec(blocks)
    params = init_params(spec, int(time.time()) % (2**31))
    (params,), header = weights_io.load_weights(weightfile, [spec], [params])
    seen = header.seen

    trainlist = load_lines(data_options["train"], settings)
    if settings.yolo_joint:
        # merge the few-shot support lists into training (train.py:94-103)
        extra = load_lines(data_options["meta"], settings, checkvalid=False)
        factor = max(len(trainlist) // max(len(extra), 1) // 4, 1)
        trainlist = trainlist + extra * factor

    nsamples = len(trainlist)
    processed_batches = seen // batch_size
    init_epoch = seen // max(nsamples, 1)
    max_epochs = max_batches * batch_size // max(nsamples, 1) + 1

    n_groups, _ = replica_layout(batch_size)
    trainer = PlainTrainer(
        spec, momentum=momentum, weight_decay=decay * batch_size,
        zero_tcls=settings.metayolo,
        remat=os.environ.get("FSD_REMAT", "0") == "1",
        clip_norm=float(os.environ.get("FSD_CLIP_NORM", "0")),
        image_dtype=_jnp_dtype(os.environ.get("FSD_DTYPE", "float32")),
        warmup_seen=settings.warmup_seen,
    )
    mom = init_momentum(params)

    mesh = None
    if n_groups > 1:
        from ..parallel import make_mesh, replicate

        mesh = make_mesh(n_groups)
        # see train_meta_cli: params left single-device next to sharded
        # batches are resharded every step — replicate once up front
        params = replicate(mesh, params)
        mom = replicate(mesh, mom)

    rng = random.Random(int(time.time()))
    nprng = np.random.RandomState(rng.randrange(2**31))

    import jax.numpy as jnp

    # FSD_DTYPE=bfloat16 halves the per-step H2D image traffic (same knob
    # as the meta driver); BN stats/loss math stay fp32
    from .train_meta_cli import _image_host_dtype

    jdt, enc = _image_host_dtype(os.environ.get("FSD_DTYPE", "float32"))

    for epoch in range(init_epoch, max_epochs):
        t0 = time.time()
        ds = DetectionDataset(
            trainlist, settings, train=True, seen=seen, shuffle=False,
            rng=rng, filter_valid=False,
        )
        lr = lr_schedule(processed_batches, learning_rate, steps, scales)
        log(
            f"epoch {epoch}/{max_epochs}, processed {epoch * nsamples} "
            f"samples, lr {lr:f}"
        )
        # FSD_WORKERS=N: N loader worker processes (torch num_workers
        # analogue); default keeps the single prefetch thread
        n_workers = int(os.environ.get("FSD_WORKERS", "0"))
        if n_workers > 0:
            from ..data.mploader import MPLoader, detection_stream

            loader = MPLoader(
                detection_stream,
                (trainlist, settings, batch_size, seen),
                num_workers=n_workers, seed=rng.randrange(2**31),
            )
        else:
            loader = None
        try:
            for imgs, labels in (iter(loader) if loader
                                 else prefetch(ds.batches(batch_size))):
                lr = lr_schedule(processed_batches, learning_rate, steps, scales)
                processed_batches += 1
                B = imgs.shape[0]
                b = B // n_groups
                keep = sample_neg_keep(
                    labels.reshape(B, -1), settings.neg_ratio, nprng
                )
                batch = {
                    "x": jnp.asarray(
                        enc(imgs.reshape(n_groups, b, *imgs.shape[1:])), jdt
                    ),
                    "target": labels.reshape(n_groups, b, 50, 5),
                    "keep": keep.reshape(n_groups, b),
                }
                if mesh is not None:
                    from ..parallel import shard_batch

                    batch = shard_batch(mesh, batch)
                seen += B
                params, mom, metrics = trainer.step(
                    params, mom, batch, seen=seen, lr=lr / batch_size
                )
                print(format_loss_line(seen, metrics))
                _free_batch(batch)
        finally:
            # close worker processes on every exit path, not just the
            # clean epoch end (a crash otherwise leaks them until exit)
            if loader is not None:
                loader.close()
        log(
            "training with %f samples/s"
            % (nsamples / max(time.time() - t0, 1e-9))
        )
        if (epoch + 1) % settings.save_interval == 0:
            out = f"{backupdir}/{epoch + 1:06d}.weights"
            log("save weights to " + out)
            weights_io.save_weights(
                out, [spec], [params], seen=(epoch + 1) * nsamples
            )
    return params
