"""Episodic meta training driver (train_meta.py CLI contract).

Usage: python train_meta.py datacfg darknetcfg learnetcfg weightfile

Reproduces the reference driver's control flow (train_meta.py:28-326):
schedule state restored from the .weights `seen` counter, per-epoch list
dataset + support stream, step-LR warmup schedule adjusted per batch, LR /
batch_size and weight_decay * batch_size * factor scaling, periodic
.weights checkpoints. The per-step compute (forward, loss, SGD, BN merge)
is one jitted program over a replica-group mesh (train.trainer)."""

from __future__ import annotations

import math
import os
import random
import time

import numpy as np

from ..data import MetaDataset, build_dataset
from ..data.datasets import DetectionDataset
from ..data.loader import prefetch
from ..models import weights_io
from ..models.meta import MetaSpec, init_meta_params
from ..models.spec import build_spec
from ..ops.region_loss import sample_neg_keep
from ..train import MetaTrainer, init_momentum, lr_schedule, neg_ratio_lr_factor
from ..utils import format_loss_line, log
from ..utils.profiling import StepTimer, trace
from .common import ensure_backup_dir, replica_layout, resolve_configs


def _free_batch(batch: dict) -> None:
    """Explicitly free the step's device input buffers.

    Through the remote-attached TPU tunnel the staged input arrays are NOT
    reclaimed when Python drops them — measured 54 MB/step host RSS growth
    (one bf16 episode batch), which OOM-killed a 110-minute training run at
    129 GB. The loss-line fetch above already synced step completion, so
    deleting the inputs here is safe everywhere and a no-op-cost on
    locally-attached backends."""
    import jax

    for leaf in jax.tree_util.tree_leaves(batch):
        if hasattr(leaf, "delete"):
            try:
                leaf.delete()
            except Exception:
                pass


def compute_dtype() -> str:
    """Training compute dtype name: FSD_DTYPE=bfloat16 casts image inputs
    (BN statistics and loss math stay fp32 regardless — ops/layers.py)."""
    return os.environ.get("FSD_DTYPE", "float32")


def _jnp_dtype(name: str):
    import jax.numpy as jnp

    return getattr(jnp, name)


def _image_host_dtype(dtype: str):
    """FSD_INPUT_U8=1 ships image tensors as uint8 and rescales on device
    (trainer._decode_images): halves H2D bytes vs bf16 (4x vs fp32) on
    remote-attached transports with no precision loss relative to the
    bf16 compute cast (bf16's 8 mantissa bits ~= u8)."""
    import jax.numpy as jnp

    if os.environ.get("FSD_INPUT_U8", "0") == "1":
        return jnp.uint8, lambda a: np.round(
            np.asarray(a, np.float32) * 255.0
        ).astype(np.uint8)
    return getattr(jnp, dtype), lambda a: a


def make_episode_batch(imgs, labels, metax, mask, n_groups, neg_ratio, rng,
                       dtype: str = "float32"):
    """Stack host arrays into the trainer's (R, ...) layout."""
    import jax.numpy as jnp

    jdt, enc = _image_host_dtype(dtype)
    B = imgs.shape[0]
    n_cls = labels.shape[1]
    b = B // n_groups
    keep = sample_neg_keep(labels.reshape(B * n_cls, -1), neg_ratio, rng)
    return {
        "x": jnp.asarray(enc(imgs.reshape(n_groups, b, *imgs.shape[1:])), jdt),
        "metax": jnp.asarray(
            enc(metax.reshape(n_groups, n_cls, *metax.shape[1:])), jdt
        ),
        "mask": jnp.asarray(
            enc(mask.reshape(n_groups, n_cls, *mask.shape[1:])), jdt
        ),
        "target": labels.reshape(n_groups, b, n_cls, 50, 5),
        "keep": keep.reshape(n_groups, b * n_cls),
    }


def main(datacfg, darknetcfg_path, learnetcfg_path, weightfile):
    data_options, darknetcfg, learnetcfg, settings = resolve_configs(
        datacfg, darknetcfg_path, learnetcfg_path
    )
    net_options = darknetcfg[0]
    batch_size = int(net_options["batch"])
    max_batches = int(net_options["max_batches"])
    learning_rate = float(net_options["learning_rate"])
    momentum = float(net_options["momentum"])
    decay = float(net_options["decay"])
    steps = tuple(float(s) for s in net_options["steps"].split(","))
    scales = tuple(float(s) for s in net_options["scales"].split(","))

    backupdir = ensure_backup_dir(settings)
    log("logging to " + backupdir)

    spec = MetaSpec(build_spec(darknetcfg), build_spec(learnetcfg))
    params = init_meta_params(spec, int(time.time()) % (2**31))
    (dp, lp), header = weights_io.load_weights(
        weightfile, [spec.darknet, spec.learnet],
        [params["darknet"], params["learnet"]],
    )
    params = {"darknet": dp, "learnet": lp}
    seen = header.seen

    trainlist = build_dataset(data_options, settings)
    nsamples = len(trainlist)
    processed_batches = 0 if settings.tuning else seen // batch_size
    init_epoch = 0 if settings.tuning else seen // max(nsamples, 1)
    max_epochs = max_batches * batch_size // max(nsamples, 1) + 1
    if settings.tuning:
        max_epochs = int(math.ceil(settings.max_epoch * 1.0 / settings.repeat))
    log(f"{settings.repeat} {nsamples} {max_batches} {batch_size}")

    # LR factor keyed to neg sampling (train_meta.py:123-135)
    probe_meta = MetaDataset(
        data_options["meta"], settings, train=True, num_replicas=1,
        rng=random.Random(0),
    )
    factor = neg_ratio_lr_factor(settings.neg_ratio, len(probe_meta.classes))
    log(f"factor: {factor}")
    learning_rate /= factor

    n_groups, _ = replica_layout(batch_size)
    trainer = MetaTrainer(
        spec, momentum=momentum,
        weight_decay=decay * batch_size * factor,
        metain_type=settings.metain_type,
        # FSD_REMAT=1: rematerialize activation epilogues in the backward —
        # numerically identical, required to fit the flagship 416px step at
        # the cfg's batch 64 in 16 GB HBM (PERF.md scaling table)
        remat=os.environ.get("FSD_REMAT", "0") == "1",
        # FSD_CLIP_NORM: opt-in global-norm gradient clipping — the
        # reference never trains from random init (always darknet19
        # pretrained), where the early conf loss can diverge plain SGD
        clip_norm=float(os.environ.get("FSD_CLIP_NORM", "0")),
        image_dtype=_jnp_dtype(compute_dtype()),
        warmup_seen=settings.warmup_seen,
    )
    mom = init_momentum(params)

    # Full-state resume (params + momentum + schedule counters) when an
    # Orbax snapshot exists — richer than the .weights seen-counter restore.
    orbax_resume = os.environ.get("FSD_ORBAX_DIR")
    if orbax_resume:
        from ..train.checkpoint import latest_checkpoint, restore_train_state

        latest = latest_checkpoint(orbax_resume)
        if latest:
            log(f"resuming train state from {latest}")
            state = restore_train_state(
                latest, {"params": params, "momentum": mom,
                         "counters": {"seen": 0, "processed_batches": 0,
                                      "step": 0}},
            )
            params = state["params"]
            mom = state["momentum"]
            seen = state["counters"]["seen"]
            processed_batches = state["counters"]["processed_batches"]
            init_epoch = state["counters"]["step"]

    mesh = None
    if n_groups > 1:
        from ..parallel import make_mesh, replicate, shard_batch

        mesh = make_mesh(n_groups)
        # commit params/momentum replicated on the mesh once — leaving them
        # single-device next to sharded batches makes XLA reshard the full
        # parameter set every step (measured 6x step slowdown)
        params = replicate(mesh, params)
        mom = replicate(mesh, mom)

    if os.environ.get("FSD_WARM", "0") == "1" and settings.multiscale:
        log("pre-compiling multiscale buckets...")
        shard_fn = None
        if mesh is not None:
            from ..parallel import shard_batch as _sb

            shard_fn = lambda b: _sb(mesh, b)
        import jax.numpy as jnp

        trainer.warm(
            params, mom, n_cls=len(probe_meta.classes),
            batch_size=batch_size, n_groups=n_groups,
            # the jit cache keys on input dtype: warm with the SAME dtype
            # the loop's make_episode_batch will feed (FSD_DTYPE /
            # FSD_INPUT_U8), else every bucket still recompiles at first use
            dtype=_image_host_dtype(compute_dtype())[0],
            meta_shape=(settings.meta_width, settings.meta_height),
            mask_shape=(settings.mask_width, settings.mask_height),
            # raw support-image channels: RGB, +cropped RGB for metain 3/4
            meta_channels=6 if settings.metain_type in (3, 4) else 3,
            shard_fn=shard_fn,
        )

    rng = random.Random(int(time.time()))
    nprng = np.random.RandomState(rng.randrange(2**31))

    orbax_dir = os.environ.get("FSD_ORBAX_DIR")

    try:
        for epoch in range(init_epoch, max_epochs):
            timer = StepTimer()
            ds = DetectionDataset(
                trainlist, settings, train=True, seen=seen, shuffle=False,
                rng=rng, filter_valid=False,
            )
            metaset = MetaDataset(
                data_options["meta"], settings, train=True,
                num_replicas=n_groups, rng=rng,
            )
            meta_iter = metaset.batches(n_groups * len(metaset.classes))

            lr = lr_schedule(processed_batches, learning_rate, steps, scales)
            log(
                f"epoch {epoch}/{max_epochs}, processed {epoch * nsamples} "
                f"samples, lr {lr:f}"
            )

            def episodes():
                # detection + support batches prepared together so the
                # background thread hides BOTH loads behind the device step
                for imgs, labels in ds.batches(batch_size):
                    metax, mask = next(meta_iter)
                    yield imgs, labels, metax, mask

            # FSD_WORKERS=N: N loader worker PROCESSES (the reference's
            # torch num_workers, train_meta.py:173-183) — the GIL-bound
            # decode path cannot scale on the prefetch thread alone
            n_workers = int(os.environ.get("FSD_WORKERS", "0"))
            mp_loader = None
            if n_workers > 0:
                from ..data.mploader import MPLoader, episode_stream

                mp_loader = MPLoader(
                    episode_stream,
                    (trainlist, data_options["meta"], settings, batch_size,
                     seen, n_groups),
                    num_workers=n_workers, seed=rng.randrange(2**31),
                )

            # FSD_OVERLAP_METRICS=1: fetch step i's loss scalars only AFTER
            # step i+1 is dispatched, so the blocking metrics round-trip
            # (700-1400 ms through the remote tunnel at b32/416) overlaps
            # the next step's host prep + H2D instead of serializing the
            # pipeline. Loss lines print one step late with their own seen
            # counter; checkpoint cadence and values are unchanged.
            overlap = os.environ.get("FSD_OVERLAP_METRICS", "0") == "1"
            pending = None

            def _flush(p):
                with timer.phase("sync"):
                    line = format_loss_line(p[0], p[1])
                print(line)
                _free_batch(p[2])

            try:
                with trace():  # jax.profiler trace when FSD_PROFILE_DIR set
                    it = iter(mp_loader) if mp_loader else prefetch(episodes())
                    while True:
                        with timer.phase("data"):
                            nxt = next(it, None)
                            if nxt is None:
                                break
                            imgs, labels, metax, mask = nxt
                        lr = lr_schedule(processed_batches, learning_rate, steps, scales)
                        processed_batches += 1
                        with timer.phase("step"):
                            batch = make_episode_batch(
                                imgs, labels, metax, mask, n_groups,
                                settings.neg_ratio, nprng, dtype=compute_dtype(),
                            )
                            if mesh is not None:
                                from ..parallel import shard_batch

                                batch = shard_batch(mesh, batch)
                            seen += imgs.shape[0]
                            params, mom, metrics = trainer.step(
                                params, mom, batch, seen=seen, lr=lr / batch_size
                            )
                        # the metrics fetch is where the host actually BLOCKS
                        # on the async-dispatched step — time it as its own
                        # phase ('step' above measures trace+dispatch only)
                        if overlap:
                            if pending is not None:
                                _flush(pending)
                            pending = (seen, metrics, batch)
                        else:
                            with timer.phase("sync"):
                                line = format_loss_line(seen, metrics)
                            print(line)
                            _free_batch(batch)
                    if pending is not None:
                        _flush(pending)
                        pending = None
            finally:
                # a tunnel crash mid-epoch must not leave FSD_WORKERS
                # spawned processes decoding batches until interpreter exit
                if mp_loader is not None:
                    mp_loader.close()
            log(timer.summary(images=nsamples))

            if (epoch + 1) % settings.save_interval == 0:
                out = f"{backupdir}/{epoch + 1:06d}.weights"
                log("save weights to " + out)
                weights_io.save_weights(
                    out, [spec.darknet, spec.learnet],
                    [params["darknet"], params["learnet"]],
                    seen=(epoch + 1) * nsamples,
                )
                if orbax_dir:
                    from ..train.checkpoint import save_train_state

                    save_train_state(
                        orbax_dir, epoch + 1, params, mom,
                        seen=(epoch + 1) * nsamples,
                        processed_batches=processed_batches,
                    )

    finally:
        if orbax_dir:
            # commit any in-flight FSD_ASYNC_CKPT=1 background save even on
            # an exception / KeyboardInterrupt mid-training — otherwise the
            # background writer thread can die at interpreter exit and leave
            # a partially staged checkpoint behind
            from ..train.checkpoint import wait_for_saves

            wait_for_saves()
    return params
