"""jit-compiled train steps (meta + plain) with replica-group semantics.

Distribution model: the step takes inputs with a leading replica-group axis
R and vmaps the per-group episode over it; under a 1-D `data` mesh the R
axis is sharded one group per device. This reproduces the reference's
DataParallel layout exactly — each replica gets its own support batch with
one sample per class (train_meta.py:137-141, dataset.py:348) — with zero
hand-written communication: vmap over a sharded axis keeps every group's
compute local and XLA all-reduces the summed-loss gradients over ICI.

The whole step (meta forward, detection forward with fused reweighting,
on-device target building, loss, SGD, BN-stat merge) is ONE compiled XLA
program per input geometry; the multi-scale schedule therefore produces at
most 10 cached executables ({320..608 step 32}).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from ..models import meta as meta_mod
from ..models.darknet import apply_network
from ..models.spec import NetSpec
from ..ops.region_loss import region_loss, region_loss_v2
from .optim import sgd_update


def _compiler_options() -> dict[str, str] | None:
    """Optional XLA compiler options for the train step, from the env:
    FSD_XLA_OPTS="xla_tpu_scoped_vmem_limit_kib=65536,flag=val,...".

    Passed per-executable via jit(compiler_options=...) rather than
    XLA_FLAGS because compilation may happen in a remote TPU worker
    (tunneled attach), where the local process env never reaches the
    compiler. Default (unset) compiles with XLA's defaults."""
    import os

    raw = os.environ.get("FSD_XLA_OPTS", "")
    if not raw.strip():
        return None
    opts = {}
    for kv in raw.split(","):
        if kv.strip():
            k, _, v = kv.partition("=")
            opts[k.strip()] = v.strip()
    return opts or None


def _decode_images(arrays, dtype):
    """uint8-shipped image tensors (FSD_INPUT_U8) -> [0,1] compute dtype.
    The /255 fuses into the first conv; non-u8 inputs pass through."""
    return tuple(
        a.astype(dtype) / 255.0 if a.dtype == jnp.uint8 else a
        for a in arrays
    )


def _mean_over_groups(tree):
    return jax.tree_util.tree_map(lambda x: x.mean(axis=0), tree)


def _sum_metrics(metrics):
    return jax.tree_util.tree_map(lambda x: x.sum(), metrics)


def apply_bn_updates(params: list, updates: dict[int, dict]) -> list:
    """Write new running stats into the per-layer params list."""
    if not updates:
        return params
    params = list(params)
    for idx, stats in updates.items():
        p = dict(params[idx])
        bn = dict(p["bn"])
        bn["mean"] = stats["mean"]
        bn["var"] = stats["var"]
        p["bn"] = bn
        params[idx] = p
    return params


def apply_meta_bn_updates(params: dict, bn: dict) -> dict:
    new = dict(params)
    # stem updates (feat_layer>0) apply first; detect-pass updates win on
    # overlap, mirroring the reference's sequential in-place updates
    dk = apply_bn_updates(params["darknet"], bn.get("darknet_stem", {}))
    new["darknet"] = apply_bn_updates(dk, bn.get("darknet", {}))
    new["learnet"] = apply_bn_updates(params["learnet"], bn.get("learnet", {}))
    return new


class MetaTrainer:
    """Episodic meta-detector training step.

    Step inputs (R = replica groups, b = per-group detection batch):
      x      (R, b, H, W, 3)        detection images
      metax  (R, n_cls, Hm, Wm, Cm) support images (one per class, in order)
      mask   (R, n_cls, hm, wm, 1)  support masks
      target (R, b, n_cls, 50, 5)   per-class-binned labels
      keep   (R, b*n_cls)           neg-filter weights (host-sampled)
      seen   ()                     sample counter (warm-up switch)
      lr     ()                     current learning rate (already /batch)
    """

    def __init__(
        self,
        spec: meta_mod.MetaSpec,
        *,
        momentum: float = 0.9,
        weight_decay: float = 0.0,
        metain_type: int = 2,
        fuse: bool = True,
        donate: bool = True,
        remat: bool = False,
        s2d: bool = False,
        clip_norm: float = 0.0,
        image_dtype=jnp.float32,
        warmup_seen: int = 12800,
    ):
        self.spec = spec
        self.region = spec.region
        self.momentum = momentum
        self.weight_decay = weight_decay
        self.clip_norm = clip_norm
        # coord warm-up threshold (settings.warmup_seen; reference hardcodes
        # 12800, region_loss.py:70-79)
        self.warmup_seen = warmup_seen
        self.metain_type = metain_type
        self.fuse = fuse
        # compute dtype that uint8-shipped inputs decode to (FSD_INPUT_U8)
        self.image_dtype = image_dtype
        # space-to-depth stem: exact conv+pool rewrite that keeps the
        # full-res stem activation out of HBM (ops.layers.stem_s2d_conv_pool)
        self.s2d = s2d
        # The step is HBM-bandwidth-bound (XLA cost analysis: ~700 GB/s on
        # v5e at 18% MXU util), so rematerializing everything EXCEPT conv/
        # matmul outputs trades cheap recompute for activation traffic.
        self.remat = remat
        self._donate = donate
        self._step = jax.jit(
            self._step_impl, donate_argnums=(0, 1) if donate else (),
            compiler_options=_compiler_options(),
        )

    def _forward(self, params, x, metax, mask):
        return meta_mod.forward(
            self.spec, params, x, metax, mask,
            metain_type=self.metain_type, train=True, fuse=self.fuse,
            s2d=self.s2d,
        )

    def _episode_loss(self, params, x, metax, mask, target, keep, seen):
        x, metax, mask = _decode_images((x, metax, mask), self.image_dtype)
        n_cls = metax.shape[0]
        fwd = self._forward
        if self.remat:
            # save conv outputs (tagged in apply_conv_layer), BN batch stats
            # (tiny, but recomputing them re-reads the whole conv activation)
            # and matmul results; recompute the cheap normalize/activation
            # epilogues in the backward
            policy = jax.checkpoint_policies.save_from_both_policies(
                jax.checkpoint_policies.save_only_these_names(
                    "conv_out", "bn_stats"
                ),
                jax.checkpoint_policies.dots_saveable,
            )
            fwd = jax.checkpoint(fwd, policy=policy)
        y, aux = fwd(params, x, metax, mask)
        loss, metrics = region_loss_v2(
            y, target, keep, seen, self.region, n_cls,
            warmup_seen=self.warmup_seen,
        )
        return loss, (aux["bn_updates"], metrics)

    def _step_impl(self, params, mom, x, metax, mask, target, keep, seen, lr):
        def total(p):
            losses, (bn, metrics) = jax.vmap(
                self._episode_loss, in_axes=(None, 0, 0, 0, 0, 0, None)
            )(p, x, metax, mask, target, keep, seen)
            return losses.sum(), (bn, metrics)

        (loss, (bn, metrics)), grads = jax.value_and_grad(
            total, has_aux=True
        )(params)
        params, mom = sgd_update(
            params, grads, mom, lr,
            momentum=self.momentum, weight_decay=self.weight_decay,
            decay_bn_and_bias=True,  # train_meta.py decays everything
            clip_norm=self.clip_norm,
        )
        params = apply_meta_bn_updates(params, _mean_over_groups(bn))
        return params, mom, _sum_metrics(metrics)

    def step(self, params, mom, batch: dict, seen: int, lr: float):
        return self._step(
            params, mom, batch["x"], batch["metax"], batch["mask"],
            batch["target"], batch["keep"],
            jnp.asarray(seen, jnp.int32), jnp.asarray(lr, jnp.float32),
        )

    @functools.cached_property
    def _multi_step(self):
        def run(params, mom, batches, seens, lrs):
            def body(carry, xs):
                p, m = carry
                b, s, l = xs
                p, m, metrics = self._step_impl(
                    p, m, b["x"], b["metax"], b["mask"], b["target"],
                    b["keep"], s, l,
                )
                return (p, m), metrics

            (params, mom), metrics = jax.lax.scan(
                body, (params, mom), (batches, seens, lrs)
            )
            return params, mom, metrics

        return jax.jit(run,
                       donate_argnums=(0, 1) if self._donate else (),
                       compiler_options=_compiler_options())

    def multi_step(self, params, mom, batches: dict, seens, lrs):
        """N train steps in ONE device dispatch (lax.scan over pre-stacked
        batches) — the same math as N step() calls, minus N-1 host
        round-trips (worth ~3-5 ms/step on remote-attached transports plus
        the Python dispatch overhead locally); costs N batches of input HBM
        residency, so size N to the memory headroom. The scanned body fuses
        differently, so results match step() to float32 reduction-reorder
        ulps per step (compounding across steps), not bitwise.

        batches: the step() dict with an extra leading axis N on every
        leaf; seens/lrs: (N,) arrays, seens[i] already including step i's
        images (the CLI increments `seen` before each step). Returns
        (params, mom, metrics) with metrics stacked (N, ...)."""
        return self._multi_step(
            params, mom, batches,
            jnp.asarray(seens, jnp.int32), jnp.asarray(lrs, jnp.float32),
        )

    def warm(self, params, mom, n_cls: int, batch_size: int, sizes=None,
             n_groups: int = 1, dtype=jnp.float32,
             meta_shape: tuple[int, int] = (416, 416),
             mask_shape: tuple[int, int] = (416, 416),
             meta_channels: int = 3, shard_fn=None):
        """Pre-compile one executable per multi-scale bucket (SURVEY.md §7:
        'warm all buckets at startup') so scale switches never stall the
        training loop.

        Implementation note: `jit.lower().compile()` does NOT populate the
        jit call cache (verified: `_cache_size()` stays 0), so warming must
        execute real dummy steps. Throwaway zero params/momentum are used
        (zeros_like preserves the real trees' shardings) and chained once so
        the steady-state placement — step outputs fed back as inputs — is
        what lands in the cache. Geometry AND shardings must match the real
        loop: meta_channels is the raw support-image channel count (3, or 6
        for cropped-object metain types) and `shard_fn` must be the same
        batch-sharding function the loop uses (the cache keys on input
        shardings, so unsharded dummies would warm nothing on a mesh)."""
        sizes = sizes or tuple(range(320, 609, 32))
        b = batch_size // n_groups
        mh, mw = meta_shape[1], meta_shape[0]
        kh, kw = mask_shape[1], mask_shape[0]
        for s in sizes:
            batch = {
                "x": jnp.zeros((n_groups, b, s, s, 3), dtype),
                "metax": jnp.zeros((n_groups, n_cls, mh, mw, meta_channels), dtype),
                "mask": jnp.zeros((n_groups, n_cls, kh, kw, 1), dtype),
                "target": jnp.zeros((n_groups, b, n_cls, 50, 5), jnp.float32),
                "keep": jnp.ones((n_groups, b * n_cls), jnp.float32),
            }
            if shard_fn is not None:
                batch = shard_fn(batch)
            # fresh throwaway trees per size: donation consumes them
            p, m = jax.tree_util.tree_map(jnp.zeros_like, (params, mom))
            # two chained steps: the first may see host-resident inputs,
            # the second caches the steady-state device-output placement
            p, m, _ = self.step(p, m, batch, seen=0, lr=0.0)
            self.step(p, m, batch, seen=0, lr=0.0)


class PlainTrainer:
    """Baseline YOLOv2 training step (train.py:126-225).

    Inputs: x (R, b, H, W, 3), target (R, b, 50, 5), keep (R, b).
    Weight decay exempts BN affine + biases (train.py:132-138)."""

    def __init__(
        self,
        spec: NetSpec,
        *,
        momentum: float = 0.9,
        weight_decay: float = 0.0,
        zero_tcls: bool = False,
        donate: bool = True,
        remat: bool = False,
        s2d: bool = False,
        clip_norm: float = 0.0,
        image_dtype=jnp.float32,
        warmup_seen: int = 12800,
    ):
        self.spec = spec
        self.region = spec.region
        self.momentum = momentum
        self.weight_decay = weight_decay
        self.clip_norm = clip_norm
        self.warmup_seen = warmup_seen
        self.zero_tcls = zero_tcls
        self.image_dtype = image_dtype
        self.s2d = s2d
        self.remat = remat  # same policy/rationale as MetaTrainer
        self._step = jax.jit(
            self._step_impl, donate_argnums=(0, 1) if donate else (),
            compiler_options=_compiler_options(),
        )

    def _episode_loss(self, params, x, target, keep, seen):
        (x,) = _decode_images((x,), self.image_dtype)

        def fwd(p, xx):
            return apply_network(
                self.spec, p, xx, train=True, s2d_stem=self.s2d
            )

        if self.remat:
            policy = jax.checkpoint_policies.save_from_both_policies(
                jax.checkpoint_policies.save_only_these_names(
                    "conv_out", "bn_stats"
                ),
                jax.checkpoint_policies.dots_saveable,
            )
            fwd = jax.checkpoint(fwd, policy=policy)
        y, aux = fwd(params, x)
        loss, metrics = region_loss(
            y, target, keep, seen, self.region, zero_tcls=self.zero_tcls,
            warmup_seen=self.warmup_seen,
        )
        return loss, (aux["bn_updates"], metrics)

    def _step_impl(self, params, mom, x, target, keep, seen, lr):
        def total(p):
            losses, (bn, metrics) = jax.vmap(
                self._episode_loss, in_axes=(None, 0, 0, 0, None)
            )(p, x, target, keep, seen)
            return losses.sum(), (bn, metrics)

        (loss, (bn, metrics)), grads = jax.value_and_grad(
            total, has_aux=True
        )(params)
        params, mom = sgd_update(
            params, grads, mom, lr,
            momentum=self.momentum, weight_decay=self.weight_decay,
            decay_bn_and_bias=False, clip_norm=self.clip_norm,
        )
        params = apply_bn_updates(params, _mean_over_groups(bn))
        return params, mom, _sum_metrics(metrics)

    def step(self, params, mom, batch: dict, seen: int, lr: float):
        return self._step(
            params, mom, batch["x"], batch["target"], batch["keep"],
            jnp.asarray(seen, jnp.int32), jnp.asarray(lr, jnp.float32),
        )
