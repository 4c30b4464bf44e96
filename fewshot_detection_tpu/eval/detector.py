"""Inference-time detector wrappers: cfg + .weights -> jitted forward.

BN is folded into conv weights at load (fold_batchnorm), so the inference
graph is conv+bias+leaky only. Multi-size inputs compile one executable per
geometry (the valid sweeps use a single fixed size)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config.darkcfg import parse_cfg
from ..models import meta as meta_mod
from ..models.darknet import apply_network, fold_batchnorm, folded_spec, init_params
from ..models.meta import MetaSpec, init_meta_params
from ..models.spec import NetSpec, build_spec
from ..models.weights_io import WeightsHeader, load_weights
from ..parallel.mesh import batch_sharding, replicated_sharding


def _commit(tree, mesh):
    """Device-commit a param tree: replicated over `mesh`, or single-device."""
    if mesh is None:
        return jax.tree_util.tree_map(jnp.asarray, tree)
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def _shard_images(images, mesh):
    """(B,H,W,3) host batch -> device array; over a mesh, pad B to a multiple
    of the mesh size (repeating the last image) and shard the batch axis.
    Returns (device_batch, real_b) — real_b is None when nothing was padded
    (so callers skip the output slice and its extra dispatch), else the
    valid row count (meta outputs are image-major: padded rows at the tail)."""
    x = np.asarray(images)
    b = x.shape[0]
    if mesh is None:
        return jnp.asarray(x), None
    n = mesh.devices.size
    pad = (-b) % n
    if pad:
        x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)])
    return jax.device_put(x, batch_sharding(mesh)), (b if pad else None)


class PlainDetector:
    """Static YOLOv2 network (darknet.Darknet equivalent).

    compute_dtype=jnp.bfloat16 runs the conv stack in bf16 (box decode is
    insensitive to the last-bit differences; fp32 is the parity default)."""

    def __init__(
        self,
        cfgfile: str,
        weightfile: str | None = None,
        compute_dtype=jnp.float32,
        mesh=None,
    ):
        self.spec = build_spec(parse_cfg(cfgfile))
        params = init_params(self.spec, 0)
        self.header = WeightsHeader()
        if weightfile:
            (params,), self.header = load_weights(weightfile, [self.spec], [params])
        self.raw_params = params
        # over a mesh the sweep is data-parallel: params replicated, image
        # batch sharded — the TPU analogue of a multi-GPU validation sweep
        # (the reference ran valid on one GPU; here extra chips are free)
        self.mesh = mesh
        # device-commit once (fold leaves BN-less layers as host numpy;
        # numpy leaves re-upload on every jitted call)
        self.params = _commit(fold_batchnorm(self.spec, params), mesh)
        self.fspec = folded_spec(self.spec)
        self.region = self.spec.region
        self.width = self.spec.width
        self.height = self.spec.height
        self.compute_dtype = compute_dtype
        self._fwd = jax.jit(
            lambda p, x: apply_network(
                self.fspec, p, x.astype(compute_dtype), train=False
            )[0].astype(jnp.float32)
        )

        self._fwd_int8 = None

    def quantize_int8(self, calib_images: np.ndarray) -> None:
        """Switch serving to the int8 MXU path (models/quant.py): per-channel
        int8 weights from the folded graph, per-tensor activation scales
        calibrated on `calib_images` (a representative (N, H, W, 3) [0,1]
        batch; a few dozen images suffice). Stem + head stay bf16."""
        from ..models.quant import (
            apply_network_int8,
            calibrate_act_scales,
            quantize_weights,
        )

        self.qparams = _commit(
            quantize_weights(self.fspec, self.params), self.mesh
        )
        self.act_scales = calibrate_act_scales(
            self.fspec, self.params, np.asarray(calib_images, np.float32)
        )
        fspec, scales, dtype = self.fspec, self.act_scales, self.compute_dtype
        self._fwd_int8 = jax.jit(
            lambda p, x: apply_network_int8(
                fspec, p, scales, x.astype(dtype)
            ).astype(jnp.float32)
        )

    def __call__(self, images: np.ndarray) -> jax.Array:
        """images: (B, H, W, 3) float32 [0,1] -> raw head output.

        Stays ON DEVICE: the box decode (ops.boxes) consumes it in place,
        so only the small decoded arrays ever cross to the host."""
        x, b = _shard_images(images, self.mesh)
        out = (
            self._fwd_int8(self.qparams, x)
            if self._fwd_int8 is not None
            else self._fwd(self.params, x)
        )
        return out if b is None else out[:b]


class MetaDetector:
    """Meta detector (darknet_meta.Darknet equivalent): class-code
    extraction + dynamically reweighted detection forward."""

    def __init__(
        self,
        darknetcfg: str | list,
        learnetcfg: str | list,
        weightfile: str | None = None,
        metain_type: int = 2,
        compute_dtype=jnp.float32,
        mesh=None,
    ):
        dblocks = darknetcfg if isinstance(darknetcfg, list) else parse_cfg(darknetcfg)
        lblocks = learnetcfg if isinstance(learnetcfg, list) else parse_cfg(learnetcfg)
        self.spec = MetaSpec(build_spec(dblocks), build_spec(lblocks))
        params = init_meta_params(self.spec, 0)
        self.header = WeightsHeader()
        if weightfile:
            (dp, lp), self.header = load_weights(
                weightfile,
                [self.spec.darknet, self.spec.learnet],
                [params["darknet"], params["learnet"]],
            )
            params = {"darknet": dp, "learnet": lp}
        # data-parallel sweep over a mesh: params + class codes replicated,
        # image batch sharded; the internal B -> B*n_cls class expansion
        # stays batch-sharded so every chip detects its own images
        self.mesh = mesh
        # commit params to device ONCE: load_weights returns host numpy, and
        # feeding numpy leaves into a jitted call re-uploads the whole model
        # every invocation (measured 4.3 s/batch through the TPU tunnel vs
        # 9 ms with device-resident params)
        self.params = _commit(params, mesh)
        self.metain_type = metain_type
        self.region = self.spec.region
        self.width = self.spec.darknet.width
        self.height = self.spec.darknet.height
        self.compute_dtype = compute_dtype

        self._codes = jax.jit(
            lambda p, mx, mk: [
                d.astype(jnp.float32)
                for d in meta_mod.meta_forward(
                    self.spec, p, mx.astype(compute_dtype),
                    mk.astype(compute_dtype),
                    metain_type=self.metain_type, train=False,
                )[0]
            ]
        )
        self._detect = jax.jit(
            lambda p, x, dw: meta_mod.detect_forward(
                self.spec, p, x.astype(compute_dtype),
                [d.astype(compute_dtype) for d in dw],
                train=False, fuse=True,
            )[0].astype(jnp.float32)
        )

        self._detect_int8 = None
        self._codes_int8 = None

    def quantize_int8(self, calib_images: np.ndarray, dynamic_weights,
                      calib_support=None, quant_head: bool = False) -> None:
        """int8 MXU serving for the META path: fold BN into the backbone
        convs, quantize them per-channel, calibrate activation scales on
        `calib_images`. The class codes do not influence the
        pre-reweighting activations, so any representative
        `dynamic_weights` work for calibration.

        `calib_support=(metax, mask)` additionally quantizes the LEARNET —
        the network ensemble eval's phase 1 runs over EVERY support image
        (valid_ensemble.py:88-100 in /root/reference), thousands of images
        per checkpoint at real VOC scale; class_codes() then serves int8.

        `quant_head=True` also runs the fused reweight+head contraction on
        the int8 MXU (the effective per-class weights are re-quantized on
        device each call since they depend on the sweep's codes)."""
        from ..models.darknet import fold_batchnorm, folded_spec
        from ..models.quant import _is_quantizable, quantize_weights

        dfspec = folded_spec(self.spec.darknet)
        dfolded = fold_batchnorm(self.spec.darknet, self.params["darknet"])
        qd = quantize_weights(dfspec, dfolded)
        qspec = MetaSpec(dfspec, self.spec.learnet)

        dyn_idx = next(
            (l.index for l in dfspec.layers if l.kind == "conv" and l.dynamic),
            None,
        )
        absmax: dict[int, float] = {}

        def observe(idx, x):
            quantizable = _is_quantizable(dfspec, dfspec.layers[idx]) or (
                quant_head and idx == dyn_idx
            )
            if quantizable:
                m = float(jnp.max(jnp.abs(x.astype(jnp.float32))))
                absmax[idx] = max(absmax.get(idx, 0.0), m)

        dw = tuple(jnp.asarray(d) for d in dynamic_weights)
        meta_mod.detect_forward(
            qspec, {"darknet": dfolded, "learnet": None},
            jnp.asarray(calib_images, jnp.float32).astype(self.compute_dtype),
            list(dw), train=False, fuse=True, observe=observe,
        )
        scales = {k: (v / 127.0 if v > 0 else 1.0) for k, v in absmax.items()}
        self.act_scales = scales
        self.qparams = _commit(qd, self.mesh)
        dtype = self.compute_dtype
        self._detect_int8 = jax.jit(
            lambda p, x, dws: meta_mod.detect_forward(
                qspec, {"darknet": p, "learnet": None},
                x.astype(dtype), [d.astype(dtype) for d in dws],
                train=False, fuse=True, act_scales=scales,
            )[0].astype(jnp.float32)
        )

        if calib_support is not None:
            self._quantize_learnet(calib_support)

    def _quantize_learnet(self, calib_support) -> None:
        """Fold + per-channel-quantize the learnet convs, calibrate their
        input scales on a support batch, and route class_codes() through
        the int8 graph."""
        from ..models.darknet import fold_batchnorm, folded_spec
        from ..models.quant import _is_quantizable, quantize_weights

        lfspec = folded_spec(self.spec.learnet)
        lfolded = fold_batchnorm(self.spec.learnet, self.params["learnet"])
        ql = quantize_weights(lfspec, lfolded)
        # keep the (unquantized, folded) darknet for the feat_layer stem
        dfspec = folded_spec(self.spec.darknet)
        dfolded = fold_batchnorm(self.spec.darknet, self.params["darknet"])
        lqspec = MetaSpec(dfspec, lfspec)

        absmax: dict[int, float] = {}

        def observe(idx, x):
            if _is_quantizable(lfspec, lfspec.layers[idx]):
                m = float(jnp.max(jnp.abs(x.astype(jnp.float32))))
                absmax[idx] = max(absmax.get(idx, 0.0), m)

        metax, mask = calib_support
        meta_mod.meta_forward(
            lqspec, {"darknet": dfolded, "learnet": lfolded},
            jnp.asarray(metax, jnp.float32).astype(self.compute_dtype),
            jnp.asarray(mask, jnp.float32).astype(self.compute_dtype),
            metain_type=self.metain_type, train=False, observe=observe,
        )
        lscales = {k: (v / 127.0 if v > 0 else 1.0) for k, v in absmax.items()}
        self.learnet_act_scales = lscales
        self.lqparams = _commit({"darknet": dfolded, "learnet": ql}, self.mesh)
        dtype = self.compute_dtype
        self._codes_int8 = jax.jit(
            lambda p, mx, mk: [
                d.astype(jnp.float32)
                for d in meta_mod.meta_forward(
                    lqspec, p, mx.astype(dtype), mk.astype(dtype),
                    metain_type=self.metain_type, train=False,
                    act_scales=lscales,
                )[0]
            ]
        )

    def commit_codes(self, codes) -> list[jax.Array]:
        """Device-commit fixed class codes once for a whole sweep:
        replicated over the mesh when sharded eval is active, plain
        device arrays otherwise. detect() then reuses them as-is."""
        if self.mesh is None:
            return [jnp.asarray(c) for c in codes]
        sh = replicated_sharding(self.mesh)
        return [jax.device_put(jnp.asarray(c), sh) for c in codes]

    def class_codes(self, metax: np.ndarray, mask: np.ndarray) -> list[np.ndarray]:
        """Support batch -> list of per-class code tensors (N, 1, 1, C).
        Returned as host arrays (they get averaged/spliced on host).

        Over a mesh the support batch is sharded like the detection batch:
        ensemble eval's phase 1 (learnet over EVERY support image,
        valid_ensemble.py:88-100) is embarrassingly data-parallel."""
        mx, b = _shard_images(metax, self.mesh)
        mk, _ = _shard_images(mask, self.mesh)
        if self._codes_int8 is not None:
            out = self._codes_int8(self.lqparams, mx, mk)
        else:
            out = self._codes(self.params, mx, mk)
        return [np.asarray(d if b is None else d[:b]) for d in out]

    def detect(self, images: np.ndarray, dynamic_weights) -> jax.Array:
        """Raw head output, left on device for the box decode.

        Output rows are image-major (B*n_cls); over a mesh any padded
        images' rows sit at the tail and are sliced off."""
        x, b = _shard_images(images, self.mesh)
        if self.mesh is None:
            dw = tuple(jnp.asarray(d) for d in dynamic_weights)
        else:
            sh = replicated_sharding(self.mesh)
            # skip the device_put when the codes already carry the
            # replicated sharding (a fixed-code sweep passes the same
            # arrays every batch — re-replicating them per batch would
            # re-issue the transfers the device-commit exists to avoid)
            dw = tuple(
                d if getattr(d, "sharding", None) == sh
                else jax.device_put(jnp.asarray(d), sh)
                for d in dynamic_weights
            )
        out = (
            self._detect_int8(self.qparams, x, dw)
            if self._detect_int8 is not None
            else self._detect(self.params, x, dw)
        )
        return out if b is None else out[: b * dw[0].shape[0]]

    def __call__(self, images, metax, mask) -> jax.Array:
        return self.detect(images, self.class_codes(metax, mask))
