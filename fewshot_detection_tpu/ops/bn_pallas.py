"""Pallas BatchNorm statistics kernel (single-pass fp32 sum + sum-of-squares).

Status: prototyped, measured, and DISABLED by default (opt in with
FSD_PALLAS_BN=1). The profiler trace of the b=384 train step showed XLA's
BN-stats pass (bf16 -> fp32 convert + channel reduce) at ~180 GB/s, which
motivated this kernel — but end-to-end it LOSES (478 vs 786 img/s at b128):
the tpu_custom_call boundary forces a layout copy of the (M, C) operand
(narrow-C arrays are lane-padded on relayout) and blocks the producer/
consumer fusions XLA would otherwise build around the stats. The apparent
180 GB/s was also partly measurement artifact — the session's TPU tunnel
adds ~3-5 ms per dispatch, poisoning op-level timing. Full numbers and the
decision record live in PERF.md.

Numerics match the jnp path up to reduction reassociation (fp32 accumulate
either way). The custom VJP keeps the backward ELEMENTWISE
(dx = dsum_c + 2*x*dsumsq_c), so XLA fuses it into the existing BN backward
pass instead of materializing an extra tensor.

The reference computed BN through torch's cuDNN BN / its optional CUDA
extension (/root/reference/layers/batchnorm/src/batchnorm.c:bn_forward);
this kernel is the TPU-native counterpart of that native layer.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

_LANES = 128


def _sums_kernel(x_ref, sum_ref, sq_ref, acc_s, acc_q):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc_s[...] = jnp.zeros_like(acc_s)
        acc_q[...] = jnp.zeros_like(acc_q)

    xf = x_ref[...].astype(jnp.float32)
    # keep 8 sublane strata as independent partial accumulators; the final
    # cross-stratum fold happens outside the kernel on an (8, C) array
    xr = xf.reshape(-1, 8, xf.shape[-1])
    acc_s[...] += jnp.sum(xr, axis=0)
    acc_q[...] += jnp.sum(xr * xr, axis=0)

    @pl.when(i == pl.num_programs(0) - 1)
    def _flush():
        sum_ref[...] = acc_s[...]
        sq_ref[...] = acc_q[...]


@functools.partial(jax.jit, static_argnums=(1, 2))
def _sums_pallas_2d(x2: jax.Array, bm: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m2, c2 = x2.shape
    g = m2 // bm
    out_shape = [
        jax.ShapeDtypeStruct((8, c2), jnp.float32),
        jax.ShapeDtypeStruct((8, c2), jnp.float32),
    ]
    psum, psq = pl.pallas_call(
        _sums_kernel,
        grid=(g,),
        in_specs=[pl.BlockSpec((bm, c2), lambda i: (i, 0))],
        out_specs=[
            pl.BlockSpec((8, c2), lambda i: (0, 0)),
            pl.BlockSpec((8, c2), lambda i: (0, 0)),
        ],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((8, c2), jnp.float32),
            pltpu.VMEM((8, c2), jnp.float32),
        ],
        interpret=interpret,
    )(x2)
    return psum.sum(axis=0), psq.sum(axis=0)


def _pick_block(m2: int, c2: int) -> int | None:
    """Largest power-of-two row block dividing m2 (and a multiple of 8),
    sized so the bf16 input block stays ~2 MB (VMEM double-buffers it)."""
    budget = max(8, (2 * 1024 * 1024) // max(2 * c2, 1))
    bm = 1
    while m2 % (bm * 2) == 0 and bm * 2 <= budget:
        bm *= 2
    return bm if bm >= 8 else None


def _use_pallas() -> bool:
    # OFF by default: measured end-to-end on v5e the kernel LOSES to XLA's
    # fused reduce inside the train step (478 vs 786 img/s at b128) — the
    # custom call forces a layout copy of its operand (narrow-C arrays get
    # lane-padded) and breaks neighboring fusions, costing more than the
    # standalone stats pass saves. Kept as an opt-in prototype; see PERF.md.
    return os.environ.get("FSD_PALLAS_BN") == "1"


def _sums_reference(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    xf = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    return jnp.sum(xf, axis=axes), jnp.sum(xf * xf, axis=axes)


@jax.custom_vjp
def bn_sums(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(sum, sum_of_squares) over all leading axes, per channel, fp32."""
    return _bn_sums_impl(x)


def _bn_sums_impl(x, *, interpret: bool | None = None):
    c = x.shape[-1]
    m = int(np.prod(x.shape[:-1]))
    use = _use_pallas() if interpret is None else True
    if use:
        # widen narrow channel dims by folding rows so the lane dim is full
        k = max(1, _LANES // max(c, 1))
        while k > 1 and m % k:
            k //= 2
        c2, m2 = c * k, m // k
        bm = _pick_block(m2, c2)
        if c2 % _LANES == 0 and bm is not None and m2 // bm >= 1:
            interp = (
                jax.default_backend() != "tpu" if interpret is None
                else interpret
            )
            s, q = _sums_pallas_2d(x.reshape(m2, c2), bm, interp)
            return s.reshape(k, c).sum(axis=0), q.reshape(k, c).sum(axis=0)
    return _sums_reference(x.reshape(m, c))


def _bn_sums_fwd(x):
    return _bn_sums_impl(x), x


def _bn_sums_bwd(x, g):
    dsum, dsq = g
    # elementwise — fuses into the surrounding BN backward pass
    dx = dsum.astype(jnp.float32) + 2.0 * x.astype(jnp.float32) * dsq
    return (dx.astype(x.dtype),)


bn_sums.defvjp(_bn_sums_fwd, _bn_sums_bwd)
