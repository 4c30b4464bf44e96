"""bn_sums: fused BN-statistics op (Pallas prototype + jnp fallback).

The default path on every backend is the jnp reference (the Pallas kernel
measured slower end-to-end on v5e — see PERF.md); these tests pin that the
kernel itself is numerically correct (interpret mode on CPU) so the opt-in
stays safe, and that the custom VJP backward is the exact analytic form.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fewshot_detection_tpu.ops.bn_pallas import (
    _bn_sums_impl,
    _sums_reference,
    bn_sums,
)


SHAPES = [
    (2, 8, 8, 32),    # narrow C -> row folding to 128 lanes
    (2, 16, 16, 3),   # C=3 stem (k=32 fold)
    (4, 4, 4, 256),
    (2, 8, 8, 96),    # 96*k never hits a multiple of 128 -> jnp fallback
    (3, 13, 13, 1024),
    (1, 8, 8, 4, 16), # 5D (space-to-depth stem phase axis)
]


@pytest.mark.parametrize("shape", SHAPES, ids=[str(s) for s in SHAPES])
def test_pallas_interpret_matches_reference(shape):
    rng = np.random.RandomState(hash(shape) % 2**31)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    s, q = _bn_sums_impl(x, interpret=True)
    sr, qr = _sums_reference(x.reshape(-1, shape[-1]))
    np.testing.assert_allclose(np.asarray(s), np.asarray(sr), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(q), np.asarray(qr), rtol=1e-5, atol=1e-4)


def test_bn_sums_default_path_and_vjp():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 4, 4, 8).astype(np.float32))
    s, q = bn_sums(x)
    sr, qr = _sums_reference(x.reshape(-1, 8))
    np.testing.assert_allclose(np.asarray(s), np.asarray(sr), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(q), np.asarray(qr), rtol=1e-6)

    def loss(x):
        s, q = bn_sums(x)
        return jnp.sum(s * 2.0 + q * 0.5)

    g = jax.grad(loss)(x)
    np.testing.assert_allclose(
        np.asarray(g), 2.0 + np.asarray(x), rtol=1e-5, atol=1e-5
    )


def test_bn_sums_vmap():
    rng = np.random.RandomState(1)
    xv = jnp.asarray(rng.randn(3, 2, 8, 8, 16).astype(np.float32))
    sv, qv = jax.vmap(bn_sums)(xv)
    for i in range(3):
        s1, q1 = bn_sums(xv[i])
        np.testing.assert_allclose(np.asarray(sv[i]), np.asarray(s1), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(qv[i]), np.asarray(q1), rtol=1e-5)


def test_bn_sums_bf16_accumulates_fp32():
    rng = np.random.RandomState(2)
    x32 = rng.randn(4, 16, 16, 32).astype(np.float32)
    x16 = jnp.asarray(x32, jnp.bfloat16)
    s, q = bn_sums(x16)
    assert s.dtype == q.dtype == jnp.float32
    sr, _ = _sums_reference(jnp.asarray(x16).reshape(-1, 32))
    np.testing.assert_allclose(np.asarray(s), np.asarray(sr), rtol=1e-6)


def test_darknet_bn_mode(monkeypatch):
    """FSD_BN_DARKNET=1: rolling = .99*rolling + .01*biased_batch_var
    (reference batchnorm.c:196-203); the normalized output is identical to
    torch mode (both normalize with biased batch stats at eps 1e-5)."""
    from fewshot_detection_tpu.ops.layers import batchnorm_train

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 4, 4, 8).astype(np.float32))
    bn = {
        "gamma": jnp.asarray(rng.rand(8).astype(np.float32) + 0.5),
        "beta": jnp.asarray(rng.randn(8).astype(np.float32)),
        "mean": jnp.asarray(rng.randn(8).astype(np.float32) * 0.1),
        "var": jnp.asarray(rng.rand(8).astype(np.float32) + 0.5),
    }
    y_torch, st_torch = batchnorm_train(x, bn)
    monkeypatch.setenv("FSD_BN_DARKNET", "1")
    y_dark, st_dark = batchnorm_train(x, bn)

    np.testing.assert_allclose(np.asarray(y_dark), np.asarray(y_torch),
                               rtol=1e-6, atol=1e-6)

    # explicit oracle for the darknet rolling update
    xf = np.asarray(x, np.float64).reshape(-1, 8)
    n = xf.shape[0]
    mean = xf.mean(0)
    var_biased = ((xf - mean) ** 2).mean(0)
    np.testing.assert_allclose(
        np.asarray(st_dark["mean"]),
        0.99 * np.asarray(bn["mean"]) + 0.01 * mean, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(st_dark["var"]),
        0.99 * np.asarray(bn["var"]) + 0.01 * var_biased, rtol=1e-5, atol=1e-6)
    # torch mode differs exactly by momentum and the unbiased correction
    np.testing.assert_allclose(
        np.asarray(st_torch["var"]),
        0.9 * np.asarray(bn["var"]) + 0.1 * var_biased * n / (n - 1),
        rtol=1e-5, atol=1e-6)
