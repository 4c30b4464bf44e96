"""Space-to-depth stem rewrite: exactness vs the plain conv+pool path.

stem_s2d_conv_pool must compute the SAME function as
conv3x3(s1,p1)+BN+leaky+maxpool(2,2) — the rewrite is algebraic (phase
decomposition), so outputs agree to float reassociation noise, and BN batch
statistics are computed over the identical population.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fewshot_detection_tpu.config import parse_cfg
from fewshot_detection_tpu.models.darknet import (
    apply_network,
    can_fuse_s2d_stem,
    init_params,
)
from fewshot_detection_tpu.models.meta import (
    MetaSpec,
    forward,
    init_meta_params,
)
from fewshot_detection_tpu.models.spec import build_spec
from fewshot_detection_tpu.ops.layers import stem_s2d_conv_pool


def test_stem_op_matches_plain_eval_and_train():
    rng = np.random.RandomState(0)
    B, H, W, C, K = 2, 32, 48, 3, 16
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, C, K).astype(np.float32) * 0.2)
    bn = {
        "gamma": jnp.asarray(rng.randn(K).astype(np.float32)),
        "beta": jnp.asarray(rng.randn(K).astype(np.float32)),
        "mean": jnp.asarray(rng.randn(K).astype(np.float32) * 0.1),
        "var": jnp.asarray(rng.rand(K).astype(np.float32) + 0.5),
    }

    from fewshot_detection_tpu.models.darknet import conv2d
    from fewshot_detection_tpu.ops.layers import (
        batchnorm_apply,
        batchnorm_train,
        leaky_relu,
        maxpool,
    )

    for train in (False, True):
        y_ref = conv2d(x, w, 1, 1)
        if train:
            y_ref, stats_ref = batchnorm_train(y_ref, bn)
        else:
            y_ref = batchnorm_apply(y_ref, bn)
        y_ref = maxpool(leaky_relu(y_ref, 0.1), 2, 2)

        y_s2d, stats_s2d = stem_s2d_conv_pool(x, w, bn, "leaky", None, train)
        assert y_s2d.shape == y_ref.shape
        np.testing.assert_allclose(
            np.asarray(y_s2d), np.asarray(y_ref), rtol=1e-5, atol=1e-5
        )
        if train:
            for k in ("mean", "var"):
                np.testing.assert_allclose(
                    np.asarray(stats_s2d[k]), np.asarray(stats_ref[k]),
                    rtol=1e-5, atol=1e-6,
                )


def test_stem_without_bn_with_bias():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 16, 16, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 8).astype(np.float32))
    b = jnp.asarray(rng.randn(8).astype(np.float32))

    from fewshot_detection_tpu.models.darknet import conv2d
    from fewshot_detection_tpu.ops.layers import maxpool

    y_ref = maxpool(conv2d(x, w, 1, 1) + b, 2, 2)
    y_s2d, stats = stem_s2d_conv_pool(x, w, None, "linear", b, False)
    assert stats is None
    np.testing.assert_allclose(
        np.asarray(y_s2d), np.asarray(y_ref), rtol=1e-5, atol=1e-5
    )


def test_apply_network_s2d_matches_plain():
    spec = build_spec(parse_cfg("cfg/tiny-yolo-voc.cfg"))
    assert can_fuse_s2d_stem(spec)
    params = init_params(spec, 0)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    y_plain, _ = apply_network(spec, params, x)
    y_s2d, _ = apply_network(spec, params, x, s2d_stem=True)
    np.testing.assert_allclose(
        np.asarray(y_s2d), np.asarray(y_plain), rtol=1e-4, atol=1e-5
    )


def test_meta_forward_s2d_matches_plain_train():
    """Full meta episode (darknet + learnet stems both rewritten), train
    mode: outputs and BN-stat updates must match the plain path."""
    spec = MetaSpec(
        build_spec(parse_cfg("cfg/darknet_dynamic.cfg")),
        build_spec(parse_cfg("cfg/reweighting_net.cfg")),
    )
    assert can_fuse_s2d_stem(spec.darknet)
    assert can_fuse_s2d_stem(spec.learnet)
    params = init_meta_params(spec, 3)
    rng = np.random.RandomState(4)
    B, N, S = 2, 4, 64
    x = jnp.asarray(rng.rand(B, S, S, 3).astype(np.float32))
    metax = jnp.asarray(rng.rand(N, S, S, 3).astype(np.float32))
    mask = jnp.asarray((rng.rand(N, S, S, 1) > 0.5).astype(np.float32))

    y_p, aux_p = forward(spec, params, x, metax, mask, train=True)
    y_s, aux_s = forward(spec, params, x, metax, mask, train=True, s2d=True)
    # train-mode BN divides by batch stds, amplifying reassociation noise
    # through 19 layers; the op-level test above pins tight agreement
    np.testing.assert_allclose(
        np.asarray(y_s), np.asarray(y_p), rtol=1e-3, atol=1e-3
    )
    # stem BN stats present and equal in both trees
    for net in ("darknet", "learnet"):
        upd_p = aux_p["bn_updates"][net]
        upd_s = aux_s["bn_updates"][net]
        assert set(upd_p) == set(upd_s)
        assert 0 in upd_s  # the rewritten stem still reports its stats
        for idx in upd_p:
            for k in ("mean", "var"):
                np.testing.assert_allclose(
                    np.asarray(upd_s[idx][k]), np.asarray(upd_p[idx][k]),
                    rtol=1e-3, atol=1e-4,
                )


def test_s2d_stem_op_gradients_match_plain():
    """Single-op gradient parity: grads must flow through the einsum weight
    lift back to the original (3,3,C,K) weight and the BN affines, and match
    the plain composition tightly (no deep-network noise amplification)."""
    import jax

    from fewshot_detection_tpu.models.darknet import conv2d
    from fewshot_detection_tpu.ops.layers import (
        batchnorm_train,
        leaky_relu,
        maxpool,
    )

    rng = np.random.RandomState(5)
    B, H, W, C, K = 2, 16, 16, 3, 8
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    w0 = jnp.asarray(rng.randn(3, 3, C, K).astype(np.float32) * 0.3)
    bn0 = {
        "gamma": jnp.asarray(rng.rand(K).astype(np.float32) + 0.5),
        "beta": jnp.asarray(rng.randn(K).astype(np.float32)),
        "mean": jnp.zeros(K, jnp.float32),
        "var": jnp.ones(K, jnp.float32),
    }

    def loss_plain(w, bn):
        y, _ = batchnorm_train(conv2d(x, w, 1, 1), bn)
        return jnp.sum(jnp.square(maxpool(leaky_relu(y, 0.1), 2, 2)))

    def loss_s2d(w, bn):
        y, _ = stem_s2d_conv_pool(x, w, bn, "leaky", None, True)
        return jnp.sum(jnp.square(y))

    import jax

    gp_w, gp_bn = jax.grad(loss_plain, argnums=(0, 1))(w0, bn0)
    gs_w, gs_bn = jax.grad(loss_s2d, argnums=(0, 1))(w0, bn0)
    np.testing.assert_allclose(
        np.asarray(gs_w), np.asarray(gp_w), rtol=1e-4, atol=1e-4
    )
    for k in ("gamma", "beta"):
        np.testing.assert_allclose(
            np.asarray(gs_bn[k]), np.asarray(gp_bn[k]), rtol=1e-4, atol=1e-4
        )


def test_s2d_network_gradients_close():
    """End-to-end grads agree loosely (train-BN chains amplify reassociation
    noise, and near-tied pool windows can flip argmax routing)."""
    import jax

    spec = build_spec(parse_cfg("cfg/tiny-yolo-voc.cfg"))
    params = init_params(spec, 1)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))

    def loss(p, s2d):
        y, _ = apply_network(spec, p, x, train=True, s2d_stem=s2d)
        return jnp.sum(jnp.square(y))

    g_plain = jax.grad(lambda p: loss(p, False))(params)
    g_s2d = jax.grad(lambda p: loss(p, True))(params)
    stem_p, stem_s = g_plain[0], g_s2d[0]
    gp, gs = np.asarray(stem_p["w"]), np.asarray(stem_s["w"])
    # cosine similarity + scale: direction-preserving to within noise
    cos = float((gp * gs).sum() / (np.linalg.norm(gp) * np.linalg.norm(gs)))
    assert cos > 0.9999, cos
    assert abs(np.linalg.norm(gs) / np.linalg.norm(gp) - 1) < 1e-3
