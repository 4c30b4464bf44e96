"""Meta detector: dynamic conv semantics, fused path equivalence, forward."""

import numpy as np
import pytest

import jax.numpy as jnp

from fewshot_detection_tpu.config import parse_cfg
from fewshot_detection_tpu.models.meta import (
    MetaSpec,
    class_broadcast,
    detect_forward,
    dynamic_conv_general,
    forward,
    init_meta_params,
    meta_forward,
)
from fewshot_detection_tpu.models.spec import LayerSpec, build_spec


def _meta_spec():
    return MetaSpec(
        build_spec(parse_cfg("cfg/darknet_dynamic.cfg")),
        build_spec(parse_cfg("cfg/reweighting_net.cfg")),
    )


def test_dynamic_conv_first_matches_torch():
    """is_first grouped dynamic conv == torch F.conv2d with groups
    (dynamic_conv.py:138-159 semantics)."""
    import torch
    import torch.nn.functional as F

    B, C, H, W, N = 2, 8, 5, 5, 3
    rng = np.random.RandomState(0)
    x = rng.randn(B, C, H, W).astype(np.float32)
    dw = rng.randn(N, C, 1, 1).astype(np.float32)  # group_size = 1

    # torch oracle
    xt = torch.from_numpy(x).repeat(1, N, 1, 1)
    wt = torch.from_numpy(dw).view(-1, 1, 1, 1)
    ref = F.conv2d(xt, wt, groups=N * C).view(B * N, C, H, W).numpy()

    layer = LayerSpec(index=0, kind="conv", in_channels=C, out_channels=C,
                      size=1, stride=1, pad=0, dynamic=True)
    ours = dynamic_conv_general(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(dw.transpose(0, 2, 3, 1)),
        layer,
        is_first=True,
    )
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, rtol=1e-5, atol=1e-5
    )


def test_dynamic_conv_not_first_matches_torch():
    """Second dynamic conv reshapes (B*n, C) -> (B, n*C) before grouping
    (dynamic_conv.py:144-149)."""
    import torch
    import torch.nn.functional as F

    B, C, H, W, N = 2, 4, 3, 3, 3
    rng = np.random.RandomState(1)
    x = rng.randn(B * N, C, H, W).astype(np.float32)
    dw = rng.randn(N, C, 1, 1).astype(np.float32)

    xt = torch.from_numpy(x).view(B, N * C, H, W)
    wt = torch.from_numpy(dw).view(-1, 1, 1, 1)
    ref = F.conv2d(xt, wt, groups=N * C).view(B * N, C, H, W).numpy()

    layer = LayerSpec(index=0, kind="conv", in_channels=C, out_channels=C,
                      size=1, stride=1, pad=0, dynamic=True)
    ours = dynamic_conv_general(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(dw.transpose(0, 2, 3, 1)),
        layer,
        is_first=False,
    )
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, rtol=1e-5, atol=1e-5
    )


def test_dynamic_conv_group_size_2_matches_torch():
    """Cd = 2*C -> group_size 2 (channel-pair mixing path)."""
    import torch
    import torch.nn.functional as F

    B, C, H, W, N = 1, 4, 3, 3, 2
    rng = np.random.RandomState(2)
    x = rng.randn(B, C, H, W).astype(np.float32)
    dw = rng.randn(N, 2 * C, 1, 1).astype(np.float32)

    xt = torch.from_numpy(x).repeat(1, N, 1, 1)
    wt = torch.from_numpy(dw).view(-1, 2, 1, 1)
    groups = N * C // 2
    ref = F.conv2d(xt, wt, groups=groups).view(B * N, C, H, W).numpy()

    layer = LayerSpec(index=0, kind="conv", in_channels=C, out_channels=C,
                      size=1, stride=1, pad=0, dynamic=True)
    ours = dynamic_conv_general(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(dw.transpose(0, 2, 3, 1)),
        layer,
        is_first=True,
    )
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, rtol=1e-5, atol=1e-5
    )


def test_class_broadcast_interleave():
    x = jnp.arange(6).reshape(3, 2)
    y = class_broadcast(x, 2)
    np.testing.assert_array_equal(
        np.asarray(y), [[0, 1], [0, 1], [2, 3], [2, 3], [4, 5], [4, 5]]
    )


def test_fused_equals_general():
    spec = _meta_spec()
    params = init_meta_params(spec, 0)
    rng = np.random.RandomState(3)
    B, N, S = 2, 4, 64
    x = jnp.asarray(rng.randn(B, S, S, 3).astype(np.float32))
    metax = jnp.asarray(rng.randn(N, S, S, 3).astype(np.float32))
    mask = jnp.asarray((rng.rand(N, S, S, 1) > 0.5).astype(np.float32))

    dw, _ = meta_forward(spec, params, metax, mask)
    assert len(dw) == 1 and dw[0].shape == (N, 1, 1, 1024)
    y_fused, _ = detect_forward(spec, params, x, dw, fuse=True)
    y_gen, _ = detect_forward(spec, params, x, dw, fuse=False)
    assert y_fused.shape == (B * N, S // 32, S // 32, 30)
    np.testing.assert_allclose(
        np.asarray(y_fused), np.asarray(y_gen), rtol=1e-5, atol=1e-5
    )


def test_forward_batch_ordering_is_b_major():
    """Output row b*n_cls + j must correspond to (image b, class j) —
    the contract of valid_ensemble.py:164 (oi = b * n_cls + i)."""
    spec = _meta_spec()
    params = init_meta_params(spec, 1)
    rng = np.random.RandomState(4)
    N, S = 3, 64
    xa = rng.randn(1, S, S, 3).astype(np.float32)
    xb = rng.randn(1, S, S, 3).astype(np.float32)
    metax = jnp.asarray(rng.randn(N, S, S, 3).astype(np.float32))
    mask = jnp.asarray((rng.rand(N, S, S, 1) > 0.5).astype(np.float32))

    y_ab, _ = forward(spec, params, jnp.asarray(np.concatenate([xa, xb])), metax, mask)
    y_a, _ = forward(spec, params, jnp.asarray(xa), metax, mask)
    y_b, _ = forward(spec, params, jnp.asarray(xb), metax, mask)
    np.testing.assert_allclose(np.asarray(y_ab[:N]), np.asarray(y_a), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(y_ab[N:]), np.asarray(y_b), rtol=2e-5, atol=2e-5)


def test_meta_forward_train_bn_updates():
    spec = _meta_spec()
    params = init_meta_params(spec, 2)
    rng = np.random.RandomState(5)
    N, S = 2, 64
    metax = jnp.asarray(rng.randn(N, S, S, 3).astype(np.float32))
    mask = jnp.asarray(np.ones((N, S, S, 1), np.float32))
    dw, aux = meta_forward(spec, params, metax, mask, train=True)
    n_bn = sum(
        1 for l in spec.learnet.layers if l.kind == "conv" and l.batch_normalize
    )
    assert len(aux["bn_updates"]["learnet"]) == n_bn


TUPLE_ROUTE_CFG = """
[net]
batch=1
width=16
height=16
channels=3

[convolutional]
filters=8
size=3
stride=1
pad=1
activation=leaky

[convolutional]
filters=8
size=1
stride=1
pad=0
activation=linear

[globalmax]

[route]
layers=-3,-1
concat=0

[convolutional]
dynamic=1
filters=8
size=1
stride=1
pad=0
activation=linear
"""


def test_tuple_route_feeds_dynamic_conv():
    """concat=0 routes (darknet_meta.py:166-168) carry (x1, x2) tuples; a
    downstream dynamic conv consumes the pair as (input, dynamic_weight).
    Here the weight branch is in-graph (conv -> globalmax), so
    detect_forward needs no external dynamic_weights at all."""
    import jax.numpy as jnp

    from fewshot_detection_tpu.config.darkcfg import parse_cfg_text
    from fewshot_detection_tpu.models.darknet import apply_network, init_params

    blocks = parse_cfg_text(TUPLE_ROUTE_CFG)
    dspec = build_spec(blocks)
    route = dspec.layers[3]
    assert route.kind == "route" and not route.concat
    assert route.out_channels == 8  # first source's channels, not the sum

    spec = MetaSpec(dspec, build_spec(parse_cfg("cfg/reweighting_net.cfg")))
    params = {
        "darknet": init_params(dspec, 0),
        "learnet": None,  # unused: all dynamic weights are in-graph
    }
    rng = np.random.RandomState(0)
    B = 2
    x = jnp.asarray(rng.randn(B, 16, 16, 3).astype(np.float32))
    y, _ = detect_forward(spec, params, x, [], fuse=False)

    # oracle: run the static prefix, then the reference dynamic-conv math
    # with the route's second element as the weight (n_cls = its batch B)
    feats, _ = apply_network(dspec, params["darknet"], x, stop=1)
    w_branch, _ = apply_network(dspec, params["darknet"], feats, start=1, stop=3)
    assert w_branch.shape == (B, 1, 1, 8)
    ref = dynamic_conv_general(feats, w_branch, dspec.layers[4], is_first=True)
    assert y.shape == (B * B, 16, 16, 8)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5, atol=1e-6)
