"""Spec building, layer ops, network forward, and .weights codec tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fewshot_detection_tpu.config import parse_cfg
from fewshot_detection_tpu.models import (
    apply_network,
    build_spec,
    fold_batchnorm,
    init_params,
    weights_io,
)
from fewshot_detection_tpu.models.darknet import folded_spec
from fewshot_detection_tpu.ops.layers import maxpool, maxpool_stride1, reorg


# ---------------------------------------------------------------------------
# spec
# ---------------------------------------------------------------------------


def test_build_spec_darknet_dynamic():
    spec = build_spec(parse_cfg("cfg/darknet_dynamic.cfg"))
    kinds = [l.kind for l in spec.layers]
    assert kinds.count("conv") == 24
    dyn = [l for l in spec.layers if l.dynamic]
    assert len(dyn) == 1
    assert dyn[0].partial is None and not dyn[0].has_params
    # route -1,-4 resolved to absolute indices
    routes = [l for l in spec.layers if l.kind == "route"]
    assert routes[0].sources == (16,)  # -9 from layer 25
    assert routes[1].sources == (27, 24)
    region = spec.region
    assert region.num_classes == 1 and region.num_anchors == 5
    assert region.anchor_wh[0] == (1.3221, 1.73145)
    assert region.object_scale == 5.0
    # head conv has bias (no BN), dconv does not
    head = spec.layers[-2]
    assert head.kind == "conv" and head.bias and not head.batch_normalize


def test_build_spec_learnet():
    spec = build_spec(parse_cfg("cfg/reweighting_net.cfg"))
    assert spec.kind == "learnet"
    assert spec.feat_layer == 0
    assert spec.channels == 4
    assert spec.layers[-1].kind == "globalmax"
    assert spec.out_channels == 1024


# ---------------------------------------------------------------------------
# layer ops vs torch oracle
# ---------------------------------------------------------------------------


def test_reorg_permutation_explicit():
    """out[b, i, j, (hi*s+wj)*C + c] == x[b, s*i+hi, s*j+wj, c]"""
    B, H, W, C, s = 2, 4, 4, 3, 2
    x = np.arange(B * H * W * C, dtype=np.float32).reshape(B, H, W, C)
    y = np.asarray(reorg(jnp.asarray(x), s))
    assert y.shape == (B, H // s, W // s, s * s * C)
    for b in range(B):
        for i in range(H // s):
            for j in range(W // s):
                for hi in range(s):
                    for wj in range(s):
                        for c in range(C):
                            assert (
                                y[b, i, j, (hi * s + wj) * C + c]
                                == x[b, s * i + hi, s * j + wj, c]
                            )


def test_reorg_matches_torch_fork():
    import torch
    from torch_ref import reorg_torch

    x = np.random.RandomState(0).randn(2, 8, 6, 6).astype(np.float32)  # NCHW
    ref = reorg_torch(torch.from_numpy(x), 2).numpy()
    ours = np.asarray(reorg(jnp.asarray(x.transpose(0, 2, 3, 1)), 2))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, rtol=0, atol=0)


def test_maxpool_stride1_matches_torch():
    import torch
    import torch.nn.functional as F

    x = np.random.RandomState(1).randn(2, 4, 13, 13).astype(np.float32)
    ref = F.max_pool2d(
        F.pad(torch.from_numpy(x), (0, 1, 0, 1), mode="replicate"), 2, stride=1
    ).numpy()
    ours = np.asarray(maxpool_stride1(jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref)


def test_maxpool_odd_input_matches_torch():
    import torch
    import torch.nn.functional as F

    x = np.random.RandomState(2).randn(1, 3, 7, 7).astype(np.float32)
    ref = F.max_pool2d(torch.from_numpy(x), 2, 2).numpy()
    ours = np.asarray(maxpool(jnp.asarray(x.transpose(0, 2, 3, 1)), 2, 2))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref)


# ---------------------------------------------------------------------------
# full network forward vs torch oracle
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("cfgfile,size", [
    ("cfg/reweighting_net.cfg", 64),
    ("cfg/tiny-yolo-voc.cfg", 64),
])
def test_network_forward_matches_torch(cfgfile, size):
    import torch
    from torch_ref import torch_forward

    spec = build_spec(parse_cfg(cfgfile))
    params = init_params(spec, 0)
    cin = spec.channels
    x = np.random.RandomState(3).randn(2, size, size, cin).astype(np.float32)

    ours, _ = apply_network(spec, params, jnp.asarray(x))
    ref = torch_forward(spec, params, torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref.numpy(), rtol=2e-4, atol=2e-4
    )


def test_backbone_prefix_matches_torch():
    """Run the darknet_dynamic backbone up to the route (static prefix)."""
    import torch
    from torch_ref import torch_forward
    import dataclasses

    spec = build_spec(parse_cfg("cfg/darknet_dynamic.cfg"))
    # static prefix: everything before the dynamic conv (index of dconv)
    dyn_idx = next(l.index for l in spec.layers if l.dynamic)
    prefix = dataclasses.replace(spec, layers=spec.layers[:dyn_idx])
    params = init_params(prefix, 1)
    x = np.random.RandomState(4).randn(1, 64, 64, 3).astype(np.float32)
    ours, _ = apply_network(prefix, params, jnp.asarray(x))
    ref = torch_forward(prefix, params, torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref.numpy(), rtol=1e-3, atol=1e-3
    )


def test_bn_folding_matches_inference():
    spec = build_spec(parse_cfg("cfg/reweighting_net.cfg"))
    params = init_params(spec, 5)
    # give BN nontrivial running stats
    rng = np.random.RandomState(7)
    for layer in spec.layers:
        if layer.kind == "conv" and layer.batch_normalize:
            bn = params[layer.index]["bn"]
            c = layer.out_channels
            params[layer.index]["bn"] = {
                "gamma": jnp.asarray(rng.rand(c).astype(np.float32) + 0.5),
                "beta": jnp.asarray(rng.randn(c).astype(np.float32)),
                "mean": jnp.asarray(rng.randn(c).astype(np.float32) * 0.1),
                "var": jnp.asarray(rng.rand(c).astype(np.float32) + 0.5),
            }
            del bn
    x = jnp.asarray(np.random.RandomState(8).randn(2, 64, 64, 4).astype(np.float32))
    y_ref, _ = apply_network(spec, params, x)
    y_fold, _ = apply_network(folded_spec(spec), fold_batchnorm(spec, params), x)
    # folding reassociates the BN affine into the conv weights; fp32 rounding
    # drift accumulates through 8 conv layers — tolerance reflects that
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_ref), rtol=2e-2, atol=1e-2)


def test_train_mode_bn_updates():
    spec = build_spec(parse_cfg("cfg/reweighting_net.cfg"))
    params = init_params(spec, 2)
    x = jnp.asarray(np.random.RandomState(9).randn(4, 64, 64, 4).astype(np.float32))
    y, aux = apply_network(spec, params, x, train=True)
    n_bn = sum(1 for l in spec.layers if l.kind == "conv" and l.batch_normalize)
    assert len(aux["bn_updates"]) == n_bn
    # running mean moved toward batch mean
    first = min(aux["bn_updates"])
    assert not np.allclose(
        np.asarray(aux["bn_updates"][first]["mean"]),
        np.asarray(params[first]["bn"]["mean"]),
    )


# ---------------------------------------------------------------------------
# weights codec
# ---------------------------------------------------------------------------


def test_weights_roundtrip_meta(tmp_path):
    dspec = build_spec(parse_cfg("cfg/darknet_dynamic.cfg"))
    lspec = build_spec(parse_cfg("cfg/reweighting_net.cfg"))
    dparams = init_params(dspec, 0)
    lparams = init_params(lspec, 1)
    path = str(tmp_path / "model.weights")
    weights_io.save_weights(path, [dspec, lspec], [dparams, lparams], seen=12345)

    d2 = init_params(dspec, 42)
    l2 = init_params(lspec, 43)
    (d3, l3), header = weights_io.load_weights(path, [dspec, lspec], [d2, l2])
    assert header.seen == 12345

    def check(spec, a, b):
        for layer in spec.layers:
            if not layer.has_params:
                continue
            pa, pb = a[layer.index], b[layer.index]
            np.testing.assert_allclose(np.asarray(pa["w"]), np.asarray(pb["w"]), rtol=1e-6)
            if "b" in pa:
                np.testing.assert_allclose(np.asarray(pa["b"]), np.asarray(pb["b"]), rtol=1e-6)
            if "bn" in pa:
                for k in ("gamma", "beta", "mean", "var"):
                    np.testing.assert_allclose(
                        np.asarray(pa["bn"][k]), np.asarray(pb["bn"][k]), rtol=1e-6
                    )

    check(dspec, dparams, d3)
    check(lspec, lparams, l3)


def test_weights_truncated_prefix_load(tmp_path):
    """A cutoff file initializes only the prefix (darknet19_448.conv.23 style)."""
    spec = build_spec(parse_cfg("cfg/darknet_dynamic.cfg"))
    params = init_params(spec, 0)
    path = str(tmp_path / "prefix.weights")
    # save only the first 23 blocks' layers
    weights_io.save_weights(path, [spec], [params], seen=0, cutoff=23)

    fresh = init_params(spec, 99)
    (loaded,), _ = weights_io.load_weights(path, [spec], [fresh])
    # conv layers inside the cutoff match saved, later convs remain fresh
    n_loaded_convs = sum(
        1 for l in spec.layers[:23] if l.kind == "conv" and l.has_params
    )
    convs = [l for l in spec.layers if l.kind == "conv" and l.has_params]
    for i, layer in enumerate(convs):
        same = np.allclose(
            np.asarray(loaded[layer.index]["w"]), np.asarray(params[layer.index]["w"])
        )
        assert same == (i < n_loaded_convs), f"conv #{i} (layer {layer.index})"


def test_weights_file_bit_layout(tmp_path):
    """First bytes: header int32s then bn beta of conv0 (field-order spec)."""
    spec = build_spec(parse_cfg("cfg/reweighting_net.cfg"))
    params = init_params(spec, 0)
    path = str(tmp_path / "w.weights")
    weights_io.save_weights(path, [spec], [params], seen=7)
    raw = np.fromfile(path, dtype=np.int32, count=4)
    assert raw[3] == 7
    floats = np.fromfile(path, dtype=np.float32)[4:]
    c0 = spec.layers[0].out_channels
    np.testing.assert_allclose(floats[:c0], np.asarray(params[0]["bn"]["beta"]))
    np.testing.assert_allclose(floats[c0 : 2 * c0], np.asarray(params[0]["bn"]["gamma"]))
