"""`partial` dynamic conv: learned shared channels concatenated before the
per-class codes (dynamic_conv.py:39-48, 133-136 in the reference)."""

import numpy as np
import jax.numpy as jnp

from fewshot_detection_tpu.models.meta import (
    _full_dynamic_weight,
    dynamic_conv_general,
)
from fewshot_detection_tpu.models.spec import LayerSpec


def _layer(C, partial):
    return LayerSpec(index=0, kind="conv", in_channels=C, out_channels=C,
                     size=1, stride=1, pad=0, dynamic=True, partial=partial)


def test_partial_weight_concat_layout():
    C, N, k = 4, 3, 4
    rng = np.random.RandomState(0)
    shared = jnp.asarray(rng.randn(1, 1, k).astype(np.float32))
    dw = jnp.asarray(rng.randn(N, 1, 1, C).astype(np.float32))
    full = _full_dynamic_weight(_layer(C, k), {"w": shared}, dw, N)
    assert full.shape == (N, 1, 1, k + C)
    # shared channels lead and are identical per class
    np.testing.assert_allclose(np.asarray(full[0, ..., :k]), np.asarray(shared))
    np.testing.assert_allclose(np.asarray(full[2, ..., :k]), np.asarray(shared))
    np.testing.assert_allclose(np.asarray(full[..., k:]), np.asarray(dw))


def test_partial_dynamic_conv_matches_torch():
    """partial=C gives group_size 2: each output channel mixes its shared
    and per-class weight rows, exactly as the torch grouped conv."""
    import torch
    import torch.nn.functional as F

    B, C, H, W, N = 2, 4, 3, 3, 2
    k = C  # shared block same width as codes -> group_size 2
    rng = np.random.RandomState(1)
    x = rng.randn(B, C, H, W).astype(np.float32)
    shared = rng.randn(k, 1, 1).astype(np.float32)  # torch (partial, kH, kW)
    dw = rng.randn(N, C, 1, 1).astype(np.float32)

    # torch oracle: shared repeated per class, concat on channel dim
    shared_t = torch.from_numpy(shared).unsqueeze(0).repeat(N, 1, 1, 1)
    dw_full = torch.cat([shared_t, torch.from_numpy(dw)], dim=1)  # (N, k+C,1,1)
    xt = torch.from_numpy(x).repeat(1, N, 1, 1)
    wt = dw_full.view(-1, 2, 1, 1)  # group_size 2
    groups = N * C // 2
    ref = F.conv2d(xt, wt, groups=groups).view(B * N, C, H, W).numpy()

    layer = _layer(C, k)
    p = {"w": jnp.asarray(shared.transpose(1, 2, 0))}  # ours: (kh, kw, partial)
    full = _full_dynamic_weight(layer, p, jnp.asarray(dw.transpose(0, 2, 3, 1)), N)
    ours = dynamic_conv_general(
        jnp.asarray(x.transpose(0, 2, 3, 1)), full, layer, is_first=True
    )
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, rtol=1e-5, atol=1e-5
    )


def test_partial_weights_codec_roundtrip(tmp_path):
    """A dynamic conv WITH a partial weight stores/loads its shared block."""
    from fewshot_detection_tpu.models import weights_io
    from fewshot_detection_tpu.models.darknet import init_params
    from fewshot_detection_tpu.models.spec import build_spec

    blocks = [
        {"type": "net", "batch": "1", "height": "32", "width": "32",
         "channels": "8"},
        {"type": "convolutional", "batch_normalize": "0", "filters": "8",
         "size": "1", "stride": "1", "pad": "1", "activation": "linear",
         "dynamic": "1", "partial": "8"},
    ]
    spec = build_spec(blocks)
    assert spec.layers[0].has_params
    params = init_params(spec, 0)
    assert params[0]["w"].shape == (1, 1, 8)

    path = str(tmp_path / "p.weights")
    weights_io.save_weights(path, [spec], [params], seen=1)
    fresh = init_params(spec, 9)
    (loaded,), hdr = weights_io.load_weights(path, [spec], [fresh])
    np.testing.assert_allclose(
        np.asarray(loaded[0]["w"]), np.asarray(params[0]["w"]), rtol=1e-6
    )


def test_partial_bn_codec_and_forward(tmp_path):
    """dynamic=1 batch_normalize=1 partial=N stores [BN, shared w] like the
    reference's load_conv_bn walk, and the detect path applies BN."""
    import jax.numpy as jnp

    from fewshot_detection_tpu.models import weights_io
    from fewshot_detection_tpu.models.meta import MetaSpec, detect_forward, init_meta_params
    from fewshot_detection_tpu.models.spec import build_spec

    C = 8
    dblocks = [
        {"type": "net", "batch": "1", "height": "16", "width": "16",
         "channels": str(C)},
        {"type": "convolutional", "batch_normalize": "1", "filters": str(C),
         "size": "1", "stride": "1", "pad": "1", "activation": "leaky",
         "dynamic": "1", "partial": str(C)},
    ]
    lblocks = [
        {"type": "learnet", "feat_layer": "0", "channels": "4",
         "height": "16", "width": "16"},
        {"type": "convolutional", "batch_normalize": "1", "filters": str(C),
         "size": "1", "stride": "1", "pad": "1", "activation": "leaky"},
        {"type": "globalmax"},
    ]
    spec = MetaSpec(build_spec(dblocks), build_spec(lblocks))
    params = init_meta_params(spec, 0)
    assert "bn" in params["darknet"][0] and "w" in params["darknet"][0]

    # perturb BN so the roundtrip is nontrivial
    rng = np.random.RandomState(0)
    bn = params["darknet"][0]["bn"]
    params["darknet"][0]["bn"] = {
        k: jnp.asarray(rng.rand(C).astype(np.float32) + 0.5) for k in bn
    }

    path = str(tmp_path / "dbn.weights")
    weights_io.save_weights(path, [spec.darknet, spec.learnet],
                            [params["darknet"], params["learnet"]], seen=0)
    fresh = init_meta_params(spec, 7)
    (d2, l2), _ = weights_io.load_weights(
        path, [spec.darknet, spec.learnet],
        [fresh["darknet"], fresh["learnet"]],
    )
    for k in ("gamma", "beta", "mean", "var"):
        np.testing.assert_allclose(
            np.asarray(d2[0]["bn"][k]),
            np.asarray(params["darknet"][0]["bn"][k]), rtol=1e-6,
        )
    np.testing.assert_allclose(
        np.asarray(d2[0]["w"]), np.asarray(params["darknet"][0]["w"]), rtol=1e-6
    )

    # forward applies BN between the dynamic conv and the activation —
    # torch oracle: grouped conv -> batch_norm(eval) -> leaky
    import torch
    import torch.nn.functional as F

    x = rng.rand(1, 4, 4, C).astype(np.float32)
    dw_codes = rng.rand(2, 1, 1, C).astype(np.float32)
    y1, _ = detect_forward(spec, params, jnp.asarray(x),
                           [jnp.asarray(dw_codes)])

    N = 2
    shared = np.asarray(params["darknet"][0]["w"])  # (1, 1, partial)
    shared_t = torch.from_numpy(
        np.tile(shared.transpose(2, 0, 1)[None], (N, 1, 1, 1))
    )  # (N, partial, 1, 1)
    dw_t = torch.from_numpy(
        np.ascontiguousarray(dw_codes.transpose(0, 3, 1, 2))
    )  # (N, C, 1, 1)
    full = torch.cat([shared_t, dw_t], dim=1)  # (N, 2C, 1, 1)
    xt = torch.from_numpy(
        np.ascontiguousarray(x.transpose(0, 3, 1, 2))
    ).repeat(1, N, 1, 1)
    wt = full.view(-1, 2, 1, 1)
    conv = F.conv2d(xt, wt, groups=N * C // 2).view(N, C, 4, 4)
    bn = params["darknet"][0]["bn"]
    ref = F.batch_norm(
        conv,
        torch.from_numpy(np.asarray(bn["mean"])).clone(),
        torch.from_numpy(np.asarray(bn["var"])).clone(),
        torch.from_numpy(np.asarray(bn["gamma"])),
        torch.from_numpy(np.asarray(bn["beta"])),
        training=False, momentum=0.1, eps=1e-5,
    )
    ref = F.leaky_relu(ref, 0.1).numpy()
    np.testing.assert_allclose(
        np.asarray(y1).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-5
    )
