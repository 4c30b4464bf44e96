"""Edge paths: metain_type 3/4 support inputs, COCO->VOC head surgery,
ensemble base-code splicing layout."""

import os
import random

import numpy as np
import pytest

from fewshot_detection_tpu.config import Settings
from fewshot_detection_tpu.data.datasets import MetaDataset
from synth import make_voc_like


def _settings(metain_type, tmp=None):
    opts = {
        "metayolo": "1", "metain_type": str(metain_type), "data": "voc",
        "neg": "1", "rand": "0", "novel": "data/voc_novels.txt",
        "novelid": "0", "meta": "data/voc_traindict_full.txt",
        "train": "x", "backup": "b", "gpus": "0",
    }
    net = {"height": "416", "width": "416", "batch": "64"}
    meta = {"height": "128", "width": "128", "feat_layer": "0",
            "channels": "4"}
    return Settings.configure(opts, net, meta)


@pytest.fixture(scope="module")
def voc_dir(tmp_path_factory):
    return make_voc_like(str(tmp_path_factory.mktemp("voc3")), n_images=24,
                         seed=7)


def test_metain_type3_seven_channels(voc_dir):
    """metain 3: RGB + cropped-object RGB + mask = 7 channels total
    (cfg.py:173, dataset.py:386-391)."""
    s = _settings(3)
    assert s.meta_channels == 7
    ds = MetaDataset(voc_dir["traindict"], s, train=True, num_replicas=1,
                     rng=random.Random(0))
    arr, mask = ds[0]
    assert arr.shape == (128, 128, 6)  # RGB + cropped RGB
    assert mask.shape == (128, 128, 1)


def test_metain_type4_six_channels_no_mask_concat(voc_dir):
    s = _settings(4)
    assert s.meta_channels == 6
    ds = MetaDataset(voc_dir["traindict"], s, train=True, num_replicas=1,
                     rng=random.Random(1))
    arr, mask = ds[0]
    assert arr.shape == (128, 128, 6)


def test_meta_forward_metain_type4_no_mask():
    """metain 4 feeds 6 channels straight into the learnet (no mask
    concat, darknet_meta.py:117-118 condition)."""
    import jax.numpy as jnp

    from fewshot_detection_tpu.config import parse_cfg
    from fewshot_detection_tpu.models.meta import MetaSpec, init_meta_params, meta_forward
    from fewshot_detection_tpu.models.spec import build_spec

    lblocks = parse_cfg("cfg/tiny_reweighting.cfg")
    lblocks[0]["channels"] = "6"
    spec = MetaSpec(build_spec(parse_cfg("cfg/tiny_darknet_dynamic.cfg")),
                    build_spec(lblocks))
    params = init_meta_params(spec, 0)
    metax = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 6),
                        jnp.float32)
    dws, _ = meta_forward(spec, params, metax, None, metain_type=4)
    assert dws[0].shape == (2, 1, 1, 64)


def test_load_conv_from_coco_head_surgery():
    """425ch COCO head -> 125ch VOC head keeps box(5) + 20 VOC class rows
    per anchor (cfg.py:419-435)."""
    from fewshot_detection_tpu.config.settings import load_class_names
    from fewshot_detection_tpu.models.spec import LayerSpec
    from fewshot_detection_tpu.models.weights_io import load_conv_from_coco

    coco = list(load_class_names("coco"))
    voc = list(load_class_names("voc"))
    vocids = [coco.index(c) for c in voc]

    rng = np.random.RandomState(0)
    bias = rng.randn(425).astype(np.float32)
    w = rng.randn(425, 1024, 1, 1).astype(np.float32)
    buf = np.concatenate([bias, w.ravel()])

    layer = LayerSpec(index=0, kind="conv", in_channels=1024,
                      out_channels=125, size=1)
    p, end = load_conv_from_coco(buf, 0, layer, vocids)
    assert end == buf.size
    assert p["b"].shape == (125,)
    assert p["w"].shape == (1, 1, 1024, 125)
    # anchor 0: first 5 channels are the box/conf rows, next 20 the VOC ids
    np.testing.assert_allclose(p["b"][:5], bias[:5])
    np.testing.assert_allclose(p["b"][5], bias[5 + vocids[0]])
    # anchor 1 starts at coco offset 85, ours at 25
    np.testing.assert_allclose(p["b"][25:30], bias[85:90])
