"""Decoded-image RAM cache: identical outputs, decode-once behavior.

The cache (data/datasets.py DecodedCache) exists because this host's
single core re-decoding PNGs every epoch bounds end-to-end training at
14-17 img/s while the chip sustains 347 img/s (PERF.md round 4). It must
be invisible in outputs: every loader path (PIL, native per-image, native
batch) has to produce bit-identical batches with the cache on and off.
"""

import os
import random
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from synth import make_voc_like

from fewshot_detection_tpu.config.settings import Settings
import fewshot_detection_tpu.data.datasets as ds_mod
from fewshot_detection_tpu.data.datasets import DecodedCache, DetectionDataset


@pytest.fixture(scope="module")
def voc(tmp_path_factory):
    root = tmp_path_factory.mktemp("ramcache_voc")
    return make_voc_like(str(root), n_images=8, size=(96, 80), seed=5,
                         style="huebin")


def _settings(voc):
    return Settings.configure({
        "metayolo": "0", "data": "voc", "neg": "0", "rand": "0",
        "scale": "0", "novelid": "0",
        "train": voc["train_list"], "backup": "/tmp/rc_backup", "gpus": "0",
    })


def _batches(voc, settings, cache, native_env, batch_env, n=2):
    """Collect n batches with a controlled cache + env."""
    old_native = os.environ.get("FSD_NATIVE")
    old_batch = os.environ.get("FSD_NATIVE_BATCH")
    os.environ["FSD_NATIVE"] = native_env
    os.environ["FSD_NATIVE_BATCH"] = batch_env
    old_cache = ds_mod._ram_cache
    old_init = ds_mod._ram_cache_init
    ds_mod._ram_cache = cache
    ds_mod._ram_cache_init = True
    try:
        d = DetectionDataset(
            voc["train_list"], settings, train=True, seen=0, shuffle=False,
            rng=random.Random(123), filter_valid=False,
        )
        out = []
        for i, (imgs, labels) in enumerate(d.batches(4)):
            out.append((imgs, labels))
            if i + 1 >= n:
                break
        return out
    finally:
        ds_mod._ram_cache = old_cache
        ds_mod._ram_cache_init = old_init
        for k, v in (("FSD_NATIVE", old_native), ("FSD_NATIVE_BATCH", old_batch)):
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


@pytest.mark.parametrize("native,batch", [("0", "0"), ("1", "0"), ("1", "1")])
def test_cache_outputs_identical(voc, native, batch):
    settings = _settings(voc)
    base = _batches(voc, settings, None, native, batch)
    cache = DecodedCache(1 << 30)
    cached = _batches(voc, settings, cache, native, batch)
    for (a_img, a_lab), (b_img, b_lab) in zip(base, cached):
        np.testing.assert_array_equal(a_img, b_img)
        np.testing.assert_array_equal(a_lab, b_lab)
    assert cache.hits > 0 or cache.misses > 0


def test_cache_decodes_each_image_once(voc):
    settings = _settings(voc)
    cache = DecodedCache(1 << 30)
    _batches(voc, settings, cache, "0", "0", n=2)  # 8 images over 2 epochs? no — 2 batches of 4 = 8 distinct
    assert len(cache.map) == 8
    first_bytes = cache.bytes
    # second pass: all hits, no growth
    _batches(voc, settings, cache, "0", "0", n=2)
    assert len(cache.map) == 8
    assert cache.bytes == first_bytes
    assert cache.hits >= 8


def test_cache_budget_stops_admission(voc):
    settings = _settings(voc)
    tiny = DecodedCache(1)  # one byte: first decode lands, then full
    _batches(voc, settings, tiny, "0", "0", n=1)
    assert len(tiny.map) == 1  # fill-to-budget admits the overshooting first
    assert tiny.bytes > tiny.max_bytes
    before = tiny.bytes
    _batches(voc, settings, tiny, "0", "0", n=1)
    assert tiny.bytes == before
