"""Regression tests for the round-1 self-review findings."""

import os
import random

import numpy as np
import pytest

from fewshot_detection_tpu.config import Settings
from fewshot_detection_tpu.data.datasets import DetectionDataset, topath
from synth import make_voc_like


def _settings(**kw):
    opts = {
        "metayolo": "1", "metain_type": "2", "data": "voc", "neg": "1",
        "rand": "0", "novel": "data/voc_novels.txt", "novelid": "0",
        "meta": "data/voc_traindict_full.txt", "train": "x", "backup": "b",
        "gpus": "0", "scale": "1",
    }
    opts.update(kw)
    return Settings.configure(opts, {"height": "416", "width": "416",
                                     "batch": "64"})


def test_multiscale_never_switches_mid_batch(tmp_path):
    """Batch sizes that don't divide 64 must still get uniform-scale
    batches (the stacking would crash otherwise)."""
    d = make_voc_like(str(tmp_path / "voc"), n_images=24, seed=13)
    s = _settings()
    ds = DetectionDataset(d["train_list"], s, train=True, shuffle=False,
                          seen=5 * 4000 * 64,  # widest multiscale regime
                          filter_valid=False, rng=random.Random(0))
    shapes = set()
    for imgs, labels in ds.batches(10):
        assert imgs.shape[1] == imgs.shape[2]
        shapes.add(imgs.shape[1])
    assert shapes  # ran without a mid-batch switch crash


def test_topath_remap(monkeypatch, tmp_path):
    monkeypatch.setenv("FSD_PATH_MAP", "/old/root=/new/root,/a=/b")
    assert topath("/old/root/images/x.jpg") == "/new/root/images/x.jpg"
    assert topath("/a/y.png") == "/b/y.png"
    monkeypatch.delenv("FSD_PATH_MAP")
    assert topath("/old/root/images/x.jpg") == "/old/root/images/x.jpg"


def test_baserw_splice_torch_layout(tmp_path, monkeypatch):
    """Reference-format (n, C, 1, 1) pickles must transpose before the
    splice (the original condition skipped it exactly when needed)."""
    import pickle

    n, C = 20, 64
    rng = np.random.RandomState(0)
    rws = [rng.randn(n, C, 1, 1).astype(np.float32)]
    os.makedirs(tmp_path / "data" / "rws", exist_ok=True)
    with open(tmp_path / "data" / "rws" / "voc_novel0_.pkl", "wb") as f:
        pickle.dump(rws, f)

    codes = [np.zeros((n, 1, 1, C), np.float32)]
    tki = list(range(15))
    monkeypatch.chdir(tmp_path)
    # replicate the splice block from run_valid_ensemble
    with open("data/rws/voc_novel0_.pkl", "rb") as fh:
        loaded = pickle.load(fh)
    for i in range(len(loaded)):
        rw = np.asarray(loaded[i], np.float32)
        if rw.ndim == 4 and rw.shape != codes[i].shape:
            rw = rw.transpose(0, 2, 3, 1)
        codes[i][tki] = rw[tki]
    np.testing.assert_allclose(
        codes[0][3, 0, 0, :], rws[0][3, :, 0, 0]
    )


def test_meta_harness_pairing(tmp_path):
    """test_detector with a meta detector visits every image's own truths."""
    from fewshot_detection_tpu.config import parse_cfg
    from fewshot_detection_tpu.data.datasets import MetaDataset
    from fewshot_detection_tpu.eval.detector import MetaDetector
    from fewshot_detection_tpu.eval.harness import test_detector

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    d = make_voc_like(str(tmp_path / "voc"), n_images=24, seed=14)
    s = _settings(meta=d["traindict"])
    det = MetaDetector(
        os.path.join(REPO, "cfg/tiny_darknet_dynamic.cfg"),
        os.path.join(REPO, "cfg/tiny_reweighting.cfg"),
    )
    ms = MetaDataset(d["traindict"], s, train=True, num_replicas=1,
                     rng=random.Random(0))
    ms.meta_shape = (128, 128)
    ms.mask_shape = (128, 128)
    p, r, f = test_detector(det, d["train_list"], s, batch_size=4,
                            meta_batches=ms.batches())
    assert 0.0 <= p <= 1.0 and 0.0 <= r <= 1.0
