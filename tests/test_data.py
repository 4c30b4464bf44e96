"""Data pipeline: augmentation math, datasets, list builders."""

import random

import numpy as np
import pytest
from PIL import Image

from fewshot_detection_tpu.config import Settings
from fewshot_detection_tpu.data import (
    DetectionDataset,
    MetaDataset,
    build_fewset,
    fill_truth_detection,
    fill_truth_detection_meta,
    load_lines,
)
from fewshot_detection_tpu.data.augment import augment_image, distort_hsv
from fewshot_detection_tpu.data.datasets import multiscale_size
from synth import VOC, make_voc_like


@pytest.fixture(scope="module")
def voc_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc")
    return make_voc_like(str(root), n_images=24, seed=0)


def _settings(**kw):
    opts = {
        "metayolo": "1", "metain_type": "2", "data": "voc", "neg": "1",
        "rand": "0", "novel": "data/voc_novels.txt", "novelid": "0",
        "meta": "data/voc_traindict_full.txt", "train": "x", "backup": "b",
        "gpus": "0",
    }
    opts.update(kw)
    net = {"height": "416", "width": "416", "batch": "64"}
    meta = {"height": "416", "width": "416", "feat_layer": "0", "channels": "4"}
    return Settings.configure(opts, net, meta)


# ---------------------------------------------------------------------------
# augmentation / label transforms
# ---------------------------------------------------------------------------


def test_augment_identity_when_disabled():
    img = Image.new("RGB", (40, 30), (10, 20, 30))
    out, flip, dx, dy, sx, sy = augment_image(img, (20, 20), augment=False)
    assert out.size == (20, 20)
    assert (flip, dx, dy, sx, sy) == (0, 0.0, 0.0, 1.0, 1.0)


def test_fill_truth_identity_transform(tmp_path):
    p = tmp_path / "lab.txt"
    p.write_text("2 0.5 0.5 0.2 0.3\n7 0.25 0.75 0.1 0.1\n")
    base_ids = (0, 1, 2, 3, 4, 6, 7, 8, 10, 11, 12, 14, 15, 16, 18, 19)
    lab = fill_truth_detection(str(p), 0, 0, 0, 1.0, 1.0, base_ids).reshape(50, 5)
    np.testing.assert_allclose(lab[0], [2, 0.5, 0.5, 0.2, 0.3], atol=1e-6)
    np.testing.assert_allclose(lab[1], [7, 0.25, 0.75, 0.1, 0.1], atol=1e-6)
    assert lab[2].sum() == 0


def test_fill_truth_flip_and_clamp(tmp_path):
    p = tmp_path / "lab.txt"
    p.write_text("0 0.9 0.5 0.4 0.2\n")
    lab = fill_truth_detection(str(p), 1, 0, 0, 1.0, 1.0, (0,)).reshape(50, 5)
    # x2 clamps to 0.999: box [0.7, 0.999] -> cx 0.8495, w 0.299; flip cx
    np.testing.assert_allclose(lab[0, 1], 0.999 - 0.8495, atol=1e-5)
    np.testing.assert_allclose(lab[0, 3], 0.299, atol=1e-5)


def test_fill_truth_drops_novel_classes(tmp_path):
    p = tmp_path / "lab.txt"
    p.write_text("2 0.5 0.5 0.2 0.2\n0 0.5 0.5 0.2 0.2\n")  # 2=bird is novel0
    base_ids = (0, 1, 3, 4)
    lab = fill_truth_detection(str(p), 0, 0, 0, 1.0, 1.0, base_ids).reshape(50, 5)
    assert lab[0][0] == 0 and lab[0][1] == 0.5
    assert lab[1].sum() == 0
    # joint_keep keeps everything
    lab2 = fill_truth_detection(
        str(p), 0, 0, 0, 1.0, 1.0, base_ids, joint_keep=True
    ).reshape(50, 5)
    assert lab2[1][1] == 0.5


def test_fill_truth_meta_bins_and_remaps(tmp_path):
    p = tmp_path / "lab.txt"
    # classes 0 and 3; base list (0, 1, 3, 4) -> positions 0 and 2
    p.write_text("3 0.5 0.5 0.2 0.2\n0 0.3 0.3 0.1 0.1\n")
    base_ids = (0, 1, 3, 4)
    lab = fill_truth_detection_meta(str(p), 0, 0, 0, 1.0, 1.0, base_ids)
    assert lab.shape == (4, 250)
    lab = lab.reshape(4, 50, 5)
    assert lab[2, 0, 0] == 2 and abs(lab[2, 0, 1] - 0.5) < 1e-6
    assert lab[0, 0, 0] == 0 and abs(lab[0, 0, 1] - 0.3) < 1e-6
    assert lab[1].sum() == 0 and lab[3].sum() == 0


def test_distort_hsv_identity():
    img = Image.new("RGB", (8, 8), (120, 60, 200))
    out = distort_hsv(img, 0.0, 1.0, 1.0)
    # HSV roundtrip through uint8 is lossy by at most a few counts
    a = np.asarray(img, np.int16)
    b = np.asarray(out, np.int16)
    assert np.abs(a - b).max() <= 6


def test_multiscale_schedule_buckets():
    rng = random.Random(0)
    assert multiscale_size(0, rng, True) == 416
    sizes = {multiscale_size(5 * 4000 * 64, random.Random(s), True)
             for s in range(100)}
    assert sizes <= set(range(320, 609, 32))
    assert len(sizes) >= 8
    assert multiscale_size(10**9, random.Random(0), False) == 416


# ---------------------------------------------------------------------------
# datasets
# ---------------------------------------------------------------------------


def test_detection_dataset_meta_labels(voc_dir):
    s = _settings()
    ds = DetectionDataset(voc_dir["train_list"], s, train=False, shuffle=False,
                          shape=(64, 64))
    img, lab = ds[0]
    assert img.shape == (64, 64, 3) and img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0
    assert lab.shape == (15, 250)


def test_detection_dataset_filters_novel_only_images(voc_dir):
    s = _settings()
    ds = DetectionDataset(voc_dir["train_list"], s, train=True, shuffle=False,
                          filter_valid=True, rng=random.Random(0))
    # every remaining image must contain at least one base box
    from fewshot_detection_tpu.data.lists import image_is_valid

    assert len(ds) > 0
    for l in ds.lines:
        assert image_is_valid(l, s.base_ids)


def test_detection_dataset_batches(voc_dir):
    s = _settings()
    ds = DetectionDataset(voc_dir["train_list"], s, train=False, shuffle=False,
                          shape=(32, 32))
    batches = list(ds.batches(4))
    assert len(batches) == len(ds) // 4
    imgs, labs = batches[0]
    assert imgs.shape == (4, 32, 32, 3)
    assert labs.shape == (4, 15, 250)


def test_meta_dataset_train_interleave(voc_dir):
    s = _settings(tuning="1", max_epoch="10", repeat="1",
                  meta="data/voc_traindict_bbox_5shot.txt")
    ds = MetaDataset(voc_dir["traindict"], s, train=True,
                     rng=random.Random(0))
    n_cls = len(ds.classes)
    assert n_cls == 20  # tuning: all classes
    # first block covers each class once, in order
    first = ds.inds[:n_cls]
    assert [c for c, _ in first] == list(range(n_cls))
    arr, mask = ds[0]
    assert arr.shape == (416, 416, 3)
    assert mask.shape == (416, 416, 1)
    assert set(np.unique(mask)) <= {0.0, 1.0}
    assert mask.sum() > 0


def test_meta_dataset_ensemble_with_ids(voc_dir):
    s = _settings()
    ds = MetaDataset(voc_dir["traindict"], s, train=False, ensemble=True,
                     with_ids=True, rng=random.Random(0))
    assert len(ds) > 0
    arr, mask, clsid = ds[0]
    assert arr.shape[-1] == 3 and mask.shape[-1] == 1
    assert 0 <= clsid < len(ds.classes)
    # ensemble enumerates every (class, image) pair that survives filtering
    assert len({c for c, _ in ds.inds}) == len(ds.classes)


def test_meta_dataset_batches_shapes(voc_dir):
    s = _settings()
    ds = MetaDataset(voc_dir["traindict"], s, train=True, num_replicas=1,
                     rng=random.Random(1))
    metax, mask = next(ds.batches())
    n_cls = len(ds.classes)
    assert metax.shape == (n_cls, 416, 416, 3)
    assert mask.shape == (n_cls, 416, 416, 1)


# ---------------------------------------------------------------------------
# list builders
# ---------------------------------------------------------------------------


def test_load_lines_filters_and_dedups(voc_dir):
    s = _settings()
    lines = load_lines(voc_dir["train_list"], s, checkvalid=True)
    assert len(lines) > 0
    assert len(lines) == len(set(lines))


def test_load_lines_dict_expansion(voc_dir):
    s = _settings()
    lines = load_lines(voc_dir["traindict"], s, checkvalid=True)
    assert len(lines) > 0


def test_build_fewset_budget(tmp_path):
    # dedicated set: one box per image, classes cycling, so every base class
    # has candidates without novel contamination
    d = make_voc_like(str(tmp_path / "few"), n_images=60, classes_per_image=1,
                      seed=3)
    s = _settings()
    novel_names = set(s.novel_classes)
    metacnt = {c: 0 for c in VOC}
    for c in novel_names:
        metacnt[c] = 1  # pretend novel classes already have their shots
    fewset = build_fewset(
        d["train_list"], [], metacnt, shot=1, settings=s,
        rng=random.Random(0),
    )
    assert min(metacnt.values()) >= 1
    # no image in the set contains a novel object
    from fewshot_detection_tpu.data.datasets import get_labpath

    for imgpath in fewset:
        bs = np.loadtxt(get_labpath(imgpath.strip())).reshape(-1, 5)
        assert set(bs[:, 0].astype(int)).isdisjoint(set(s.novel_ids))


def test_meta_dataset_ensemble_stream_single_decode(voc_dir):
    """Ensemble batches() must decode each support image ONCE (the reference
    ran a filter() prepass then re-decoded every kept image,
    dataset.py:447-457) and yield exactly what the eager filter+index path
    yields."""
    s = _settings()

    # streamed path (no len()/indexing -> lazy filter never runs)
    ds1 = MetaDataset(voc_dir["traindict"], s, train=False, ensemble=True,
                      with_ids=True, rng=random.Random(0))
    calls = {"n": 0}
    orig = MetaDataset._load_support

    def counting(self, clsid, which):
        calls["n"] += 1
        return orig(self, clsid, which)

    MetaDataset._load_support = counting
    try:
        streamed = list(ds1.batches(4))
    finally:
        MetaDataset._load_support = orig
    n_raw = len(ds1.inds)
    assert ds1._needs_filter  # lazy filter never forced
    assert calls["n"] == n_raw  # ONE decode per enumerated support image

    # eager path: len() forces the filter prepass, then batches re-decode
    ds2 = MetaDataset(voc_dir["traindict"], s, train=False, ensemble=True,
                      with_ids=True, rng=random.Random(0))
    assert len(ds2) > 0
    eager = list(ds2.batches(4))

    assert len(streamed) == len(eager)
    for (a1, m1, c1), (a2, m2, c2) in zip(streamed, eager):
        np.testing.assert_array_equal(a1, a2)
        np.testing.assert_array_equal(m1, m2)
        np.testing.assert_array_equal(c1, c2)


def test_augmented_labels_align_with_pixels(voc_dir, monkeypatch):
    """End-to-end geometric check through the REAL DetectionDataset train
    path: with jitter+flip on (HSV neutralized so class colors stay
    matchable), the transformed label boxes must still cover the class-
    colored object pixels at EVERY target shape of the multiscale range.
    Guards the full augment->fill_truth->batch chain (image.py:52-141
    semantics) against geometry regressions."""
    import fewshot_detection_tpu.data.augment as aug_mod
    from fewshot_detection_tpu.data.datasets import DetectionDataset

    monkeypatch.setattr(aug_mod, "distort_hsv", lambda img, h, s, v: img)
    cls_colors = (np.random.RandomState(0).rand(20, 3) * 155 + 100).astype(
        np.uint8)
    s = _settings(train=voc_dir["train_list"])
    base_ids = s.base_ids

    for shape in [(128, 128), (416, 416)]:
        ds = DetectionDataset(
            voc_dir["train_list"], s, train=True, shape=shape, shuffle=False,
            rng=random.Random(7), filter_valid=False)
        ds._maybe_rescale = lambda i: None  # pin the shape under test
        ious = []
        for imgs, labels in ds.batches(4):
            H, W = imgs.shape[1:3]
            assert (H, W) == shape
            for img, lab in zip(imgs, labels):
                for ci in range(lab.shape[0]):
                    for row in lab[ci].reshape(50, 5):
                        if row[3] <= 0 or row[4] <= 0:
                            continue
                        col = cls_colors[base_ids[ci]].astype(np.float32) / 255
                        m = np.abs(img - col).max(-1) < 0.08
                        if m.sum() < 4:  # object cropped out
                            continue
                        ys, xs = np.nonzero(m)
                        px = (xs.min() / W, ys.min() / H,
                              (xs.max() + 1) / W, (ys.max() + 1) / H)
                        lx = (row[1] - row[3] / 2, row[2] - row[4] / 2,
                              row[1] + row[3] / 2, row[2] + row[4] / 2)
                        ix = max(0.0, min(px[2], lx[2]) - max(px[0], lx[0]))
                        iy = max(0.0, min(px[3], lx[3]) - max(px[1], lx[1]))
                        inter = ix * iy
                        union = ((px[2] - px[0]) * (px[3] - px[1])
                                 + row[3] * row[4] - inter)
                        ious.append(inter / max(union, 1e-9))
        ious = np.asarray(ious)
        assert len(ious) >= 20, len(ious)
        # mean alignment high; allow a tail from the reference's swidth-1
        # crop quirk + tiny sources
        assert ious.mean() > 0.75, (shape, ious.mean())
        assert np.percentile(ious, 25) > 0.6, (shape, np.percentile(ious, 25))
