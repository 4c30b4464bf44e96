"""COCO-layout path handling: labels_1c derivation, meta dataset on
train2014-style trees, and COCO Settings policies."""

import os
import random

import numpy as np
import pytest
from PIL import Image

from fewshot_detection_tpu.config import Settings
from fewshot_detection_tpu.data.datasets import MetaDataset, get_labpath_1c


def _coco_settings(**kw):
    opts = {
        "metayolo": "1", "metain_type": "2", "data": "coco", "neg": "1",
        "rand": "0", "novel": "data/coco_novels.txt", "novelid": "0",
        "meta": "data/coco_traindict_full.txt", "train": "x", "backup": "b",
        "gpus": "0",
    }
    opts.update(kw)
    net = {"height": "416", "width": "416", "batch": "64"}
    meta = {"height": "416", "width": "416", "feat_layer": "0", "channels": "4"}
    return Settings.configure(opts, net, meta)


def test_coco_settings_policies():
    s = _coco_settings()
    assert s.n_classes == 80
    assert s.save_interval == 2
    # novel split 0 for coco
    assert s.novel_classes == ("orange", "zebra", "traffic light",
                               "wine glass", "cake")
    assert len(s.base_classes) == 75


def test_coco_labpath_1c():
    p = get_labpath_1c("/d/images/train2014/COCO_x_1.jpg", "zebra", "coco")
    assert p == "/d/labels_1c/train2014/zebra/COCO_x_1.txt"
    p = get_labpath_1c("/d/images/val2014/COCO_y_2.jpg", "cake", "coco")
    assert p == "/d/labels_1c/val2014/cake/COCO_y_2.txt"
    with pytest.raises(ValueError):
        get_labpath_1c("/d/other/x.jpg", "cake", "coco")


@pytest.fixture(scope="module")
def coco_tree(tmp_path_factory):
    """Minimal train2014-style tree with per-class labels for 3 classes."""
    root = tmp_path_factory.mktemp("coco")
    imgdir = os.path.join(root, "images", "train2014")
    os.makedirs(imgdir)
    rng = np.random.RandomState(0)
    s = _coco_settings()
    classes = list(s.base_classes)[:3]
    lists = {}
    for ci, cname in enumerate(classes):
        labdir = os.path.join(root, "labels_1c", "train2014", cname)
        os.makedirs(labdir)
        paths = []
        for j in range(3):
            name = f"COCO_train2014_{ci:02d}{j:02d}"
            img = os.path.join(imgdir, name + ".jpg")
            Image.fromarray(
                rng.randint(0, 255, (32, 48, 3), np.uint8)
            ).save(img)
            with open(os.path.join(labdir, name + ".txt"), "w") as f:
                f.write("0 0.5 0.5 0.4 0.4\n")
            paths.append(img)
        lst = os.path.join(root, f"{cname}_train.txt")
        with open(lst, "w") as f:
            f.write("\n".join(paths) + "\n")
        lists[cname] = lst
    # dict file covering ALL coco base classes: unlisted classes reuse the
    # first list (MetaDataset requires an entry per class)
    dictfile = os.path.join(root, "traindict.txt")
    with open(dictfile, "w") as f:
        for cname in s.base_classes:
            f.write(f"{cname} {lists.get(cname, lists[classes[0]])}\n")
    return {"root": str(root), "dict": dictfile, "classes": classes}


def test_coco_meta_dataset(coco_tree):
    s = _coco_settings()
    ds = MetaDataset(coco_tree["dict"], s, train=True, num_replicas=1,
                     rng=random.Random(0))
    assert len(ds.classes) == 75  # coco base classes
    ds.meta_shape = (64, 64)
    ds.mask_shape = (64, 64)
    arr, mask = ds[0]
    assert arr.shape == (64, 64, 3)
    assert mask.shape == (64, 64, 1)
    assert mask.sum() > 0
