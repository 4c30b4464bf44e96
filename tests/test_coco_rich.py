"""Trainable synthetic COCO (80-class) generator + k-shot budget helper.

These pin the CPU-side plumbing the COCO-protocol hardware workflow
(scripts/full_workflow_coco.py) depends on: the 80 distinct HSV-robust
visual identities, the COCO path grammar (images/train2014 +
labels_1c/train2014/<class>/), the devkit over COCO names, and the
full-budget few-shot sampling with per-class top-up.
"""

import os
import sys

import numpy as np
import pytest

from synth import coco_identity, load_coco_names, make_coco_rich

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_coco_identity_distinct():
    ids = {coco_identity(c) for c in range(80)}
    assert len(ids) == 80
    for c in range(80):
        hue, shape, fill = coco_identity(c)
        assert 0 <= hue < 5 and 0 <= shape < 5 and 0 <= fill < 4


@pytest.fixture(scope="module")
def rich(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cocorich") / "coco")
    return make_coco_rich(root, n_images=170, size=(96, 96), seed=5)


def test_coco_rich_layout(rich):
    names = load_coco_names()
    # every class got at least one image + a labels_1c dir + list file
    assert len(rich["cls_lists"]) == 80
    some = names[3]
    d1c = os.path.join(rich["root"], "labels_1c", "train2014", some)
    assert os.path.isdir(d1c) and os.listdir(d1c)
    # label ids match the class list membership
    lst = open(rich["cls_lists"][some]).read().split("\n")[0]
    lab = lst.replace("images", "labels").replace(".png", ".txt")
    rows = np.loadtxt(lab).reshape(-1, 5)
    assert 3 in rows[:, 0].astype(int)
    # devkit over the COCO names
    anno = os.path.join(rich["devkit"], "VOC2007", "Annotations")
    assert len(os.listdir(anno)) == 170
    main = os.path.join(rich["devkit"], "VOC2007", "ImageSets", "Main")
    assert os.path.exists(os.path.join(main, f"{some}_test.txt"))


def test_fewlists_full_budget_topup(rich):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from full_workflow import _fewlists_full_budget

    from fewshot_detection_tpu.data.coco_prep import get_bbox_fewlist

    names = load_coco_names()
    shot = 2
    pools = {c: open(p).read().splitlines()
             for c, p in rich["cls_lists"].items()}
    lists = _fewlists_full_budget(
        lambda seed: get_bbox_fewlist(rich["train_list"], shot, names,
                                      seed=seed),
        names, shot, seeds=(1, 2), class_pools=pools)

    from fewshot_detection_tpu.data.datasets import get_labpath

    for ci, flist in enumerate(lists):
        total = 0
        for p in flist:
            rows = np.loadtxt(get_labpath(p.strip())).reshape(-1, 5)
            total += int((rows[:, 0].astype(int) == ci).sum())
        assert total >= shot, (names[ci], total)
