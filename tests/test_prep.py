"""Dataset preparation tooling on the synthetic devkit."""

import os

import numpy as np
import pytest

from fewshot_detection_tpu.data import prep
from synth import VOC, make_voc_like


@pytest.fixture(scope="module")
def devkit_ws(tmp_path_factory):
    root = tmp_path_factory.mktemp("prep")
    d = make_voc_like(str(root / "voc"), n_images=40, seed=1)
    return {"root": str(root), "d": d, "devkit": d["devkit"]}


SETS = [("2007", "train")]


def test_write_voc_labels(devkit_ws):
    out = os.path.join(devkit_ws["root"], "lists")
    os.makedirs(out, exist_ok=True)
    lists = prep.write_voc_labels(devkit_ws["devkit"], out, sets=SETS)
    assert len(lists) == 1
    with open(lists[0]) as f:
        paths = [l.strip() for l in f]
    assert len(paths) == 40
    # labels dir written with darknet rows
    labdir = os.path.join(devkit_ws["devkit"], "VOC2007", "labels")
    labs = os.listdir(labdir)
    assert len(labs) == 40
    rows = np.loadtxt(os.path.join(labdir, labs[0])).reshape(-1, 5)
    assert ((rows[:, 1:] >= 0) & (rows[:, 1:] <= 1)).all()
    assert set(rows[:, 0].astype(int)) <= set(range(20))


def test_write_voc_labels_1c_and_fewlists(devkit_ws):
    voclist = os.path.join(devkit_ws["root"], "voclist")
    prep.write_voc_labels_1c(devkit_ws["devkit"], voclist, sets=SETS)
    # per-class merged lists exist and only contain positive images
    for c in VOC:
        merged = os.path.join(voclist, f"{c}_train.txt")
        assert os.path.exists(merged)
    # labels_1c files carry class id 0
    any_cls = VOC[0]
    d = os.path.join(devkit_ws["devkit"], "VOC2007", "labels_1c", any_cls)
    f0 = os.listdir(d)[0]
    rows = np.loadtxt(os.path.join(d, f0)).reshape(-1, 5)
    assert (rows[:, 0] == 0).all()

    # image few-lists: k files per class with exactly k lines
    prep.gen_image_fewlist(voclist, few_nums=[1, 2], classes=VOC)
    for c in VOC:
        for n in (1, 2):
            with open(os.path.join(voclist, f"{n}shot_{c}_train.txt")) as f:
                assert len(f.readlines()) == n


def test_gen_bbox_fewlist_budget(devkit_ws):
    out = os.path.join(devkit_ws["root"], "lists")
    lists = prep.write_voc_labels(devkit_ws["devkit"], out, sets=SETS)
    voclist = os.path.join(devkit_ws["root"], "voclist")
    prep.gen_bbox_fewlist(lists[0], voclist, few_nums=[1], classes=VOC)
    total = 0
    for c in VOC:
        p = os.path.join(voclist, f"box_1shot_{c}_train.txt")
        assert os.path.exists(p)
        with open(p) as f:
            total += len(f.readlines())
    assert total >= len(VOC) * 0.8  # budget met (or near-met on tiny data)


def test_gen_traindict(devkit_ws):
    voclist = os.path.join(devkit_ws["root"], "voclist")
    ddir = os.path.join(devkit_ws["root"], "data_out")
    cdir = os.path.join(devkit_ws["root"], "cfg_out")
    prep.gen_traindict(voclist, ddir, cdir, few_nums=[1])
    assert os.path.exists(os.path.join(ddir, "voc_traindict_mix5c_1shot.txt"))
    cfg = os.path.join(cdir, "voc_learnet_few5c_1shot.data")
    with open(cfg) as f:
        txt = f.read()
    assert "meta = data/voc_traindict_few5c_1shot.txt" in txt


def test_coco_prep_fewlist(devkit_ws):
    """COCO fewlist logic driven with VOC-id labels (ids < 80 are valid
    COCO ids too, so the machinery exercises end-to-end)."""
    from fewshot_detection_tpu.config.settings import load_class_names
    from fewshot_detection_tpu.data import coco_prep

    coco = list(load_class_names("coco"))
    # one box per image so every class has clean single-class candidates
    d = make_voc_like(os.path.join(devkit_ws["root"], "coco_like"),
                      n_images=60, classes_per_image=1, seed=5)
    tgt = [coco[i] for i in range(20)]
    lists = coco_prep.get_bbox_fewlist(d["train_list"], 1, tgt, coco, seed=0)
    counts = [len(l) for l in lists]
    assert sum(counts) > 0

    # label1c splitting
    with open(d["train_list"]) as f:
        imgs = f.readlines()
    coco_prep.gen_label1c(imgs[:5], coco)
