"""VOC mAP scorer with hand-crafted detections of known AP."""

import os

import numpy as np
import pytest

from fewshot_detection_tpu.eval.voc_eval import voc_ap, voc_eval
from synth import make_voc_like


def test_voc_ap_perfect():
    rec = np.asarray([0.5, 1.0])
    prec = np.asarray([1.0, 1.0])
    assert voc_ap(rec, prec, use_07_metric=True) == pytest.approx(1.0)
    assert voc_ap(rec, prec, use_07_metric=False) == pytest.approx(1.0)


def test_voc_ap_known_07():
    # one TP then one FP over 2 gts: rec [0.5, 0.5], prec [1.0, 0.5]
    rec = np.asarray([0.5, 0.5])
    prec = np.asarray([1.0, 0.5])
    # 11-point: p=1 for t in {0, .1, ..., .5}, 0 above -> 6/11
    assert voc_ap(rec, prec, use_07_metric=True) == pytest.approx(6 / 11)


@pytest.fixture(scope="module")
def scored_ws(tmp_path_factory):
    root = tmp_path_factory.mktemp("score")
    d = make_voc_like(str(root / "voc"), n_images=12, seed=9)
    return {"root": str(root), "d": d}


def _gt_boxes(devkit, imgid, classname):
    from fewshot_detection_tpu.eval.voc_eval import parse_rec

    objs = parse_rec(os.path.join(devkit, "VOC2007", "Annotations",
                                  imgid + ".xml"))
    return [o["bbox"] for o in objs if o["name"] == classname]


def test_voc_eval_perfect_detections(scored_ws):
    """Feeding the ground truth back as detections yields AP == 1."""
    d = scored_ws["d"]
    devkit = d["devkit"]
    main = os.path.join(devkit, "VOC2007", "ImageSets", "Main")
    with open(os.path.join(main, "test.txt")) as f:
        ids = [l.strip() for l in f]

    cls = "aeroplane"
    det_file = os.path.join(scored_ws["root"], f"det_{cls}.txt")
    npos = 0
    with open(det_file, "w") as f:
        for imgid in ids:
            for bb in _gt_boxes(devkit, imgid, cls):
                npos += 1
                f.write(f"{imgid} 0.9 {bb[0]} {bb[1]} {bb[2]} {bb[3]}\n")
    assert npos > 0

    rec, prec, ap = voc_eval(
        os.path.join(scored_ws["root"], "det_{:s}.txt"),
        os.path.join(devkit, "VOC2007", "Annotations", "{:s}.xml"),
        os.path.join(main, "test.txt"),
        cls,
        os.path.join(scored_ws["root"], "cache"),
        use_07_metric=True,
    )
    assert ap == pytest.approx(1.0)
    assert rec[-1] == pytest.approx(1.0)


def test_voc_eval_duplicates_are_fps(scored_ws):
    """The same gt detected twice: second hit counts as FP."""
    d = scored_ws["d"]
    devkit = d["devkit"]
    main = os.path.join(devkit, "VOC2007", "ImageSets", "Main")
    with open(os.path.join(main, "test.txt")) as f:
        ids = [l.strip() for l in f]

    cls = "bicycle"
    det_file = os.path.join(scored_ws["root"], f"dup_{cls}.txt")
    with open(det_file, "w") as f:
        for imgid in ids:
            for bb in _gt_boxes(devkit, imgid, cls):
                f.write(f"{imgid} 0.9 {bb[0]} {bb[1]} {bb[2]} {bb[3]}\n")
                f.write(f"{imgid} 0.8 {bb[0]} {bb[1]} {bb[2]} {bb[3]}\n")

    rec, prec, ap = voc_eval(
        os.path.join(scored_ws["root"], "dup_{:s}.txt"),
        os.path.join(devkit, "VOC2007", "Annotations", "{:s}.xml"),
        os.path.join(main, "test.txt"),
        cls,
        os.path.join(scored_ws["root"], "cache2"),
        use_07_metric=True,
    )
    assert rec[-1] == pytest.approx(1.0)
    assert prec[-1] == pytest.approx(0.5)
    assert ap == pytest.approx(1.0)  # TPs sort first at higher conf
