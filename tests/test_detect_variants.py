"""detect.py CLI variants (PIL / cv2 / skimage — reference detect.py:8-103).

Drives detect() and detect_cv2() end-to-end on a synthetic image with
random-init tiny-yolo weights; skimage is absent from this environment, so
its variant gets an import-surface check only.
"""

import os
import sys

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from fewshot_detection_tpu.config import parse_cfg
from fewshot_detection_tpu.models import weights_io
from fewshot_detection_tpu.models.darknet import init_params
from fewshot_detection_tpu.models.spec import build_spec

import detect as detect_cli


@pytest.fixture()
def tiny_setup(tmp_path, monkeypatch):
    spec = build_spec(parse_cfg(os.path.join(REPO, "cfg/tiny-yolo-voc.cfg")))
    params = init_params(spec, 0)
    # gain so random-init outputs are not collapsed-constant (see
    # test_meta_golden._gain)
    params = [
        {**p, "w": p["w"] * 2.45} if p is not None and "w" in p else p
        for p in params
    ]
    wpath = tmp_path / "tiny.weights"
    weights_io.save_weights(str(wpath), [spec], [params])

    rng = np.random.RandomState(3)
    img = Image.fromarray(
        rng.randint(0, 255, (96, 128, 3), np.uint8), "RGB"
    )
    ipath = tmp_path / "img.png"
    img.save(ipath)

    # detect writes predictions.jpg into CWD and resolves data/voc.names
    # relatively: run in tmp with the repo's protocol assets linked in
    monkeypatch.chdir(tmp_path)
    os.symlink(os.path.join(REPO, "data"), tmp_path / "data")
    os.symlink(os.path.join(REPO, "cfg"), tmp_path / "cfg")
    return str(wpath), str(ipath)


def test_detect_pil(tiny_setup, capsys):
    wpath, ipath = tiny_setup
    detect_cli.detect("cfg/tiny-yolo-voc.cfg", wpath, ipath)
    out = capsys.readouterr().out
    assert "Predicted in" in out
    assert os.path.exists("predictions.jpg")


def test_detect_cv2(tiny_setup, capsys):
    cv2 = pytest.importorskip("cv2")
    wpath, ipath = tiny_setup
    detect_cli.detect_cv2("cfg/tiny-yolo-voc.cfg", wpath, ipath)
    out = capsys.readouterr().out
    assert "Predicted in" in out
    saved = cv2.imread("predictions.jpg")
    assert saved is not None and saved.shape == (96, 128, 3)


def test_detect_cv2_bgr_quirk(tiny_setup):
    """cv2.imread is BGR; the model must see RGB (detect.py:57-59): feeding
    the same image through the PIL and cv2 paths yields identical model
    inputs apart from resize interpolation."""
    cv2 = pytest.importorskip("cv2")
    _, ipath = tiny_setup
    img_bgr = cv2.imread(ipath)
    rgb = cv2.cvtColor(img_bgr, cv2.COLOR_BGR2RGB)
    pil = np.asarray(Image.open(ipath).convert("RGB"))
    np.testing.assert_array_equal(rgb, pil)
    assert not np.array_equal(img_bgr, pil)  # BGR really is swapped


def test_skimage_variant_guarded():
    """detect_skimage must exist with the reference signature; with skimage
    missing in this env the import error surfaces only on call."""
    assert callable(detect_cli.detect_skimage)
    assert detect_cli.VARIANTS["skimage"] is detect_cli.detect_skimage
    try:
        import skimage  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError):
            detect_cli.detect_skimage("cfg/tiny-yolo-voc.cfg", "x", "y")
