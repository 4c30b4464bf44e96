"""Native C++ image pipeline vs PIL."""

import os

import numpy as np
import pytest
from PIL import Image

from fewshot_detection_tpu.native import loader as native_loader

pytestmark = pytest.mark.skipif(
    not native_loader.native_available(),
    reason=f"native pipeline unavailable: {native_loader.build_error()}",
)


@pytest.fixture(scope="module")
def img_files(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 255, (48, 64, 3), np.uint8)
    png = str(root / "a.png")
    jpg = str(root / "a.jpg")
    Image.fromarray(arr).save(png)
    Image.fromarray(arr).save(jpg, quality=95)
    return {"arr": arr, "png": png, "jpg": jpg}


def test_decode_png_exact(img_files):
    pipe = native_loader.NativeImagePipe()
    out = pipe.decode(img_files["png"])
    np.testing.assert_array_equal(out, img_files["arr"])


def test_decode_jpeg_matches_pil(img_files):
    pipe = native_loader.NativeImagePipe()
    ours = pipe.decode(img_files["jpg"])
    ref = np.asarray(Image.open(img_files["jpg"]).convert("RGB"))
    # same libjpeg underneath -> identical decode
    np.testing.assert_array_equal(ours, ref)


def test_image_size(img_files):
    pipe = native_loader.NativeImagePipe()
    assert pipe.image_size(img_files["png"]) == (64, 48)
    assert pipe.image_size(img_files["jpg"]) == (64, 48)
    with pytest.raises(IOError):
        pipe.image_size("/nonexistent.jpg")


def test_plain_resize_close_to_pil_bilinear(img_files):
    pipe = native_loader.NativeImagePipe()
    ours = pipe.load_plain(img_files["png"], 32, 24)
    ref = np.asarray(
        Image.fromarray(img_files["arr"]).resize((32, 24), Image.BILINEAR),
        np.uint8,
    ).astype(np.float32) / 255.0
    assert np.abs(ours - ref).max() <= 3.0 / 255.0


def test_hsv_distort_matches_pil_point_tables(img_files):
    """With no resize (same size) the native HSV distortion should match
    the PIL path within HSV-roundtrip quantization."""
    from fewshot_detection_tpu.data.augment import distort_hsv

    pipe = native_loader.NativeImagePipe()
    h, w = img_files["arr"].shape[:2]
    ours = pipe.load_augment(
        img_files["png"], w, h, 0, 0, 0, 0, 0, 0.05, 1.3, 0.8
    )
    # PIL reference with BILINEAR resample (the native filter); the default
    # PIL path uses bicubic, which is why native is an opt-in fast path
    img = (
        Image.fromarray(img_files["arr"])
        .crop((0, 0, w - 1, h - 1))
        .resize((w, h), Image.BILINEAR)
    )
    ref = np.asarray(distort_hsv(img, 0.05, 1.3, 0.8), np.uint8).astype(np.float32) / 255.0
    diff = np.abs(ours - ref) * 255
    # residual = filter fixed-point + HSV u8 rounding differences
    assert np.percentile(diff, 90) <= 6, np.percentile(diff, [50, 90, 99])


def test_flip_and_crop_semantics(img_files):
    pipe = native_loader.NativeImagePipe()
    h, w = img_files["arr"].shape[:2]
    ours = pipe.load_augment(img_files["png"], w, h, 0, 0, 0, 0, 1, 0, 1, 1)
    base = pipe.load_augment(img_files["png"], w, h, 0, 0, 0, 0, 0, 0, 1, 1)
    np.testing.assert_allclose(ours, base[:, ::-1], atol=1e-6)


def test_batch_loader_matches_sequential(img_files):
    pipe = native_loader.NativeImagePipe(n_threads=4)
    paths = [img_files["png"], img_files["jpg"]] * 3
    batch, fails = pipe.load_batch(paths, 32, 32)
    assert fails == 0
    assert batch.shape == (6, 32, 32, 3)
    single = pipe.load_plain(img_files["png"], 32, 32)
    np.testing.assert_allclose(batch[0], single)
    # failed path zero-fills and counts
    batch2, fails2 = pipe.load_batch(["/nonexistent.png"] + paths, 16, 16)
    assert fails2 == 1
    assert batch2[0].sum() == 0


def test_batch_loader_augment_params_per_index(img_files):
    """The training path (FSD_NATIVE_BATCH=1) ships PER-IMAGE augment
    params; the threaded batch must apply row i's params to image i exactly
    (completion-order scrambling here would silently decorrelate images
    from their labels/masks)."""
    rng = np.random.RandomState(3)
    paths = [img_files["png"], img_files["jpg"]] * 4
    params = np.stack([
        [rng.randint(-12, 12), rng.randint(-12, 12), rng.randint(-9, 9),
         rng.randint(-9, 9), rng.randint(0, 2), rng.uniform(-0.1, 0.1),
         rng.uniform(0.7, 1.4), rng.uniform(0.7, 1.4)]
        for _ in range(len(paths))
    ]).astype(np.float32)
    pipe = native_loader.NativeImagePipe(n_threads=4)
    batch, fails = pipe.load_batch(paths, 40, 40, params)
    assert fails == 0
    for i, p in enumerate(paths):
        single = pipe.load_augment(
            p, 40, 40, int(params[i, 0]), int(params[i, 1]),
            int(params[i, 2]), int(params[i, 3]), int(params[i, 4]),
            float(params[i, 5]), float(params[i, 6]), float(params[i, 7]),
        )
        np.testing.assert_array_equal(batch[i], single)


def test_augment_crop_geometry_matches_pil(img_files):
    """Nonzero and NEGATIVE crop paddings (jitter can pad outside the
    image) must place content where the PIL path does — the label/mask
    transforms assume that geometry (image.py:52-87). Compared via the
    centroid of a marker square; interpolation differs (triangle vs
    bicubic) so pixels are only close, not equal."""
    from fewshot_detection_tpu.data.augment import (
        AugmentParams, apply_augment_pil)

    arr = np.zeros((96, 128, 3), np.uint8)
    arr[30:60, 40:80] = [255, 0, 0]
    src = img_files["png"].replace("a.png", "marker.png")
    Image.fromarray(arr).save(src)
    pipe = native_loader.NativeImagePipe()

    def centroid(a):
        m = (a[..., 0] > 0.8) & (a[..., 1] < 0.2)
        assert m.sum() > 0
        ys, xs = np.nonzero(m)
        return np.array([xs.mean(), ys.mean()])

    for pads in [(10, 5, 7, 3, 0), (-10, -5, -7, -3, 0),
                 (-15, 10, 8, -12, 1), (20, -20, -15, 15, 1)]:
        pleft, pright, ptop, pbot, flip = pads
        ours = pipe.load_augment(src, 416, 416, pleft, pright, ptop, pbot,
                                 flip, 0.0, 1.0, 1.0)
        ref = np.asarray(
            apply_augment_pil(
                Image.fromarray(arr), (416, 416),
                AugmentParams(pleft, pright, ptop, pbot, flip, 0.0, 1.0, 1.0),
            ), np.uint8,
        ).astype(np.float32) / 255.0
        delta = np.abs(centroid(ours) - centroid(ref)).max()
        assert delta < 4.0, (pads, delta)
