#!/usr/bin/env python3
"""Single-image detection (reference CLI contract, detect.py:105-119):

    python detect.py cfgfile weightfile imgfile [pil|cv2|skimage]

Writes predictions.jpg with drawn boxes and prints class confidences.
The cv2/skimage variants reproduce detect.py:39-103 of the reference,
including their IO quirks (cv2's BGR read, skimage's float resize)."""

import sys
import time

import numpy as np


def _setup(cfgfile, weightfile):
    from fewshot_detection_tpu.eval.detector import PlainDetector

    m = PlainDetector(cfgfile, weightfile)
    print(f"Loading weights from {weightfile}... Done!")
    n_classes = m.region.num_classes
    if n_classes == 20:
        namesfile = "data/voc.names"
    elif n_classes == 80:
        namesfile = "data/coco.names"
    else:
        namesfile = "data/names"
    with open(namesfile) as f:
        class_names = [l.strip() for l in f if l.strip()]
    return m, class_names


def _do_detect(m, sized01, imgfile):
    """Two timed passes (second measures cached-executable latency),
    matching do_detect's conf/nms 0.5/0.4 (utils.py:410-458).

    FSD_DEVICE_NMS=1 routes through the jitted fixed-buffer device pipeline
    (decode -> top-k -> on-device NMS, eval/device_pipeline.py) instead of
    the host decode loop — same boxes, one small D2H copy."""
    import os

    from fewshot_detection_tpu.ops.boxes import get_region_boxes, nms

    pipe = None
    if os.environ.get("FSD_DEVICE_NMS") == "1":
        from fewshot_detection_tpu.eval.device_pipeline import DevicePipeline

        pipe = DevicePipeline(m.region, conf_thresh=0.5, nms_thresh=0.4)

    boxes = None
    for i in range(2):
        start = time.time()
        output = m(sized01[None])
        if pipe is not None:
            boxes = pipe(output)[0]
        else:
            all_boxes = get_region_boxes(
                output, 0.5, m.region.num_classes, m.region.anchor_wh
            )
            boxes = nms(all_boxes[0], 0.4)
        finish = time.time()
        if i == 1:
            print(f"{imgfile}: Predicted in {finish - start:f} seconds.")
    return boxes


def detect(cfgfile, weightfile, imgfile):
    """PIL variant (reference detect.py:8-37)."""
    from PIL import Image

    from fewshot_detection_tpu.utils import plot_boxes
    from fewshot_detection_tpu.utils.imaging import load_image_resized

    m, class_names = _setup(cfgfile, weightfile)
    img = Image.open(imgfile).convert("RGB")
    sized = load_image_resized(imgfile, m.width, m.height)
    boxes = _do_detect(m, sized, imgfile)
    plot_boxes(img, boxes, "predictions.jpg", class_names)


def detect_cv2(cfgfile, weightfile, imgfile):
    """cv2 variant (reference detect.py:39-70): BGR read, resize, then
    BGR->RGB for the model; boxes drawn on the original BGR array."""
    import cv2

    from fewshot_detection_tpu.utils.imaging import plot_boxes_cv2

    m, class_names = _setup(cfgfile, weightfile)
    img = cv2.imread(imgfile)
    sized = cv2.resize(img, (m.width, m.height))
    sized = cv2.cvtColor(sized, cv2.COLOR_BGR2RGB)
    boxes = _do_detect(m, sized.astype(np.float32) / 255.0, imgfile)
    plot_boxes_cv2(img, boxes, savename="predictions.jpg",
                   class_names=class_names)


def detect_skimage(cfgfile, weightfile, imgfile):
    """skimage variant (reference detect.py:72-103). Quirks reproduced:
    `resize(img, (m.width, m.height))` passes (rows, cols), so width/height
    swap for non-square nets, and the result is float [0,1] scaled by 255
    then re-normalized by do_detect's /255."""
    from skimage import io
    from skimage.transform import resize

    from fewshot_detection_tpu.utils.imaging import plot_boxes_cv2

    m, class_names = _setup(cfgfile, weightfile)
    img = io.imread(imgfile)
    sized = resize(img, (m.width, m.height)) * 255
    boxes = _do_detect(m, sized.astype(np.float32) / 255.0, imgfile)
    plot_boxes_cv2(img, boxes, savename="predictions.jpg",
                   class_names=class_names)


VARIANTS = {"pil": detect, "cv2": detect_cv2, "skimage": detect_skimage}


if __name__ == "__main__":
    if len(sys.argv) in (4, 5):
        variant = sys.argv[4] if len(sys.argv) == 5 else "pil"
        if variant not in VARIANTS:
            print(f"unknown variant {variant!r}; pick one of {sorted(VARIANTS)}")
            sys.exit(1)
        VARIANTS[variant](sys.argv[1], sys.argv[2], sys.argv[3])
    else:
        print("Usage:")
        print("  python detect.py cfgfile weightfile imgfile [pil|cv2|skimage]")
