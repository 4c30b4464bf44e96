#!/usr/bin/env python3
"""Single-image detection (reference CLI contract, detect.py:105-119):

    python detect.py cfgfile weightfile imgfile

Writes predictions.jpg with drawn boxes and prints class confidences."""

import sys
import time


def detect(cfgfile, weightfile, imgfile):
    from PIL import Image

    from fewshot_detection_tpu.eval.detector import PlainDetector
    from fewshot_detection_tpu.ops.boxes import get_region_boxes, nms
    from fewshot_detection_tpu.utils import plot_boxes
    from fewshot_detection_tpu.utils.imaging import load_image_resized

    m = PlainDetector(cfgfile, weightfile)
    print(f"Loading weights from {weightfile}... Done!")

    n_classes = m.region.num_classes
    if n_classes == 20:
        namesfile = "data/voc.names"
    elif n_classes == 80:
        namesfile = "data/coco.names"
    else:
        namesfile = "data/names"

    img = Image.open(imgfile).convert("RGB")
    sized = load_image_resized(imgfile, m.width, m.height)

    boxes = None
    for i in range(2):  # second run measures cached-executable latency
        start = time.time()
        output = m(sized[None])
        all_boxes = get_region_boxes(
            output, 0.5, n_classes, m.region.anchor_wh
        )
        boxes = nms(all_boxes[0], 0.4)
        finish = time.time()
        if i == 1:
            print(f"{imgfile}: Predicted in {finish - start:f} seconds.")

    with open(namesfile) as f:
        class_names = [l.strip() for l in f if l.strip()]
    plot_boxes(img, boxes, "predictions.jpg", class_names)


if __name__ == "__main__":
    if len(sys.argv) == 4:
        detect(sys.argv[1], sys.argv[2], sys.argv[3])
    else:
        print("Usage:")
        print("  python detect.py cfgfile weightfile imgfile")
