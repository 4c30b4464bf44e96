#!/usr/bin/env python3
"""Multi-scale face-detection sweep (reference scripts/eval_widerface.py):
walks a WIDER-style directory tree, resizes each image to a multiple of the
network stride, detects at conf 0.05 / nms 0.4, writes per-image box files
and annotated images.

    python scripts/eval_widerface.py cfgfile weightfile valdir savedir
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def save_boxes(img_w, img_h, boxes, savename):
    with open(savename, "w") as f:
        f.write(f"{len(boxes)}\n")
        for box in boxes:
            x1 = round((box[0] - box[2] / 2.0) * img_w)
            y1 = round((box[1] - box[3] / 2.0) * img_h)
            w = round(box[2] * img_w)
            h = round(box[3] * img_h)
            f.write(f"{x1} {y1} {w} {h} {box[4]:f}\n")


def eval_widerface(cfgfile, weightfile, valdir, savedir):
    import numpy as np
    from PIL import Image

    from fewshot_detection_tpu.eval.detector import PlainDetector
    from fewshot_detection_tpu.ops.boxes import get_region_boxes, nms
    from fewshot_detection_tpu.utils.imaging import plot_boxes

    m = PlainDetector(cfgfile, weightfile)
    scale = 16
    for parent, _dirnames, filenames in os.walk(valdir):
        if parent == valdir:
            continue
        targetdir = os.path.join(savedir, os.path.basename(parent))
        os.makedirs(targetdir, exist_ok=True)
        for filename in filenames:
            imgfile = os.path.join(parent, filename)
            img = Image.open(imgfile).convert("RGB")
            sw = int(round(img.width / scale) * 16)
            sh = int(round(img.height / scale) * 16)
            print(filename, img.width, img.height, sw, sh)
            if sw * sh > 1024 * 2560:
                print(f"omit {filename}")
                continue
            sized = np.asarray(img.resize((sw, sh)), np.uint8)
            x = sized.astype(np.float32)[None] / 255.0
            output = m(x)
            boxes = nms(
                get_region_boxes(
                    output, 0.05, m.region.num_classes, m.region.anchor_wh
                )[0],
                0.4,
            )
            plot_boxes(img, boxes, os.path.join(targetdir, filename))
            save_boxes(
                img.width, img.height, boxes,
                os.path.join(targetdir, os.path.splitext(filename)[0] + ".txt"),
            )


if __name__ == "__main__":
    if len(sys.argv) == 5:
        eval_widerface(sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4])
    else:
        print("Usage: python scripts/eval_widerface.py cfgfile weightfile valdir savedir")
