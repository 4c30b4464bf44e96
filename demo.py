#!/usr/bin/env python3
"""Webcam demo loop (reference CLI contract, demo.py:42-52):

    python demo.py cfgfile weightfile

Requires OpenCV with camera access; exits with a clear message when cv2 is
unavailable (this environment has no camera stack)."""

import sys


def demo(cfgfile, weightfile):
    try:
        import cv2
    except ImportError:
        print("demo.py requires OpenCV (cv2) with camera support; not available here")
        sys.exit(2)

    import numpy as np

    from fewshot_detection_tpu.eval.detector import PlainDetector
    from fewshot_detection_tpu.ops.boxes import get_region_boxes, nms
    from fewshot_detection_tpu.utils.imaging import plot_boxes

    m = PlainDetector(cfgfile, weightfile)
    n_classes = m.region.num_classes
    namesfile = "data/voc.names" if n_classes == 20 else "data/coco.names"
    with open(namesfile) as f:
        class_names = [l.strip() for l in f if l.strip()]

    cap = cv2.VideoCapture(0)
    if not cap.isOpened():
        print("Unable to open camera")
        sys.exit(-1)
    while True:
        res, img = cap.read()
        if not res:
            print("Unable to read image")
            break
        sized = cv2.resize(img, (m.width, m.height))
        rgb = cv2.cvtColor(sized, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        output = m(rgb[None])
        boxes = nms(
            get_region_boxes(output, 0.5, n_classes, m.region.anchor_wh)[0],
            0.4,
        )
        print("------")
        draw = img.copy()
        h, w = draw.shape[:2]
        for box in boxes:
            x1 = int((box[0] - box[2] / 2) * w)
            y1 = int((box[1] - box[3] / 2) * h)
            x2 = int((box[0] + box[2] / 2) * w)
            y2 = int((box[1] + box[3] / 2) * h)
            cv2.rectangle(draw, (x1, y1), (x2, y2), (0, 0, 255), 2)
        cv2.imshow(cfgfile, draw)
        if (cv2.waitKey(1) & 0xFF) == 27:
            break


if __name__ == "__main__":
    if len(sys.argv) == 3:
        demo(sys.argv[1], sys.argv[2])
    else:
        print("Usage:")
        print("    python demo.py cfgfile weightfile")
