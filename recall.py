#!/usr/bin/env python3
"""Per-image IoU recall sweep (reference CLI contract, recall.py:73-83):

    python recall.py cfgfile weightfile imglist
"""

import sys

if __name__ == "__main__":
    if len(sys.argv) == 4:
        from fewshot_detection_tpu.eval.detector import PlainDetector
        from fewshot_detection_tpu.eval.harness import recall_list

        detector = PlainDetector(sys.argv[1], sys.argv[2])
        recall_list(detector, sys.argv[3])
    else:
        print("Usage:")
        print("python recall.py cfgfile weightfile imglist")
