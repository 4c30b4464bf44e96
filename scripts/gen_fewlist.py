#!/usr/bin/env python3
"""Seeded k-shot list generation (reference scripts/gen_fewlist.py).

    python scripts/gen_fewlist.py --droot /path/to/voc [--type box|img|both]

Expects <droot>/voclist/<cls>_train.txt (from voc_label_1c.py) and
<droot>/voc_train.txt (from voc_label.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fewshot_detection_tpu.data.prep import gen_bbox_fewlist, gen_image_fewlist

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--droot", required=True)
    p.add_argument("--type", default="box", choices=["box", "img", "both"])
    args = p.parse_args()
    voclist = os.path.join(args.droot, "voclist")
    rootfile = os.path.join(args.droot, "voc_train.txt")
    if args.type in ("img", "both"):
        print("===> Generating fewlist (images)")
        gen_image_fewlist(voclist)
    if args.type in ("box", "both"):
        print("===> Generating fewlist (bboxes)")
        gen_bbox_fewlist(rootfile, voclist)
