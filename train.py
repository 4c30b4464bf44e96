#!/usr/bin/env python3
"""Baseline YOLOv2 training (reference CLI contract):

    python train.py datacfg cfgfile weightfile
"""

import sys

if len(sys.argv) != 4:
    print("Usage:")
    print("python train.py datacfg cfgfile weightfile")
    sys.exit(1)

from fewshot_detection_tpu.cli.train_plain_cli import main

main(sys.argv[1], sys.argv[2], sys.argv[3])
