#!/usr/bin/env python3
"""Episodic meta training (reference CLI contract, train_meta.py:3-6):

    python train_meta.py datacfg darknetcfg learnetcfg weightfile
"""

import sys

if len(sys.argv) != 5:
    print("Usage:")
    print("python train_meta.py datacfg darknetcfg learnetcfg weightfile")
    sys.exit(1)

from fewshot_detection_tpu.cli.train_meta_cli import main

main(sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4])
