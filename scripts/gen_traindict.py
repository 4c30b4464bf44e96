#!/usr/bin/env python3
"""class->list dict files + .data cfgs (reference scripts/gen_traindict.py).

    python scripts/gen_traindict.py --voclist /path/voc/voclist \
        [--data data] [--cfg cfg]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fewshot_detection_tpu.data.prep import gen_traindict

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--voclist", required=True)
    p.add_argument("--data", default="data")
    p.add_argument("--cfg", default="cfg")
    args = p.parse_args()
    gen_traindict(args.voclist, args.data, args.cfg)
    print("wrote traindict files to", args.data, "and .data cfgs to", args.cfg)
