#!/usr/bin/env python3
"""Plain VOC validation sweep (reference CLI contract, valid.py:87-110):

    python valid.py datacfg cfgfile weightfile [gpu]
"""

import sys

if __name__ == "__main__":
    if len(sys.argv) in (4, 5):
        from fewshot_detection_tpu.cli.common import resolve_configs
        from fewshot_detection_tpu.eval.valid import run_valid

        data_options, blocks, _, settings = resolve_configs(
            sys.argv[1], sys.argv[2]
        )
        run_valid(data_options, sys.argv[2], sys.argv[3], settings)
    else:
        print("Usage:")
        print(" python valid.py datacfg cfgfile weightfile")
