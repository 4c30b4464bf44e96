#!/usr/bin/env python3
"""Meta validation with per-batch support codes (reference CLI contract,
valid_meta.py):

    python valid_meta.py datacfg darknetcfg learnetcfg weightfile [gpu]
"""

import sys

if __name__ == "__main__":
    if len(sys.argv) in (5, 6):
        from fewshot_detection_tpu.cli.common import resolve_configs
        from fewshot_detection_tpu.eval.valid import run_valid_meta

        data_options, darknet, learnet, settings = resolve_configs(
            sys.argv[1], sys.argv[2], sys.argv[3]
        )
        run_valid_meta(data_options, darknet, learnet, sys.argv[4], settings)
    else:
        print("Usage:")
        print(" python valid_meta.py datacfg darknetcfg learnetcfg weightfile")
