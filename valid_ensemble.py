#!/usr/bin/env python3
"""Ensemble-reweighting validation (reference CLI contract,
valid_ensemble.py:185-217):

    python valid_ensemble.py datacfg darknetcfg learnetcfg weightfile \
        [gpu] [use_baserw]
"""

import sys

if __name__ == "__main__":
    if len(sys.argv) in (5, 6, 7):
        from fewshot_detection_tpu.cli.common import resolve_configs
        from fewshot_detection_tpu.eval.valid import run_valid_ensemble

        use_baserw = len(sys.argv) == 7
        data_options, darknet, learnet, settings = resolve_configs(
            sys.argv[1], sys.argv[2], sys.argv[3]
        )
        run_valid_ensemble(
            data_options, darknet, learnet, sys.argv[4], settings,
            use_baserw=use_baserw,
        )
    else:
        print("Usage:")
        print(" python valid_ensemble.py datacfg darknetcfg learnetcfg weightfile")
