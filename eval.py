#!/usr/bin/env python3
"""Precision/recall/F harness over a list of checkpoints (reference CLI
contract, eval.py):

    python eval.py datacfg cfgfile weightfile1 [weightfile2 ...]
"""

import sys

if __name__ == "__main__":
    if len(sys.argv) < 4:
        print("Usage:")
        print("python eval.py datacfg cfgfile weightfile(s)")
        sys.exit(1)

    from fewshot_detection_tpu.cli.common import resolve_configs
    from fewshot_detection_tpu.eval.detector import PlainDetector
    from fewshot_detection_tpu.eval.harness import test_detector
    from fewshot_detection_tpu.utils import log

    data_options, blocks, _, settings = resolve_configs(sys.argv[1], sys.argv[2])
    for weightfile in sys.argv[3:]:
        log(f"evaluating ... {weightfile}")
        detector = PlainDetector(sys.argv[2], weightfile)
        test_detector(detector, data_options["valid"], settings)
