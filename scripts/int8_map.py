#!/usr/bin/env python3
"""Score the int8 serving path in mAP, not just output deviation.

Reruns the full ensemble eval sweep (reference contract:
/root/reference/valid_ensemble.py:137-178 -> scripts/voc_eval.py:246-331)
on a finished full_workflow root's TUNED checkpoint with FSD_INT8=1
(per-channel int8 weights + calibrated activation scales on the MXU,
models/quant.py), then prints the bf16-vs-int8 mAP pair so the 1.64x
throughput gain (PERF.md round 4) carries a measured accuracy cost.

The bf16 numbers come from the root's state/evalt.done marker (same
checkpoint, same held-out valid list, same scorer) — no need to re-run the
bf16 sweep.

Usage:
    python scripts/int8_map.py [--root /tmp/fsd_tiny_n1] [--no-head]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from full_workflow import TPU_ENV  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/fsd_tiny_n1")
    ap.add_argument("--no-head", action="store_true",
                    help="leave the fused reweight+head contraction in bf16 "
                    "(FSD_INT8_HEAD=0)")
    args = ap.parse_args()
    root = args.root

    state = os.path.join(root, "state")
    tune = json.load(open(os.path.join(state, "tune.done")))
    data = json.load(open(os.path.join(state, "data.done")))
    bf16 = json.load(open(os.path.join(state, "evalt.done")))
    ckpt = tune["ckpt"]
    novelid = data.get("novelid", 0)
    ln_src = ("cfg/tiny_reweighting.cfg" if data.get("mode") == "tiny"
              else "cfg/reweighting_net.cfg")

    script = os.path.join(root, "eval_int8.py")
    with open(script, "w") as f:
        f.write(f"""
import json, os, sys, time
sys.path.insert(0, {REPO!r})
from fewshot_detection_tpu.cli.common import resolve_configs
from fewshot_detection_tpu.eval.valid import run_valid_ensemble
from fewshot_detection_tpu.eval.voc_eval import do_python_eval

os.chdir({root!r})
data_options, dk, ln, settings = resolve_configs(
    os.path.join({root!r}, "tune.data"), os.path.join({root!r}, "dk.cfg"),
    os.path.join({REPO!r}, {ln_src!r}))
t0 = time.time()
prefix = run_valid_ensemble(data_options, dk, ln, {ckpt!r}, settings)
sweep_s = time.time() - t0
result = do_python_eval(
    prefix + "/comp4_det_test_",
    devkit_path=os.path.join({root!r}, "voc", "VOCdevkit"),
    novel=True, novel_file=os.path.join({REPO!r}, "data/voc_novels.txt"),
    novelid=str({novelid!r}))
print("EVALJSON " + json.dumps({{
    "mean_ap": round(float(result["mean"]), 4),
    "base_mean": round(float(result.get("base_mean", 0.0)), 4),
    "novel_mean": round(float(result.get("novel_mean", 0.0)), 4),
    "aps": {{c: round(float(a), 4) for c, a in result["ap"].items()}},
    "sweep_s": round(sweep_s, 1),
    "checkpoint": {ckpt!r}}}))
""")

    env = dict(os.environ, **TPU_ENV,
               FSD_COMPILE_CACHE=os.path.join(root, "xla_cache"),
               FSD_EVAL_BATCH="16", FSD_DEVICE_NMS="1", FSD_INT8="1",
               FSD_INT8_HEAD="0" if args.no_head else "1")
    logfile = os.path.join(root, "logs", "eval_int8.log")
    print(f"[int8_map {time.strftime('%H:%M:%S')}] running int8 sweep "
          f"on {ckpt} (log: {logfile})", flush=True)
    with open(logfile, "a") as lf:
        p = subprocess.run([sys.executable, script], stdout=lf,
                           stderr=subprocess.STDOUT, cwd=root, env=env,
                           timeout=40 * 60)
    assert p.returncode == 0, f"int8 eval failed (rc={p.returncode})"
    out = None
    for line in open(logfile):
        if line.startswith("EVALJSON "):
            out = json.loads(line[len("EVALJSON "):])
    assert out, "no EVALJSON line"

    rows = [("mean mAP", bf16["mean_ap"], out["mean_ap"]),
            ("base mAP", bf16["base_mean"], out["base_mean"]),
            ("novel mAP", bf16["novel_mean"], out["novel_mean"])]
    print(f"\nint8 (quant_head={not args.no_head}) vs bf16, tuned "
          f"checkpoint, novelid {novelid}:")
    for name, b, q in rows:
        print(f"  {name:10s} bf16 {b:.4f}  int8 {q:.4f}  delta {q - b:+.4f}")
    per_cls = {c: round(out["aps"][c] - bf16["aps"][c], 4)
               for c in out["aps"] if c in bf16["aps"]}
    print("  per-class delta:", json.dumps(per_cls))
    print("INT8JSON " + json.dumps({
        "bf16": {k: bf16[k] for k in ("mean_ap", "base_mean", "novel_mean")},
        "int8": {k: out[k] for k in ("mean_ap", "base_mean", "novel_mean")},
        "quant_head": not args.no_head, "novelid": novelid,
        "sweep_s": out["sweep_s"], "checkpoint": ckpt}))


if __name__ == "__main__":
    main()
