#!/usr/bin/env python3
"""k-shot sweep: tune + evaluate a completed tiny workflow root at several
shot counts.

The reference protocol's core result is mAP vs k over the frozen
box_{1,2,3,5,10}shot splits (/root/reference/scripts/gen_fewlist.py:53-103,
README.md:131-152). This driver reproduces that axis in miniature: from ONE
base checkpoint (a finished `full_workflow --tiny` root), it builds a
box-budgeted k-shot dict per k, runs the dynamic few-shot tune
(train_meta.py, tuning=1 dynamic=1), sweeps the tuned checkpoint with
valid_ensemble, and scores VOC07 AP — reporting novel/base mAP vs k.

Each k gets its own subdir <root>/shot<k>/ (tune backup + results), so the
sweep is resumable per k. One tunnel client at a time, as always.

Usage:
    python scripts/shot_sweep.py --root /tmp/fsd_tiny [--shots 1,2,3,5,10]
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))
sys.path.insert(0, os.path.join(REPO, "tests"))

import full_workflow as wf


def build_fewdict(root, kdir, shot):
    """Box-budgeted k-shot lists + dict file for `shot` (stage_few logic,
    parameterized by k; dict filename carries the shot count — settings
    parses it back out of the `meta` option). Written under the per-k dir
    so the sweep never clobbers the root's canonical stage_few lists."""
    from fewshot_detection_tpu.data.prep import VOC_CLASSES, get_bbox_fewlist

    voclist = os.path.join(kdir, "voclist")
    os.makedirs(voclist, exist_ok=True)
    lists = wf._fewlists_full_budget(
        lambda seed: get_bbox_fewlist(
            os.path.join(root, "voc", "train_split.txt"), shot, VOC_CLASSES,
            seed=seed),
        VOC_CLASSES, shot)
    fewdict = os.path.join(kdir, f"voc_traindict_bbox_{shot}shot.txt")
    with open(fewdict, "w") as df:
        for cname, flist in zip(VOC_CLASSES, lists):
            out = os.path.join(voclist, f"box_{shot}shot_{cname}_train.txt")
            with open(out, "w") as f:
                f.writelines(flist)
            df.write(f"{cname} {out}\n")
    return fewdict


def tune_and_eval(root, shot):
    """One k: tune from the base checkpoint, ensemble-eval the tuned one."""
    kdir = os.path.join(root, f"shot{shot}")
    os.makedirs(kdir, exist_ok=True)
    marker = os.path.join(kdir, "result.json")
    if os.path.exists(marker):
        res = json.load(open(marker))
        wf.log(f"shot{shot}: already done ({res['novel_mean']})")
        return res

    base_ckpt = json.load(open(wf.done_marker(root, "base")))["ckpt"]
    fewdict = build_fewdict(root, kdir, shot)
    tune_data = os.path.join(kdir, "tune.data")
    with open(tune_data, "w") as f:
        f.write(
            "metayolo=1\nmetain_type=2\ndata=voc\nneg=0\nrand=0\n"
            f"tuning=1\nmax_epoch={wf.TUNE_MAX_EPOCH}\n"
            f"repeat={wf.TUNE_REPEAT}\n"
            f"dynamic=1\nscale={wf.TUNE_SCALE}\n"
            f"novel={REPO}/data/voc_novels.txt\nnovelid=0\n"
            f"meta={fewdict}\ntrain={root}/voc/train_split.txt\n"
            f"valid={root}/voc/test_split.txt\nbackup={kdir}/backup_tune\n"
            "gpus=0\n"
        )
    bdir = wf.tune_backup_dir(kdir)
    ok = wf.run_cli(
        root, f"tune_shot{shot}",
        [sys.executable, os.path.join(REPO, "train_meta.py"),
         tune_data, os.path.join(root, "dk.cfg"),
         os.path.join(REPO, wf.LN_SRC), base_ckpt],
        timeout_s=60 * 60,
        resume_backup=bdir,
        resume_argpos=5,
    )
    ckpt = wf.latest_weights(bdir) if os.path.isdir(bdir) else None
    assert ok and ckpt, f"shot{shot} tuning failed"

    res = wf._eval(root, f"shot{shot}", tune_data, ckpt)
    res["shot"] = shot
    with open(marker, "w") as f:
        json.dump(res, f)
    wf.log(f"shot{shot}: novel {res['novel_mean']} base {res['base_mean']} "
           f"mean {res['mean_ap']}")
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True,
                    help="a COMPLETED full_workflow --tiny root")
    ap.add_argument("--shots", default="1,2,3,5,10")
    args = ap.parse_args()

    # adopt the root's mode knobs (tiny): same cfgs/scales the root trained
    mode = wf.recorded_mode(args.root)
    assert mode == "tiny", f"shot_sweep expects a tiny root, got {mode!r}"
    wf.TINY = True
    wf.DK_SRC = "cfg/tiny_darknet_dynamic.cfg"
    wf.LN_SRC = "cfg/tiny_reweighting.cfg"
    wf.TUNE_SCALE = 0
    wf.TUNE_MAX_EPOCH = 10
    wf.TUNE_REPEAT = 20
    assert wf.is_done(args.root, "base"), "root has no finished base stage"

    shots = [int(s) for s in args.shots.split(",")]
    rows = []
    for k in shots:
        rows.append(tune_and_eval(args.root, k))
    evalb = (json.load(open(wf.done_marker(args.root, "evalb")))
             if wf.is_done(args.root, "evalb") else None)
    table = {
        "root": args.root,
        "base_checkpoint_novel": evalb["novel_mean"] if evalb else None,
        "per_shot": [
            {"shot": r["shot"], "novel": r["novel_mean"],
             "base": r["base_mean"], "mean": r["mean_ap"]} for r in rows
        ],
    }
    print("SHOTSWEEP " + json.dumps(table))


if __name__ == "__main__":
    main()
