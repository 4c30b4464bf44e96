#!/usr/bin/env python3
"""Full reference workflow on HSV-robust synthetic VOC, end to end on TPU.

Drives the complete base-training + few-shot-tuning recipe of the reference
(README.md:84-152 in /root/reference) through the REAL CLI drivers:

    data   -> synthetic VOC (shape/texture classes, tests/synth.py style=shape)
    plain  -> train.py           (vanilla YOLOv2 from scratch)
    part   -> partial.py         (backbone extraction, darknet19_448.conv.23 analogue)
    base   -> train_meta.py      (episodic base training, novelid 0)
    few    -> k-shot list build  (gen_fewlist.py analogue, box-budgeted)
    tune   -> train_meta.py      (few-shot tuning, dynamic fewset)
    evalb  -> valid_ensemble + voc_eval on the BASE checkpoint
    evalt  -> valid_ensemble + voc_eval on the TUNED checkpoint

The round-2 run of this recipe (PERF.md "Full-scale learning on hardware")
used color-keyed synthetic classes, which the reference-faithful HSV
augmentation (image.py:19-50) scrambles — streaming meta classification
plateaued at uniform. This script uses shape x fill-pattern classes whose
signal survives HSV, flips, and crops, so streaming episodic learning is
provable at the flagship 416 px cfgs.

Each stage writes <root>/state/<stage>.done and skips when present; TPU
stages run as subprocesses (one tunnel client at a time) with retries that
resume from the newest .weights checkpoint.

Usage:
    python scripts/full_workflow.py [--tiny] [--root DIR] [--stage STAGE]
"""

import argparse
import json
import math
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

N_TRAIN = 512
N_TEST = 128
IMG_SIZE = (256, 256)
SHOT = 10
PLAIN_BATCHES = 1600
BASE_BATCHES = 3500
TUNE_MAX_EPOCH = 200
TUNE_REPEAT = 20
# Synthetic class style (tests/synth.py). Round-3 finding (PERF.md
# "support-code signal"): style=shape randomizes each instance's COLOR, so
# the learnet's masked-pooled support codes are episode noise
# (across/within-class distance ratio ~0.5 at init AND after 70k streaming
# samples — the cls gradient cannot bootstrap from noise codes, and
# streaming cls pins at ln(n_cls) at any LR). style=huebin keys classes to
# 5 hue bins (72 deg apart — survives the reference's +-36 deg HSV shift)
# x 4 silhouettes: the hue bin pools into a clean code signal.
STYLE = "huebin"
# dk.cfg LR schedule for the compressed synthetic run: the reference's
# warmup length (500 of 80,200 batches) is kept proportional (~300 of
# 3,500) rather than literal — 500 literal would spend 14% of the schedule
# at lr/10 (the reference spends 0.6%).
DK_STEPS = "-1,300,40000,60000"

# --tiny mode: the cfg scale at which compressed-schedule streaming
# learning is PROVEN (PERF.md round 3: tiny cfgs + huebin + warm-up off
# reach mAP 0.158 in 600 b4 batches). The flagship 416px cfgs need ~50x
# the reference schedule fraction to move cls (PERF.md round 4); tiny mode
# exists to demonstrate the few-shot TUNING DELTA — evalb vs evalt novel
# AP — with real learning signal inside one round's wall clock. plain /
# part are skipped (the tiny plain head shares no backbone prefix with
# tiny_darknet_dynamic; backbone-transplant plumbing is already proven on
# hardware at the flagship cfgs) and base meta training starts from
# random init + FSD_CLIP_NORM, exactly the proven probe recipe.
TINY = False
DK_SRC = "cfg/darknet_dynamic.cfg"
LN_SRC = "cfg/reweighting_net.cfg"
DK_BATCH = 32
SEED = 7  # --seed: synth data + weight init + fewlist sampling
NOVELID = 0  # --novelid: which of data/voc_novels.txt's 5 splits is novel
             # (reference cfg.py:103-118); masks base training, keys backup
             # dirs and the scorer's base/novel means
TUNE_SCALE = 1  # reference metatune.data scale=1; tiny pins 0 (128px cfg
                # sits below the 320-608 multiscale range, dataset.py:223-245)

TPU_ENV = {
    "FSD_CLIP_NORM": "10",   # from-random-init stabilizer (opt-in extension)
    "FSD_DTYPE": "bfloat16",  # halve tunnel H2D image traffic
    # The reference's coord warm-up (seen<12800: EVERY cell of EVERY copy
    # trained to a constant box prior) is 200 of its 80,200 batches (0.25%
    # of the schedule); at this compressed schedule the same constant would
    # cover 11% and measurably COLLAPSES the class copies before the cls
    # loss can differentiate them (probe chain in PERF.md round 3): the
    # copies' logit spread shrinks 0.64 -> 0.011 and cls pins at ln(15).
    # Scaled to this schedule the reference ratio rounds to ~300 samples;
    # clip_norm already covers early-box stability, so warm-up is disabled.
    "FSD_WARMUP_SEEN": "0",
    # C++ decode+augment pipeline, whole batches per call (1-core host is
    # the throughput bottleneck; PIL path measured 5-6 img/s under load)
    "FSD_NATIVE": "1",
    "FSD_NATIVE_BATCH": "1",
    # ship image tensors as uint8, decode on device: halves H2D bytes vs
    # bf16 and halves the tunnel transport's per-transfer host-buffer leak
    "FSD_INPUT_U8": "1",
    # with the decode cache the loader is no longer the bound (data phase
    # ~25 ms/it); the blocking per-step metrics round-trip is — fetch step
    # i's scalars only after step i+1 is dispatched (pure pipelining,
    # tests/test_overlap_metrics.py pins line + checkpoint equality)
    "FSD_OVERLAP_METRICS": "1",
    # remat headroom for reference-batch (b64) 416px episodes; the chip is
    # transfer-starved through the tunnel, so the recompute is free
    "FSD_REMAT": "1",
}


def log(msg):
    print(f"[workflow {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def base_backup_dir(root):
    """Backup dir the base stage's settings mangle resolves to: base.data
    pins scale=0 in tiny mode, which inserts 'fix' (settings.py backup
    rules / reference cfg.py:130-147)."""
    stem = "backupfix" if TINY else "backup"
    return os.path.join(root, f"{stem}_novel{NOVELID}_neg1")


def tune_backup_dir(root):
    """Backup dir the tune stage resolves to: tune.data carries
    scale={TUNE_SCALE}, so the 'fix' mangle follows TUNE_SCALE, not TINY."""
    stem = "backup_tunefix" if TUNE_SCALE == 0 else "backup_tune"
    return os.path.join(root, f"{stem}_novel{NOVELID}_neg0")


def root_mode():
    return "tiny" if TINY else "flagship"


def recorded_mode(root):
    """Mode a root's finished data stage was built in; None if no data stage.
    Pre-mode-marker roots are inferred from base.data (tiny pins scale=0)."""
    marker = done_marker(root, "data")
    if not os.path.exists(marker):
        return None
    payload = json.load(open(marker))
    if "mode" in payload:
        return payload["mode"]
    base_data = os.path.join(root, "base.data")
    if not os.path.exists(base_data):
        return None
    return "tiny" if "scale=0" in open(base_data).read() else "flagship"


def done_marker(root, stage):
    return os.path.join(root, "state", f"{stage}.done")


def mark_done(root, stage, payload=None):
    os.makedirs(os.path.join(root, "state"), exist_ok=True)
    with open(done_marker(root, stage), "w") as f:
        json.dump(payload or {}, f)


def is_done(root, stage):
    return os.path.exists(done_marker(root, stage))


def patch_cfg(src, dst, max_batches=None, batch=None, steps=None):
    txt = open(src).read()
    if max_batches is not None:
        txt = re.sub(r"(?m)^max_batches\s*=\s*\d+", f"max_batches={max_batches}", txt)
    if batch is not None:
        txt = re.sub(r"(?m)^batch\s*=\s*\d+", f"batch={batch}", txt)
    if steps is not None:
        txt = re.sub(r"(?m)^steps\s*=.*$", f"steps={steps}", txt)
    open(dst, "w").write(txt)
    return dst


def latest_weights(backupdir):
    """Newest FULL checkpoint. save_weights is atomic now, but guard against
    truncated files anyway (the codec silently accepts short buffers, so a
    partial file resumes with random tail layers): only files at the modal
    full size count."""
    if not os.path.isdir(backupdir):
        return None
    ws = sorted(f for f in os.listdir(backupdir) if f.endswith(".weights"))
    sizes = {f: os.path.getsize(os.path.join(backupdir, f)) for f in ws}
    full = max(sizes.values(), default=0)
    ws = [f for f in ws if sizes[f] == full]
    return os.path.join(backupdir, ws[-1]) if ws else None


ARTIFACTS = os.path.join(REPO, "artifacts")


def artifact_dir():
    return os.path.join(ARTIFACTS, f"flagship_base_novel{NOVELID}")


def _f32_to_bf16_bytes(buf):
    """fp32 payload -> round-to-nearest-even bf16 (raw uint16 stream).
    Halves the tracked artifact; the lost mantissa bits are below the bf16
    compute noise the weights already train in."""
    import numpy as np

    u = np.frombuffer(buf, dtype=np.uint32)
    rounded = (u + 0x7FFF + ((u >> 16) & 1)) >> 16
    return rounded.astype(np.uint16).tobytes()


def _bf16_bytes_to_f32(buf):
    import numpy as np

    u = np.frombuffer(buf, dtype=np.uint16).astype(np.uint32) << 16
    return u.tobytes()


def snapshot_base_artifact(root):
    """Persist the newest flagship base checkpoint into the repo's tracked
    artifacts/ dir (gzipped bf16-cast .weights + manifest). /tmp is wiped
    between rounds but the repo survives, so the 80,200x64-sample reference
    base schedule (cfg/darknet_dynamic.cfg:20) can accumulate across rounds
    instead of restarting from sample 0 every round."""
    if TINY:
        return None
    bdir = base_backup_dir(root)
    ck = latest_weights(bdir)
    if not ck:
        return None
    import gzip

    adir = artifact_dir()
    os.makedirs(adir, exist_ok=True)
    dst = os.path.join(adir, "base_latest.weights.bf16.gz")
    with open(ck, "rb") as fi:
        blob = fi.read()
    # .weights layout: 4 x int32 header ([3] = seen counter,
    # weights_io.py:4), then a raw fp32 field stream
    with gzip.open(dst + ".tmp", "wb", compresslevel=4) as fo:
        fo.write(blob[:16])
        fo.write(_f32_to_bf16_bytes(blob[16:]))
    os.replace(dst + ".tmp", dst)
    import numpy as np

    seen = int(np.frombuffer(blob[:16], dtype=np.int32)[3])
    manifest = {
        "src_name": os.path.basename(ck),
        "seen": seen,
        "codec": "bf16",
        "seed": SEED,
        "style": STYLE,
        "n_train": N_TRAIN,
        "dk_src": DK_SRC,
        "dk_batch": DK_BATCH,
        "saved_at": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open(os.path.join(adir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    log(f"artifact snapshot: {dst} (seen={manifest['seen']})")
    return dst


def restore_base_artifact(root):
    """Seed an empty flagship base backup dir from the repo artifact so the
    run resumes the accumulated schedule. Live checkpoints always win; a
    manifest that does not match the current data recipe is skipped."""
    if TINY:
        return None
    bdir = base_backup_dir(root)
    if latest_weights(bdir):
        return None
    adir = artifact_dir()
    mpath = os.path.join(adir, "manifest.json")
    if not os.path.exists(mpath):
        return None
    manifest = json.load(open(mpath))
    wpath = os.path.join(
        adir, "base_latest.weights.bf16.gz"
        if manifest.get("codec") == "bf16" else "base_latest.weights.gz")
    if not os.path.exists(wpath):
        return None
    # dk_batch deliberately not matched: the sample-keyed seen counter makes
    # the schedule batch-size-portable (resume derives epochs from seen)
    current = {"seed": SEED, "style": STYLE, "n_train": N_TRAIN,
               "dk_src": DK_SRC}
    stale = {k: (manifest.get(k), v) for k, v in current.items()
             if manifest.get(k) != v}
    if stale:
        log(f"artifact skipped (recipe mismatch: {stale})")
        return None
    import gzip

    os.makedirs(bdir, exist_ok=True)
    dst = os.path.join(bdir, manifest.get("src_name", "000000.weights"))
    with gzip.open(wpath, "rb") as fi:
        blob = fi.read()
    if manifest.get("codec") == "bf16":
        blob = blob[:16] + _bf16_bytes_to_f32(blob[16:])
    with open(dst + ".tmp", "wb") as fo:
        fo.write(blob)
    os.replace(dst + ".tmp", dst)
    log(f"artifact restored: {dst} (seen={manifest.get('seen')})")
    return dst


def run_cli(root, name, argv, timeout_s, retries=3, resume_backup=None,
            resume_argpos=None):
    """Run a CLI subprocess with the TPU env; on failure (tunnel crash),
    retry resuming from the newest checkpoint in `resume_backup`."""
    logdir = os.path.join(root, "logs")
    os.makedirs(logdir, exist_ok=True)
    env = dict(os.environ, **TPU_ENV,
               FSD_COMPILE_CACHE=os.path.join(root, "xla_cache"))
    for attempt in range(retries):
        args = list(argv)
        if resume_backup and resume_argpos is not None:
            # resume from the newest full checkpoint even on attempt 0 — a
            # workflow restart must not redo finished epochs from scratch
            ckpt = latest_weights(resume_backup)
            if ckpt:
                log(f"{name}: attempt {attempt} resuming from {ckpt}")
                args[resume_argpos] = ckpt
        logfile = os.path.join(logdir, f"{name}.log")
        log(f"{name}: {' '.join(args)} (log: {logfile})")
        with open(logfile, "a") as lf:
            lf.write(f"\n===== attempt {attempt} {time.ctime()} =====\n")
            lf.flush()
            try:
                p = subprocess.run(args, stdout=lf, stderr=subprocess.STDOUT,
                                   cwd=root, env=env, timeout=timeout_s)
            except subprocess.TimeoutExpired:
                log(f"{name}: TIMEOUT after {timeout_s}s")
                continue
        if p.returncode == 0:
            return True
        log(f"{name}: exit {p.returncode}; sleeping 120s before retry "
            "(tunnel recovery)")
        time.sleep(120)
    return False


def cls_loss_summary(logfile, tail=50, n_cls=15):
    """Mean loss_cls / nGT over the last `tail` loss lines, against the
    uniform-logits baseline ln(n_cls) — pass the episode's class count
    (15 for VOC base, 20 for VOC tuning, 60/80 for the COCO stages)."""
    rows = []
    pat = re.compile(r"nGT (\d+),.* cls ([0-9.]+),")
    with open(logfile) as f:
        for line in f:
            m = pat.search(line)
            if m:
                rows.append((int(m.group(1)), float(m.group(2))))
    rows = rows[-tail:]
    if not rows:
        return None
    per_gt = [c / max(n, 1) for n, c in rows]
    return {"mean_cls_per_gt": sum(per_gt) / len(per_gt),
            "random_cls_per_gt": round(math.log(n_cls), 4),
            "n_lines": len(rows)}


# ---------------------------------------------------------------- stages


def _force_cpu():
    """The driver process does config/codec work only — keep it off the TPU
    tunnel (single-client rule) while its subprocesses own the chip. The
    tunnel's sitecustomize overrides the JAX_PLATFORMS env var, so this must
    be a config update after import."""
    import jax

    jax.config.update("jax_platforms", "cpu")


def stage_data(root):
    _force_cpu()
    from synth import VOC, make_voc_like

    d = make_voc_like(
        os.path.join(root, "voc"), n_images=N_TRAIN + N_TEST,
        size=IMG_SIZE, seed=SEED, style=STYLE, box_range=(0.15, 0.45),
    )
    img_paths = d["img_paths"]
    train_imgs = img_paths[:N_TRAIN]
    test_imgs = img_paths[N_TRAIN:]
    train_list = os.path.join(root, "voc", "train_split.txt")
    test_list = os.path.join(root, "voc", "test_split.txt")
    open(train_list, "w").write("\n".join(train_imgs) + "\n")
    open(test_list, "w").write("\n".join(test_imgs) + "\n")

    # devkit imagesets: score ONLY the held-out split
    test_ids = {os.path.basename(p).split(".")[0] for p in test_imgs}
    main = os.path.join(d["devkit"], "VOC2007", "ImageSets", "Main")
    for fname in os.listdir(main):
        if not fname.endswith("test.txt"):
            continue
        path = os.path.join(main, fname)
        rows = [ln for ln in open(path) if ln.split()[0] in test_ids]
        open(path, "w").writelines(rows)

    # per-class support lists restricted to the TRAIN split (no leakage)
    train_set = set(train_imgs)
    voclist = os.path.join(root, "voc", "voclist")
    os.makedirs(voclist, exist_ok=True)
    traindict = os.path.join(root, "voc", "traindict_trainsplit.txt")
    with open(traindict, "w") as df:
        for cname, lst in d["cls_lists"].items():
            kept = [p for p in open(lst).read().split() if p in train_set]
            out = os.path.join(voclist, f"{cname}_train.txt")
            open(out, "w").write("\n".join(kept) + "\n")
            if kept:
                df.write(f"{cname} {out}\n")

    # data cfgs
    plain_data = os.path.join(root, "plain.data")
    with open(plain_data, "w") as f:
        f.write(
            "metayolo=0\ndata=voc\nneg=0\nrand=0\n"
            f"novel={REPO}/data/voc_novels.txt\nnovelid={NOVELID}\n"
            f"train={train_list}\nvalid={test_list}\n"
            f"names={REPO}/data/voc.names\nbackup={root}/backup_plain\ngpus=0\n"
        )
    base_data = os.path.join(root, "base.data")
    with open(base_data, "w") as f:
        f.write(
            "metayolo=1\nmetain_type=2\ndata=voc\nneg=1\nrand=0\n"
            "tuning=0\nrepeat=1\ndynamic=0\n"
            + ("scale=0\n" if TINY else "")
            + f"novel={REPO}/data/voc_novels.txt\nnovelid={NOVELID}\n"
            f"meta={traindict}\ntrain={train_list}\nvalid={test_list}\n"
            f"backup={root}/backup\ngpus=0\n"
        )
    if not TINY:
        patch_cfg(os.path.join(REPO, "cfg/yolo-voc.cfg"),
                  os.path.join(root, "plain.cfg"), max_batches=PLAIN_BATCHES,
                  batch=32)
    patch_cfg(os.path.join(REPO, DK_SRC),
              os.path.join(root, "dk.cfg"), max_batches=BASE_BATCHES,
              batch=DK_BATCH, steps=DK_STEPS)

    # random-init weights for both graphs
    from fewshot_detection_tpu.config import parse_cfg
    from fewshot_detection_tpu.models import weights_io
    from fewshot_detection_tpu.models.darknet import init_params
    from fewshot_detection_tpu.models.meta import MetaSpec, init_meta_params
    from fewshot_detection_tpu.models.spec import build_spec

    if not TINY:
        pspec = build_spec(parse_cfg(os.path.join(root, "plain.cfg")))
        weights_io.save_weights(os.path.join(root, "plain_init.weights"),
                                [pspec], [init_params(pspec, SEED)], seen=0)
    mspec = MetaSpec(build_spec(parse_cfg(os.path.join(root, "dk.cfg"))),
                     build_spec(parse_cfg(os.path.join(REPO, LN_SRC))))
    mp = init_meta_params(mspec, SEED)
    weights_io.save_weights(os.path.join(root, "meta_init.weights"),
                            [mspec.darknet, mspec.learnet],
                            [mp["darknet"], mp["learnet"]], seen=0)
    mark_done(root, "data",
              {"train": N_TRAIN, "test": N_TEST, "mode": root_mode(),
               "novelid": NOVELID, "seed": SEED})
    log("data stage done")


def stage_plain(root):
    ok = run_cli(
        root, "plain",
        [sys.executable, os.path.join(REPO, "train.py"),
         os.path.join(root, "plain.data"), os.path.join(root, "plain.cfg"),
         os.path.join(root, "plain_init.weights")],
        timeout_s=90 * 60,
        resume_backup=os.path.join(root, f"backup_plain_novel{NOVELID}"),
        resume_argpos=4,
    )
    ckpt = latest_weights(os.path.join(root, f"backup_plain_novel{NOVELID}"))
    assert ok and ckpt, "plain training failed"
    mark_done(root, "plain", {"ckpt": ckpt})


def stage_part(root):
    _force_cpu()
    from partial import partial as partial_fn

    ckpt = latest_weights(os.path.join(root, f"backup_plain_novel{NOVELID}"))
    out = os.path.join(root, "conv23.weights")
    partial_fn(os.path.join(root, "plain.cfg"), ckpt, out, 23)
    assert os.path.exists(out)
    mark_done(root, "part", {"out": out})


def stage_base(root):
    # tiny mode: no plain/part stages — random init (+ FSD_CLIP_NORM),
    # the proven probe recipe; flagship: the extracted backbone.
    init_w = os.path.join(root,
                          "meta_init.weights" if TINY else "conv23.weights")
    bdir = base_backup_dir(root)
    # cross-round schedule accumulation: seed an empty backup dir from the
    # repo-tracked artifact (run_cli's resume then picks it up)
    restore_base_artifact(root)
    ok = run_cli(
        root, "base",
        [sys.executable, os.path.join(REPO, "train_meta.py"),
         os.path.join(root, "base.data"), os.path.join(root, "dk.cfg"),
         os.path.join(REPO, LN_SRC), init_w],
        timeout_s=170 * 60,
        resume_backup=bdir,
        resume_argpos=5,
    )
    ckpt = latest_weights(bdir)
    assert ok and ckpt, "base meta training failed"
    summary = cls_loss_summary(os.path.join(root, "logs", "base.log"), n_cls=15)
    mark_done(root, "base", {"ckpt": ckpt, "cls": summary})
    snapshot_base_artifact(root)
    log(f"base stage done: {summary}")


def _fewlists_full_budget(sample_fn, classes, shot,
                          seeds=None,
                          class_pools=None):
    """Run a k-shot list sampler until every class reaches at least `shot`
    boxes (counting boxes, not images). A short-filled class would make the
    dynamic-tune fewset builder (lists.build_fewset) loop forever for novel
    classes, whose images are excluded from its growth pool.

    class_pools: optional {class_name: [image paths]} — when the sampler's
    box-budgeted draw leaves a class short (small synthetic pools), top it
    up from that class's own list; other classes may overshoot their k-shot
    budget, which build_fewset tolerates (only >= matters)."""
    if seeds is None:
        # key the retry chain on the workflow --seed so seed sweeps draw
        # genuinely different k-shot lists
        seeds = (2018 + SEED, SEED, 99 + SEED, 1234 + SEED, 4242 + SEED)
    import numpy as np

    from fewshot_detection_tpu.data.datasets import get_labpath

    def nboxes(flist, cid):
        total = 0
        for p in flist:
            rows = np.loadtxt(get_labpath(p.strip())).reshape(-1, 5)
            total += int((rows[:, 0].astype(int) == cid).sum())
        return total

    best = None
    for seed in seeds:
        try:
            lists = sample_fn(seed)
        except AssertionError as e:  # coco_prep's 0.8*shot floor
            log(f"fewlist seed {seed} failed: {e}")
            continue
        counts = [nboxes(flist, ci) for ci, flist in enumerate(lists)]
        if all(c >= shot for c in counts):
            log(f"fewlist seed {seed}: per-class boxes {counts}")
            return lists
        short = {classes[i]: c for i, c in enumerate(counts) if c < shot}
        log(f"fewlist seed {seed} under-filled {short}")
        if best is None or len(short) < best[0]:
            best = (len(short), lists, counts)

    if class_pools:
        if best is not None:
            _, lists, counts = best
        else:
            # every seed tripped the sampler's own floor (tiny pools) —
            # build the lists entirely from the per-class pools
            lists = [[] for _ in classes]
            counts = [0] * len(classes)
        for ci, cname in enumerate(classes):
            pool = [p.strip() for p in class_pools.get(cname, [])]
            have = {p.strip() for p in lists[ci]}
            for p in pool:
                if counts[ci] >= shot:
                    break
                if p in have:
                    continue
                add = nboxes([p], ci)
                if add:
                    lists[ci].append(p + "\n")
                    counts[ci] += add
        if all(c >= shot for c in counts):
            log(f"fewlist: topped up short classes from per-class pools; "
                f"per-class boxes {counts}")
            return lists
    raise RuntimeError(f"k-shot sampling failed for every seed in {seeds}")


def stage_few(root):
    from fewshot_detection_tpu.data.prep import VOC_CLASSES, get_bbox_fewlist

    voclist = os.path.join(root, "voc", "voclist")
    # A short-filled NOVEL class would make the dynamic-tune fewset builder
    # (lists.build_fewset) unfillable — novel-class images are excluded
    # from its growth pool — so retry seeds until every class hits the full
    # k-shot BOX budget.
    lists = _fewlists_full_budget(
        lambda seed: get_bbox_fewlist(
            os.path.join(root, "voc", "train_split.txt"), SHOT, VOC_CLASSES,
            seed=seed),
        VOC_CLASSES, SHOT)
    fewdict = os.path.join(root, "voc", f"voc_traindict_bbox_{SHOT}shot.txt")
    with open(fewdict, "w") as df:
        for cname, flist in zip(VOC_CLASSES, lists):
            out = os.path.join(voclist, f"box_{SHOT}shot_{cname}_train.txt")
            with open(out, "w") as f:
                f.writelines(flist)
            df.write(f"{cname} {out}\n")

    tune_data = os.path.join(root, "tune.data")
    with open(tune_data, "w") as f:
        f.write(
            "metayolo=1\nmetain_type=2\ndata=voc\nneg=0\nrand=0\n"
            f"tuning=1\nmax_epoch={TUNE_MAX_EPOCH}\nrepeat={TUNE_REPEAT}\n"
            f"dynamic=1\nscale={TUNE_SCALE}\n"
            f"novel={REPO}/data/voc_novels.txt\nnovelid={NOVELID}\n"
            f"meta={fewdict}\ntrain={root}/voc/train_split.txt\n"
            f"valid={root}/voc/test_split.txt\nbackup={root}/backup_tune\ngpus=0\n"
        )
    mark_done(root, "few", {"dict": fewdict})


def stage_tune(root):
    base_ckpt = json.load(open(done_marker(root, "base")))["ckpt"]
    # tuning backup dir gets the settings mangle: [fix]_novel0_neg0 — the
    # exact name (shared with run_cli's resume), NOT a prefix glob that
    # could pick a stale mixed-mode dir
    bdir = tune_backup_dir(root)
    ok = run_cli(
        root, "tune",
        [sys.executable, os.path.join(REPO, "train_meta.py"),
         os.path.join(root, "tune.data"), os.path.join(root, "dk.cfg"),
         os.path.join(REPO, LN_SRC), base_ckpt],
        timeout_s=100 * 60,
        resume_backup=bdir,
        resume_argpos=5,
    )
    ckpt = latest_weights(bdir) if os.path.isdir(bdir) else None
    assert ok and ckpt, "tuning failed"
    summary = cls_loss_summary(os.path.join(root, "logs", "tune.log"), n_cls=20)
    mark_done(root, "tune", {"ckpt": ckpt, "cls": summary})
    log(f"tune stage done: {summary}")


def _eval(root, name, datacfg, ckpt):
    """valid_ensemble sweep + VOC07 scoring in a subprocess (tunnel client)."""
    script = os.path.join(root, f"eval_{name}.py")
    with open(script, "w") as f:
        f.write(f"""
import json, os, sys
sys.path.insert(0, {REPO!r})
from fewshot_detection_tpu.cli.common import resolve_configs
from fewshot_detection_tpu.eval.valid import run_valid_ensemble
from fewshot_detection_tpu.eval.voc_eval import do_python_eval

os.chdir({root!r})
data_options, dk, ln, settings = resolve_configs(
    {datacfg!r}, os.path.join({root!r}, "dk.cfg"),
    os.path.join({REPO!r}, {LN_SRC!r}))
prefix = run_valid_ensemble(data_options, dk, ln, {ckpt!r}, settings)
result = do_python_eval(
    prefix + "/comp4_det_test_",
    devkit_path=os.path.join({root!r}, "voc", "VOCdevkit"),
    novel=True, novel_file=os.path.join({REPO!r}, "data/voc_novels.txt"),
    novelid=str({NOVELID!r}))
print("EVALJSON " + json.dumps({{
    "stage": {name!r},
    "mean_ap": round(float(result["mean"]), 4),
    "base_mean": round(float(result.get("base_mean", 0.0)), 4),
    "novel_mean": round(float(result.get("novel_mean", 0.0)), 4),
    "aps": {{c: round(float(a), 4) for c, a in result["ap"].items()}},
    "checkpoint": {ckpt!r}}}))
""")
    env_extra = {"FSD_EVAL_BATCH": "16", "FSD_DEVICE_NMS": "1"}
    os.environ.update(env_extra)
    ok = run_cli(root, f"eval_{name}", [sys.executable, script],
                 timeout_s=120 * 60, retries=2)
    for k in env_extra:
        os.environ.pop(k, None)
    assert ok, f"eval {name} failed"
    out = None
    for line in open(os.path.join(root, "logs", f"eval_{name}.log")):
        if line.startswith("EVALJSON "):
            out = json.loads(line[len("EVALJSON "):])
    assert out, "no EVALJSON line"
    return out


def stage_evalb(root):
    ckpt = json.load(open(done_marker(root, "base")))["ckpt"]
    res = _eval(root, "base", os.path.join(root, "base.data"), ckpt)
    mark_done(root, "evalb", res)
    log(f"base eval: {res}")


def stage_evalt(root):
    ckpt = json.load(open(done_marker(root, "tune")))["ckpt"]
    res = _eval(root, "tune", os.path.join(root, "tune.data"), ckpt)
    mark_done(root, "evalt", res)
    log(f"tuned eval: {res}")


STAGES = [
    ("data", stage_data), ("plain", stage_plain), ("part", stage_part),
    ("base", stage_base), ("few", stage_few), ("tune", stage_tune),
    ("evalb", stage_evalb), ("evalt", stage_evalt),
]


def main():
    global STYLE, N_TRAIN, N_TEST, IMG_SIZE
    global PLAIN_BATCHES, BASE_BATCHES, TUNE_MAX_EPOCH, TUNE_REPEAT
    global TINY, DK_SRC, LN_SRC, DK_BATCH, DK_STEPS, TUNE_SCALE, SEED
    global NOVELID
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=None,
                    help="workflow root (default: /tmp/fsd_flagship, or "
                    "/tmp/fsd_tiny with --tiny — separate defaults so the "
                    "two modes never share a root by accident)")
    ap.add_argument("--stage", default=None,
                    help="run only this stage (default: all remaining)")
    ap.add_argument("--reset-from", default=None,
                    help="clear done markers + outputs from this stage on, "
                    "then run (keeps earlier stages, e.g. plain/conv23)")
    ap.add_argument("--style", default=None,
                    help=f"synthetic class style (default {STYLE})")
    ap.add_argument("--n-train", type=int, default=None,
                    help="train-pool size; smaller pools trade diversity "
                    "for epochs under a fixed batch budget")
    ap.add_argument("--n-test", type=int, default=None)
    ap.add_argument("--plain-batches", type=int, default=None)
    ap.add_argument("--base-batches", type=int, default=None)
    ap.add_argument("--tune-max-epoch", type=int, default=None)
    ap.add_argument("--tune-repeat", type=int, default=None)
    ap.add_argument("--snapshot-artifact", action="store_true",
                    help="snapshot the newest flagship base checkpoint into "
                    "the repo artifacts/ dir and exit (safe to run while a "
                    "training subprocess holds the tunnel)")
    ap.add_argument("--novelid", type=int, default=None,
                    help="novel split 0-4 from data/voc_novels.txt "
                    "(default 0); changes which classes are masked during "
                    "base training and scored as novel")
    ap.add_argument("--seed", type=int, default=None,
                    help="synthetic-data/init/fewlist seed (default 7); "
                    "run several seeds in separate roots for mean+-std")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny cfgs (128px, cfg/tiny_*) at the scale where "
                    "compressed-schedule streaming learning is proven — "
                    "demonstrates the few-shot tuning delta with signal; "
                    "plain/part are skipped (base trains from random init)")
    args = ap.parse_args()
    if args.tiny:
        TINY = True
        DK_SRC = "cfg/tiny_darknet_dynamic.cfg"
        LN_SRC = "cfg/tiny_reweighting.cfg"
        DK_BATCH = 4          # the proven probe batch size
        # keep full LR after a short warmup; the shipped tiny cfg decays
        # x100 by batch 80, starving anything longer than a smoke test
        DK_STEPS = "-1,20,40000,60000"
        TUNE_SCALE = 0
        IMG_SIZE = (128, 128)
        N_TRAIN, N_TEST = 384, 96
        BASE_BATCHES = 2400   # 4x the proven 600-batch probe (more images)
        TUNE_MAX_EPOCH = 10
        TUNE_REPEAT = 20
    if args.style:
        STYLE = args.style
    if args.n_train:
        N_TRAIN = args.n_train
    if args.n_test:
        N_TEST = args.n_test
    if args.plain_batches:
        PLAIN_BATCHES = args.plain_batches
    if args.base_batches:
        BASE_BATCHES = args.base_batches
    if args.tune_max_epoch:
        TUNE_MAX_EPOCH = args.tune_max_epoch
    if args.tune_repeat:
        TUNE_REPEAT = args.tune_repeat
    if args.seed is not None:
        SEED = args.seed
    if args.novelid is not None:
        NOVELID = args.novelid
    if args.root is None:
        args.root = "/tmp/fsd_tiny" if TINY else "/tmp/fsd_flagship"
        if args.seed is not None:
            args.root += f"_s{SEED}"
        if NOVELID != 0:
            args.root += f"_n{NOVELID}"
    os.makedirs(args.root, exist_ok=True)

    stages = [(n, f) for n, f in STAGES
              if not (TINY and n in ("plain", "part"))]

    if args.reset_from:
        names = [n for n, _ in stages]
        idx = names.index(args.reset_from)
        import shutil

        for name in names[idx:]:
            m = done_marker(args.root, name)
            if os.path.exists(m):
                os.remove(m)
        # clear BOTH mangled variants (backup[fix]_, backup_tune[fix]_) so a
        # reset stage retrains instead of silently resuming a stale run;
        # backup_plain_novel0 (no _neg mangle) survives base-level resets
        import glob as _glob

        tune_dirs = _glob.glob(os.path.join(args.root, "backup_tune*_novel*_*"))
        base_dirs = [d for d in
                     _glob.glob(os.path.join(args.root, "backup*_novel*_*"))
                     if d not in tune_dirs]
        doomed = []
        if args.reset_from in ("data", "plain", "base"):
            doomed = base_dirs + tune_dirs + [os.path.join(args.root, "results")]
        elif args.reset_from in ("few", "tune"):
            doomed = tune_dirs + [os.path.join(args.root, "results")]
        for sub in doomed:
            shutil.rmtree(sub, ignore_errors=True)
        log(f"reset stages from {args.reset_from}: {names[idx:]}"
            + (f" (cleared {[os.path.basename(d) for d in doomed]})"
               if doomed else ""))

    # fail fast on tiny/flagship mode mixing: reusing a root whose data
    # stage was built in the other mode would train the wrong cfgs and only
    # assert after a full training run
    prev_mode = recorded_mode(args.root)
    if prev_mode is not None and prev_mode != root_mode():
        raise SystemExit(
            f"root {args.root} was built in {prev_mode} mode but this "
            f"invocation is {root_mode()}; use a different --root or "
            f"--reset-from data"
        )
    data_m = done_marker(args.root, "data")
    if os.path.exists(data_m):
        prev = json.load(open(data_m))
        if prev.get("novelid", 0) != NOVELID:
            raise SystemExit(
                f"root {args.root} was built with novelid "
                f"{prev.get('novelid', 0)} but this invocation is "
                f"{NOVELID}; base.data's class mask would be stale — use a "
                f"different --root or --reset-from data"
            )

    if args.snapshot_artifact:
        snapshot_base_artifact(args.root)
        return

    for name, fn in stages:
        if args.stage and name != args.stage:
            continue
        if is_done(args.root, name) and not args.stage:
            log(f"{name}: already done, skipping")
            continue
        log(f"=== stage {name} ===")
        fn(args.root)

    summary = {}
    for name, _ in stages:
        if is_done(args.root, name):
            summary[name] = json.load(open(done_marker(args.root, name)))
    print("WORKFLOW " + json.dumps(summary))


if __name__ == "__main__":
    main()
