"""Backup-dir mangles + mode bookkeeping of the workflow driver.

Round-4 advisor findings: stage_tune resumed from the unmangled dir in
--tiny mode (scale=0 inserts 'fix' — settings.py backup rules, reference
cfg.py:130-147), --reset-from left the 'fix'-mangled dirs alive so a reset
stage silently resumed stale weights, and tiny/flagship mode mixing in one
root was undetected until a late assert. These pin the fixed behavior.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import full_workflow as wf


def test_backup_dirs_follow_scale_mangle(monkeypatch):
    monkeypatch.setattr(wf, "TINY", False)
    monkeypatch.setattr(wf, "TUNE_SCALE", 1)
    assert wf.base_backup_dir("/r") == "/r/backup_novel0_neg1"
    assert wf.tune_backup_dir("/r") == "/r/backup_tune_novel0_neg0"

    monkeypatch.setattr(wf, "TINY", True)
    monkeypatch.setattr(wf, "TUNE_SCALE", 0)
    assert wf.base_backup_dir("/r") == "/r/backupfix_novel0_neg1"
    assert wf.tune_backup_dir("/r") == "/r/backup_tunefix_novel0_neg0"


def test_tune_dir_matches_settings_mangle(monkeypatch, tmp_path):
    """The helper must agree with what Settings actually mangles for the
    tune.data the workflow writes (scale=0 path)."""
    from fewshot_detection_tpu.config.settings import Settings

    opts = {
        "metayolo": "1", "data": "voc", "neg": "0", "rand": "0",
        "tuning": "1", "max_epoch": "10", "repeat": "20", "scale": "0",
        "meta": "box_10shot.txt", "novelid": "0",
        "backup": str(tmp_path / "backup_tune"), "gpus": "0",
    }
    s = Settings.configure(opts)
    monkeypatch.setattr(wf, "TUNE_SCALE", 0)
    assert s.backup == wf.tune_backup_dir(str(tmp_path))


def test_artifact_snapshot_restore_roundtrip(tmp_path, monkeypatch):
    """Flagship base checkpoints must survive rounds via the repo artifacts
    dir: snapshot gzips the newest full checkpoint + manifest; restore seeds
    an EMPTY backup dir byte-identically, skips when live checkpoints exist
    or the data recipe changed."""
    import numpy as np

    monkeypatch.setattr(wf, "TINY", False)
    monkeypatch.setattr(wf, "ARTIFACTS", str(tmp_path / "artifacts"))
    root = str(tmp_path / "root")
    bdir = wf.base_backup_dir(root)
    os.makedirs(bdir)
    header = np.array([0, 2, 0, 12345], np.int32)
    payload = np.arange(100, dtype=np.float32)
    with open(os.path.join(bdir, "000040.weights"), "wb") as f:
        header.tofile(f)
        payload.tofile(f)

    dst = wf.snapshot_base_artifact(root)
    assert dst and os.path.exists(dst)
    manifest = json.load(open(os.path.join(wf.artifact_dir(),
                                           "manifest.json")))
    assert manifest["seen"] == 12345
    assert manifest["src_name"] == "000040.weights"

    # restore into a fresh root
    root2 = str(tmp_path / "root2")
    os.makedirs(root2)
    got = wf.restore_base_artifact(root2)
    assert got and got.endswith("000040.weights")
    assert open(got, "rb").read() == open(
        os.path.join(bdir, "000040.weights"), "rb").read()

    # live checkpoints win: restoring again is a no-op
    assert wf.restore_base_artifact(root2) is None

    # recipe mismatch skips
    root3 = str(tmp_path / "root3")
    os.makedirs(root3)
    monkeypatch.setattr(wf, "SEED", wf.SEED + 1)
    assert wf.restore_base_artifact(root3) is None

    # tiny mode never snapshots or restores
    monkeypatch.setattr(wf, "TINY", True)
    assert wf.snapshot_base_artifact(root) is None


def test_recorded_mode_roundtrip(tmp_path, monkeypatch):
    root = str(tmp_path)
    assert wf.recorded_mode(root) is None

    os.makedirs(os.path.join(root, "state"))
    with open(wf.done_marker(root, "data"), "w") as f:
        json.dump({"mode": "tiny"}, f)
    assert wf.recorded_mode(root) == "tiny"

    # pre-mode-marker roots: inferred from base.data scale=0
    with open(wf.done_marker(root, "data"), "w") as f:
        json.dump({}, f)
    with open(os.path.join(root, "base.data"), "w") as f:
        f.write("metayolo=1\nscale=0\n")
    assert wf.recorded_mode(root) == "tiny"
    with open(os.path.join(root, "base.data"), "w") as f:
        f.write("metayolo=1\n")
    assert wf.recorded_mode(root) == "flagship"
