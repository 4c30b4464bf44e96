"""Cross-round artifact snapshot/restore: bf16-cast .weights roundtrip.

The flagship base schedule accumulates across rounds through a repo-tracked
artifact (scripts/full_workflow.py snapshot_base_artifact /
restore_base_artifact): header preserved bit-exact (incl. the seen counter,
weights_io.py:4), payload stored as round-to-nearest-even bf16 and restored
as the corresponding fp32.
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import full_workflow as wf  # noqa: E402


def _rne_bf16_f32(x):
    u = x.view(np.uint32)
    r = ((u.astype(np.uint64) + 0x7FFF + ((u >> 16) & 1)) >> 16).astype(
        np.uint32) << 16
    return r.astype(np.uint32).view(np.float32)


def test_bf16_snapshot_roundtrip(tmp_path, monkeypatch):
    rng = np.random.RandomState(0)
    payload = rng.randn(4096).astype(np.float32)
    header = np.array([0, 2, 0, 123456], dtype=np.int32)  # seen=123456
    root = tmp_path / "root"
    bdir = root / "backup_novel0_neg1"
    bdir.mkdir(parents=True)
    src = bdir / "000060.weights"
    src.write_bytes(header.tobytes() + payload.tobytes())

    monkeypatch.setattr(wf, "ARTIFACTS", str(tmp_path / "artifacts"))
    monkeypatch.setattr(wf, "TINY", False)
    monkeypatch.setattr(wf, "NOVELID", 0)

    dst = wf.snapshot_base_artifact(str(root))
    assert dst and dst.endswith(".bf16.gz") and os.path.exists(dst)

    # restore into a FRESH root (the cross-round scenario)
    root2 = tmp_path / "root2"
    (root2 / "backup_novel0_neg1").mkdir(parents=True)
    out = wf.restore_base_artifact(str(root2))
    assert out and os.path.basename(out) == "000060.weights"
    blob = open(out, "rb").read()
    assert np.frombuffer(blob[:16], np.int32)[3] == 123456
    got = np.frombuffer(blob[16:], np.float32)
    want = _rne_bf16_f32(payload)
    assert np.array_equal(got, want)
    # bf16 cast is within 2^-8 relative of the source
    assert np.max(np.abs(got - payload) / np.maximum(np.abs(payload), 1e-9)) < 2 ** -8

    # a live checkpoint in the backup dir wins over the artifact
    assert wf.restore_base_artifact(str(root2)) is None

    # recipe mismatch is refused
    root3 = tmp_path / "root3"
    (root3 / "backup_novel0_neg1").mkdir(parents=True)
    monkeypatch.setattr(wf, "SEED", wf.SEED + 1)
    assert wf.restore_base_artifact(str(root3)) is None
