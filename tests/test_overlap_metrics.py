"""FSD_OVERLAP_METRICS=1 (one-step-delayed metrics fetch) is a pure
pipelining change: same loss lines, same checkpoints.

The overlapped path dispatches step i+1 before blocking on step i's loss
scalars so the metrics round-trip (700-1400 ms through the remote TPU
tunnel) overlaps the next step's host prep + H2D. Training math must be
untouched: this pins printed loss lines and the final checkpoint bytes
against the serial path on an identical seeded run.
"""

import os
import shutil

import pytest

from synth import make_voc_like

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("overlap")
    d = make_voc_like(str(root / "voc"), n_images=24, seed=0)

    dk_cfg = str(root / "tiny_dd.cfg")
    with open(os.path.join(REPO, "cfg/tiny_darknet_dynamic.cfg")) as f:
        txt = f.read().replace("max_batches=100", "max_batches=6")
    with open(dk_cfg, "w") as f:
        f.write(txt)
    ln_cfg = os.path.join(REPO, "cfg/tiny_reweighting.cfg")

    shot_dict = str(root / "traindict_3shot.txt")
    shutil.copy(d["traindict"], shot_dict)

    from fewshot_detection_tpu.config import parse_cfg
    from fewshot_detection_tpu.models import weights_io
    from fewshot_detection_tpu.models.meta import MetaSpec, init_meta_params
    from fewshot_detection_tpu.models.spec import build_spec

    spec = MetaSpec(build_spec(parse_cfg(dk_cfg)), build_spec(parse_cfg(ln_cfg)))
    params = init_meta_params(spec, 0)
    init_w = str(root / "init.weights")
    weights_io.save_weights(
        init_w, [spec.darknet, spec.learnet],
        [params["darknet"], params["learnet"]], seen=0,
    )
    return {"root": str(root), "d": d, "dk_cfg": dk_cfg, "ln_cfg": ln_cfg,
            "init_w": init_w, "shot_dict": shot_dict}


def _run(ws, tag, overlap, monkeypatch, capsys):
    import time as _time

    root = ws["root"]
    datacfg = os.path.join(root, f"meta_{tag}.data")
    backup = os.path.join(root, f"backup_{tag}")
    with open(datacfg, "w") as f:
        f.write(
            "metayolo=1\nmetain_type=2\ndata=voc\nneg=1\nrand=0\n"
            "tuning=1\nmax_epoch=2\nrepeat=1\ndynamic=0\n"
            f"novel={REPO}/data/voc_novels.txt\nnovelid=0\n"
            f"meta={ws['shot_dict']}\ntrain={ws['d']['train_list']}\n"
            f"valid={ws['d']['train_list']}\nbackup={backup}\ngpus=0\n"
        )
    monkeypatch.setenv("FSD_OVERLAP_METRICS", "1" if overlap else "0")
    # the CLI seeds its episode/augment RNG from time.time — pin it so the
    # serial and overlapped runs draw identical episode streams
    monkeypatch.setattr(_time, "time", lambda: 1234567890.0)

    from fewshot_detection_tpu.cli.train_meta_cli import main as train_main

    train_main(datacfg, ws["dk_cfg"], ws["ln_cfg"], ws["init_w"])
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if ": nGT" in ln]
    bdir = backup + "_novel0_neg1"
    ckpts = sorted(os.listdir(bdir))
    assert ckpts, f"no checkpoints in {bdir}"
    with open(os.path.join(bdir, ckpts[-1]), "rb") as f:
        blob = f.read()
    return lines, blob


def test_overlap_is_pure_pipelining(workspace, monkeypatch, capsys):
    serial_lines, serial_ckpt = _run(workspace, "serial", False,
                                     monkeypatch, capsys)
    overlap_lines, overlap_ckpt = _run(workspace, "overlap", True,
                                       monkeypatch, capsys)
    assert len(serial_lines) == 12  # 2 epochs x 6 batches, none dropped
    assert overlap_lines == serial_lines
    assert overlap_ckpt == serial_ckpt
