"""End-to-end slice: train a tiny meta detector on a synthetic VOC-like set
through the real CLIs' code paths, sweep validation, and score mAP —
the full reference workflow (README.md train->valid->voc_eval) in miniature.
"""

import os
import shutil

import numpy as np
import pytest

from synth import make_voc_like

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    d = make_voc_like(str(root / "voc"), n_images=24, seed=0)

    # tiny cfgs with a short schedule
    dk_cfg = str(root / "tiny_dd.cfg")
    with open(os.path.join(REPO, "cfg/tiny_darknet_dynamic.cfg")) as f:
        txt = f.read().replace("max_batches=100", "max_batches=8")
    with open(dk_cfg, "w") as f:
        f.write(txt)
    ln_cfg = os.path.join(REPO, "cfg/tiny_reweighting.cfg")

    # tuning-mode meta dict (save_interval=1); tuning derives the shot count
    # from the meta filename, so the dict file must carry a 'Nshot' suffix
    shot_dict = str(root / "traindict_3shot.txt")
    shutil.copy(d["traindict"], shot_dict)

    datacfg = str(root / "meta.data")
    with open(datacfg, "w") as f:
        f.write(
            "metayolo=1\nmetain_type=2\ndata=voc\nneg=1\nrand=0\n"
            "tuning=1\nmax_epoch=2\nrepeat=1\ndynamic=0\n"
            f"novel={REPO}/data/voc_novels.txt\nnovelid=0\n"
            f"meta={shot_dict}\ntrain={d['train_list']}\n"
            f"valid={d['train_list']}\nbackup={root}/backup\ngpus=0\n"
        )

    # random-init starting weights
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
    return {
        "root": str(root),
        "data": d,
        "datacfg": datacfg,
        "dk_cfg": dk_cfg,
        "ln_cfg": ln_cfg,
        "init_w": init_w,
    }


def test_e2e_train_valid_map(workspace):
    from fewshot_detection_tpu.cli.common import resolve_configs
    from fewshot_detection_tpu.cli.train_meta_cli import main as train_main
    from fewshot_detection_tpu.eval.valid import run_valid_ensemble
    from fewshot_detection_tpu.eval.voc_eval import do_python_eval

    ws = workspace
    # --- train (2 epochs of 6 batches through the real CLI driver) ---
    train_main(ws["datacfg"], ws["dk_cfg"], ws["ln_cfg"], ws["init_w"])

    backupdir = f"{ws['root']}/backup_novel0_neg1"
    ckpts = sorted(os.listdir(backupdir))
    assert ckpts, "no checkpoints saved"
    ckpt = os.path.join(backupdir, ckpts[-1])

    # --- validation sweep with ensemble class codes ---
    cwd = os.getcwd()
    os.chdir(ws["root"])
    try:
        data_options, darknet, learnet, settings = resolve_configs(
            ws["datacfg"], ws["dk_cfg"], ws["ln_cfg"]
        )
        prefix = run_valid_ensemble(
            data_options, darknet, learnet, ckpt, settings
        )
        # one result file per class, reference row format
        files = os.listdir(prefix)
        assert len(files) == 20
        rows = 0
        for fn in files:
            with open(os.path.join(prefix, fn)) as f:
                for line in f:
                    parts = line.split()
                    assert len(parts) == 6
                    float(parts[1])
                    rows += 1

        # --- mAP scoring against the synthetic devkit ---
        result = do_python_eval(
            prefix + "/comp4_det_test_",
            devkit_path=ws["data"]["devkit"],
            novel=True,
            novel_file=os.path.join(REPO, "data/voc_novels.txt"),
        )
        assert 0.0 <= result["mean"] <= 1.0
        assert "base_mean" in result and "novel_mean" in result
    finally:
        os.chdir(cwd)
