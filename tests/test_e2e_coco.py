"""COCO-protocol end-to-end slice (VERDICT r1 item 8).

Mirrors test_e2e.py on a synthetic COCO-layout tree: images/train2014 +
labels_1c/train2014/<class>/ paths, `data=coco` settings (80-name universe,
60-base protocol via coco_novels line 2, save_interval 2, factor-4 support
sampling — cfg.py:84-101, dataset.py:479-488 in the reference). Drives the
real train_meta CLI then run_valid_ensemble and checks the result files.
"""

import os

import numpy as np
import pytest

from synth import load_coco_names, make_coco_like

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e_coco")

    # resolve the 60-base / 20-novel split exactly as settings will
    from fewshot_detection_tpu.config.settings import get_novels

    names = load_coco_names()
    novels = get_novels(os.path.join(REPO, "data/coco_novels.txt"), "2")
    base_ids = [i for i, n in enumerate(names) if n not in novels]
    assert len(base_ids) == 60

    d = make_coco_like(str(root / "coco"), base_ids, seed=0, n_train=8)

    # tiny cfgs at 64px with a 2-epoch schedule
    dk_cfg = str(root / "tiny_dd.cfg")
    with open(os.path.join(REPO, "cfg/tiny_darknet_dynamic.cfg")) as f:
        txt = (f.read().replace("max_batches=100", "max_batches=3")
               .replace("height=128", "height=64")
               .replace("width=128", "width=64"))
    with open(dk_cfg, "w") as f:
        f.write(txt)
    ln_cfg = str(root / "tiny_rw.cfg")
    with open(os.path.join(REPO, "cfg/tiny_reweighting.cfg")) as f:
        txt = f.read().replace("height=128", "height=64").replace(
            "width=128", "width=64")
    with open(ln_cfg, "w") as f:
        f.write(txt)

    datacfg = str(root / "metacoco.data")
    with open(datacfg, "w") as f:
        f.write(
            "metayolo=1\nmetain_type=2\ndata=coco\nneg=1\nrand=0\n"
            f"novel={REPO}/data/coco_novels.txt\nnovelid=2\n"
            f"meta={d['traindict']}\ntrain={d['train_list']}\n"
            f"valid={d['valid_list']}\nbackup={root}/backup\ngpus=0\n"
        )

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
    return {"root": str(root), "data": d, "datacfg": datacfg,
            "dk_cfg": dk_cfg, "ln_cfg": ln_cfg, "init_w": init_w,
            "base": [names[i] for i in base_ids]}


def test_coco_settings_protocol(workspace):
    """data=coco resolves the 60-base protocol, save_interval 2, and
    factor-4 support sampling (cfg.py:84-101 semantics)."""
    from fewshot_detection_tpu.cli.common import resolve_configs
    from fewshot_detection_tpu.data.datasets import MetaDataset

    ws = workspace
    _, _, _, settings = resolve_configs(ws["datacfg"], ws["dk_cfg"], ws["ln_cfg"])
    assert settings.data == "coco"
    assert len(settings.classes) == 80
    assert len(settings.base_classes) == 60
    assert settings.save_interval == 2

    ms = MetaDataset(ws["data"]["traindict"], settings, train=True,
                     num_replicas=1)
    assert list(ms.classes) == ws["base"]
    # factor 4: nbatch = 4*500*64/batch_size class-major blocks
    assert len(ms.inds) == 60 * (4 * 500 * 64 // settings.batch_size)


def test_coco_e2e_train_valid_result_files(workspace):
    from fewshot_detection_tpu.cli.common import resolve_configs
    from fewshot_detection_tpu.cli.train_meta_cli import main as train_main
    from fewshot_detection_tpu.eval.valid import run_valid_ensemble

    ws = workspace
    train_main(ws["datacfg"], ws["dk_cfg"], ws["ln_cfg"], ws["init_w"])

    backupdir = f"{ws['root']}/backup_novel2_neg1"
    ckpts = sorted(f for f in os.listdir(backupdir) if f.endswith(".weights"))
    assert ckpts, "no checkpoints saved"
    ckpt = os.path.join(backupdir, ckpts[-1])

    cwd = os.getcwd()
    os.chdir(ws["root"])
    try:
        data_options, darknet, learnet, settings = resolve_configs(
            ws["datacfg"], ws["dk_cfg"], ws["ln_cfg"]
        )
        prefix = run_valid_ensemble(
            data_options, darknet, learnet, ckpt, settings
        )
        files = os.listdir(prefix)
        # one result file per base class (coco ensemble evaluates the
        # 60-base set, datasets.py MetaDataset eval-mode class selection)
        assert len(files) == 60
        rows = 0
        for fn in files:
            assert fn.startswith("comp4_det_test_")
            with open(os.path.join(prefix, fn)) as f:
                for line in f:
                    parts = line.split()
                    assert len(parts) == 6  # imgid prob x1 y1 x2 y2
                    float(parts[1])
                    rows += 1
        assert rows > 0
    finally:
        os.chdir(cwd)
