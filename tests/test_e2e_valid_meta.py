"""valid_meta flow (per-batch support codes) on the synthetic set."""

import os
import shutil

import pytest

from synth import make_voc_like

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_valid_meta_sweep(tmp_path):
    d = make_voc_like(str(tmp_path / "voc"), n_images=24, seed=11)
    dk_cfg = str(tmp_path / "tiny_dd.cfg")
    with open(os.path.join(REPO, "cfg/tiny_darknet_dynamic.cfg")) as f:
        open(dk_cfg, "w").write(f.read())
    ln_cfg = os.path.join(REPO, "cfg/tiny_reweighting.cfg")
    datacfg = str(tmp_path / "m.data")
    with open(datacfg, "w") as f:
        f.write(
            "metayolo=1\nmetain_type=2\ndata=voc\nneg=1\nrand=0\n"
            f"novel={REPO}/data/voc_novels.txt\nnovelid=0\n"
            f"meta={d['traindict']}\ntrain={d['train_list']}\n"
            f"valid={d['train_list']}\nbackup={tmp_path}/backup\ngpus=0\n"
        )

    from fewshot_detection_tpu.cli.common import resolve_configs
    from fewshot_detection_tpu.config import parse_cfg
    from fewshot_detection_tpu.eval.valid import run_valid_meta
    from fewshot_detection_tpu.models import weights_io
    from fewshot_detection_tpu.models.meta import MetaSpec, init_meta_params
    from fewshot_detection_tpu.models.spec import build_spec

    spec = MetaSpec(build_spec(parse_cfg(dk_cfg)), build_spec(parse_cfg(ln_cfg)))
    params = init_meta_params(spec, 0)
    w = str(tmp_path / "init.weights")
    weights_io.save_weights(
        w, [spec.darknet, spec.learnet],
        [params["darknet"], params["learnet"]], seen=0,
    )

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        data_options, darknet, learnet, settings = resolve_configs(
            datacfg, dk_cfg, ln_cfg
        )
        prefix = run_valid_meta(data_options, darknet, learnet, w, settings)
        files = os.listdir(prefix)
        assert len(files) == 20  # eval mode covers all classes
        for fn in files:
            with open(os.path.join(prefix, fn)) as f:
                for line in f:
                    assert len(line.split()) == 6
    finally:
        os.chdir(cwd)
