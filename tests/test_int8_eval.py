"""FSD_INT8=1 routes the full ensemble eval sweep through int8 serving.

The int8 path's throughput was benchmarked in round 4 (1.64x bf16); this
covers the missing accuracy half of the trade: the sweep must run through
the reference eval contract (valid_ensemble.py:137-178) end to end with
quantized backbone + head, producing scoreable result files.
"""

import os

import pytest

from synth import make_voc_like

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_int8_ensemble_sweep(tmp_path, monkeypatch):
    from fewshot_detection_tpu.cli.common import resolve_configs
    from fewshot_detection_tpu.eval.valid import run_valid_ensemble
    from fewshot_detection_tpu.models import weights_io
    from fewshot_detection_tpu.config import parse_cfg
    from fewshot_detection_tpu.models.meta import MetaSpec, init_meta_params
    from fewshot_detection_tpu.models.spec import build_spec

    root = str(tmp_path)
    d = make_voc_like(os.path.join(root, "voc"), n_images=24, seed=2)
    dk_cfg = os.path.join(REPO, "cfg/tiny_darknet_dynamic.cfg")
    ln_cfg = os.path.join(REPO, "cfg/tiny_reweighting.cfg")

    spec = MetaSpec(build_spec(parse_cfg(dk_cfg)), build_spec(parse_cfg(ln_cfg)))
    params = init_meta_params(spec, 3)
    ckpt = os.path.join(root, "w.weights")
    weights_io.save_weights(ckpt, [spec.darknet, spec.learnet],
                            [params["darknet"], params["learnet"]], seen=0)

    import shutil
    shot_dict = os.path.join(root, "traindict_3shot.txt")
    shutil.copy(d["traindict"], shot_dict)
    datacfg = os.path.join(root, "meta.data")
    with open(datacfg, "w") as f:
        f.write(
            "metayolo=1\nmetain_type=2\ndata=voc\nneg=1\nrand=0\n"
            "tuning=1\nmax_epoch=2\nrepeat=1\ndynamic=0\n"
            f"novel={REPO}/data/voc_novels.txt\nnovelid=0\n"
            f"meta={shot_dict}\ntrain={d['train_list']}\n"
            f"valid={d['train_list']}\nbackup={root}/backup\ngpus=0\n"
        )

    monkeypatch.setenv("FSD_INT8", "1")
    monkeypatch.setenv("FSD_EVAL_BATCH", "4")
    monkeypatch.chdir(root)
    data_options, dk, ln, settings = resolve_configs(datacfg, dk_cfg, ln_cfg)
    prefix = run_valid_ensemble(data_options, dk, ln, ckpt, settings)

    files = os.listdir(prefix)
    assert len(files) == 20
    rows = 0
    for fn in files:
        with open(os.path.join(prefix, fn)) as fh:
            for line in fh:
                parts = line.split()
                assert len(parts) == 6
                conf = float(parts[1])
                assert 0.0 <= conf <= 1.0
                rows += 1
    assert rows > 0
