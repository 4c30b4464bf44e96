"""mAP-sweep parity: device pipeline vs host decode, file-for-file.

The comp4_det_test_ result files produced with FSD_DEVICE_NMS=1 (decode +
top-k + on-device NMS, eval/device_pipeline.py) must be IDENTICAL to the
host path's (ops.boxes.get_region_boxes[_v2] + python NMS — the loop
reproducing utils.py:195-290 + valid_ensemble.py:137-178 of
/root/reference) for all three sweeps. Also pins the truncation fallback:
with a tiny buffer the sweep falls back to the host path and the files
still match.
"""

import os
import random

import pytest

from synth import make_voc_like

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read_results(prefix):
    out = {}
    for fn in sorted(os.listdir(prefix)):
        with open(os.path.join(prefix, fn)) as f:
            out[fn] = f.read()
    return out



def assert_results_equivalent(host, dev, tag_h, tag_d):
    """Same files, same rows, same imgids/ordering; floats equal to well
    within the 6-decimal printed precision. Byte-equality is NOT required:
    XLA contracts the decode's mul-adds differently inside the pipeline jit
    than in the eager host decode, so coordinates can differ by one fp32
    ulp (~3e-5 px at image scale) — semantically identical detections."""
    assert len(host) == len(dev)
    for hf, df in zip(host, dev):
        assert hf.replace(tag_h, "") == df.replace(tag_d, "")
        hl = host[hf].splitlines()
        dl = dev[df].splitlines()
        assert len(hl) == len(dl), f"{hf}: {len(hl)} vs {len(dl)} rows"
        for a, b in zip(hl, dl):
            ta, tb = a.split(), b.split()
            assert ta[0] == tb[0], f"{hf}: imgid {ta[0]} vs {tb[0]}"
            assert abs(float(ta[1]) - float(tb[1])) < 1e-5
            for va, vb in zip(ta[2:], tb[2:]):
                assert abs(float(va) - float(vb)) < 1e-3, f"{hf}: {a} vs {b}"


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("sweepfix")
    d = make_voc_like(str(tmp_path / "voc"), n_images=24, seed=3)
    dk_cfg = os.path.join(REPO, "cfg/tiny_darknet_dynamic.cfg")
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
    from fewshot_detection_tpu.models import weights_io
    from fewshot_detection_tpu.models.meta import MetaSpec, init_meta_params
    from fewshot_detection_tpu.models.spec import build_spec

    spec = MetaSpec(build_spec(parse_cfg(dk_cfg)), build_spec(parse_cfg(ln_cfg)))
    params = init_meta_params(spec, 5)
    w = str(tmp_path / "init.weights")
    weights_io.save_weights(
        w, [spec.darknet, spec.learnet],
        [params["darknet"], params["learnet"]], seen=0,
    )
    data_options, darknet, learnet, settings = resolve_configs(
        datacfg, dk_cfg, ln_cfg
    )
    return {
        "tmp": str(tmp_path), "weights": w, "data_options": data_options,
        "darknet": darknet, "learnet": learnet, "settings": settings,
        "dk_cfg": dk_cfg, "ln_cfg": ln_cfg,
    }


def _run_sweep(fx, which, tag, env):
    """Run one sweep flavor into results/, return {file: content}."""
    from fewshot_detection_tpu.eval import valid as valid_mod

    cwd = os.getcwd()
    os.chdir(fx["tmp"])
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        if which == "ensemble":
            prefix = valid_mod.run_valid_ensemble(
                fx["data_options"], fx["darknet"], fx["learnet"],
                fx["weights"], fx["settings"], outfile=f"{tag}_det_",
            )
        elif which == "meta":
            # support selection is random per batch; pin it so both sweep
            # flavors see identical support codes
            prefix = valid_mod.run_valid_meta(
                fx["data_options"], fx["darknet"], fx["learnet"],
                fx["weights"], fx["settings"], outfile=f"{tag}_det_",
                rng=random.Random(123),
            )
        else:
            # plain sweep over the meta cfg's BACKBONE is shape-mismatched;
            # use the tiny plain cfg instead
            raise AssertionError(which)
        files = {
            fn: open(os.path.join(prefix, fn)).read()
            for fn in sorted(os.listdir(prefix)) if fn.startswith(tag)
        }
        return files
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        os.chdir(cwd)


@pytest.mark.parametrize("which", ["ensemble", "meta"])
def test_meta_sweep_device_parity(fixture, which):
    host = _run_sweep(fixture, which, f"host_{which}",
                      {"FSD_DEVICE_NMS": "0", "FSD_EVAL_BATCH": "4"})
    # K larger than the candidate count: device path engages on every batch
    dev = _run_sweep(
        fixture, which, f"dev_{which}",
        {"FSD_DEVICE_NMS": "1", "FSD_DEVICE_NMS_K": "4096",
         "FSD_EVAL_BATCH": "4"},
    )
    assert len(host) == len(dev) == 20
    total = sum(c.count("\n") for c in host.values())
    assert total > 0, "degenerate fixture: no detections at all"
    assert_results_equivalent(host, dev, f"host_{which}", f"dev_{which}")


def test_meta_sweep_truncation_fallback(fixture):
    """A buffer too small for the candidate counts must fall back to the
    host path (not silently truncate) — files identical again."""
    host = _run_sweep(fixture, "ensemble", "host_trunc",
                      {"FSD_DEVICE_NMS": "0", "FSD_EVAL_BATCH": "4"})
    dev = _run_sweep(
        fixture, "ensemble", "dev_trunc",
        {"FSD_DEVICE_NMS": "1", "FSD_DEVICE_NMS_K": "4",
         "FSD_EVAL_BATCH": "4"},
    )
    # the fallback IS the host path, so here the files are byte-identical
    for hf, df in zip(host, dev):
        assert host[hf] == dev[df]


def test_plain_sweep_device_parity(tmp_path):
    """run_valid (plain YOLOv2, 20-class head incl. the reference's extra
    validation (cls_conf, cls_id) pairs) host vs device files."""
    d = make_voc_like(str(tmp_path / "voc"), n_images=10, seed=4)
    cfg = os.path.join(REPO, "cfg/tiny-yolo-voc.cfg")
    datacfg = str(tmp_path / "p.data")
    with open(datacfg, "w") as f:
        f.write(
            "metayolo=0\ndata=voc\nneg=0\nrand=0\n"
            f"novel={REPO}/data/voc_novels.txt\nnovelid=0\n"
            f"train={d['train_list']}\nvalid={d['train_list']}\n"
            f"names={REPO}/data/voc.names\nbackup={tmp_path}/backup\ngpus=0\n"
        )

    from fewshot_detection_tpu.cli.common import resolve_configs
    from fewshot_detection_tpu.config import parse_cfg
    from fewshot_detection_tpu.eval.valid import run_valid
    from fewshot_detection_tpu.models import weights_io
    from fewshot_detection_tpu.models.darknet import init_params
    from fewshot_detection_tpu.models.spec import build_spec

    spec = build_spec(parse_cfg(cfg))
    w = str(tmp_path / "init.weights")
    weights_io.save_weights(w, [spec], [init_params(spec, 9)], seen=0)
    data_options, _, _, settings = resolve_configs(datacfg, cfg)

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        os.environ["FSD_EVAL_BATCH"] = "4"
        os.environ["FSD_DEVICE_NMS"] = "0"
        host_prefix = run_valid(data_options, cfg, w, settings,
                                outfile="host_det_")
        os.environ["FSD_DEVICE_NMS"] = "1"
        os.environ["FSD_DEVICE_NMS_K"] = "4096"
        dev_prefix = run_valid(data_options, cfg, w, settings,
                               outfile="dev_det_")
        # prefixes are cwd-relative: read before restoring cwd
        host = {fn: open(os.path.join(host_prefix, fn)).read()
                for fn in sorted(os.listdir(host_prefix))
                if fn.startswith("host_det_")}
        dev = {fn: open(os.path.join(dev_prefix, fn)).read()
               for fn in sorted(os.listdir(dev_prefix))
               if fn.startswith("dev_det_")}
    finally:
        for k in ("FSD_EVAL_BATCH", "FSD_DEVICE_NMS", "FSD_DEVICE_NMS_K"):
            os.environ.pop(k, None)
        os.chdir(cwd)
    assert len(host) == len(dev) == 20
    assert sum(c.count("\n") for c in host.values()) > 0
    assert_results_equivalent(host, dev, "host_det_", "dev_det_")
