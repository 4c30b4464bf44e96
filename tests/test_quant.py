"""int8 serving path: quantization math + end-to-end closeness to fp32."""

import numpy as np
import pytest

import jax.numpy as jnp

from fewshot_detection_tpu.config import parse_cfg
from fewshot_detection_tpu.eval.detector import PlainDetector
from fewshot_detection_tpu.models import weights_io
from fewshot_detection_tpu.models.darknet import init_params
from fewshot_detection_tpu.models.quant import (
    _is_quantizable,
    apply_network_int8,
    calibrate_act_scales,
    quantize_weights,
)
from fewshot_detection_tpu.models.spec import build_spec


def _detector(tmp_path, gain=2.45):
    spec = build_spec(parse_cfg("cfg/tiny-yolo-voc.cfg"))
    params = [
        {**p, "w": p["w"] * gain} if p is not None and "w" in p else p
        for p in init_params(spec, 0)
    ]
    w = tmp_path / "t.weights"
    weights_io.save_weights(str(w), [spec], [params])
    return PlainDetector("cfg/tiny-yolo-voc.cfg", str(w))


def test_quantizable_selection(tmp_path):
    """Stem (3-ch input) and head (last conv) stay fp; middles quantize."""
    m = _detector(tmp_path)
    convs = [l for l in m.fspec.layers if l.kind == "conv"]
    flags = [_is_quantizable(m.fspec, l) for l in convs]
    assert flags[0] is False          # 3-channel stem
    assert flags[-1] is False         # detection head
    assert all(flags[1:-1])           # everything between

    q = quantize_weights(m.fspec, m.params)
    for l, flag in zip(convs, flags):
        p = q[l.index]
        if flag:
            assert p["wq"].dtype == jnp.int8
            assert p["wq"].shape == (l.size, l.size, l.in_channels, l.out_channels)
            assert p["wscale"].shape == (l.out_channels,)
        else:
            assert "w" in p


def test_weight_quant_roundtrip_error_bounded():
    rng = np.random.RandomState(0)
    spec = build_spec(parse_cfg("cfg/tiny-yolo-voc.cfg"))
    params = init_params(spec, 0)
    from fewshot_detection_tpu.models.darknet import fold_batchnorm, folded_spec

    fspec = folded_spec(spec)
    folded = fold_batchnorm(spec, params)
    q = quantize_weights(fspec, folded)
    for l in fspec.layers:
        if l.kind == "conv" and _is_quantizable(fspec, l):
            w = np.asarray(folded[l.index]["w"])
            deq = np.asarray(q[l.index]["wq"], np.float32) * np.asarray(
                q[l.index]["wscale"])
            # symmetric per-channel: error <= scale/2 everywhere
            err = np.abs(w - deq)
            bound = np.asarray(q[l.index]["wscale"]) / 2 + 1e-7
            assert (err <= bound).all()


def test_int8_forward_close_to_fp(tmp_path):
    m = _detector(tmp_path)
    rng = np.random.RandomState(1)
    calib = rng.rand(8, 64, 64, 3).astype(np.float32)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)

    y_fp = np.asarray(m(x))
    m.quantize_int8(calib)
    y_q = np.asarray(m(x))
    assert y_q.shape == y_fp.shape

    # quantization noise is bounded relative to the activation range; the
    # decode consumes sigmoids/exp of these, so demand close agreement
    denom = np.abs(y_fp).max()
    rel = np.abs(y_q - y_fp).max() / denom
    assert rel < 0.05, rel
    # and decoded detections agree on the confident picks
    from fewshot_detection_tpu.ops.boxes import get_region_boxes, nms

    b_fp = [nms(b, 0.4) for b in get_region_boxes(
        y_fp, 0.5, m.region.num_classes, m.region.anchor_wh)]
    b_q = [nms(b, 0.4) for b in get_region_boxes(
        y_q, 0.5, m.region.num_classes, m.region.anchor_wh)]
    n_fp = sum(len(b) for b in b_fp)
    n_q = sum(len(b) for b in b_q)
    assert n_fp > 0
    assert abs(n_fp - n_q) <= max(2, n_fp // 5)


def test_calibration_covers_all_quantized_convs(tmp_path):
    m = _detector(tmp_path)
    rng = np.random.RandomState(2)
    scales = calibrate_act_scales(
        m.fspec, m.params, rng.rand(4, 64, 64, 3).astype(np.float32))
    need = {l.index for l in m.fspec.layers if _is_quantizable(m.fspec, l)}
    assert set(scales) == need
    assert all(v > 0 for v in scales.values())


def test_meta_detector_int8_close(tmp_path):
    """MetaDetector.quantize_int8: the detection sweep runs the quantized
    backbone; outputs stay close to fp and the codes path is untouched."""
    from fewshot_detection_tpu.eval.detector import MetaDetector

    spec_d = build_spec(parse_cfg("cfg/darknet_dynamic.cfg"))
    spec_l = build_spec(parse_cfg("cfg/reweighting_net.cfg"))
    from fewshot_detection_tpu.models.meta import MetaSpec, init_meta_params

    params = init_meta_params(MetaSpec(spec_d, spec_l), 7)
    params = {
        k: [{**p, "w": p["w"] * 2.45} if p is not None and "w" in p else p
            for p in v]
        for k, v in params.items()
    }
    w = tmp_path / "m.weights"
    weights_io.save_weights(
        str(w), [spec_d, spec_l], [params["darknet"], params["learnet"]])
    m = MetaDetector("cfg/darknet_dynamic.cfg", "cfg/reweighting_net.cfg",
                     str(w))

    rng = np.random.RandomState(0)
    N, S = 4, 64
    metax = rng.rand(N, S, S, 3).astype(np.float32)
    mask = (rng.rand(N, S, S, 1) > 0.5).astype(np.float32)
    codes = m.class_codes(metax, mask)
    x = rng.rand(2, S, S, 3).astype(np.float32)

    y_fp = np.asarray(m.detect(x, codes))
    m.quantize_int8(x, codes)
    y_q = np.asarray(m.detect(x, codes))
    assert y_q.shape == y_fp.shape == (2 * N, S // 32, S // 32, 30)
    rel = np.abs(y_q - y_fp).max() / np.abs(y_fp).max()
    assert rel < 0.06, rel
    # codes path untouched by quantization
    codes2 = m.class_codes(metax, mask)
    np.testing.assert_array_equal(codes[0], codes2[0])


def test_meta_detector_int8_learnet_and_head(tmp_path):
    """Full int8 meta serving: learnet (ensemble phase 1 runs it over every
    support image) and the fused reweight+head contraction also quantized;
    codes and head outputs stay within post-training-quant deviation
    bounds and confident detections agree."""
    from fewshot_detection_tpu.config import parse_cfg
    from fewshot_detection_tpu.eval.detector import MetaDetector
    from fewshot_detection_tpu.models import weights_io
    from fewshot_detection_tpu.models.meta import MetaSpec, init_meta_params
    from fewshot_detection_tpu.models.spec import build_spec

    spec_d = build_spec(parse_cfg("cfg/darknet_dynamic.cfg"))
    spec_l = build_spec(parse_cfg("cfg/reweighting_net.cfg"))
    params = init_meta_params(MetaSpec(spec_d, spec_l), 3)
    params = {
        k: [{**p, "w": p["w"] * 2.45} if p is not None and "w" in p else p
            for p in v]
        for k, v in params.items()
    }
    w = tmp_path / "m.weights"
    weights_io.save_weights(
        str(w), [spec_d, spec_l], [params["darknet"], params["learnet"]])
    m = MetaDetector("cfg/darknet_dynamic.cfg", "cfg/reweighting_net.cfg",
                     str(w))

    rng = np.random.RandomState(1)
    N, S = 4, 64
    metax = rng.rand(N, S, S, 3).astype(np.float32)
    mask = (rng.rand(N, S, S, 1) > 0.5).astype(np.float32)
    codes_fp = m.class_codes(metax, mask)
    x = rng.rand(2, S, S, 3).astype(np.float32)
    y_fp = np.asarray(m.detect(x, codes_fp))

    m.quantize_int8(x, codes_fp, calib_support=(metax, mask),
                    quant_head=True)

    codes_q = m.class_codes(metax, mask)
    for cf, cq in zip(codes_fp, codes_q):
        rel = np.abs(np.asarray(cq) - np.asarray(cf)).max() / (
            np.abs(np.asarray(cf)).max() + 1e-9
        )
        assert rel < 0.08, rel

    y_q = np.asarray(m.detect(x, codes_fp))
    rel = np.abs(y_q - y_fp).max() / np.abs(y_fp).max()
    assert rel < 0.08, rel
