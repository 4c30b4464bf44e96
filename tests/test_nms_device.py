"""On-device NMS (lax loop + Pallas interpret mode) vs the host reference."""

import numpy as np
import pytest

from fewshot_detection_tpu.ops.boxes import nms as host_nms
from fewshot_detection_tpu.ops.nms_device import nms_device_boxes


def _random_boxes(seed, n=40):
    rng = np.random.RandomState(seed)
    boxes = []
    for _ in range(n):
        cx, cy = rng.rand(2) * 0.6 + 0.2
        w, h = rng.rand(2) * 0.3 + 0.05
        boxes.append([float(cx), float(cy), float(w), float(h),
                      float(rng.rand()), 0.9, 1])
    return boxes


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_nms_jax_matches_host(seed):
    boxes = _random_boxes(seed)
    ref = host_nms([list(b) for b in boxes], 0.4)
    ours = nms_device_boxes(boxes, 0.4, use_pallas=False)
    assert len(ref) == len(ours)
    for a, b in zip(ref, ours):
        np.testing.assert_allclose(a, b)


@pytest.mark.parametrize("seed", [0, 3])
def test_nms_pallas_matches_host(seed):
    boxes = _random_boxes(seed)
    ref = host_nms([list(b) for b in boxes], 0.4)
    ours = nms_device_boxes(boxes, 0.4, use_pallas=True, interpret=True)
    assert len(ref) == len(ours)
    for a, b in zip(ref, ours):
        np.testing.assert_allclose(a, b)


def test_nms_device_empty():
    assert nms_device_boxes([], 0.4) == []
