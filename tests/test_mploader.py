"""Parallel input pipeline: native pthread batch API + multi-process loader.

The reference fed training with torch DataLoader worker processes
(train_meta.py:173-183 in /root/reference); these tests pin the TPU
rebuild's two scaling paths:
  * FSD_NATIVE_BATCH=1 — whole batches through the C++ pipeline's pthread
    batch API, output-identical to the per-image native path
  * MPLoader — N spawned worker processes with stride partitioning,
    round-robin drained back into sequential batch order
"""

import os
import random

import numpy as np
import pytest

from synth import make_voc_like

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _settings(d, metayolo=1):
    from fewshot_detection_tpu.config import Settings, parse_cfg, read_data_cfg

    datacfg = os.path.join(d["root"], "m.data")
    with open(datacfg, "w") as f:
        f.write(
            f"metayolo={metayolo}\nmetain_type=2\ndata=voc\nneg=1\nrand=0\n"
            f"novel={REPO}/data/voc_novels.txt\nnovelid=0\n"
            f"meta={d['traindict']}\ntrain={d['train_list']}\n"
            f"backup={d['root']}/backup\ngpus=0\n"
        )
    blocks = parse_cfg(os.path.join(REPO, "cfg/tiny_darknet_dynamic.cfg"))
    return read_data_cfg(datacfg), Settings.configure(
        read_data_cfg(datacfg), blocks[0], None
    )


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mpl") / "voc")
    return make_voc_like(root, n_images=24, seed=2, style="shape")


def test_native_batch_matches_per_image(synth):
    from fewshot_detection_tpu.data.datasets import DetectionDataset
    from fewshot_detection_tpu.native import native_available

    if not native_available():
        pytest.skip("native pipeline unavailable")
    _, settings = _settings(synth)
    lines = open(synth["train_list"]).read().split()

    os.environ["FSD_NATIVE"] = "1"
    try:
        seq = DetectionDataset(list(lines), settings, train=True, seen=0,
                               shuffle=False, rng=random.Random(7),
                               filter_valid=False)
        seq_batches = list(seq.batches(8))

        os.environ["FSD_NATIVE_BATCH"] = "1"
        bat = DetectionDataset(list(lines), settings, train=True, seen=0,
                               shuffle=False, rng=random.Random(7),
                               filter_valid=False)
        bat_batches = list(bat.batches(8))
    finally:
        os.environ.pop("FSD_NATIVE", None)
        os.environ.pop("FSD_NATIVE_BATCH", None)

    assert len(seq_batches) == len(bat_batches) > 0
    for (si, sl), (bi, bl) in zip(seq_batches, bat_batches):
        np.testing.assert_array_equal(si, bi)
        np.testing.assert_array_equal(sl, bl)


def test_mploader_single_worker_matches_direct(synth):
    from fewshot_detection_tpu.data.mploader import MPLoader, episode_stream

    data_options, settings = _settings(synth)
    lines = open(synth["train_list"]).read().split()
    args = (lines, data_options["meta"], settings, 4, 0)

    direct = list(episode_stream(*args, worker_id=0, num_workers=1, seed=11))
    loader = MPLoader(episode_stream, args, num_workers=1, seed=11)
    via_mp = list(loader)
    loader.close()

    assert len(direct) == len(via_mp) > 0
    for d, m in zip(direct, via_mp):
        for a, b in zip(d, m):
            np.testing.assert_array_equal(a, b)


def test_mploader_two_workers_stride_partition(synth):
    """Even-index batches come from worker 0's stream, odd from worker 1's,
    interleaved back into sequential order."""
    from fewshot_detection_tpu.data.mploader import MPLoader, episode_stream

    data_options, settings = _settings(synth)
    lines = open(synth["train_list"]).read().split()
    args = (lines, data_options["meta"], settings, 4, 0)

    w0 = list(episode_stream(*args, worker_id=0, num_workers=2, seed=11))
    w1 = list(episode_stream(*args, worker_id=1, num_workers=2, seed=11))
    loader = MPLoader(episode_stream, args, num_workers=2, seed=11)
    merged = list(loader)
    loader.close()

    assert len(merged) == len(w0) + len(w1) > 1
    for i, item in enumerate(merged):
        ref = w0[i // 2] if i % 2 == 0 else w1[i // 2]
        for a, b in zip(item, ref):
            np.testing.assert_array_equal(a, b)


def test_episode_stream_replica_groups(synth):
    """FSD_WORKERS + multi-device runs: episode_stream must carry one
    support sample per class PER replica group (the reference's
    n_cls*num_gpus layout, dataset.py:348) so make_episode_batch's
    (n_groups, n_cls, ...) reshape holds."""
    from fewshot_detection_tpu.cli.train_meta_cli import make_episode_batch
    from fewshot_detection_tpu.data.mploader import episode_stream

    data_options, settings = _settings(synth)
    lines = open(synth["train_list"]).read().split()
    n_groups = 2
    stream = episode_stream(lines, data_options["meta"], settings, 4, 0,
                            n_groups, worker_id=0, num_workers=1, seed=11)
    imgs, labels, metax, mask = next(stream)
    n_cls = labels.shape[1]
    assert metax.shape[0] == mask.shape[0] == n_groups * n_cls
    batch = make_episode_batch(imgs, labels, metax, mask, n_groups,
                               settings.neg_ratio, np.random.RandomState(0))
    assert batch["metax"].shape[:2] == (n_groups, n_cls)
    assert batch["x"].shape[:2] == (n_groups, imgs.shape[0] // n_groups)


def test_mploader_propagates_worker_errors():
    from fewshot_detection_tpu.data.mploader import MPLoader, episode_stream

    # nonexistent meta file -> the worker raises; the parent must re-raise
    from fewshot_detection_tpu.config import Settings

    s = Settings.configure({"metayolo": "1", "data": "voc",
                            "novelid": "0"}, None, None)
    loader = MPLoader(episode_stream, (["/nonexistent.png"], "/nope.txt", s,
                                       4, 0), num_workers=1)
    with pytest.raises(RuntimeError, match="loader worker failed"):
        list(loader)
    loader.close()
