"""Unit tests for cfg/.data parsing and shape propagation."""

import pytest

from fewshot_detection_tpu.config import (
    Settings,
    format_net_table,
    parse_cfg,
    propagate_shapes,
    read_data_cfg,
)
from fewshot_detection_tpu.config.darkcfg import parse_cfg_text


def test_parse_cfg_text_basic():
    blocks = parse_cfg_text(
        """
[net]
width=416
height=416
channels=3

# a comment
[convolutional]
filters=32
size=3
stride=1
pad=1
activation=leaky

[cost]
type=sse
"""
    )
    assert [b["type"] for b in blocks] == ["net", "convolutional", "cost"]
    # convolutional defaults batch_normalize=0
    assert blocks[1]["batch_normalize"] == "0"
    # `type=` inside a block is renamed to _type
    assert blocks[2]["_type"] == "sse"


def test_parse_darknet_dynamic_cfg():
    blocks = parse_cfg("cfg/darknet_dynamic.cfg")
    assert blocks[0]["type"] == "net"
    kinds = [b["type"] for b in blocks]
    assert kinds.count("convolutional") == 24
    assert kinds.count("maxpool") == 5
    assert "reorg" in kinds and "region" in kinds
    # dynamic conv present
    dyn = [b for b in blocks if b.get("dynamic") == "1"]
    assert len(dyn) == 1
    assert dyn[0]["filters"] == "1024"


def test_shape_propagation_darknet_dynamic():
    blocks = parse_cfg("cfg/darknet_dynamic.cfg")
    shapes = propagate_shapes(blocks)
    # backbone ends 13x13; head conv -> 30 channels
    region = shapes[-1]
    head = shapes[-2]
    assert (head.width, head.height, head.filters) == (13, 13, 30)
    assert region.kind == "region"
    # reorg layer: 26x26x64 -> 13x13x256
    reorg = [s for s in shapes if s.kind == "reorg"][0]
    assert (reorg.width, reorg.height, reorg.filters) == (13, 13, 256)
    # the route after reorg concatenates 256 + 1024
    route2 = [s for s in shapes if s.kind == "route"][1]
    assert route2.filters == 1280
    # dconv keeps 1024 channels at 13x13
    dconv = [s for s in shapes if s.kind == "dconv"][0]
    assert (dconv.width, dconv.height, dconv.filters) == (13, 13, 1024)


def test_shape_propagation_learnet():
    blocks = parse_cfg("cfg/reweighting_net.cfg")
    shapes = propagate_shapes(blocks)
    final = shapes[-1]
    assert final.kind == "glomax"
    assert (final.width, final.height, final.filters) == (1, 1, 1024)


def test_shape_propagation_multiscale():
    blocks = parse_cfg("cfg/darknet_dynamic.cfg")
    for size in (320, 416, 608):
        shapes = propagate_shapes(blocks, width=size, height=size)
        assert shapes[-2].width == size // 32


def test_shape_propagation_tiny_yolo():
    blocks = parse_cfg("cfg/tiny-yolo-voc.cfg")
    shapes = propagate_shapes(blocks)
    assert shapes[-2].filters == 125  # 5 anchors * (5 + 20 classes)
    assert shapes[-2].width == 13


def test_format_net_table_runs():
    blocks = parse_cfg("cfg/darknet_dynamic.cfg")
    table = format_net_table(blocks)
    assert "dconv" in table and "reorg" in table


def test_read_data_cfg_defaults(tmp_path):
    p = tmp_path / "x.data"
    p.write_text("data = voc\ntrain=/tmp/list.txt\n# comment\n")
    opts = read_data_cfg(str(p))
    assert opts["gpus"] == "0,1,2,3"
    assert opts["num_workers"] == "10"
    assert opts["data"] == "voc"
    assert opts["train"] == "/tmp/list.txt"


# ---------------------------------------------------------------------------
# Settings resolution
# ---------------------------------------------------------------------------


def _base_data_options(**kw):
    opts = {
        "metayolo": "1",
        "metain_type": "2",
        "data": "voc",
        "neg": "1",
        "rand": "0",
        "novel": "data/voc_novels.txt",
        "novelid": "0",
        "meta": "data/voc_traindict_full.txt",
        "train": "/tmp/voc_train.txt",
        "backup": "backup/metayolo",
        "gpus": "1,2,3,4",
    }
    opts.update(kw)
    return opts


def test_settings_base_training_split():
    s = Settings.configure(_base_data_options())
    # novelid 0 => bird,bus,cow,motorbike,sofa are novel
    assert s.novel_classes == ("bird", "bus", "cow", "motorbike", "sofa")
    assert len(s.base_classes) == 15
    assert "bird" not in s.base_classes
    assert s.base_ids == (0, 1, 3, 4, 6, 7, 8, 10, 11, 12, 14, 15, 16, 18, 19)
    assert s.novel_ids == (2, 5, 9, 13, 17)
    assert s.neg_ratio == 1
    assert s.num_gpus == 4
    assert not s.tuning
    assert s.backup == "backup/metayolo_novel0_neg1"


def test_settings_tuning_split():
    s = Settings.configure(
        _base_data_options(
            tuning="1",
            neg="0",
            max_epoch="2000",
            repeat="200",
            meta="data/voc_traindict_bbox_5shot.txt",
            scale="1",
        )
    )
    assert s.tuning
    assert s.shot == 5
    # during tuning all 20 classes are "base"
    assert len(s.base_classes) == 20
    assert s.max_epoch == 2000 and s.repeat == 200
    assert s.save_interval == 1  # 2000/200 = 10 epochs <= 20
    assert s.novel_ids == (2, 5, 9, 13, 17)


def test_settings_meta_channels():
    net = {"height": "416", "width": "416", "batch": "64"}
    meta = {"height": "416", "width": "416", "feat_layer": "0", "channels": "4"}
    s = Settings.configure(_base_data_options(), net, meta)
    assert s.meta_channels == 4  # metain_type 2 => rgb + mask
    assert s.mask_width == 416
    s2 = Settings.configure(_base_data_options(metain_type="1"), net, meta)
    assert s2.meta_channels == 3
    s3 = Settings.configure(_base_data_options(metain_type="3"), net, meta)
    assert s3.meta_channels == 7


def test_settings_save_interval_policy():
    for max_epoch, repeat, expect in [
        ("2000", "200", 1),
        ("2000", "50", 2),
        ("2000", "25", 5),
        ("2000", "10", 10),
    ]:
        s = Settings.configure(
            _base_data_options(
                tuning="1", max_epoch=max_epoch, repeat=repeat,
                meta="data/voc_traindict_bbox_5shot.txt",
            )
        )
        assert s.save_interval == expect, (max_epoch, repeat)


def test_settings_backup_mangling():
    s = Settings.configure(_base_data_options(scale="0", metain_type="1", rand="1"))
    assert s.backup == "backup/metayolofixin1_novel0_neg1_rand"


def test_settings_neg_full():
    s = Settings.configure(_base_data_options(neg="full"))
    assert s.neg_ratio == "full"
