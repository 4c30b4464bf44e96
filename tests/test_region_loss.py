"""On-device region loss vs the explicit-loop oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fewshot_detection_tpu.models.spec import RegionSpec
from fewshot_detection_tpu.ops.region_loss import (
    region_loss,
    region_loss_v2,
    sample_neg_keep,
)
from loss_oracle import region_loss_oracle, region_loss_v2_oracle

ANCHORS = (1.3221, 1.73145, 3.19275, 4.00944, 5.05587, 8.09892)
REGION1 = RegionSpec(anchors=ANCHORS, num_classes=1, num_anchors=3)
REGION4 = RegionSpec(anchors=ANCHORS, num_classes=4, num_anchors=3)


def _rand_targets(rng, n, n_boxes_max, n_cls):
    t = np.zeros((n, 50, 5), np.float32)
    for b in range(n):
        k = rng.randint(0, n_boxes_max + 1)
        for i in range(k):
            t[b, i] = [
                rng.randint(0, n_cls),
                rng.uniform(0.08, 0.92),
                rng.uniform(0.08, 0.92),
                rng.uniform(0.05, 0.4),
                rng.uniform(0.05, 0.4),
            ]
    return t


def _rand_meta_targets(rng, bs, cs):
    """Copy c holds only class-c boxes; some copies are empty negatives."""
    t = np.zeros((bs, cs, 50, 5), np.float32)
    for b in range(bs):
        for c in range(cs):
            if rng.rand() < 0.5:
                continue  # negative copy
            k = rng.randint(1, 3)
            for i in range(k):
                t[b, c, i] = [
                    c,
                    rng.uniform(0.08, 0.92),
                    rng.uniform(0.08, 0.92),
                    rng.uniform(0.05, 0.4),
                    rng.uniform(0.05, 0.4),
                ]
    return t


def _metrics_close(ours, ref, rtol=2e-3):
    for k in ("loss_x", "loss_y", "loss_w", "loss_h", "loss_conf",
              "loss_cls", "loss"):
        np.testing.assert_allclose(
            float(ours[k]), ref[k], rtol=rtol, atol=1e-4, err_msg=k
        )
    assert int(ours["nGT"]) == ref["nGT"]
    assert int(ours["nCorrect"]) == ref["nCorrect"]


@pytest.mark.parametrize("seen", [0, 20000])
def test_plain_loss_matches_oracle(seen):
    rng = np.random.RandomState(0)
    nB, H, W = 3, 5, 5
    region = REGION4
    out_nchw = (rng.randn(nB, 3 * 9, H, W) * 0.5).astype(np.float32)
    target = _rand_targets(rng, nB, 3, 4)
    keep = np.ones(nB, np.float32)

    loss, metrics = region_loss(
        jnp.asarray(out_nchw.transpose(0, 2, 3, 1)),
        jnp.asarray(target),
        jnp.asarray(keep),
        jnp.asarray(seen),
        region,
    )
    ref = region_loss_oracle(out_nchw, target, list(range(nB)), seen,
                             region.anchor_wh, 4)
    _metrics_close(metrics, ref)


def test_warmup_seen_per_instance():
    """warmup_seen is a per-call argument (settings.warmup_seen), not an
    import-time env global: warmup_seen=0 at seen=0 must equal the default
    threshold's post-warm-up behavior (seen=20000), and differ from the
    default at seen=0 (the all-cells coord warm-up)."""
    rng = np.random.RandomState(3)
    nB, H, W = 2, 4, 4
    out_nchw = (rng.randn(nB, 3 * 9, H, W) * 0.5).astype(np.float32)
    target = _rand_targets(rng, nB, 2, 4)
    keep = np.ones(nB, np.float32)
    args = (jnp.asarray(out_nchw.transpose(0, 2, 3, 1)),
            jnp.asarray(target), jnp.asarray(keep))

    off_now = region_loss(*args, jnp.asarray(0), REGION4, warmup_seen=0)[1]
    default_late = region_loss(*args, jnp.asarray(20000), REGION4)[1]
    default_now = region_loss(*args, jnp.asarray(0), REGION4)[1]
    np.testing.assert_allclose(
        float(off_now["loss_x"]), float(default_late["loss_x"]), rtol=1e-6)
    assert float(default_now["loss_x"]) != pytest.approx(
        float(default_late["loss_x"]))


def test_warmup_seen_settings_field(monkeypatch):
    """FSD_WARMUP_SEEN is parsed at Settings.configure() time (startup),
    never at module import."""
    from fewshot_detection_tpu.config import Settings

    assert Settings.configure({"data": "voc"}).warmup_seen == 12800
    monkeypatch.setenv("FSD_WARMUP_SEEN", "0")
    assert Settings.configure({"data": "voc"}).warmup_seen == 0
    monkeypatch.setenv("FSD_WARMUP_SEEN", "300")
    assert Settings.configure({"data": "voc"}).warmup_seen == 300


def test_plain_loss_zero_tcls():
    rng = np.random.RandomState(1)
    nB, H, W = 2, 4, 4
    out_nchw = (rng.randn(nB, 3 * 9, H, W) * 0.5).astype(np.float32)
    target = _rand_targets(rng, nB, 2, 4)
    keep = np.ones(nB, np.float32)
    loss, metrics = region_loss(
        jnp.asarray(out_nchw.transpose(0, 2, 3, 1)),
        jnp.asarray(target), jnp.asarray(keep), jnp.asarray(20000),
        REGION4, zero_tcls=True,
    )
    ref = region_loss_oracle(out_nchw, target, list(range(nB)), 20000,
                             REGION4.anchor_wh, 4, zero_tcls=True)
    _metrics_close(metrics, ref)


@pytest.mark.parametrize("seen", [0, 20000])
def test_v2_loss_matches_oracle_full(seen):
    rng = np.random.RandomState(2)
    bs, cs, H, W = 2, 4, 5, 5
    out_nchw = (rng.randn(bs * cs, 3 * 6, H, W) * 0.5).astype(np.float32)
    target = _rand_meta_targets(rng, bs, cs)
    keep = np.ones(bs * cs, np.float32)

    loss, metrics = region_loss_v2(
        jnp.asarray(out_nchw.transpose(0, 2, 3, 1)),
        jnp.asarray(target), jnp.asarray(keep), jnp.asarray(seen),
        REGION1, cs,
    )
    ref = region_loss_v2_oracle(out_nchw, target, list(range(bs * cs)),
                                seen, REGION1.anchor_wh)
    _metrics_close(metrics, ref)


def test_v2_loss_matches_oracle_with_neg_filter():
    """Mask-weighting == the reference's row dropping for the same keep set."""
    rng = np.random.RandomState(3)
    bs, cs, H, W = 2, 5, 4, 4
    out_nchw = (rng.randn(bs * cs, 3 * 6, H, W) * 0.5).astype(np.float32)
    target = _rand_meta_targets(rng, bs, cs)

    keep = sample_neg_keep(
        target.reshape(bs * cs, -1), 1, np.random.RandomState(7)
    )
    assert keep.sum() < bs * cs  # some negatives dropped
    kept_rows = np.nonzero(keep)[0].tolist()

    loss, metrics = region_loss_v2(
        jnp.asarray(out_nchw.transpose(0, 2, 3, 1)),
        jnp.asarray(target), jnp.asarray(keep), jnp.asarray(20000),
        REGION1, cs,
    )
    ref = region_loss_v2_oracle(out_nchw, target, kept_rows, 20000,
                                REGION1.anchor_wh)
    for k in ("loss_x", "loss_y", "loss_w", "loss_h", "loss_conf",
              "loss_cls", "loss"):
        np.testing.assert_allclose(float(metrics[k]), ref[k], rtol=2e-3,
                                   atol=1e-4, err_msg=k)


def test_sample_neg_keep_semantics():
    target = np.zeros((10, 250), np.float32)
    target[:4, 5] = 0.5  # 4 positives
    keep = sample_neg_keep(target, "full")
    assert keep.sum() == 10
    rng = np.random.RandomState(0)
    keep = sample_neg_keep(target, 1, rng)
    assert np.all(keep[:4] == 1)  # positives always kept
    # expected negative keep prob = 1 * 4/6
    keeps = [sample_neg_keep(target, 1, np.random.RandomState(s))[4:].mean()
             for s in range(200)]
    assert abs(np.mean(keeps) - 4 / 6) < 0.1


def test_loss_is_differentiable():
    rng = np.random.RandomState(4)
    bs, cs, H, W = 1, 3, 4, 4
    out = jnp.asarray((rng.randn(bs * cs, H, W, 18) * 0.5).astype(np.float32))
    target = jnp.asarray(_rand_meta_targets(rng, bs, cs))
    keep = jnp.ones(bs * cs)

    def f(o):
        return region_loss_v2(o, target, keep, jnp.asarray(20000), REGION1, cs)[0]

    g = jax.grad(f)(out)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0


def test_duplicate_cell_last_write_wins():
    """Two gts in the same cell with the same best anchor: the later one
    owns the targets (reference loop overwrite order)."""
    region = REGION1
    rng = np.random.RandomState(5)
    H = W = 4
    out = (rng.randn(1, 3 * 6, H, W) * 0.3).astype(np.float32)
    target = np.zeros((1, 50, 5), np.float32)
    # same cell (2, 2), same size -> same best anchor; different offsets
    target[0, 0] = [0, 0.55, 0.55, 0.2, 0.2]
    target[0, 1] = [0, 0.6, 0.6, 0.2, 0.2]
    keep = np.ones(1, np.float32)
    loss, metrics = region_loss(
        jnp.asarray(out.transpose(0, 2, 3, 1)), jnp.asarray(target),
        jnp.asarray(keep), jnp.asarray(20000), region,
    )
    ref = region_loss_oracle(out, target, [0], 20000, region.anchor_wh, 1)
    _metrics_close(metrics, ref)
