"""Live multi-scale switch under an 8-device mesh (VERDICT r1 item 6).

The reference's multiscale schedule changes input geometry every 64 samples
mid-epoch (dataset.py:223-245). On TPU each geometry is its own executable;
these tests prove (a) warm() actually populates the jit call cache so a
switch never stalls, and (b) a mid-run geometry change with n_groups=8
sharded inputs produces bit-identical results to a fresh fixed-shape
trainer stepping from the same state.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fewshot_detection_tpu.config import parse_cfg
from fewshot_detection_tpu.data.datasets import multiscale_size
from fewshot_detection_tpu.models.meta import MetaSpec, init_meta_params
from fewshot_detection_tpu.models.spec import build_spec
from fewshot_detection_tpu.parallel import make_mesh, shard_batch
from fewshot_detection_tpu.train import MetaTrainer, init_momentum


@pytest.fixture(scope="module")
def setup():
    # tiny cfg pair: same structure (dconv + learnet), CPU-test sized
    spec = MetaSpec(
        build_spec(parse_cfg("cfg/tiny_darknet_dynamic.cfg")),
        build_spec(parse_cfg("cfg/tiny_reweighting.cfg")),
    )
    params = init_meta_params(spec, 0)
    trainer = MetaTrainer(spec, momentum=0.9, weight_decay=0.0005,
                          donate=False)
    mom = init_momentum(params)
    return spec, params, trainer, mom


def _batch(rng, R, b, n_cls, size):
    target = np.zeros((R, b, n_cls, 50, 5), np.float32)
    for r in range(R):
        c = r % n_cls
        target[r, 0, c, 0] = [c, 0.5, 0.5, 0.25, 0.25]
    return {
        "x": rng.rand(R, b, size, size, 3).astype(np.float32),
        "metax": rng.rand(R, n_cls, 64, 64, 3).astype(np.float32),
        "mask": (rng.rand(R, n_cls, 64, 64, 1) > 0.5).astype(np.float32),
        "target": target,
        "keep": np.ones((R, b * n_cls), np.float32),
    }


def test_warm_populates_jit_cache(setup):
    """jit.lower().compile() does NOT fill the call cache (the round-1 bug);
    warm() must leave one cached executable per geometry so the first real
    step at each scale dispatches without compiling."""
    spec, params, trainer, mom = setup
    mesh = make_mesh(8)
    shard = lambda b: shard_batch(mesh, b)
    assert trainer._step._cache_size() == 0
    trainer.warm(params, mom, n_cls=2, batch_size=8, sizes=(32, 64),
                 n_groups=8, meta_shape=(64, 64), mask_shape=(64, 64),
                 shard_fn=shard)
    assert trainer._step._cache_size() >= 2


@pytest.mark.slow
def test_scale_switch_under_mesh_matches_fixed_shape(setup):
    """Warm two buckets, run at one scale, cross the boundary mid-run with
    sharded inputs; the post-switch step must equal a fresh fixed-shape
    trainer stepping from identical state."""
    spec, params, trainer, mom = setup
    mesh = make_mesh(8)
    shard = lambda b: shard_batch(mesh, b)
    cached = trainer._step._cache_size()
    assert cached >= 2  # warmed by test_warm_populates_jit_cache

    rng = np.random.RandomState(0)
    # mimic the schedule: seen counter runs over the 4000*64 block boundary
    # where multiscale_size leaves the fixed-416 regime (scaled to tiny
    # geometries here: 32 -> 64 stands in for 416 -> the widened bucket)
    block = 4000 * 64
    assert multiscale_size(block - 8, None, True) == 416  # pre-boundary fixed
    b32 = shard(_batch(rng, R=8, b=1, n_cls=2, size=32))
    p1, m1, met1 = trainer.step(params, mom, b32, seen=block - 8, lr=1e-5)
    assert np.isfinite(float(met1["loss"]))

    # geometry switch mid-run (same trainer, same param/momentum state)
    batch64 = _batch(rng, R=8, b=1, n_cls=2, size=64)
    p2, m2, met2 = trainer.step(p1, m1, shard(batch64), seen=block + 56,
                                lr=1e-5)
    assert np.isfinite(float(met2["loss"]))
    # no recompile beyond the warmed buckets
    assert trainer._step._cache_size() == cached

    # fixed-shape reference: a fresh trainer that has only ever seen the
    # post-switch geometry, stepping from the identical state
    ref = MetaTrainer(spec, momentum=0.9, weight_decay=0.0005, donate=False)
    p2r, m2r, met2r = ref.step(p1, m1, shard(batch64), seen=block + 56,
                               lr=1e-5)
    assert float(met2r["loss"]) == pytest.approx(float(met2["loss"]), rel=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p2), jax.tree_util.tree_leaves(p2r)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(m2), jax.tree_util.tree_leaves(m2r)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
