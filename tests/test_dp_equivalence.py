"""Replica-group data parallelism == gradient summation (exactness check).

The trainer vmaps the episode over a leading R axis and sums the losses, so
one R=2 step must produce exactly the same update as applying SGD to the
sum of the two groups' gradients — and, by extension, the same math the
reference's DataParallel gather produced."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fewshot_detection_tpu.config import parse_cfg
from fewshot_detection_tpu.models.meta import MetaSpec, init_meta_params
from fewshot_detection_tpu.models.spec import build_spec
from fewshot_detection_tpu.train import MetaTrainer, init_momentum
from fewshot_detection_tpu.train.optim import sgd_update
from fewshot_detection_tpu.train.trainer import (
    apply_meta_bn_updates,
)


def _batch(rng, R, b, n, s):
    target = np.zeros((R, b, n, 50, 5), np.float32)
    for r in range(R):
        for i in range(b):
            c = (r + i) % n
            target[r, i, c, 0] = [c, 0.4 + 0.1 * r, 0.5, 0.3, 0.3]
    return {
        "x": rng.rand(R, b, s, s, 3).astype(np.float32),
        "metax": rng.rand(R, n, s, s, 3).astype(np.float32),
        "mask": (rng.rand(R, n, s, s, 1) > 0.5).astype(np.float32),
        "target": target,
        "keep": np.ones((R, b * n), np.float32),
    }


@pytest.mark.slow
def test_two_groups_equal_summed_gradients():
    spec = MetaSpec(
        build_spec(parse_cfg("cfg/tiny_darknet_dynamic.cfg")),
        build_spec(parse_cfg("cfg/tiny_reweighting.cfg")),
    )
    params = init_meta_params(spec, 0)
    trainer = MetaTrainer(spec, momentum=0.9, weight_decay=1e-4, donate=False)
    mom = init_momentum(params)
    rng = np.random.RandomState(0)
    R, b, n, s = 2, 2, 3, 64
    batch = _batch(rng, R, b, n, s)
    lr = 1e-4

    # combined R=2 step
    p2, m2, metrics2 = trainer.step(params, mom, batch, seen=20000, lr=lr)

    # manual: grads of each group separately, summed, one SGD update
    def group_loss(p, r):
        sub = {k: jnp.asarray(v[r : r + 1]) for k, v in batch.items()}
        losses, (bn, metrics) = jax.vmap(
            trainer._episode_loss, in_axes=(None, 0, 0, 0, 0, 0, None)
        )(p, sub["x"], sub["metax"], sub["mask"], sub["target"],
          sub["keep"], jnp.asarray(20000))
        return losses.sum(), (bn, metrics)

    grads = None
    bn_all = []
    for r in range(R):
        (loss_r, (bn_r, metrics_r)), g_r = jax.value_and_grad(
            lambda p: group_loss(p, r), has_aux=True
        )(params)
        bn_all.append(bn_r)
        grads = g_r if grads is None else jax.tree_util.tree_map(
            jnp.add, grads, g_r
        )

    p_ref, m_ref = sgd_update(params, grads, mom, lr, momentum=0.9,
                              weight_decay=1e-4, decay_bn_and_bias=True)
    # BN stats: mean across groups
    bn_merged = jax.tree_util.tree_map(
        lambda a, b: (a[0] + b[0]) / 2, bn_all[0], bn_all[1]
    )
    p_ref = apply_meta_bn_updates(p_ref, bn_merged)

    flat2 = jax.tree_util.tree_leaves(p2)
    flat_ref = jax.tree_util.tree_leaves(p_ref)
    assert len(flat2) == len(flat_ref)
    for a, b in zip(flat2, flat_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-6
        )
