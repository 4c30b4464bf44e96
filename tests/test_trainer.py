"""Optimizer parity, LR schedule, and sharded train-step smoke tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fewshot_detection_tpu.config import parse_cfg
from fewshot_detection_tpu.models.meta import MetaSpec, init_meta_params
from fewshot_detection_tpu.models.spec import build_spec
from fewshot_detection_tpu.parallel import make_mesh, replicate, shard_batch
from fewshot_detection_tpu.train import (
    MetaTrainer,
    init_momentum,
    lr_schedule,
    neg_ratio_lr_factor,
    sgd_update,
)

STEPS = (-1, 500, 40000, 60000)
SCALES = (0.1, 10, 0.1, 0.1)


def test_lr_schedule_warmup_curve():
    base = 0.001
    assert lr_schedule(0, base, STEPS, SCALES) == pytest.approx(base * 0.1)
    assert lr_schedule(499, base, STEPS, SCALES) == pytest.approx(base * 0.1)
    assert lr_schedule(500, base, STEPS, SCALES) == pytest.approx(base)
    assert lr_schedule(39999, base, STEPS, SCALES) == pytest.approx(base)
    assert lr_schedule(40000, base, STEPS, SCALES) == pytest.approx(base * 0.1)
    assert lr_schedule(70000, base, STEPS, SCALES) == pytest.approx(base * 0.01)


def test_neg_ratio_lr_factor():
    assert neg_ratio_lr_factor("full", 15) == 15.0
    assert neg_ratio_lr_factor(1, 15) == 3.0
    assert neg_ratio_lr_factor(0, 15) == 1.5
    assert neg_ratio_lr_factor(5, 15) == 8.0
    assert neg_ratio_lr_factor(2, 17) == 17.0


def test_sgd_update_matches_torch():
    import torch

    rng = np.random.RandomState(0)
    w = rng.randn(4, 3).astype(np.float32)
    g = rng.randn(4, 3).astype(np.float32)
    lr, mu, wd = 0.01, 0.9, 0.0005

    tw = torch.nn.Parameter(torch.from_numpy(w.copy()))
    opt = torch.optim.SGD([tw], lr=lr, momentum=mu, dampening=0, weight_decay=wd)
    for _ in range(3):
        opt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        opt.step()

    params = {"w": jnp.asarray(w)}
    grads = {"w": jnp.asarray(g)}
    mom = init_momentum(params)
    for _ in range(3):
        params, mom = sgd_update(params, grads, mom, lr, momentum=mu,
                                 weight_decay=wd)
    np.testing.assert_allclose(
        np.asarray(params["w"]), tw.detach().numpy(), rtol=1e-5, atol=1e-6
    )


def test_sgd_skips_bn_stats_and_optionally_decay():
    params = {
        "w": jnp.ones((2,)),
        "b": jnp.ones((2,)),
        "bn": {
            "gamma": jnp.ones((2,)),
            "beta": jnp.zeros((2,)),
            "mean": jnp.full((2,), 5.0),
            "var": jnp.full((2,), 7.0),
        },
    }
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    mom = init_momentum(params)
    new, _ = sgd_update(params, grads, mom, lr=1.0, momentum=0.0,
                        weight_decay=0.1, decay_bn_and_bias=False)
    # bn stats untouched
    np.testing.assert_array_equal(np.asarray(new["bn"]["mean"]), 5.0)
    np.testing.assert_array_equal(np.asarray(new["bn"]["var"]), 7.0)
    # with zero grads and wd exemption, bias/gamma unchanged, w decayed
    np.testing.assert_array_equal(np.asarray(new["b"]), 1.0)
    np.testing.assert_array_equal(np.asarray(new["bn"]["gamma"]), 1.0)
    np.testing.assert_allclose(np.asarray(new["w"]), 0.9)

    new2, _ = sgd_update(params, grads, mom, lr=1.0, momentum=0.0,
                         weight_decay=0.1, decay_bn_and_bias=True)
    np.testing.assert_allclose(np.asarray(new2["b"]), 0.9)
    np.testing.assert_allclose(np.asarray(new2["bn"]["gamma"]), 0.9)


@pytest.fixture(scope="module")
def meta_setup():
    spec = MetaSpec(
        build_spec(parse_cfg("cfg/darknet_dynamic.cfg")),
        build_spec(parse_cfg("cfg/reweighting_net.cfg")),
    )
    params = init_meta_params(spec, 0)
    return spec, params


def _episode_batch(rng, R, b, n_cls, size):
    target = np.zeros((R, b, n_cls, 50, 5), np.float32)
    for r in range(R):
        for i in range(b):
            c = rng.randint(n_cls)
            target[r, i, c, 0] = [c, 0.5, 0.5, 0.3, 0.3]
    return {
        "x": rng.rand(R, b, size, size, 3).astype(np.float32),
        "metax": rng.rand(R, n_cls, size, size, 3).astype(np.float32),
        "mask": (rng.rand(R, n_cls, size, size, 1) > 0.5).astype(np.float32),
        "target": target,
        "keep": np.ones((R, b * n_cls), np.float32),
    }


@pytest.mark.slow
def test_meta_train_step_sharded_8dev(meta_setup):
    """Full train step over an 8-device CPU mesh: one replica group per
    device, params replicated, grads all-reduced by XLA."""
    spec, params = meta_setup
    mesh = make_mesh(8)
    trainer = MetaTrainer(spec, momentum=0.9, weight_decay=0.0005,
                          donate=False)
    params = replicate(mesh, params)
    mom = replicate(mesh, init_momentum(params))

    rng = np.random.RandomState(0)
    batch = _episode_batch(rng, R=8, b=1, n_cls=3, size=64)
    batch = shard_batch(mesh, batch)

    p1, m1, metrics = trainer.step(params, mom, batch, seen=0, lr=1e-5)
    assert np.isfinite(float(metrics["loss"]))
    assert int(metrics["nGT"]) == 8
    # params actually moved
    dw0 = np.abs(
        np.asarray(p1["darknet"][0]["w"]) - np.asarray(params["darknet"][0]["w"])
    ).max()
    assert dw0 > 0
    # BN running stats updated
    dm = np.abs(
        np.asarray(p1["darknet"][0]["bn"]["mean"])
        - np.asarray(params["darknet"][0]["bn"]["mean"])
    ).max()
    assert dm > 0

    # a second step at a different scale compiles independently and runs
    batch2 = shard_batch(mesh, _episode_batch(rng, R=8, b=1, n_cls=3, size=96))
    p2, m2, metrics2 = trainer.step(p1, m1, batch2, seen=64, lr=1e-5)
    assert np.isfinite(float(metrics2["loss"]))


def test_meta_train_loss_decreases(meta_setup):
    """A few steps on a FIXED batch must reduce the loss."""
    spec, params = meta_setup
    trainer = MetaTrainer(spec, momentum=0.9, weight_decay=0.0, donate=False)
    mom = init_momentum(params)
    rng = np.random.RandomState(1)
    batch = _episode_batch(rng, R=1, b=2, n_cls=3, size=64)

    losses = []
    seen = 20000  # past warm-up so the coord loss is sparse
    for i in range(6):
        params, mom, metrics = trainer.step(params, mom, batch, seen, lr=2e-5)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_plain_trainer_remat_is_exact():
    """PlainTrainer(remat=True) must match the non-remat step to reduction-
    reorder ulps (rematerialization reschedules, it does not change math) —
    the FSD_REMAT=1 CLI knob needed to fit the 416px b64 step in HBM.
    Measured worst deviation on this fixture: 3e-7 abs (loss rel 4e-7)."""
    from fewshot_detection_tpu.models.darknet import init_params
    from fewshot_detection_tpu.train import PlainTrainer

    spec = build_spec(parse_cfg("cfg/tiny-yolo-voc.cfg"))
    params = init_params(spec, 11)
    rng = np.random.RandomState(3)
    R, b, s = 1, 2, 64
    target = np.zeros((R, b, 50, 5), np.float32)
    target[0, 0, 0] = [4, 0.5, 0.5, 0.4, 0.4]
    target[0, 1, 0] = [9, 0.3, 0.6, 0.2, 0.3]
    batch = {
        "x": rng.rand(R, b, s, s, 3).astype(np.float32),
        "target": target,
        "keep": np.ones((R, b), np.float32),
    }

    outs = []
    for remat in (False, True):
        tr = PlainTrainer(spec, momentum=0.9, weight_decay=5e-4,
                          donate=False, remat=remat)
        mom = init_momentum(params)
        p2, m2, metrics = tr.step(params, mom, batch, seen=0, lr=1e-4)
        outs.append((p2, float(metrics["loss"])))

    (p_a, l_a), (p_b, l_b) = outs
    assert l_a == pytest.approx(l_b, rel=1e-5)
    la, lb = jax.tree_util.tree_leaves(p_a), jax.tree_util.tree_leaves(p_b)
    assert len(la) == len(lb)
    for a, b2 in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b2), rtol=1e-4, atol=1e-5
        )


def test_clip_by_global_norm():
    from fewshot_detection_tpu.train.optim import clip_by_global_norm

    g = {"a": np.full((3,), 3.0, np.float32), "b": np.full((4,), 4.0, np.float32)}
    gn = np.sqrt(3 * 9.0 + 4 * 16.0)  # ~9.54
    clipped = clip_by_global_norm(
        {k: jnp.asarray(v) for k, v in g.items()}, 1.0
    )
    cn = np.sqrt(sum(float((np.asarray(v) ** 2).sum()) for v in clipped.values()))
    assert cn == pytest.approx(1.0, rel=1e-5)
    np.testing.assert_allclose(np.asarray(clipped["a"]), g["a"] / gn, rtol=1e-5)
    # under the limit: untouched
    same = clip_by_global_norm({k: jnp.asarray(v) for k, v in g.items()}, 100.0)
    np.testing.assert_allclose(np.asarray(same["b"]), g["b"], rtol=1e-6)


@pytest.mark.slow
def test_multi_step_matches_sequential_steps(meta_setup):
    """MetaTrainer.multi_step (N steps in one lax.scan dispatch) computes
    the same math as N sequential step() calls. The scanned body fuses
    differently, so float32 reduction reordering (~1e-7 rel per step)
    compounds through the params across steps — tolerances widen with step
    index; an indexing/order bug (wrong seen, lr, or batch slice) would
    show up as O(1) differences."""
    spec, params = meta_setup
    rng = np.random.RandomState(7)
    N, R, b, n_cls, size = 3, 1, 1, 3, 64
    batches = [_episode_batch(rng, R, b, n_cls, size) for _ in range(N)]
    seens = [20000 + 64 * (i + 1) for i in range(N)]  # past coord warm-up
    lrs = [1e-6, 2e-6, 1e-6]

    t_seq = MetaTrainer(spec, momentum=0.9, weight_decay=5e-4, donate=False)
    p, m = params, init_momentum(params)
    seq_losses = []
    for i in range(N):
        p, m, metrics = t_seq.step(p, m, batches[i], seens[i], lrs[i])
        seq_losses.append(float(metrics["loss"]))

    t_scan = MetaTrainer(spec, momentum=0.9, weight_decay=5e-4, donate=False)
    stacked = {
        k: np.stack([bt[k] for bt in batches]) for k in batches[0]
    }
    p2, m2, ms = t_scan.multi_step(
        params, init_momentum(params), stacked, seens, lrs
    )
    scan_losses = np.asarray(ms["loss"])
    for i, tol in enumerate((1e-5, 1e-4, 1e-3)):
        assert scan_losses[i] == pytest.approx(seq_losses[i], rel=tol), (
            i, scan_losses, seq_losses
        )
    # measured drift after 3 steps on this fixture: <=2.3e-5 abs, on
    # near-zero elements (reduction reordering compounded via momentum)
    for a, b2 in zip(jax.tree_util.tree_leaves(p),
                     jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   rtol=1e-3, atol=1e-4)


def test_compiler_options_env_parsing(monkeypatch):
    from fewshot_detection_tpu.train.trainer import _compiler_options

    monkeypatch.delenv("FSD_XLA_OPTS", raising=False)
    assert _compiler_options() is None
    monkeypatch.setenv("FSD_XLA_OPTS", " ")
    assert _compiler_options() is None
    monkeypatch.setenv(
        "FSD_XLA_OPTS",
        "xla_tpu_scoped_vmem_limit_kib=65536, xla_flag=true ,,",
    )
    assert _compiler_options() == {
        "xla_tpu_scoped_vmem_limit_kib": "65536",
        "xla_flag": "true",
    }
