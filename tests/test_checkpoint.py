"""Orbax train-state checkpointing + profiling utils."""

import numpy as np

import jax.numpy as jnp

from fewshot_detection_tpu.train.checkpoint import (
    latest_checkpoint,
    restore_train_state,
    save_train_state,
)
from fewshot_detection_tpu.utils.profiling import StepTimer, trace


def test_checkpoint_roundtrip(tmp_path):
    params = {"darknet": [{"w": jnp.arange(6.0).reshape(2, 3)}, None],
              "learnet": [{"b": jnp.ones(4)}]}
    mom = {"darknet": [{"w": jnp.zeros((2, 3))}, None],
           "learnet": [{"b": jnp.full((4,), 0.5)}]}
    d = str(tmp_path / "ckpts")
    save_train_state(d, step=3, params=params, momentum=mom,
                     seen=192, processed_batches=3)
    save_train_state(d, step=7, params=params, momentum=mom,
                     seen=448, processed_batches=7)

    latest = latest_checkpoint(d)
    assert latest.endswith("ckpt_00000007")
    restored = restore_train_state(latest)
    assert restored["counters"] == {"seen": 448, "processed_batches": 7,
                                    "step": 7}
    np.testing.assert_allclose(
        np.asarray(restored["params"]["darknet"][0]["w"]),
        np.arange(6.0).reshape(2, 3),
    )
    np.testing.assert_allclose(
        np.asarray(restored["momentum"]["learnet"][0]["b"]), 0.5
    )


def test_async_checkpoint_roundtrip(tmp_path, monkeypatch):
    """FSD_ASYNC_CKPT=1 stages the save in the background; after
    wait_for_saves() the checkpoint restores identically to the sync path."""
    from fewshot_detection_tpu.train.checkpoint import wait_for_saves

    monkeypatch.setenv("FSD_ASYNC_CKPT", "1")
    params = {"darknet": [{"w": jnp.arange(6.0).reshape(2, 3)}]}
    mom = {"darknet": [{"w": jnp.full((2, 3), 0.25)}]}
    d = str(tmp_path / "ckpts")
    save_train_state(d, step=5, params=params, momentum=mom,
                     seen=320, processed_batches=5)
    wait_for_saves()
    restored = restore_train_state(latest_checkpoint(d))
    assert restored["counters"]["seen"] == 320
    np.testing.assert_allclose(
        np.asarray(restored["momentum"]["darknet"][0]["w"]), 0.25
    )


def test_latest_checkpoint_empty(tmp_path):
    assert latest_checkpoint(str(tmp_path / "none")) is None


def test_step_timer():
    t = StepTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    s = t.summary(images=10)
    assert "a " in s and "b " in s and "images/s" in s
    assert t.counts["a"] == 2


def test_trace_noop_without_dir(monkeypatch):
    monkeypatch.delenv("FSD_PROFILE_DIR", raising=False)
    with trace():
        x = 1 + 1
    assert x == 2
