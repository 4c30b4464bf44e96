"""Native checkpointing (Orbax) alongside the darknet .weights codec.

The reference's only persistence was the .weights format whose header[3]
`seen` counter restored the LR-schedule position and epoch
(darknet_meta.py:104-105, train_meta.py:94-99). That codec is kept for
interop (models/weights_io.py); this module adds full training-state
checkpoints — params, SGD momentum, seen/processed counters — via Orbax,
so a resumed run continues bit-where-it-left-off rather than re-deriving
schedule state from a sample counter."""

from __future__ import annotations

import os
from typing import Any

import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


_async_ckpt = None


def _async_checkpointer():
    """Process-wide AsyncCheckpointer: save() returns after staging a host
    copy; the serialize+write runs on a background thread, hidden behind
    the next training epochs. Orbax blocks a new save until the previous
    one commits, so back-to-back saves stay well-ordered."""
    global _async_ckpt
    if _async_ckpt is None:
        import orbax.checkpoint as ocp

        _async_ckpt = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _async_ckpt


def wait_for_saves() -> None:
    """Block until any in-flight async checkpoint commits. Call before
    process exit (and before reading a just-written checkpoint)."""
    if _async_ckpt is not None:
        _async_ckpt.wait_until_finished()


def save_train_state(
    directory: str,
    step: int,
    params: Any,
    momentum: Any,
    seen: int,
    processed_batches: int,
) -> str:
    """Write one checkpoint under <directory>/ckpt_<step>."""
    path = os.path.abspath(os.path.join(directory, f"ckpt_{step:08d}"))
    state = {
        "params": params,
        "momentum": momentum,
        "counters": {
            "seen": np.asarray(seen, np.int64),
            "processed_batches": np.asarray(processed_batches, np.int64),
            "step": np.asarray(step, np.int64),
        },
    }
    # FSD_ASYNC_CKPT=1: stage + return immediately, write in background
    # (training continues while the ~0.5 GB state serializes); pair with
    # wait_for_saves() at shutdown
    if os.environ.get("FSD_ASYNC_CKPT", "0") == "1":
        _async_checkpointer().save(path, state, force=True)
    else:
        _checkpointer().save(path, state, force=True)
    return path


def latest_checkpoint(directory: str) -> str | None:
    if not os.path.isdir(directory):
        return None
    # Orbax stages async writes as 'ckpt_N.orbax-checkpoint-tmp-<ts>' in the
    # same directory before the atomic commit rename; a crash mid-save leaves
    # that partial dir behind and it sorts AFTER the last committed one. Only
    # committed checkpoints are resume candidates.
    ckpts = sorted(
        d for d in os.listdir(directory)
        if d.startswith("ckpt_") and ".orbax-checkpoint-tmp" not in d
    )
    return os.path.join(directory, ckpts[-1]) if ckpts else None


def restore_train_state(path: str, template: Any | None = None) -> dict:
    """Restore {params, momentum, counters}. `template` (a matching pytree
    of arrays) restores device placement / dtypes when provided."""
    import orbax.checkpoint as ocp

    ckpt = ocp.PyTreeCheckpointer()
    if template is not None:
        restored = ckpt.restore(os.path.abspath(path), item=template)
    else:
        restored = ckpt.restore(os.path.abspath(path))
    c = restored["counters"]
    restored["counters"] = {k: int(np.asarray(v)) for k, v in c.items()}
    return restored
