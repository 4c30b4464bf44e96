"""Timestamped logging + per-step loss line (utils.py:571-572,
region_loss.py:364 of /root/reference)."""

from __future__ import annotations

import time


def log(message: str) -> None:
    print(f"{time.strftime('%Y-%m-%d %H:%M:%S', time.localtime())} {message}")


def format_loss_line(seen: int, metrics: dict) -> str:
    # fetch the whole metrics dict in ONE device transfer: per-scalar
    # float() costs a full host<->device round-trip each, which dominates
    # the step wall time on remote-attached devices (measured ~2.8 s/step
    # through the TPU tunnel for 7 sequential scalar fetches)
    import jax

    metrics = jax.device_get(metrics)
    g = lambda k: float(metrics[k])
    return (
        f"{seen}: nGT {int(g('nGT'))}, recall {int(g('nCorrect'))}, "
        f"proposals {int(g('nProposals'))}, loss: x {g('loss_x'):f}, "
        f"y {g('loss_y'):f}, w {g('loss_w'):f}, h {g('loss_h'):f}, "
        f"conf {g('loss_conf'):f}, cls {g('loss_cls'):f}, total {g('loss'):f}"
    )
