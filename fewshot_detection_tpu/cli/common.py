"""Shared CLI plumbing: config resolution and device/replica layout."""

from __future__ import annotations

import math
import os

from ..config import Settings, parse_cfg, read_data_cfg


def resolve_configs(datacfg: str, netcfg: str, learnetcfg: str | None = None):
    """argv -> (data_options, net_blocks, learnet_blocks, settings)."""
    data_options = read_data_cfg(datacfg)
    net_blocks = parse_cfg(netcfg)
    learnet_blocks = parse_cfg(learnetcfg) if learnetcfg else None
    settings = Settings.configure(
        data_options,
        net_blocks[0],
        learnet_blocks[0] if learnet_blocks else None,
    )
    return data_options, net_blocks, learnet_blocks, settings


def replica_layout(batch_size: int):
    """(n_groups, per_group_batch): one replica group per device, as long as
    the batch divides evenly; otherwise fall back to a single group."""
    import jax

    n_dev = len(jax.devices())
    if batch_size % n_dev == 0:
        return n_dev, batch_size // n_dev
    return 1, batch_size


def ensure_backup_dir(settings) -> str:
    backupdir = settings.backup
    os.makedirs(backupdir, exist_ok=True)
    return backupdir
