"""Shared CLI plumbing: config resolution and device/replica layout."""

from __future__ import annotations

import math
import os

from ..config import Settings, parse_cfg, read_data_cfg


def enable_compile_cache() -> None:
    """FSD_COMPILE_CACHE=<dir>: persistent XLA compilation cache across
    processes. The full 416 px train step takes 1-3 min to compile on TPU
    (once per multiscale bucket); with the cache a restarted run (resume,
    eval sweep over many checkpoints) skips all of it."""
    cache_dir = os.environ.get("FSD_COMPILE_CACHE")
    if not cache_dir:
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def resolve_configs(datacfg: str, netcfg: str, learnetcfg: str | None = None):
    """argv -> (data_options, net_blocks, learnet_blocks, settings)."""
    enable_compile_cache()
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
