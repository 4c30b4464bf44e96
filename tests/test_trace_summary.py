"""Trace summarizer: parse a real jax.profiler trace and attribute op time."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fewshot_detection_tpu.utils.trace_summary import (
    find_trace_files,
    format_summary,
    load_events,
    main,
    summarize,
)


@pytest.fixture(scope="module")
def trace_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("trace"))
    f = jax.jit(lambda a, b: jnp.tanh(a @ b) + 1)
    x = jnp.ones((256, 256))
    f(x, x).block_until_ready()
    with jax.profiler.trace(d):
        for _ in range(3):
            y = f(x, x)
        y.block_until_ready()
    return d


def test_summarize_real_trace(trace_dir):
    files = find_trace_files(trace_dir)
    assert files, "profiler wrote no trace"
    s = summarize(load_events(files[0]), device_substr="CPU" if
                  jax.default_backend() == "cpu" else "TPU")
    assert s["total_us"] > 0
    assert s["ops"]
    out = format_summary(s, top=5)
    assert "categories" in out and "ms" in out


def test_cli_main(trace_dir, capsys):
    rc = main([trace_dir, "--top", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "device timeline" in out


def test_cli_main_empty(tmp_path, capsys):
    assert main([str(tmp_path)]) == 1
