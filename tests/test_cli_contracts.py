"""Every root CLI prints its reference-contract usage line on bad argv."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CLIS = [
    ("train.py", "python train.py datacfg cfgfile weightfile"),
    ("train_meta.py", "python train_meta.py datacfg darknetcfg learnetcfg weightfile"),
    ("detect.py", "python detect.py cfgfile weightfile imgfile"),
    ("valid.py", "python valid.py datacfg cfgfile weightfile"),
    ("valid_meta.py", "python valid_meta.py datacfg darknetcfg learnetcfg weightfile"),
    ("valid_ensemble.py", "python valid_ensemble.py datacfg darknetcfg learnetcfg weightfile"),
    ("eval.py", "python eval.py datacfg cfgfile weightfile"),
    ("recall.py", "python recall.py cfgfile weightfile imglist"),
    ("partial.py", "python partial.py cfgfile weightfile output cutoff"),
    ("demo.py", "python demo.py cfgfile weightfile"),
    ("debug.py", "python debug.py cfgfile weightfile imgpath"),
]


@pytest.mark.parametrize("script,usage", CLIS, ids=[c[0] for c in CLIS])
def test_cli_usage(script, usage):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, script)],
        capture_output=True, text=True, cwd=REPO, timeout=120,
    )
    out = r.stdout + r.stderr
    assert "Usage" in out, out[-500:]
    # the full usage line, including positional args, prints verbatim
    assert usage.split("python ")[1] in out, out[-500:]


def test_compile_cache_knob(monkeypatch, tmp_path):
    """FSD_COMPILE_CACHE wires jax's persistent compilation cache."""
    import jax

    from fewshot_detection_tpu.cli.common import enable_compile_cache

    monkeypatch.delenv("FSD_COMPILE_CACHE", raising=False)
    enable_compile_cache()  # no-op without the env var

    cache = str(tmp_path / "cache")
    monkeypatch.setenv("FSD_COMPILE_CACHE", cache)
    enable_compile_cache()
    assert jax.config.jax_compilation_cache_dir == cache
