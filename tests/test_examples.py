"""The example tours are documentation that executes — pin that they
keep running end-to-end (each spawns its own Spark session via
subprocess, so a broken import or renamed API surfaces here)."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("script", [
    "examples/data_selection_tour.py",
    "examples/round3_features.py",
])
def test_example_runs_clean(script):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, script)],
        capture_output=True, text=True, timeout=420,
        cwd=REPO, env={**os.environ, "PYTHONPATH": REPO},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "==" in out.stdout  # section banners printed
