"""Demo-rot guard: the example scripts must keep running end-to-end.

Each demo owns (and stops) its own SparkSession, so they run as
subprocesses at the smallest scale factor rather than inside the shared
test session."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize(
    "script,needle",
    [
        ("examples/factorized_ml.py", "train"),
        ("examples/pipeline_demo.py", "bm25"),
        ("examples/incremental_demo.py", "old data untouched"),
        ("examples/analytics_demo.py", "analytics demo done"),
        ("examples/monitor_demo.py", "monitor demo done"),
    ],
)
def test_demo_runs_end_to_end(script, needle):
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, script), SF],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=ROOT,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert needle in proc.stdout.lower(), proc.stdout[-2000:]
