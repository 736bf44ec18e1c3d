"""README perf numbers must be generated from committed artifacts.

Round-3 verdict item 7: a hand-copied (or dangling) figure slipped into
README three rounds running. benchmarks/render_perf.py is the only path
for perf numbers into the docs; this test fails whenever the committed
README block differs from what the committed artifacts render to.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_readme_perf_tables_match_artifacts():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", "render_perf.py"),
         "--check"],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stderr or proc.stdout
