"""Docs must not drift from the committed bench artifact.

Rounds 1 and 2 both shipped README/PARITY perf paragraphs quoting numbers
that disagreed with BENCH_DETAIL.json; the perf sections are now generated
(tools/gen_perf_docs.py) and this test pins them to the artifact."""

import subprocess
import sys
import pathlib

ROOT = pathlib.Path(__file__).resolve().parents[1]


def test_perf_docs_match_bench_artifact():
    r = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "gen_perf_docs.py"), "--check"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stdout + r.stderr
