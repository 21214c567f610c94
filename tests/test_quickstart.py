"""The examples/quickstart.py script must run end-to-end (crawl →
store → curate → cluster → pack → shards) in a fresh process — the
switch-from-the-reference smoke path."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_quickstart_end_to_end(tmp_path):
    cp = subprocess.run(
        [sys.executable, str(REPO / "examples" / "quickstart.py"),
         "--sf", "0.0001", "--out", str(tmp_path / "q"),
         "--docs", "/root/testdata/sf0.001/documents.parquet"],
        capture_output=True, text=True, timeout=420)
    assert cp.returncode == 0, cp.stderr[-2000:]
    lines = [json.loads(l) for l in cp.stdout.strip().splitlines()
             if l.startswith("{")]
    assert lines[0]["crawl"]["seen"] > 0
    assert lines[1]["store"]["live_docs"] > 0
    final = lines[-1]
    assert final["curate_kept"] > 0
    assert final["canonical_docs"] > 0
    assert final["shards_written"] == 8
    assert (tmp_path / "q" / "shards").exists()
