"""Checkpoint / resume: kill after wave k, resume, byte-identical outputs
(SURVEY.md §4.1 checkpoint row; reference analogue: all state external →
kill a process and another resumes mid-stream)."""

from pathlib import Path

import pandas as pd
import pyarrow.parquet as pq
import pytest

from ghcrawler_ray.config import CrawlConfig
from ghcrawler_ray.pipelines.wave import CrawlEngine
from ghcrawler_ray.testgen import ensure_testdata

SF = 0.0001


def _read_order(out_dir: Path) -> pd.DataFrame:
    files = sorted((out_dir / "order").glob("wave=*.parquet"),
                   key=lambda p: int(p.stem.split("=")[1]))
    return pq.read_table([str(f) for f in files]).to_pandas().reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
def test_kill_and_resume_is_byte_identical(tmp_path):
    web_root = ensure_testdata(SF)
    full_out = tmp_path / "full"
    res_full = CrawlEngine(web_root, full_out, CrawlConfig()).run()
    assert res_full["n_waves"] > 6

    # run A: killed after wave 3 (max_waves acts as the kill point)
    part_out = tmp_path / "resumed"
    CrawlEngine(web_root, part_out, CrawlConfig(max_waves=3)).run()
    manifests = sorted((part_out / "manifests").glob("wave=*.json"))
    assert len(manifests) == 3

    # run B: fresh engine object resumes from the checkpoint
    res2 = CrawlEngine(web_root, part_out, CrawlConfig()).run(resume=True)
    assert res2["n_waves"] == res_full["n_waves"]

    a, b = _read_order(full_out), _read_order(part_out)
    pd.testing.assert_frame_equal(a, b)
    sa = pq.read_table(str(full_out / "seen.parquet")).to_pandas()
    sb = pq.read_table(str(part_out / "seen.parquet")).to_pandas()
    pd.testing.assert_frame_equal(sa, sb)


@pytest.mark.usefixtures("ray_session")
def test_resume_with_no_checkpoint_starts_fresh(tmp_path):
    web_root = ensure_testdata(SF)
    out = tmp_path / "fresh"
    res = CrawlEngine(web_root, out, CrawlConfig(max_waves=2)).run(resume=True)
    assert res["n_waves"] == 2
    assert (Path(out) / "manifests" / "wave=0.json").exists()
