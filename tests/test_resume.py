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


@pytest.mark.usefixtures("ray_session")
def test_mid_wave_shard_death_recovers_byte_identical(tmp_path):
    """Chaos probe: a seen-shard actor dies mid-crawl (the fail_inject
    failpoint kills shard 0 right before wave 2 executes). The engine
    must rebuild the pool from the wave-START snapshot, re-run the
    wave, and produce byte-identical order + seen artifacts."""
    web_root = ensure_testdata(SF)
    ref_out = tmp_path / "ref"
    CrawlEngine(web_root, ref_out, CrawlConfig()).run()

    a = _read_order(ref_out)
    sa = pq.read_table(str(ref_out / "seen.parquet")).to_pandas()
    # both execution modes: driver-local waves AND all-distributed waves
    # recover through the same wave-START snapshot restore
    for name, thresh in (("chaos_local", 4096), ("chaos_dist", 0)):
        chaos_out = tmp_path / name
        CrawlEngine(web_root, chaos_out,
                    CrawlConfig(fail_inject="wave=2",
                                local_wave_threshold=thresh)).run()
        b = _read_order(chaos_out)
        pd.testing.assert_frame_equal(a, b)
        sb = pq.read_table(str(chaos_out / "seen.parquet")).to_pandas()
        pd.testing.assert_frame_equal(sa, sb)


@pytest.mark.usefixtures("ray_session")
def test_mid_wave_death_exhausting_attempts_raises(tmp_path):
    """With wave_max_attempts=1 the failpoint death is fatal — the
    engine must surface the RayError, not silently drop the wave."""
    import ray as _ray
    web_root = ensure_testdata(SF)
    with pytest.raises(_ray.exceptions.RayError):
        CrawlEngine(web_root, tmp_path / "fatal",
                    CrawlConfig(fail_inject="wave=2",
                                wave_max_attempts=1)).run()


def test_user_code_error_fails_fast(ray_session, tmp_path, monkeypatch):
    """A deterministic user-code bug in a stage must surface immediately
    (no wave_max_attempts pool-rebuild retries — the recovery path is
    reserved for actor-death root causes)."""
    import dataclasses

    import pytest
    import ray as _ray

    from ghcrawler_ray.config import CrawlConfig
    from ghcrawler_ray.pipelines import wave as wave_mod
    from ghcrawler_ray.testgen import ensure_testdata

    root = ensure_testdata(0.0001)

    def broken_stage(*a, **k):
        def extract_bucket(g):
            raise ValueError("deterministic user bug")
        return extract_bucket

    monkeypatch.setattr(wave_mod, "make_extract_stage", broken_stage)
    recoveries = []
    orig_recover = wave_mod.CrawlEngine._recover_pool
    monkeypatch.setattr(
        wave_mod.CrawlEngine, "_recover_pool",
        lambda self, k: recoveries.append(k) or orig_recover(self, k))

    eng = wave_mod.CrawlEngine(
        root, tmp_path / "out",
        dataclasses.replace(CrawlConfig(), max_waves=2,
                            local_wave_threshold=0))
    with pytest.raises(_ray.exceptions.RayError):
        eng.run()
    assert recoveries == []     # no pool rebuilds for a user-code error
