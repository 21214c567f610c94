"""Hot-host salting parity: with a tiny salt_threshold the Zipf head hosts
exceed their budgets, get salted into subgroups, and the engine must still
replay the oracle exactly (SURVEY.md §7.4 skew handling; reference has NO
skew handling — salting is the scale-path addition, `lib/crawlerFactory.js:86`
queues just interleave)."""

from pathlib import Path

import pandas as pd
import pyarrow.parquet as pq
import pytest

from ghcrawler_ray.config import CrawlConfig
from ghcrawler_ray.pipelines.oracle import SequentialOracle, load_web
from ghcrawler_ray.pipelines.wave import CrawlEngine
from ghcrawler_ray.testgen import ensure_testdata

CFG = CrawlConfig(salt_threshold=8, salt_factor=3, max_waves=30)


def _order(out: Path) -> pd.DataFrame:
    files = sorted((out / "order").glob("wave=*.parquet"),
                   key=lambda p: int(p.stem.split("=")[1]))
    df = pq.read_table([str(f) for f in files]).to_pandas()
    cols = ["wave", "seq_in_wave", "url", "outcome", "attempt"]
    out_df = df[cols].copy()
    for c in ("wave", "seq_in_wave", "attempt"):
        out_df[c] = out_df[c].astype("int64")
    return out_df.reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("threshold", [0, 1 << 20],
                         ids=["distributed", "local"])
def test_salted_crawl_matches_oracle(tmp_path, threshold):
    web_root = ensure_testdata(0.0001)
    golden = SequentialOracle(load_web(web_root), CFG).run()
    # salting must actually engage for the test to mean anything
    assert (golden["order"].groupby(["wave", "host"]).size() > CFG.salt_threshold).any()

    cfg = CrawlConfig(salt_threshold=CFG.salt_threshold,
                      salt_factor=CFG.salt_factor, max_waves=CFG.max_waves,
                      local_wave_threshold=threshold)
    res = CrawlEngine(web_root, tmp_path / "out", cfg).run()
    eo = _order(tmp_path / "out")
    go = golden["order"][["wave", "seq_in_wave", "url", "outcome", "attempt"]] \
        .astype({"wave": "int64", "seq_in_wave": "int64", "attempt": "int64"}) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(eo, go)
    assert res["n_seen"] == len(golden["seen"])
