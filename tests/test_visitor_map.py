"""Visitor-map edge gating + typed link relations (`lib/visitorMap.js`,
`lib/request.js:119-140`): classification units, map navigation, the
golden admitted-out-link set per map (the gitHubProcessorTests.js:201-257
style assertion), and engine↔oracle parity under a gating policy."""

import os
import shutil
from pathlib import Path

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ghcrawler_ray.config import CrawlConfig
from ghcrawler_ray.frontier import links_to_frontier
from ghcrawler_ray.pipelines.oracle import SequentialOracle, load_web
from ghcrawler_ray.pipelines.wave import CrawlEngine
from ghcrawler_ray.stages.extract import extract_links_df
from ghcrawler_ray.testgen import ensure_testdata
from ghcrawler_ray.visitor_map import (MAPS, advance_one, classify_rels,
                                       gate_links, split_spec)

SF = 0.0001
ORDER_COLS = ["wave", "seq_in_wave", "url", "host", "priority", "outcome",
              "attempt"]


def test_classify_rels():
    src = pd.Series(["http://a.example/p/1"] * 4)
    dst = pd.Series(["http://a.example/p/1?page=2",   # same host, paginated
                     "http://a.example/p/9",          # same host
                     "http://b.example/p/1",          # cross host
                     "http://B.EXAMPLE/p/1?page=3"])  # cross host + paginated
    assert list(classify_rels(src, dst)) == [
        "siblings", "resource", "relation", "relation"]


def test_split_and_advance():
    assert split_spec("default") == ("default", None, "root")
    assert split_spec("default:sameHost") == ("default", "sameHost", "root")
    assert split_spec("always:shallow@leaf") == ("always", "shallow", "leaf")
    # no map → admit all, spec unchanged
    assert advance_one("default", "relation") == (True, "default")
    # sameHost: follows resource/siblings, blocks relation
    assert advance_one("default:sameHost", "resource") == \
        (True, "default:sameHost@root")
    assert advance_one("default:sameHost", "relation")[0] is False
    # shallow: one hop then terminal
    ok, child = advance_one("default:shallow", "resource")
    assert ok and child == "default:shallow@leaf"
    assert advance_one(child, "resource")[0] is False
    # self map is terminal at the root
    for rel in ("siblings", "resource", "relation"):
        assert advance_one("default:self", rel)[0] is False
    # unknown map fails open (reference: unmodelled segments)
    assert advance_one("default:nosuchmap", "relation") == \
        (True, "default:nosuchmap")


def test_gate_links_vectorized_matches_scalar():
    specs = pd.Series(["default", "default:self", "default:sameHost",
                       "default:shallow@leaf", "default:collection"] * 3)
    rels = pd.Series((["siblings", "resource", "relation"] * 5))
    admit, child = gate_links(specs, rels.to_numpy(dtype=object))
    for i in range(len(specs)):
        a, c = advance_one(specs.iloc[i], rels.iloc[i])
        assert admit[i] == a and child[i] == c


def test_links_to_frontier_gating_golden():
    """The exact admitted out-link set per map for one synthetic page."""
    links = pd.DataFrame({
        "src_url": ["http://h0.example/p/1"] * 3,
        "dst_url": ["http://h0.example/p/1?page=2",
                    "http://h0.example/p/7",
                    "http://h1.example/p/0"],
        "depth": [0, 0, 0],
    })
    cfg = CrawlConfig()

    def admitted(spec):
        f = links_to_frontier(links.assign(policy=spec), links["depth"], 0, cfg)
        return sorted(f["url"])

    assert admitted("default") == sorted(links["dst_url"])
    assert admitted("default:all") == sorted(links["dst_url"])
    assert admitted("default:self") == []
    assert admitted("default:sameHost") == [
        "http://h0.example/p/1?page=2", "http://h0.example/p/7"]
    # advanced spec rides on the admitted children
    f = links_to_frontier(links.assign(policy="default:shallow"),
                          links["depth"], 0, cfg)
    assert set(f["policy"]) == {"default:shallow@leaf"}


def _gated_web_root(tmp_path: Path) -> Path:
    """Base web with every seed's policy set to default:sameHost."""
    root = ensure_testdata(SF)
    custom = tmp_path / "web"
    custom.mkdir()
    for name in ("pages", "pages_meta"):
        os.symlink(root / name, custom / name)
    shutil.copy(root / "robots.parquet", custom / "robots.parquet")
    seeds = pq.read_table(str(root / "seeds.parquet")).to_pandas()
    seeds["policy"] = "default:sameHost"
    pq.write_table(pa.Table.from_pandas(seeds, preserve_index=False),
                   custom / "seeds.parquet")
    return custom


def _norm(df, cols):
    df = df[cols].copy()
    for c in cols:
        df[c] = df[c].astype("int64") if df[c].dtype.kind in "iu" \
            else df[c].fillna("").astype(str)
    return df.reset_index(drop=True)


def _read_order(out: Path) -> pd.DataFrame:
    files = sorted((out / "order").glob("wave=*.parquet"),
                   key=lambda p: int(p.stem.split("=")[1]))
    return pq.read_table([str(f) for f in files]).to_pandas()


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("threshold", [0, 1 << 20],
                         ids=["distributed", "local"])
def test_samehost_policy_crawl_matches_oracle(tmp_path, threshold):
    web_root = _gated_web_root(tmp_path)
    golden = SequentialOracle(load_web(web_root), CrawlConfig()).run()
    CrawlEngine(web_root, tmp_path / "out",
                CrawlConfig(local_wave_threshold=threshold)).run()
    eo = _read_order(tmp_path / "out")
    pd.testing.assert_frame_equal(_norm(eo, ORDER_COLS),
                                  _norm(golden["order"], ORDER_COLS))
    # gating is real: beyond wave 0, every scheduled url stays on a host
    # that seeded it (sameHost never crosses hosts), and the ungated base
    # crawl visits strictly more urls
    seeds = pq.read_table(str(web_root / "seeds.parquet")).to_pandas()
    seed_hosts = set(seeds["url"].str.extract(
        r"^https?://([^/?#]+)", expand=False).dropna().str.lower())
    later = eo[(eo["wave"] > 0) & (eo["outcome"] != "bounced")]
    assert len(later) and later["host"].str.lower().isin(seed_hosts).all()
    base = SequentialOracle(load_web(ensure_testdata(SF)), CrawlConfig()).run()
    assert len(base["order"]) > len(eo)
