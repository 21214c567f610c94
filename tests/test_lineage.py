"""Discovery-lineage BFS (J5/L1 history semi-join): shortest path,
deterministic min-parent tie-break, cycle / re-entry suppression."""

import pandas as pd
import ray

from ghcrawler_ray.lineage import SEP, discovery_lineage


def _links(pairs):
    return ray.data.from_pandas(pd.DataFrame(
        {"src_url": [a for a, _ in pairs], "dst_url": [b for _, b in pairs]}))


def test_bfs_shortest_path_and_tiebreak():
    # d reachable at depth 2 via b and via c -> parent must be min(b, c)
    ds = _links([("http://a/1", "http://b/2"), ("http://a/1", "http://c/3"),
                 ("http://b/2", "http://d/4"), ("http://c/3", "http://d/4")])
    out = discovery_lineage(ds, ["http://a/1"]).to_pandas() \
        .sort_values(["depth", "url"]).reset_index(drop=True)
    assert out["url"].tolist() == [
        "http://a/1", "http://b/2", "http://c/3", "http://d/4"]
    assert out["depth"].tolist() == [0, 1, 1, 2]
    d4 = out[out["url"] == "http://d/4"].iloc[0]
    assert d4["parent_url"] == "http://b/2"
    assert d4["lineage"] == SEP.join(["http://a/1", "http://b/2", "http://d/4"])


def test_cycles_and_seen_suppression():
    # cycle a->b->a: a must NOT reappear at depth 2; self-loop ignored
    ds = _links([("http://a/1", "http://b/2"), ("http://b/2", "http://a/1"),
                 ("http://b/2", "http://b/2")])
    out = discovery_lineage(ds, ["http://a/1"]).to_pandas()
    assert sorted(out["url"]) == ["http://a/1", "http://b/2"]
    assert out["depth"].max() == 1


def test_max_depth_and_malformed_seeds():
    ds = _links([("http://a/1", "http://b/2"), ("http://b/2", "http://c/3"),
                 ("http://c/3", "http://d/4")])
    out = discovery_lineage(ds, ["http://a/1", "not-a-url"],
                            max_depth=2).to_pandas()
    assert "http://d/4" not in set(out["url"])      # beyond max_depth
    assert "not-a-url" not in set(out["url"])       # malformed seed dropped
    assert len(out) == 3
