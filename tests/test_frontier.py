"""Frontier-row construction units (reference: request rationalizer
`routes/requests.js:55-80`; pagination priority `githubProcessor.js:58-79`;
attenuation dedup `providers/queuing/attenuatedQueue.js:24-52`)."""

import numpy as np
import pandas as pd

from ghcrawler_ray.config import PRIORITY_RANK, CrawlConfig
from ghcrawler_ray.frontier import (FRONTIER_COLS, links_to_frontier,
                                    seeds_to_frontier)


def test_seeds_to_frontier_schema_and_ranks():
    seeds = pd.DataFrame({
        "url": ["http://a.example/", "http://b.example/"],
        "priority": ["events", "later"],
        "policy": ["default", "default"],
        "seq": [0, 1],
    })
    f = seeds_to_frontier(seeds)
    assert list(f.columns) == FRONTIER_COLS
    assert f["rank"].tolist() == [PRIORITY_RANK["events"], PRIORITY_RANK["later"]]
    assert (f["attempt"] == 0).all() and (f["not_before"] == 0).all()
    assert (~f["claimed"]).all()


def test_links_to_frontier_priority_rule_and_dedup():
    cfg = CrawlConfig()
    links = pd.DataFrame({
        "src_url": ["http://a.example/1"] * 4,
        "dst_url": ["http://b.example/x", "http://b.example/x",  # dup in batch
                    "http://a.example/1?page=2",                 # paginated
                    "HTTP://C.EXAMPLE/y#frag"],                  # normalizes
    })
    f = links_to_frontier(links, pd.Series([0, 0, 0, 0]), clock=100, cfg=cfg)
    assert len(f) == 3                                     # in-batch dedup
    by_url = f.set_index("url")
    assert by_url.loc["http://a.example/1?page=2", "priority"] == cfg.paginated_priority
    assert by_url.loc["http://b.example/x", "priority"] == cfg.default_link_priority
    assert "http://c.example/y" in by_url.index            # normalized
    assert (f["not_before"] == 100 + cfg.wave_ms).all()    # discovered next wave
    assert (f["depth"] == 1).all()
    # seq is the deterministic hash tie-break → stable across calls
    f2 = links_to_frontier(links, pd.Series([0] * 4), clock=100, cfg=cfg)
    assert f[FRONTIER_COLS].equals(f2[FRONTIER_COLS])


def test_links_to_frontier_retry_delay_semantics():
    """not_before for retries is requeue_delay_ms × attempt
    (`lib/crawler.js:152-154`) — checked at the config level."""
    cfg = CrawlConfig()
    assert cfg.requeue_delay_ms == 5_000 and cfg.attempt_cap == 5
    assert PRIORITY_RANK == {"events": 0, "immediate": 1, "soon": 2,
                             "normal": 3, "later": 4}
