"""Unit tests for streaming-shape event ops (ghcrawler_ray/ops/events.py)
on handcrafted frames; the full value-vs-DuckDB gate runs in
test_ops_oracle.py."""

import numpy as np
import pandas as pd
import ray.data

from ghcrawler_ray.ops.events import (LATE_BLOCK, WATERMARK_DELAY_MIN,
                                      late_event_stats)

T0 = np.datetime64("2000-01-01T00:00:00", "us")
MIN = np.timedelta64(60_000_000, "us")


def test_late_event_stats_watermark_and_block_seed(ray_session):
    # arrival order crosses a block boundary (ids LATE_BLOCK-1 and
    # LATE_BLOCK): the second block's running max must seed from the
    # first block's max, not restart
    delay = WATERMARK_DELAY_MIN
    ev = pd.DataFrame({
        "event_id": [0, 1, LATE_BLOCK - 1, LATE_BLOCK, LATE_BLOCK + 1],
        "ts": [T0 + 200 * MIN,              # sets the high watermark
               T0,                          # 200 min behind → late
               T0 + 199 * MIN,              # 1 min behind → on time
               T0 + (200 - delay - 1) * MIN,  # 61 min behind, next block
                                              # → late ONLY via seed
               T0 + (200 - delay) * MIN],   # exactly 60 min → NOT late
        "user_id": [1] * 5,
        "event_type": ["a", "a", "b", "b", "b"],
    })
    out = late_event_stats(ray.data.from_pandas(ev)).to_pandas() \
        .set_index("event_type")
    assert out.loc["a", "n_events"] == 2
    assert out.loc["a", "n_late"] == 1
    assert out.loc["a", "max_lateness_us"] == 200 * 60_000_000
    assert out.loc["b", "n_events"] == 3
    assert out.loc["b", "n_late"] == 1          # the cross-block seed row
    assert out.loc["b", "max_lateness_us"] == (delay + 1) * 60_000_000
