"""Hot/live config — engine ↔ oracle parity for between-wave patches.

The reference patches a RUNNING crawler's options (queue weights, loop
counts, delays) over redis pub-sub without restart
(`lib/crawlerFactory.js:194-251`). The analogue is wave-quantized:
``CrawlEngine(patches={wave: {field: value}})`` in-process, plus the
``{out}/config_patches/wave=K.json`` file channel (CLI ``patch-config``)
for running/checkpointed crawls, replayed deterministically on resume.
"""

import json
from pathlib import Path

import pandas as pd
import pyarrow.parquet as pq
import pytest

from ghcrawler_ray.config import CrawlConfig
from ghcrawler_ray.pipelines.oracle import SequentialOracle, load_web
from ghcrawler_ray.pipelines.wave import PATCHABLE_FIELDS, CrawlEngine
from ghcrawler_ray.testgen import ensure_testdata

SF = 0.0001
ORDER_COLS = ["wave", "seq_in_wave", "url", "host", "priority", "outcome",
              "attempt"]

#: throttle hard at wave 2 (wave_ms down ⇒ every robots-backed host
#: budget = wave_ms // crawl_delay shrinks), relax the retry delay at
#: wave 4 — touches politeness, the clock, and routing, so divergence
#: would be visible
PATCHES = {2: {"wave_ms": 1_000, "default_max_per_window": 2},
           4: {"requeue_delay_ms": 1_000}}


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


@pytest.fixture(scope="module")
def web_root():
    return ensure_testdata(SF)


@pytest.fixture(scope="module")
def golden_patched(web_root):
    return SequentialOracle(load_web(web_root), CrawlConfig(),
                            patches=PATCHES).run()


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("mode", ["local", "distributed"])
def test_patched_order_parity(mode, web_root, golden_patched, tmp_path):
    threshold = 0 if mode == "distributed" else 1 << 20
    cfg = CrawlConfig(local_wave_threshold=threshold)
    res = CrawlEngine(web_root, tmp_path / "out", cfg,
                      patches=PATCHES).run()
    eo = _norm(_read_order(Path(res["out_dir"])), ORDER_COLS)
    go = _norm(golden_patched["order"], ORDER_COLS)
    pd.testing.assert_frame_equal(eo, go)
    # the throttle actually bit: wave 2+ must show deferred rows that
    # the unpatched crawl would have admitted
    assert (eo.loc[eo["wave"] >= 2, "outcome"] == "deferred").any()


@pytest.mark.usefixtures("ray_session")
def test_file_channel_and_resume_replay(web_root, golden_patched, tmp_path):
    """A patch written through the file channel (the operator's pub-sub
    analogue) applies identically, and a kill+resume AFTER the patched
    wave replays it — the resumed run equals the uninterrupted one."""
    out = tmp_path / "out"
    CrawlEngine(web_root, out, CrawlConfig(max_waves=1)).run()
    d = out / "config_patches"
    d.mkdir(parents=True, exist_ok=True)
    for k, patch in PATCHES.items():
        (d / f"wave={k}.json").write_text(json.dumps(patch))
    # resume through wave 3 (patch at 2 applies live), kill, resume again
    # (patch at 2 must REPLAY so waves 3+ keep the patched clock)
    CrawlEngine(web_root, out, CrawlConfig(max_waves=3)).run(resume=True)
    CrawlEngine(web_root, out, CrawlConfig()).run(resume=True)
    eo = _norm(_read_order(out), ORDER_COLS)
    go = _norm(golden_patched["order"], ORDER_COLS)
    pd.testing.assert_frame_equal(eo, go)


def test_non_patchable_fields_rejected(web_root, tmp_path):
    eng = CrawlEngine(web_root, tmp_path / "out", CrawlConfig(),
                      patches={1: {"n_shards": 2}})
    with pytest.raises(ValueError, match="non-patchable"):
        eng._apply_patch_dict({"n_shards": 2})
    assert "n_shards" not in PATCHABLE_FIELDS
    assert "wave_ms" in PATCHABLE_FIELDS


def test_mistyped_patch_values_rejected(web_root, tmp_path):
    """Value-TYPE validation at patch time: a mistyped patch (e.g.
    {"wave_ms": "5000"}) must fail when applied — never be persisted to
    config_patches/ where resume would replay it into a crash loop."""
    eng = CrawlEngine(web_root, tmp_path / "out", CrawlConfig())
    with pytest.raises(ValueError, match="wave_ms"):
        eng._apply_patch_dict({"wave_ms": "5000"})
    with pytest.raises(ValueError, match="emit_order_log"):
        eng._apply_patch_dict({"emit_order_log": 1})   # int is not bool
    with pytest.raises(ValueError, match="allowed_host_suffixes"):
        eng._apply_patch_dict({"allowed_host_suffixes": ".example"})
    with pytest.raises(ValueError, match="allowed_host_suffixes"):
        eng._apply_patch_dict({"allowed_host_suffixes": [".example", 7]})
    with pytest.raises(Exception):                     # malformed regex
        eng._apply_patch_dict({"deny_url_regex": "("})
    with pytest.raises(ValueError, match="cred_rules"):
        eng._apply_patch_dict({"cred_rules": [["/p/", "elevated", "x"]]})
    with pytest.raises(ValueError, match="cred_windows"):
        eng._apply_patch_dict({"cred_windows": [["partner", "10"]]})
    # valid shapes still pass, JSON lists become tuples
    eng._apply_patch_dict({"wave_ms": 5000,
                           "allowed_host_suffixes": [".example"],
                           "cred_rules": [["/p/3$", "elevated"]],
                           "cred_windows": [["partner", 3]]})
    assert eng.cfg.wave_ms == 5000
    assert eng.cfg.cred_rules == (("/p/3$", "elevated"),)
    assert eng.cfg.cred_windows == (("partner", 3),)
    # nothing was persisted by the failing applications
    assert not (tmp_path / "out" / "config_patches").exists()


def test_patch_config_cli_rejects_bad_value(tmp_path, capsys):
    """The patch-config CLI shares the validator: a mistyped value exits
    1 with an error instead of writing the patch file."""
    from ghcrawler_ray.__main__ import main

    rc = main(["patch-config", "--out", str(tmp_path / "out"),
               "--wave", "3", "--patch", '{"wave_ms": "5000"}'])
    assert rc == 1
    out = json.loads(capsys.readouterr().out)
    assert "error" in out and "wave_ms" in out["error"]
    assert not (tmp_path / "out" / "config_patches").exists()
    rc = main(["patch-config", "--out", str(tmp_path / "out"),
               "--wave", "3", "--patch", '{"wave_ms": 5000}'])
    assert rc == 0
    f = tmp_path / "out" / "config_patches" / "wave=3.json"
    assert json.loads(f.read_text()) == {"wave_ms": 5000}
