"""CLI entry point (`python -m ghcrawler_ray`) — the ray-job-submit
surface. Ray-free subcommands exercised in-process."""

import json

import pandas as pd
import pyarrow.parquet as pq

from ghcrawler_ray.__main__ import main


def test_status_and_deadletters_empty(tmp_path, capsys):
    (tmp_path / "manifests").mkdir()
    (tmp_path / "manifests" / "wave=0.json").write_text(
        json.dumps({"wave": 0, "next_clock": 10000,
                    "next_frontier_rows": 5, "hot_hosts": []}))
    assert main(["status", "--out", str(tmp_path)]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["waves_complete"] == 1 and out["last"]["wave"] == 0

    assert main(["deadletters", "count", "--out", str(tmp_path)]) == 0
    assert capsys.readouterr().out.strip() == "0"


def test_inject_seeds_cli(tmp_path, capsys):
    seeds = tmp_path / "seeds.parquet"
    pd.DataFrame({"url": ["http://x.example/a"], "priority": ["normal"],
                  "seq": [0]}).to_parquet(seeds)
    assert main(["inject-seeds", "--out", str(tmp_path / "run"),
                 "--seeds", str(seeds), "--wave", "2"]) == 0
    assert json.loads(capsys.readouterr().out) == {
        "injected": 1, "wave": 2, "rejected": False}
    files = list((tmp_path / "run" / "frontier" / "wave=2").glob("*.parquet"))
    assert len(files) == 1
    assert pq.read_table(files[0]).num_rows == 1


def test_ops_cli_list_and_run(tmp_path, capsys, ray_session):
    import json

    from ghcrawler_ray.__main__ import main
    assert main(["ops", "list"]) == 0
    names = json.loads(capsys.readouterr().out)
    assert "doc_exact_dedup" in names and "pmi_bigrams" in names
    out = tmp_path / "op_out"
    assert main(["ops", "run", "--name", "rollup_doc_stats",
                 "--sf-dir", "/root/testdata/sf0.001",
                 "--out", str(out)]) == 0
    res = json.loads(capsys.readouterr().out)
    assert res["rows"] > 0
    import pyarrow.parquet as pq
    files = list(out.glob("*.parquet"))
    assert files and sum(pq.read_metadata(f).num_rows
                         for f in files) == res["rows"]
    # bounded DataFrame results take the single-file path
    out2 = tmp_path / "op_df"
    assert main(["ops", "run", "--name", "bpe_train",
                 "--sf-dir", "/root/testdata/sf0.001",
                 "--out", str(out2)]) == 0
    res2 = json.loads(capsys.readouterr().out)
    t = pq.read_table(str(out2 / "part-0.parquet"))
    assert t.num_rows == res2["rows"] > 0
    assert "merged" in t.column_names


def test_warc_cli_export_ingest(tmp_path, capsys, ray_session):
    """warc export → warc ingest reconstructs a crawlable root with the
    same page count and byte-identical html."""
    from ghcrawler_ray.testgen import ensure_testdata

    root = ensure_testdata(0.0001)
    warc_out = tmp_path / "warc"
    assert main(["warc", "export", "--web-root", str(root),
                 "--out", str(warc_out)]) == 0
    exp = json.loads(capsys.readouterr().out)
    assert exp["records"] > 0

    web_out = tmp_path / "webroot"
    assert main(["warc", "ingest", "--warc-dir", str(warc_out),
                 "--out", str(web_out)]) == 0
    ing = json.loads(capsys.readouterr().out)
    assert ing["pages"] == exp["records"]
    # defaults synthesized when robots/seeds aren't supplied
    assert (web_out / "seeds.parquet").exists()
    assert (web_out / "robots.parquet").exists()
    orig = pq.read_table(sorted(
        str(p) for p in (root / "pages").glob("bucket=*/part-0.parquet"))) \
        .to_pandas()[["url", "html"]].sort_values("url")
    back = pq.read_table(sorted(
        str(p) for p in (web_out / "pages").glob("bucket=*/part-0.parquet"))) \
        .to_pandas()[["url", "html"]].sort_values("url")
    assert orig["url"].tolist() == back["url"].tolist()
    assert all(bytes(a) == bytes(b)
               for a, b in zip(orig["html"], back["html"]))
