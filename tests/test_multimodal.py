"""Multimodal binary-column plumbing: actor-pool feature stage over the
pages table's html payloads; real decode is stubbed (no image libs in this
container) behind a clean NotImplementedError gate."""

import hashlib

import pandas as pd
import pytest

from ghcrawler_ray.ops.multimodal import MediaFeatureStage, media_features
from ghcrawler_ray.testgen import ensure_testdata


def test_fake_mode_features_deterministic():
    stage = MediaFeatureStage()
    df = pd.DataFrame({"url": ["u1", "u2"],
                       "html": [b"<html>abc</html>", b"<html>defg</html>"]})
    out = stage(df)
    assert out["n_bytes"].tolist() == [16, 17]
    assert out["content_md5"].iloc[0] == hashlib.md5(b"<html>abc</html>").hexdigest()
    assert out["width"].tolist() == [16 % 1920, 17 % 1920]
    assert out["height"].tolist() == [16 % 1080, 17 % 1080]


def test_real_decode_gated_cleanly():
    with pytest.raises(NotImplementedError, match="image"):
        MediaFeatureStage(mode="pil")


def test_actor_pool_pipeline(ray_session):
    import ray.data
    root = ensure_testdata(0.0001)
    files = sorted(str(p) for p in (root / "pages").glob("bucket=*/part-0.parquet"))
    ds = ray.data.read_parquet(files)
    out = media_features(ds).to_pandas()
    assert len(out) == ds.count()
    assert set(out.columns) == {"url", "n_bytes", "content_md5", "width", "height"}
    assert not out["url"].duplicated().any()
