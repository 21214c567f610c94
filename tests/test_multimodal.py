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


def test_resize_stage_aspect_preserving():
    from ghcrawler_ray.ops.multimodal import MediaResizeStage
    stage = MediaResizeStage(target_w=224, target_h=224)
    df = pd.DataFrame({"url": ["u1"], "html": [b"x" * 500]})
    out = stage(df)
    # src 500x500 -> scale 224/500, floor -> 224x224; never upscale
    assert out[["src_w", "src_h", "out_w", "out_h"]].values.tolist() == \
        [[500, 500, 224, 224]]
    small = stage(pd.DataFrame({"url": ["u2"], "html": [b"y" * 100]}))
    assert small[["out_w", "out_h"]].values.tolist() == [[100, 100]]


def test_frame_sample_stage_windows():
    from ghcrawler_ray.ops.multimodal import FrameSampleStage
    stage = FrameSampleStage(n_frames=4)
    payload = bytes(range(256))
    out = stage(pd.DataFrame({"url": ["v"], "html": [payload]}))
    assert out["frame_index"].tolist() == [0, 1, 2, 3]
    assert out["offset"].tolist() == [0, 64, 128, 192]
    assert out["frame_md5"].iloc[2] == hashlib.md5(payload[128:192]).hexdigest()


def test_resize_and_frames_gated():
    from ghcrawler_ray.ops.multimodal import FrameSampleStage, MediaResizeStage
    with pytest.raises(NotImplementedError):
        MediaResizeStage(mode="pil")
    with pytest.raises(NotImplementedError):
        FrameSampleStage(mode="decord")


def test_text_embed_stage_deterministic_and_bounded():
    """Hash-model embedding stub: deterministic, components in [-1, 1),
    real-runtime mode import-gated."""
    import pandas as pd
    import pytest as _pytest
    from ghcrawler_ray.ops.multimodal import TextEmbedStage
    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["alpha", "beta", "alpha"]})
    st = TextEmbedStage()
    a = st(df)
    b = TextEmbedStage()(df)
    pd.testing.assert_frame_equal(a, b)
    for j in range(4):
        col = a[f"e{j}"]
        assert ((col >= -1.0) & (col < 1.0)).all()
    # same text -> same vector; different text -> (md5) different vector
    assert (a.iloc[0, 1:] == a.iloc[2, 1:]).all()
    assert (a.iloc[0, 1:] != a.iloc[1, 1:]).any()
    with _pytest.raises(NotImplementedError):
        TextEmbedStage(mode="torch")
    with _pytest.raises(ValueError):
        TextEmbedStage(dim=9)


def test_doc_embeddings_actor_pool(ray_session, tmp_path):
    """End-to-end actor-pool inference over a Dataset."""
    import pandas as pd
    import ray.data
    from ghcrawler_ray.ops.multimodal import doc_embeddings
    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": range(10), "text": [f"doc {i}" for i in range(10)],
    }))
    out = doc_embeddings(docs).to_pandas().sort_values("doc_id")
    assert list(out.columns) == ["doc_id", "e0", "e1", "e2", "e3"]
    assert len(out) == 10


def test_audio_chunk_windows(ray_session):
    """Chunk boundaries: 100 ms windows at 75 ms hop over an 8 B/ms
    payload; last window clamps to the duration; md5 matches the span."""
    import hashlib

    import pandas as pd
    import ray.data

    from ghcrawler_ray.ops.multimodal import AudioChunkStage, audio_chunks

    payload = bytes(range(256)) * 8          # 2048 B → 256 ms
    df = pd.DataFrame({"url": ["u1"], "html": [payload]})
    out = audio_chunks(ray.data.from_pandas(df)).to_pandas() \
        .sort_values("chunk_index").reset_index(drop=True)
    # dur=256: n = 1 + ceil((256-100)/75) = 1 + ceil(156/75) = 4
    assert out["chunk_index"].tolist() == [0, 1, 2, 3]
    assert out["start_ms"].tolist() == [0, 75, 150, 225]
    assert out["end_ms"].tolist() == [100, 175, 250, 256]
    exp = hashlib.md5(payload[225 * 8:256 * 8]).hexdigest()
    assert out["chunk_md5"].iloc[3] == exp

    # short payload → exactly one clamped chunk
    short = pd.DataFrame({"url": ["u2"], "html": [b"abcd" * 10]})  # 5 ms
    o2 = audio_chunks(ray.data.from_pandas(short)).to_pandas()
    assert len(o2) == 1 and o2["end_ms"].iloc[0] == 5

    # real-decode gate
    import pytest
    with pytest.raises(NotImplementedError):
        AudioChunkStage(mode="real")


def test_parse_media_dims_real_headers():
    from ghcrawler_ray.ops.multimodal import parse_media_dims
    # real PNG header: magic + IHDR chunk (len=13) + 640x480 dims
    png = (b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
           + (640).to_bytes(4, "big") + (480).to_bytes(4, "big")
           + b"\x08\x02\x00\x00\x00")
    assert parse_media_dims(png) == ("png", 640, 480)
    # GIF89a logical screen 320x200 (little-endian)
    gif = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little")
    assert parse_media_dims(gif) == ("gif", 320, 200)
    # JPEG: SOI + APP0 segment, then SOF0 with 240 high x 360 wide
    jpeg = (b"\xff\xd8"
            + b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
            + b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
            + (240).to_bytes(2, "big") + (360).to_bytes(2, "big")
            + b"\x03" + b"\x00" * 9)
    assert parse_media_dims(jpeg) == ("jpeg", 360, 240)
    # html / junk / truncated → none
    assert parse_media_dims(b"<html><body>x</body></html>") == ("none", 0, 0)
    assert parse_media_dims(b"") == ("none", 0, 0)
    assert parse_media_dims(b"\x89PNG\r\n\x1a\n" + b"\x00" * 4) == ("none", 0, 0)


def test_media_header_stage_over_dataset(ray_session):
    import ray.data
    from ghcrawler_ray.ops.multimodal import media_header_dims
    png = (b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
           + (64).to_bytes(4, "big") + (32).to_bytes(4, "big") + b"\x00" * 5)
    df = pd.DataFrame({"url": ["http://a/img.png", "http://a/page.html"],
                       "html": [png, b"<html></html>"]})
    out = media_header_dims(ray.data.from_pandas(df)).to_pandas() \
        .set_index("url")
    assert out.loc["http://a/img.png", "media_format"] == "png"
    assert out.loc["http://a/img.png", "width"] == 64
    assert out.loc["http://a/img.png", "height"] == 32
    assert out.loc["http://a/page.html", "media_format"] == "none"
