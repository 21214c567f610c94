"""Multimodal binary-column plumbing: decode / feature-extract stages for
opaque ``binary`` payloads (images/audio/video at scale; here the pages
table's ``html`` binary column is the payload).

The decode libraries (PIL / torchaudio / decord) are NOT in this
container, so the actual pixel/sample decode is STUBBED (cleanly gated
``NotImplementedError``) while all the Ray-side plumbing is real and
tested: actor-pool ``map_batches`` stage (decoder "model" loaded once per
actor in ``__init__``), small batch sizes for large payloads, typed
output schema, deterministic fallback features so pipelines are testable
end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data

#: payloads per batch — binary columns are large; keep batches small so
#: batch x concurrency fits in a worker heap (SURVEY.md §7.4 wide rows)
MEDIA_BATCH_SIZE = 256


class MediaFeatureStage:
    """Actor-pool stage: binary payload → features.

    ``mode='fake'`` (default): deterministic metadata features computed
    from the bytes themselves — real plumbing, stub decode.
    ``mode='pil'``: requires a real image library → raises
    NotImplementedError in this environment (import-gated, not crashing
    at pipeline-build time).
    """

    def __init__(self, payload_col: str = "html", id_col: str = "url",
                 mode: str = "fake"):
        self.payload_col = payload_col
        self.id_col = id_col
        self.mode = mode
        self.decoder = None
        if mode == "pil":
            try:
                from PIL import Image  # noqa: F401  (absent in this container)
                self.decoder = Image
            except ImportError as e:
                raise NotImplementedError(
                    "real image decode needs PIL; run with mode='fake' "
                    "or install an image library on the cluster") from e

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        payloads = df[self.payload_col]
        n_bytes = np.array([len(b) for b in payloads], dtype=np.int64)
        md5 = [hashlib.md5(bytes(b)).hexdigest() for b in payloads]
        if self.mode == "pil":  # pragma: no cover - gated above
            raise NotImplementedError("pixel decode not available here")
        # deterministic fake "decode": dims derived from byte length, so
        # the DuckDB oracle can recompute them (octet_length-based)
        return pd.DataFrame({
            self.id_col: df[self.id_col].astype(str),
            "n_bytes": n_bytes,
            "content_md5": md5,
            "width": (n_bytes % 1920).astype(np.int64),
            "height": (n_bytes % 1080).astype(np.int64),
        })


class MediaResizeStage:
    """Actor-pool resize stage: compute target dimensions (aspect-
    preserving downscale, never upscale) for each payload. ``mode='fake'``
    derives source dims from byte length (same rule as MediaFeatureStage)
    so the DuckDB oracle recomputes everything; ``mode='pil'`` is the
    real-decoder gate."""

    def __init__(self, target_w: int = 224, target_h: int = 224,
                 payload_col: str = "html", id_col: str = "url",
                 mode: str = "fake"):
        self.tw, self.th = target_w, target_h
        self.payload_col, self.id_col = payload_col, id_col
        if mode != "fake":
            raise NotImplementedError(
                "real image resize needs an image library; use mode='fake'")

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        n = np.array([len(b) for b in df[self.payload_col]], dtype=np.int64)
        src_w = np.maximum(n % 1920, 1)
        src_h = np.maximum(n % 1080, 1)
        scale = np.minimum(np.minimum(self.tw / src_w, self.th / src_h), 1.0)
        return pd.DataFrame({
            self.id_col: df[self.id_col].astype(str),
            "src_w": src_w, "src_h": src_h,
            "out_w": np.floor(src_w * scale).astype(np.int64),
            "out_h": np.floor(src_h * scale).astype(np.int64),
        })


class FrameSampleStage:
    """Actor-pool frame sampler: N evenly-spaced 64-byte windows per
    payload (the video frame-sample analogue — offsets are where a real
    decoder would seek; the window md5 stands in for the decoded frame).
    Emits one row per (payload, frame_index)."""

    WINDOW = 64

    def __init__(self, n_frames: int = 4, payload_col: str = "html",
                 id_col: str = "url", mode: str = "fake"):
        self.n_frames = n_frames
        self.payload_col, self.id_col = payload_col, id_col
        if mode != "fake":
            raise NotImplementedError(
                "real frame decode needs a video library; use mode='fake'")

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids, idxs, offs, md5s = [], [], [], []
        for key, b in zip(df[self.id_col].astype(str), df[self.payload_col]):
            b = bytes(b)
            n = len(b)
            for i in range(self.n_frames):
                off = (i * n) // self.n_frames
                ids.append(key)
                idxs.append(i)
                offs.append(off)
                md5s.append(hashlib.md5(b[off:off + self.WINDOW]).hexdigest())
        return pd.DataFrame({
            self.id_col: pd.Series(ids, dtype=str),
            "frame_index": np.array(idxs, dtype=np.int64),
            "offset": np.array(offs, dtype=np.int64),
            "frame_md5": pd.Series(md5s, dtype=str),
        })


def media_resize(pages: ray.data.Dataset, target_w: int = 224,
                 target_h: int = 224, payload_col: str = "html",
                 id_col: str = "url", concurrency: int = 16) -> ray.data.Dataset:
    """Aspect-preserving resize planning over a binary column (actor
    pool, small batches — same sizing rationale as media_features)."""
    return pages.select_columns([id_col, payload_col]).map_batches(
        MediaResizeStage, fn_constructor_kwargs={
            "target_w": target_w, "target_h": target_h,
            "payload_col": payload_col, "id_col": id_col},
        batch_format="pandas", batch_size=MEDIA_BATCH_SIZE,
        concurrency=(1, concurrency), num_cpus=0.5)


def frame_samples(pages: ray.data.Dataset, n_frames: int = 4,
                  payload_col: str = "html", id_col: str = "url",
                  concurrency: int = 16) -> ray.data.Dataset:
    """Evenly-spaced frame sampling over a binary column (actor pool);
    output is one row per sampled frame."""
    return pages.select_columns([id_col, payload_col]).map_batches(
        FrameSampleStage, fn_constructor_kwargs={
            "n_frames": n_frames, "payload_col": payload_col,
            "id_col": id_col},
        batch_format="pandas", batch_size=MEDIA_BATCH_SIZE,
        concurrency=(1, concurrency), num_cpus=0.5)


def media_features(pages: ray.data.Dataset, payload_col: str = "html",
                   id_col: str = "url", concurrency: int = 16) -> ray.data.Dataset:
    """Feature-extract over a binary column via an actor pool (decoder
    state loads once per actor, batches stay small)."""
    # autoscaling pool (1..concurrency) at half a CPU per actor: a fixed
    # full-CPU pool can reserve every core of a small cluster and starve
    # the upstream read tasks (observed deadlock at num_cpus=4). The
    # ceiling of 16 (≈ 8 reserved CPUs) lets the payload-hash compute
    # use a 32-core node; the floor of 1 keeps 4-CPU test sessions safe.
    return pages.select_columns([id_col, payload_col]).map_batches(
        MediaFeatureStage, fn_constructor_kwargs={
            "payload_col": payload_col, "id_col": id_col},
        batch_format="pandas", batch_size=MEDIA_BATCH_SIZE,
        concurrency=(1, concurrency), num_cpus=0.5)


class TextEmbedStage:
    """Actor-pool batched "model inference" stage: text → fixed-dim
    embedding. ``mode='hash-v1'`` (default) is the deterministic stub
    model — each of the ``dim`` components is an 8-hex-digit slice of
    the text's md5 mapped affinely onto [-1, 1) — so the DuckDB oracle
    recomputes the exact doubles while ALL the real-model plumbing is
    exercised: weights "loaded" once per actor in ``__init__``, whole
    batches pushed through one vectorized call, pool autoscaling with
    fractional CPUs. ``mode='torch'`` is the real-model gate (absent in
    this container)."""

    DIM_MAX = 4   # md5 yields 32 hex chars = 4 × 8-hex components

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 dim: int = 4, mode: str = "hash-v1"):
        if not (1 <= dim <= self.DIM_MAX):
            raise ValueError(f"dim must be 1..{self.DIM_MAX}")
        self.text_col, self.id_col, self.dim = text_col, id_col, dim
        if mode != "hash-v1":
            try:
                import torch  # noqa: F401  (absent in this container)
            except ImportError as e:
                raise NotImplementedError(
                    "real embedding inference needs a model runtime; "
                    "use mode='hash-v1'") from e
        # "model load" happens HERE, once per actor — the expensive part
        # a per-batch function would re-pay on every batch
        self.model = mode

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        texts = df[self.text_col].astype(str)
        digs = [hashlib.md5(t.encode()).hexdigest() for t in texts]
        out = {self.id_col: df[self.id_col].to_numpy()}
        two31 = float(1 << 31)
        for j in range(self.dim):
            words = np.array([int(d[8 * j:8 * j + 8], 16) for d in digs],
                             dtype=np.int64)
            # affine map of the unsigned 32-bit word onto [-1, 1):
            # (w - 2^31) / 2^31 — one IEEE division, oracle-identical
            out[f"e{j}"] = (words - np.int64(1 << 31)) / two31
        return pd.DataFrame(out)


def doc_embeddings(docs: ray.data.Dataset, dim: int = 4,
                   concurrency: int = 16) -> ray.data.Dataset:
    """Batched embedding inference over the documents table (actor
    pool; model state per actor, vectorized per batch). Output is flat
    (doc_id, e0..e{dim-1}) columns — the layout the ANN/quantizer ops
    and a parquet sink both take without list-column repacking."""
    return docs.select_columns(["doc_id", "text"]).map_batches(
        TextEmbedStage, fn_constructor_kwargs={"dim": dim},
        batch_format="pandas", batch_size=MEDIA_BATCH_SIZE,
        concurrency=(1, concurrency), num_cpus=0.5)


class AudioChunkStage:
    """Actor-pool audio chunker: the ASR-preprocessing analogue over an
    opaque binary column. The payload is treated as fixed-rate PCM
    (``BYTES_PER_MS`` bytes/ms — a real decoder would read the container
    header); it is cut into overlapping windows (``chunk_ms`` long,
    ``hop_ms`` apart — the Whisper-style segmentation), one row per
    (payload, chunk_index) with the window's byte-span md5 standing in
    for the decoded samples. mode='fake' is the deterministic stand-in;
    real decode is gated like the other media stages."""

    BYTES_PER_MS = 8
    CHUNK_MS = 100
    HOP_MS = 75

    def __init__(self, payload_col: str = "html", id_col: str = "url",
                 mode: str = "fake"):
        self.payload_col, self.id_col = payload_col, id_col
        if mode != "fake":
            raise NotImplementedError(
                "real audio decode needs an audio library; use mode='fake'")

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids, idxs, starts, ends, md5s = [], [], [], [], []
        bpm, chunk, hop = self.BYTES_PER_MS, self.CHUNK_MS, self.HOP_MS
        for key, b in zip(df[self.id_col].astype(str), df[self.payload_col]):
            b = bytes(b)
            dur = len(b) // bpm
            n_chunks = max(1, 1 + (max(dur - chunk, 0) + hop - 1) // hop)
            for i in range(n_chunks):
                s = i * hop
                e = min(s + chunk, dur)
                ids.append(key)
                idxs.append(i)
                starts.append(s)
                ends.append(e)
                md5s.append(hashlib.md5(b[s * bpm:e * bpm]).hexdigest())
        return pd.DataFrame({
            self.id_col: pd.Series(ids, dtype=str),
            "chunk_index": np.array(idxs, dtype=np.int64),
            "start_ms": np.array(starts, dtype=np.int64),
            "end_ms": np.array(ends, dtype=np.int64),
            "chunk_md5": pd.Series(md5s, dtype=str),
        })


def audio_chunks(pages: ray.data.Dataset, payload_col: str = "html",
                 id_col: str = "url",
                 concurrency: int = 16) -> ray.data.Dataset:
    """Overlapping fixed-rate audio windowing over a binary column
    (actor pool, small batches); one row per chunk."""
    return pages.select_columns([id_col, payload_col]).map_batches(
        AudioChunkStage, fn_constructor_kwargs={
            "payload_col": payload_col, "id_col": id_col},
        batch_format="pandas", batch_size=MEDIA_BATCH_SIZE,
        concurrency=(1, concurrency), num_cpus=0.5)


# ---- real container-format header parsing (no decoder libs needed) ----

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_SOF_MARKERS = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def parse_media_dims(b: bytes) -> tuple[str, int, int]:
    """(format, width, height) parsed from REAL container headers —
    PNG IHDR, GIF87a/89a logical screen, JPEG SOF scan — pure byte
    arithmetic, no image library (the metadata step of an ingest
    pipeline is header parsing, which needs no decoder; pixel decode
    stays behind the ``mode='pil'`` gate). Unknown/opaque payloads →
    ('none', 0, 0); truncated containers of a known type parse as far
    as the header allows or fall back to 'none'."""
    n = len(b)
    if n >= 24 and b[:8] == _PNG_MAGIC and b[12:16] == b"IHDR":
        return ("png", int.from_bytes(b[16:20], "big"),
                int.from_bytes(b[20:24], "big"))
    if n >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        return ("gif", int.from_bytes(b[6:8], "little"),
                int.from_bytes(b[8:10], "little"))
    if n >= 4 and b[0] == 0xFF and b[1] == 0xD8:
        i = 2
        while i + 9 <= n:
            if b[i] != 0xFF:
                break
            # legal 0xFF fill/padding bytes may precede any marker
            # (ITU T.81 B.1.1.2) — skip them before classifying
            while i + 9 <= n and b[i + 1] == 0xFF:
                i += 1
            if i + 9 > n:
                break
            marker = b[i + 1]
            if marker in _SOF_MARKERS:
                return ("jpeg", int.from_bytes(b[i + 7:i + 9], "big"),
                        int.from_bytes(b[i + 5:i + 7], "big"))
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg = int.from_bytes(b[i + 2:i + 4], "big")
            if seg < 2:
                break
            i += 2 + seg
        return ("none", 0, 0)
    return ("none", 0, 0)


class MediaHeaderStage:
    """Actor-pool stage: payload bytes → (format, width, height) via
    :func:`parse_media_dims` — REAL header parsing (not the 'fake'
    byte-length rule), dependency-free. Per-payload work is C-level
    byte slicing; the stage shape (init-once class, small batches)
    matches the other media stages."""

    def __init__(self, payload_col: str = "html", id_col: str = "url"):
        self.payload_col = payload_col
        self.id_col = id_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        parsed = [parse_media_dims(bytes(b)) for b in df[self.payload_col]]
        return pd.DataFrame({
            self.id_col: df[self.id_col].astype(str),
            "media_format": np.array([p[0] for p in parsed], dtype=object),
            "width": np.array([p[1] for p in parsed], dtype=np.int64),
            "height": np.array([p[2] for p in parsed], dtype=np.int64)})


def media_header_dims(pages: ray.data.Dataset,
                      payload_col: str = "html",
                      id_col: str = "url") -> ray.data.Dataset:
    """(url, media_format, width, height) for every payload — real
    PNG/GIF/JPEG header parsing as an actor-pool `map_batches` stage;
    html payloads correctly classify as 'none'. The ingest-side media
    inventory: which fetched blobs are images at all, and their pixel
    dims, without any decode dependency."""
    return pages.select_columns([id_col, payload_col]).map_batches(
        MediaHeaderStage(payload_col, id_col),
        batch_size=MEDIA_BATCH_SIZE, concurrency=4)
