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


def media_features(pages: ray.data.Dataset, payload_col: str = "html",
                   id_col: str = "url", concurrency: int = 4) -> ray.data.Dataset:
    """Feature-extract over a binary column via an actor pool (decoder
    state loads once per actor, batches stay small)."""
    # autoscaling pool (1..concurrency) at half a CPU per actor: a fixed
    # full-CPU pool can reserve every core of a small cluster and starve
    # the upstream read tasks (observed deadlock at num_cpus=4)
    return pages.select_columns([id_col, payload_col]).map_batches(
        MediaFeatureStage, fn_constructor_kwargs={
            "payload_col": payload_col, "id_col": id_col},
        batch_format="pandas", batch_size=MEDIA_BATCH_SIZE,
        concurrency=(1, concurrency), num_cpus=0.5)
