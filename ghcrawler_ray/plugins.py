"""User-extension surface: typed protocols + named registries.

The reference loads provider plugins dynamically — queue/store/delta
implementations resolved by name, including third-party packages
(`require('ghcrawler-' + name)`, `crawlerFactory.js:383-412,479-506`),
and dispatches per-type processors from a handler map
(`githubProcessor.js:853-871`). This module is the Ray-side analogue
(SURVEY.md §2.9): small ``typing.Protocol`` contracts plus string-keyed
registries, so a deployment can ship its own seen-set filter, document
processor, or corpus sink without patching the engine.

Built-ins register themselves here; ``CrawlConfig(seen_mode=...)``
resolves through ``make_seen_filter``, so ``register_seen_filter`` is
all a third-party backend needs.
"""

from __future__ import annotations

from typing import Callable, Protocol, runtime_checkable

import numpy as np
import pandas as pd


@runtime_checkable
class SeenFilterProtocol(Protocol):
    """Per-shard membership store for 64-bit url/etag hashes — the
    tracker-tag analogue (`redisRequestTracker.js`). ``to_state`` must
    include a ``kind`` key matching the registered name so wave
    checkpoints can restore through ``load_seen_filter``."""

    def contains_many(self, hashes: np.ndarray) -> np.ndarray: ...
    def add_many(self, hashes: np.ndarray) -> np.ndarray: ...
    def delete_many(self, hashes: np.ndarray) -> np.ndarray: ...
    @property
    def n_items(self) -> int: ...
    def to_state(self) -> dict: ...


@runtime_checkable
class ProcessorProtocol(Protocol):
    """Kind-keyed document processor (`githubProcessor.js` handler map):
    vectorized over a pandas frame of that kind's pages, returns the
    processed frame."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame: ...


@runtime_checkable
class SinkProtocol(Protocol):
    """Corpus/artifact sink: writes a Dataset (or frame) under a root
    path, returns a manifest frame (the resumable-shards contract of
    ``ops/sink.write_corpus_shards``)."""

    def __call__(self, ds, root: str, **kwargs) -> pd.DataFrame: ...


@runtime_checkable
class DocStoreProtocol(Protocol):
    """The reference's 7-method storage-provider interface
    (`providers/storage/storageDocStore.js:33-189`; alternative concrete
    providers `mongodocstore.js:1-104`, `googleCloudStorage.js`):
    upsert-by-url with version history, point get/etag, list-by-prefix,
    live/raw counts, delete."""

    def get(self, url: str) -> dict | None: ...
    def etag(self, url: str) -> str | None: ...
    def list(self, prefix: str = "", limit: int | None = None): ...
    def count(self, live_only: bool = True) -> int: ...
    def delete(self, url: str) -> int: ...
    def upsert(self, docs) -> int: ...


_SEEN_FILTERS: dict[str, Callable[[int], object]] = {}
_SEEN_LOADERS: dict[str, Callable[[dict], object]] = {}
_SINKS: dict[str, SinkProtocol] = {}
_DOC_STORES: dict[str, Callable[..., DocStoreProtocol]] = {}


def register_seen_filter(name: str, factory: Callable[[int], object],
                         loader: Callable[[dict], object] | None = None
                         ) -> None:
    """Register a seen-set backend: ``factory(capacity) -> filter``
    satisfying ``SeenFilterProtocol``; ``loader(state) -> filter``
    restores a wave-checkpoint snapshot (defaults to
    ``factory.from_state``). Built-ins: exact64, cuckoo."""
    _SEEN_FILTERS[name] = factory
    _SEEN_LOADERS[name] = loader or getattr(factory, "from_state", None)


def make_seen_filter(name: str, capacity: int):
    if name not in _SEEN_FILTERS and ":" in name:
        # dynamic provider loading, the `require('ghcrawler-'+name)`
        # analogue: "package.module:ClassName" resolves in WHATEVER
        # process asks (each Ray actor/worker imports it itself, so no
        # registry state needs to ship)
        import importlib
        mod, attr = name.split(":", 1)
        factory = getattr(importlib.import_module(mod), attr)
        register_seen_filter(name, factory)
        st_kind = getattr(factory, "STATE_KIND", None)
        if st_kind and st_kind not in _SEEN_LOADERS:
            _SEEN_LOADERS[st_kind] = factory.from_state
    try:
        return _SEEN_FILTERS[name](capacity)
    except KeyError:
        raise ValueError(
            f"unknown seen_mode {name!r}; registered: "
            f"{sorted(_SEEN_FILTERS)}") from None


def load_seen_filter(state: dict):
    """Restore a filter from its checkpoint state by its ``kind``
    (pre-registry cuckoo snapshots carried no kind key)."""
    kind = state.get("kind", "cuckoo")
    try:
        return _SEEN_LOADERS[kind](state)
    except KeyError:
        raise ValueError(f"no registered loader for seen-filter kind "
                         f"{kind!r}") from None


def seen_filter_names() -> list[str]:
    return sorted(_SEEN_FILTERS)


def register_processor(kind: str, fn: ProcessorProtocol) -> None:
    """Add (or override) a kind-keyed page processor; dispatched in the
    extract stage's single vectorized pass (`stages/processors.py`)."""
    from .stages.processors import PROCESSORS
    PROCESSORS[kind] = fn


def register_sink(name: str, fn: SinkProtocol) -> None:
    _SINKS[name] = fn


def register_doc_store(name: str,
                       factory: Callable[..., DocStoreProtocol]) -> None:
    """Register a doc-store backend: ``factory(root, n_buckets=...) ->
    store`` satisfying ``DocStoreProtocol``. Built-ins: parquet
    (state.store.PagesDocStore), jsonl (state.jsonl_store.JsonlDocStore)
    — the provider-by-name analogue of `crawlerFactory.js:479-506`."""
    _DOC_STORES[name] = factory


def make_doc_store(name: str, root, **kwargs) -> DocStoreProtocol:
    if name not in _DOC_STORES and ":" in name:
        # dynamic provider loading (`require('ghcrawler-'+name)`)
        import importlib
        mod, attr = name.split(":", 1)
        register_doc_store(name, getattr(importlib.import_module(mod), attr))
    try:
        return _DOC_STORES[name](root, **kwargs)
    except KeyError:
        raise ValueError(f"unknown doc store {name!r}; registered: "
                         f"{sorted(_DOC_STORES)}") from None


def doc_store_names() -> list[str]:
    return sorted(_DOC_STORES)


def get_sink(name: str) -> SinkProtocol:
    try:
        return _SINKS[name]
    except KeyError:
        raise ValueError(f"unknown sink {name!r}; registered: "
                         f"{sorted(_SINKS)}") from None


def _register_builtins() -> None:
    from .ops.sink import write_corpus_shards
    from .state.cuckoo import CuckooFilter
    from .state.jsonl_store import JsonlDocStore
    from .state.seen import _Exact64
    from .state.store import PagesDocStore
    register_seen_filter("exact64", _Exact64)
    register_seen_filter("cuckoo", CuckooFilter)
    register_sink("corpus_shards", write_corpus_shards)
    register_doc_store("parquet", PagesDocStore)
    register_doc_store("jsonl", JsonlDocStore)


_register_builtins()
