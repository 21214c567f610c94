"""Kind-keyed processor dispatch (stages/processors.py): golden
classification + per-kind feature checks, the `gitHubProcessorTests.js`
analogue — each kind's exact admitted feature set on constructed docs."""
import numpy as np
import pandas as pd

from ghcrawler_ray.stages.processors import classify_kind, process_batch


def _mk(url: str, html: str) -> dict:
    return {"url": url, "html": html.encode()}


_DOCS = [
    _mk("http://a.example/p/1?page=3",
        '<title>pg</title><a href="http://a.example/p/1?page=4">n</a>'),
    _mk("http://a.example/dup/7", "<title>alias</title>"),
    _mk("http://a.example/hub",
        '<a href="http://a.example/p/1?page=2">l</a>'
        '<a href="http://b.example/x">e</a>'),
    _mk("http://a.example/portal",
        '<a href="http://b.example/x">1</a>'
        '<a href="http://c.example/y">2</a>'
        '<a href="http://a.example/z">3</a>'),
    _mk("http://a.example/leaf", "<title>leaf</title> no links"),
    _mk("http://a.example/article",
        '<a href="http://a.example/z">same-host</a>'),
]


def test_classification_precedence_golden():
    df = pd.DataFrame(_DOCS)
    kinds = classify_kind(df["url"], df["html"].map(bytes.decode))
    assert list(kinds) == ["paginated", "alias", "hub", "portal",
                           "leaf", "article"]


def test_per_kind_features_golden():
    out = process_batch(pd.DataFrame(_DOCS)).set_index("url")
    pg = out.loc["http://a.example/p/1?page=3"]
    assert (pg.kind, pg.page_no) == ("paginated", 3)
    assert pg.base_url == "http://a.example/p/1"
    al = out.loc["http://a.example/dup/7"]
    assert (al.kind, al.base_url) == ("alias", "http://a.example/")
    hub = out.loc["http://a.example/hub"]
    assert (hub.kind, hub.n_page_links) == ("hub", 1)
    po = out.loc["http://a.example/portal"]
    assert (po.kind, po.n_ext_links, po.n_links) == ("portal", 2, 3)
    assert out.loc["http://a.example/leaf", "kind"] == "leaf"
    # defaulted features stay -1 / "" outside their kind
    assert out.loc["http://a.example/leaf", "n_ext_links"] == -1
    assert out.loc["http://a.example/article", "page_no"] == -1
    assert (out["n_links"] >= 0).all()
    assert out["title"].loc["http://a.example/dup/7"] == "alias"


def test_registry_is_total():
    """Every kind classify_kind can emit has a registered handler and
    every handler's feature columns exist in the defaults."""
    from ghcrawler_ray.stages.processors import FEATURE_DEFAULTS, PROCESSORS
    df = pd.DataFrame(_DOCS)
    kinds = set(classify_kind(df["url"], df["html"].map(bytes.decode)))
    assert kinds <= set(PROCESSORS)
    out = process_batch(pd.DataFrame(_DOCS))
    assert set(FEATURE_DEFAULTS) <= set(out.columns)
    assert out["n_ext_links"].dtype == np.int64
