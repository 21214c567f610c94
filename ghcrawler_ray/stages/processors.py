"""Typed document processors: a kind-keyed dispatch registry — the
reference's per-type entity/event processor table re-expressed for a web
corpus.

Reference parity (file:line into /root/reference):
- the processor registry: one handler per document type, looked up by
  `document type` and applied to produce (rewritten doc, child work)
  (`providers/fetcher/githubProcessor.js:124-434` entity handlers ×14,
  `:548-833` event handlers ×25, dispatched via `process()` `:838-871`).
- shared scaffolding applied to every kind before the specific handler
  (`_addEventBasics` `:873-896`): here the common envelope columns
  (kind, title, n_links) computed once, vectorized.
- payload slimming per kind (`:248-252` commit patch stripper): the
  handlers emit only their kind's feature columns, never html.

Ray shape: ONE `map_batches` pass; classification + every handler is a
vectorized mask over the batch (never a Python row loop); the registry
is a plain dict so new kinds are one entry. Each handler's features are
deliberately regexp-derivable so the DuckDB oracle can mirror them 1:1
(__ray_entry__.crawl_doc_kinds).

Kinds over the synthesized web (testgen.py):
- 'paginated': a pagination sibling (`?page=N` in the url) — the
  reference's page-of-collection docs (`githubProcessor.js:58-79`);
- 'alias': duplicate-content alias (path under /dup/) — the 304/etag
  fixtures (`githubFetcher.js:78-84`);
- 'hub': links out to pagination siblings (html contains '?page=' hrefs);
- 'leaf': no out-links at all;
- 'article': everything else.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

TITLE_RE = re.compile(r"<title>(.*?)</title>")
PAGE_NO_RE = re.compile(r"\?page=(\d+)")
HREF_RE = re.compile(r'<a href="([^"]+)"')

#: SQL fragments each handler must stay in lockstep with
TITLE_SQL = "regexp_extract(decode(html), '<title>(.*?)</title>', 1)"
PAGE_NO_SQL = "regexp_extract(url, '\\?page=(\\d+)', 1)"


def _ext_link_counts(url: pd.Series, html: pd.Series
                     ) -> tuple[np.ndarray, np.ndarray]:
    """(n_ext, n_links): cross-host out-link count and total out-link
    count per page (absolute hrefs only, matching the oracle)."""
    page_host = (url.str.extract(r"^https?://([^/?#]+)", expand=False)
                 .fillna("").str.lower())
    link_hosts = html.str.findall(r'<a href="https?://([^/"]+)')
    n_links = np.fromiter((len(hs) for hs in link_hosts),
                          dtype=np.int64, count=len(html))
    n_ext = np.fromiter(
        (sum(1 for h in hs if h.lower() != ph)
         for hs, ph in zip(link_hosts, page_host)),
        dtype=np.int64, count=len(html))
    return n_ext, n_links


def classify_kind(url: pd.Series, html: pd.Series) -> np.ndarray:
    """Vectorized document-kind classification (dispatch key)."""
    paginated = url.str.contains(r"\?page=", regex=True).to_numpy(dtype=bool)
    alias = url.str.contains(r"^https?://[^/]+/dup/", regex=True) \
        .to_numpy(dtype=bool)
    hub = html.str.contains(r'<a href="[^"]*\?page=', regex=True) \
        .to_numpy(dtype=bool)
    n_ext, n_links = _ext_link_counts(url, html)
    portal = 2 * n_ext > n_links          # majority of links cross-host
    leaf = ~html.str.contains('<a href="', regex=False).to_numpy(dtype=bool)
    return np.select([paginated, alias, hub, portal, leaf],
                     ["paginated", "alias", "hub", "portal", "leaf"],
                     default="article").astype(object)


# ---- per-kind handlers: fn(sub_df with url/html/title/n_links) → extra
# feature columns for those rows. Handlers mutate nothing; they return a
# DataFrame indexed like their input. ------------------------------------

def _h_paginated(sub: pd.DataFrame) -> pd.DataFrame:
    """page_no parsed from the url; base_url = the hub it paginates
    (the reference's page-of-collection 'soon' requeue docs)."""
    return pd.DataFrame({
        "page_no": sub["url"].str.extract(PAGE_NO_RE, expand=False)
        .fillna("0").astype(np.int64),
        "base_url": sub["url"].str.replace(r"\?page=\d+$", "", regex=True),
    }, index=sub.index)


def _h_alias(sub: pd.DataFrame) -> pd.DataFrame:
    """alias docs: canonical host root (the content's owning site) —
    the urn-resolution analogue for duplicate-content docs."""
    return pd.DataFrame({
        "base_url": sub["url"].str.extract(r"^(https?://[^/]+)", expand=False)
        .fillna("") + "/",
    }, index=sub.index)


def _h_hub(sub: pd.DataFrame) -> pd.DataFrame:
    """hubs: how many pagination siblings they fan out to."""
    n_pages = sub["html"].str.count(r'<a href="[^"]*\?page=')
    return pd.DataFrame({"n_page_links": n_pages.astype(np.int64)},
                        index=sub.index)


def _h_portal(sub: pd.DataFrame) -> pd.DataFrame:
    """portals (majority cross-host links): how far off-site they fan
    out — the outbound-gateway signal a scheduler treats differently
    (new-host discovery source)."""
    n_ext, _ = _ext_link_counts(sub["url"], sub["html"])
    return pd.DataFrame({"n_ext_links": n_ext}, index=sub.index)


def _h_leaf(sub: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(index=sub.index)      # envelope only


def _h_article(sub: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(index=sub.index)      # envelope only


#: the registry — kind → handler (the reference's `this[...]` dispatch)
PROCESSORS: dict[str, callable] = {
    "paginated": _h_paginated,
    "alias": _h_alias,
    "hub": _h_hub,
    "portal": _h_portal,
    "leaf": _h_leaf,
    "article": _h_article,
}

#: full output schema (envelope + union of handler features, defaulted)
FEATURE_DEFAULTS = {"page_no": np.int64(-1), "base_url": "",
                    "n_page_links": np.int64(-1),
                    "n_ext_links": np.int64(-1)}


def process_batch(df: pd.DataFrame) -> pd.DataFrame:
    """The dispatch pass: envelope columns for every row + each kind's
    handler over its mask. One vectorized pass per kind present."""
    html = df["html"]
    if len(html) and isinstance(html.iloc[0], (bytes, bytearray)):
        html = html.map(lambda b: b.decode("utf-8"))
    html = html.astype(str)
    url = df["url"].astype(str)
    out = pd.DataFrame({
        "url": url,
        "kind": classify_kind(url, html),
        "title": html.str.extract(TITLE_RE, expand=False).fillna(""),
        "n_links": html.str.count('<a href="').astype(np.int64),
    })
    for col, default in FEATURE_DEFAULTS.items():
        out[col] = pd.Series([default] * len(out)).values
    sub_cols = pd.DataFrame({"url": url, "html": html})
    for kind, fn in PROCESSORS.items():
        mask = (out["kind"] == kind).to_numpy()
        if not mask.any():
            continue
        feats = fn(sub_cols[mask])
        for c in feats.columns:
            out.loc[mask, c] = feats[c]
    out["page_no"] = out["page_no"].astype(np.int64)
    out["n_page_links"] = out["n_page_links"].astype(np.int64)
    out["n_ext_links"] = out["n_ext_links"].astype(np.int64)
    return out
