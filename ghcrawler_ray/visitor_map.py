"""Visitor maps: declarative traversal-shape gating over TYPED link
relations — the reference's `lib/visitorMap.js` re-expressed for a web
corpus.

Reference parity (file:line into /root/reference):
- typed link relations on every emitted edge: `lib/request.js:119-140`
  (linkResource → 'resource', linkCollection/linkSiblings → 'collection',
  linkRelation → 'relation'); here every <a href> edge is classified by
  the deterministic URL relationship between src and dst (see
  :func:`classify_rels`), mirrored 1:1 by a SQL CASE in __ray_entry__.
- a visitor map is a named graph of steps; an edge is traversed iff the
  current step has a property of that name (`lib/visitorMap.js:47-117`
  navigate/hasNextStep); terminal `self = {}` nodes stop traversal
  (`:125-128`). Maps here are {node: {rel: next_node}} dicts — the same
  shape with explicit node names instead of object identity.
- the policy spec carries the map and position: '<policy>[:<map>[@node]]'
  (`lib/traversalPolicy.js` policy.map + getNextPolicy advancing the map
  path down the subgraph, `lib/request.js:146-165`). A spec with no map
  follows every edge (the round-1 behaviour, and the reference's default
  scenario whose maps admit all modelled edges).

Everything is a pure function of (spec, rel) so the Ray engine and the
sequential oracle share it via links_to_frontier and cannot diverge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

#: edge kinds emitted by the web extractor (the reference's rel types
#: collapsed to the three URL-derivable ones; 'self' edges are implicit —
#: a page is its own self link and is never re-enqueued by rel)
RELS = ("siblings", "resource", "relation")

#: named maps: {map_name: {node: {rel: next_node}}}. 'root' is the entry
#: node of every map.
MAPS: dict[str, dict[str, dict[str, str]]] = {
    # follow every edge forever (explicit form of the no-map default)
    "all": {"root": {"siblings": "root", "resource": "root",
                     "relation": "root"}},
    # terminal: store the document, traverse nothing (visitorMap.js `self`)
    "self": {"root": {}},
    # never leave the seed's host; pagination + same-host links only
    "sameHost": {"root": {"siblings": "root", "resource": "root"}},
    # one hop of same-host links (collection page → its entities), then stop
    "shallow": {"root": {"siblings": "leaf", "resource": "leaf"},
                "leaf": {}},
    # hub scenario: paginate the seed collection, store entities one hop
    # past each page, follow nothing else (collection(type) analogue,
    # visitorMap.js:130-138)
    "collection": {"root": {"siblings": "root", "resource": "leaf"},
                   "leaf": {}},
}


def split_spec(spec: str) -> tuple[str, str | None, str]:
    """'<policy>[:<map>[@node]]' → (policy, map_name|None, node)."""
    if ":" not in spec:
        return spec, None, "root"
    policy, m = spec.split(":", 1)
    if "@" in m:
        m, node = m.split("@", 1)
    else:
        node = "root"
    return policy, (m or None), node


def classify_rels(src: pd.Series, dst: pd.Series) -> np.ndarray:
    """Deterministic rel type per (src_url, dst_url) edge — pyarrow RE2
    kernels (this runs on every extracted link; the pandas regex version
    cost ~1.6 µs/edge).

    - same host + '?page=' in dst  → 'siblings'  (linkSiblings pagination)
    - same host otherwise          → 'resource'  (linkResource)
    - cross-host                   → 'relation'  (linkRelation)
    Mirrored by the SQL CASE in __ray_entry__ (crawl_link_rels).
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    host_re = r"^https?://(?P<h>[^/?#]+)"

    def hosts(s: pd.Series):
        arr = pa.Array.from_pandas(s.astype("string").fillna(""),
                                   type=pa.string())
        ex = pc.extract_regex(arr, host_re)
        return pc.utf8_lower(pc.fill_null(pc.struct_field(ex, "h"), "")), arr

    sh, _ = hosts(src)
    dh, dst_arr = hosts(dst)
    nonempty = pc.and_(pc.not_equal(sh, ""), pc.not_equal(dh, ""))
    same = pc.and_(pc.equal(sh, dh), nonempty).to_numpy(zero_copy_only=False)
    paged = pc.match_substring_regex(dst_arr, r"\?page=") \
        .to_numpy(zero_copy_only=False)
    return np.where(same & paged, "siblings",
                    np.where(same, "resource", "relation")).astype(object)


def advance_one(spec: str, rel: str) -> tuple[bool, str]:
    """(admit?, child spec) for one edge — hasNextStep + getNextPolicy.

    Unknown map names fail open (admit, unchanged spec) like the
    reference's getNextStep on a missing segment returning undefined →
    the caller treats the edge as unmodelled rather than crashing."""
    policy, map_name, node = split_spec(spec)
    if map_name is None:
        return True, spec
    m = MAPS.get(map_name)
    if m is None:
        return True, spec
    step = m.get(node, {})
    nxt = step.get(rel)
    if nxt is None:
        return False, spec
    return True, f"{policy}:{map_name}@{nxt}"


def gate_links(policy_spec: pd.Series, rel: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized visitor-map gate: per edge → (admitted mask, child
    policy spec). Factorizes on the (spec, rel) pair — distinct pairs are
    O(#maps × #rels), never O(rows)."""
    c1, u1 = pd.factorize(policy_spec.astype(str).to_numpy(dtype=object))
    c2, u2 = pd.factorize(np.asarray(rel, dtype=object))
    if not len(u1) or not len(u2):
        return np.empty(0, dtype=bool), np.empty(0, dtype=object)
    combo = c1.astype(np.int64) * len(u2) + c2
    uniq, codes = np.unique(combo, return_inverse=True)
    admit_u = np.empty(len(uniq), dtype=bool)
    child_u = np.empty(len(uniq), dtype=object)
    for i, cv in enumerate(uniq):
        admit_u[i], child_u[i] = advance_one(str(u1[cv // len(u2)]),
                                             str(u2[cv % len(u2)]))
    return admit_u[codes], child_u[codes]
