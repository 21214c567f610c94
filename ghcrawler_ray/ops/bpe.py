"""BPE merge-rule training over the ``documents`` corpus — the iterative
tokenizer-learning loop (Sennrich et al. 2016) on top of the engine's
distributed word count.

Scale shape (100 TB discipline):
- the HEAVY pass is the word count: per-batch combiner collapses each
  batch to its distinct (word, n) rows before ONE slim co-partition
  shuffle under a coarse ``hash64(word) % 64`` INT key (raw-string
  groupby = the repo's measured sort-shuffle pitfall). The corpus text
  is scanned exactly once and never shuffles.
- the merge LOOP runs on the word-FREQUENCY table, which is
  vocabulary-bounded (≈10⁷ distinct words for a 10¹³-token corpus —
  Heaps' law), not corpus-bounded: pulling it to the driver is the
  standard architecture (every production BPE trainer folds the corpus
  to word counts first) and is O(vocab), not O(data). Each of the K
  iterations is a vectorized pandas pass over that bounded table.
- greedy left-to-right merge application and positions-based
  (overlapping) pair counting follow the published algorithm; the
  DuckDB mirror in ``__ray_entry__`` unrolls the SAME K iterations as
  CTEs, so every (rank, pair, count) row is value-exact.

Tokenization state is carried as a DOUBLE-delimited string
(``'||h||i||'``): replacing ``'|l||r|'`` with ``'|lr|'`` consumes only
the inner halves of the token boundaries, so consecutive matches keep
their guard pipes and plain ``str.replace`` / SQL ``replace`` (both
non-overlapping, left-to-right, scan-past-replacement) reproduces BPE's
greedy one-pass merge exactly — e.g. ``[a,a,a,a]`` → ``[aa,aa]``.

Reference context: the reference has no tokenizer; its closest shape is
the iterative frontier loop (`lib/crawler.js:54-80`) — a driver-bounded
loop over a distributed pass — which is exactly this op's structure.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from .corpus import WS_TOKEN_RE

#: number of merge rules to learn (the mirror unrolls this many CTEs)
BPE_MERGES = 6
BPE_PARTS = 64


def _delim(word: str) -> str:
    """Double-delimited char tokenization: 'hi' → '||h||i||'."""
    return "||" + "||".join(word) + "||"


def _word_count_partial(df: pd.DataFrame) -> pd.DataFrame:
    from ..urls import hash64_array

    toks = df["text"].astype(str).str.lower().str.findall(WS_TOKEN_RE)
    flat = [w for ts in toks for w in ts]
    if not flat:
        return pd.DataFrame({"part": np.empty(0, np.int32),
                             "word": np.empty(0, object),
                             "n": np.empty(0, np.int64)})
    cnt = pd.Series(flat, dtype=object).value_counts()
    word = cnt.index.to_numpy(dtype=object)
    return pd.DataFrame({
        "part": (hash64_array(pd.Series(word)) % BPE_PARTS).astype(np.int32),
        "word": word,
        "n": cnt.to_numpy(dtype=np.int64)})


def _word_count_fold(g: pd.DataFrame) -> pd.DataFrame:
    out = g.groupby("word", sort=False, as_index=False)["n"].sum()
    out["n"] = out["n"].astype(np.int64)
    return out[["word", "n"]]


def _pair_counts(seqs: list[str], cnt: np.ndarray) -> pd.DataFrame:
    """Positions-based (overlapping) adjacent-pair counts over the
    delimited word table, weighted by word frequency — one flat
    vectorized pass, no per-word Python beyond the split."""
    tok_lists = [s[2:-2].split("||") for s in seqs]
    lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64,
                       count=len(tok_lists))
    npairs = np.maximum(lens - 1, 0)
    if npairs.sum() == 0:
        return pd.DataFrame({"lhs": np.empty(0, object),
                             "rhs": np.empty(0, object),
                             "n": np.empty(0, np.int64)})
    flat = np.concatenate([np.asarray(t, dtype=object) for t in tok_lists])
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    idx = np.concatenate([starts[i] + np.arange(npairs[i])
                          for i in range(len(tok_lists)) if npairs[i]])
    w = np.repeat(cnt, npairs)
    pairs = pd.DataFrame({"lhs": flat[idx], "rhs": flat[idx + 1], "n": w})
    out = pairs.groupby(["lhs", "rhs"], sort=False, as_index=False)["n"].sum()
    out["n"] = out["n"].astype(np.int64)
    return out


def bpe_train(docs: ray.data.Dataset,
              n_merges: int = BPE_MERGES) -> pd.DataFrame:
    """Learn ``n_merges`` BPE merge rules: (merge_rank 1.., lhs, rhs,
    merged, pair_count), each rank picking the most frequent adjacent
    token pair (ties: lhs asc, rhs asc) and merging it greedily
    left-to-right across the word table."""
    rows, _, _, _ = _train(docs, n_merges)
    return pd.DataFrame(rows, columns=["merge_rank", "lhs", "rhs",
                                       "merged", "pair_count"]) \
        .astype({"merge_rank": np.int64, "pair_count": np.int64})


def bpe_compression(docs: ray.data.Dataset,
                    n_merges: int = BPE_MERGES) -> pd.DataFrame:
    """The train→apply loop closed: (merge_rank 0..K, total_tokens) —
    corpus token count after applying the first ``merge_rank`` learned
    rules (rank 0 = character baseline). The compression curve is THE
    tokenizer-training acceptance metric; totals are exact int64
    Σ len(word_tokens)·word_count over the same vocabulary-bounded
    word table ``bpe_train`` learns from."""
    _, totals, _, _ = _train(docs, n_merges)
    return pd.DataFrame({
        "merge_rank": np.arange(len(totals), dtype=np.int64),
        "total_tokens": np.array(totals, dtype=np.int64)})


def _total_tokens(seqs: list[str], cnt: np.ndarray) -> int:
    lens = np.fromiter((s.count("||") - 1 if len(s) > 2 else 0
                        for s in seqs), dtype=np.int64, count=len(seqs))
    return int((lens * cnt).sum())


def _train(docs: ray.data.Dataset, n_merges: int):
    wc = (docs.select_columns(["text"])
          .map_batches(_word_count_partial, batch_format="pandas")
          .materialize()   # split scan from all-to-all (fusion pitfall)
          .groupby("part")
          .map_groups(_word_count_fold, batch_format="pandas")
          .to_pandas())    # vocabulary-bounded by design (see module doc)
    seqs = [_delim(w) for w in wc["word"].astype(str)]
    cnt = wc["n"].to_numpy(dtype=np.int64)

    rows, totals = [], [_total_tokens(seqs, cnt)]
    for rank in range(1, n_merges + 1):
        pc = _pair_counts(seqs, cnt)
        if not len(pc):
            break
        pc = pc.sort_values(["n", "lhs", "rhs"],
                            ascending=[False, True, True], kind="stable")
        lhs, rhs, n = (pc.iloc[0]["lhs"], pc.iloc[0]["rhs"],
                       int(pc.iloc[0]["n"]))
        rows.append((rank, lhs, rhs, lhs + rhs, n))
        pat, rep = f"|{lhs}||{rhs}|", f"|{lhs}{rhs}|"
        seqs = [s.replace(pat, rep) for s in seqs]
        totals.append(_total_tokens(seqs, cnt))
    return rows, totals, wc["word"].astype(str).tolist(), seqs


def bpe_encode(docs: ray.data.Dataset,
               n_merges: int = BPE_MERGES) -> ray.data.Dataset:
    """(doc_id, pos, bpe_token): the corpus tokenized with its own
    learned BPE — the tokenizer APPLY step that closes the train →
    encode loop (``vocab_encode`` is the unigram-id analogue; this one
    emits subword strings so downstream id-mapping stays a trivial
    dictionary join). pos is the document-global subtoken position.

    Scale shape: the segmentation of every DISTINCT word falls out of
    the trainer's vocabulary-bounded word table (no extra pass) and
    broadcasts once via ``ray.put`` — the standard tokenizer-vocab
    broadcast; encoding is ONE stateless streaming pass with per-word
    lookups. A word unseen at train time (new text) is segmented on the
    fly by replaying the learned merge rules — the published BPE apply
    path."""
    rules, _, words, seqs = _train(docs, n_merges)
    seg = {w: s.strip("|").split("||") for w, s in zip(words, seqs)}
    state = ray.put((seg, [(r[1], r[2]) for r in rules]))

    def enc(df: pd.DataFrame) -> pd.DataFrame:
        sg, merges = ray.get(state)

        def of(word: str) -> list[str]:
            hit = sg.get(word)
            if hit is not None:
                return hit
            s = _delim(word)                      # replay learned rules
            for lhs, rhs in merges:
                s = s.replace(f"|{lhs}||{rhs}|", f"|{lhs}{rhs}|")
            return s.strip("|").split("||")

        ids_out, pos_out, tok_out = [], [], []
        toks = df["text"].astype(str).str.lower().str.findall(WS_TOKEN_RE)
        for doc_id, ts in zip(df["doc_id"].to_numpy(dtype=np.int64), toks):
            subs = [s for w in ts for s in of(w)]
            n = len(subs)
            if not n:
                continue
            ids_out.append(np.full(n, doc_id, dtype=np.int64))
            pos_out.append(np.arange(n, dtype=np.int64))
            tok_out.extend(subs)
        if not ids_out:
            return pd.DataFrame({"doc_id": np.empty(0, np.int64),
                                 "pos": np.empty(0, np.int64),
                                 "bpe_token": np.empty(0, object)})
        return pd.DataFrame({
            "doc_id": np.concatenate(ids_out),
            "pos": np.concatenate(pos_out),
            "bpe_token": np.asarray(tok_out, dtype=object)})

    return docs.select_columns(["doc_id", "text"]).map_batches(
        enc, batch_format="pandas")
