"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (BM25 index build + top-k search over
the ``documents`` table) at sf0.001. ``queries()`` exposes one callable per
implemented operator/pipeline from SURVEY.md §2 (+ the training-data-pipeline
extras); ``oracle_sql()`` gives the DuckDB-equivalent SQL for every
SQL-expressible entry. Ray is initialised by the driver — nothing here calls
``ray.init``/``ray.shutdown``.

Float policy: any float-valued compared column is rounded to 6 decimals on
BOTH sides and ranks are computed over the ROUNDED value with a docid
tie-break, so bit-level summation-order differences between numpy and DuckDB
cannot flip a rank or a hash.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd

from colbert_ray.config import EngineConfig
from colbert_ray.extras import dedup as x_dedup
from colbert_ray.extras import graph as x_graph
from colbert_ray.extras import relational as x_rel
from colbert_ray.extras import simsearch as x_sim
from colbert_ray.extras import textstats as x_text
from colbert_ray.functions.tokenizer import sql_tokenize_expr, tokenize_query
from colbert_ray.pipelines import phrase as x_phrase

# ---------------------------------------------------------------------------
# shared constants (embedded in BOTH the Ray callables and the oracle SQL)
# ---------------------------------------------------------------------------

CFG = EngineConfig()

# fixed reference query set over the documents table (vocabulary drawn from
# the synthetic corpus; last query carries an OOV term for zero-df handling)
QUERY_SET: list[tuple[int, str]] = [
    (0, "join merge sort"),
    (1, "window agg stream"),
    (2, "hash join spark"),
    (3, "slow query filter"),
    (4, "customer order line"),
    (5, "batch stream data"),
    (6, "the fast scan"),
    (7, "dup key value zzznotaterm"),
]

KNN_QUERY_IDS = [0, 1, 2, 3, 4]
EMB_DUP_MAX_ID = 200
EMB_DUP_THRESHOLD = 0.3          # rounded-cosine threshold (float policy)
JACCARD_MAX_ID = 200
JACCARD_THRESHOLD_NUM = 6      # threshold = 6/10, tested in exact integer
JACCARD_THRESHOLD_DEN = 10     # arithmetic on both sides
PHRASE_QUERY = "hash join"     # exact-phrase query (pipelines/phrase.py)
BOOL_TERMS = ["hash", "join", "merge"]   # conjunctive boolean AND query


def _doc_path(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def _read(sf_dir: str, table: str, columns=None):
    import ray.data

    return ray.data.read_parquet(_doc_path(sf_dir, table), columns=columns)


def _index_dir_for(sf_dir: str) -> str:
    key = hashlib.sha256(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return os.path.join("/tmp/colbert_ray_driver", f"idx_{key}")


def _ensure_index(sf_dir: str) -> str:
    """Build (or resume) the documents-table index once per sf_dir."""
    from colbert_ray.pipelines.build import build_index

    idx = _index_dir_for(sf_dir)
    build_index(
        _doc_path(sf_dir, "documents"),
        idx,
        CFG,
        content_col="text",
        key_cols=(),
        meta_cols=("lang", "source"),
        docid_col="doc_id",
    )
    return idx


def _rerank_rounded(df: pd.DataFrame, score_col: str, id_col: str, k: int) -> pd.DataFrame:
    """Re-rank by (rounded score desc, id asc) within qid and cut to k."""
    df = df.copy()
    df[score_col] = df[score_col].round(6)
    df = df.sort_values(["qid", score_col, id_col], ascending=[True, False, True])
    df["rank"] = df.groupby("qid").cumcount() + 1
    df = df[df["rank"] <= k].reset_index(drop=True)
    df["rank"] = df["rank"].astype(np.int64)
    return df


# ---------------------------------------------------------------------------
# query callables
# ---------------------------------------------------------------------------

QL_MU = 2000.0


_QL_TOP10_MEMO: dict = {}


PRUNE_RATIO = 0.78   # query-term dfs cluster at 0.75-0.8*n_docs: ~half prune


def _q_pruned_bm25_top10(sf_dir: str) -> pd.DataFrame:
    """Lossy stop-term pruning gate (stages/prune.py, M11): terms with
    df > ratio*n_docs lose their posting lists; remaining terms keep
    EXACT scores (idf frozen). The twin simply filters those terms out of
    the query — the documented semantics, value-checked."""
    import pyarrow as pa

    from colbert_ray.pipelines.build import build_index
    from colbert_ray.pipelines.search import search_table
    from colbert_ray.stages.prune import prune_index

    src = _doc_path(sf_dir, "documents")
    st = os.stat(src)
    root = os.path.join("/tmp/colbert_ray_driver",
                        "prn_" + hashlib.sha256(
                            f"{os.path.abspath(src)}:{st.st_mtime_ns}:"
                            f"{st.st_size}:{PRUNE_RATIO}".encode()
                        ).hexdigest()[:12])
    idx = os.path.join(root, "index")
    marker = os.path.join(root, "_pruned")
    build_index(src, idx, CFG, content_col="text", key_cols=(),
                meta_cols=(), docid_col="doc_id")
    if not os.path.exists(marker):
        prune_index(idx, max_df_ratio=PRUNE_RATIO)
        with open(marker, "w") as f:
            f.write("ok")
    qt = pa.table(
        {
            "qid": pa.array([q for q, _ in QUERY_SET], type=pa.int64()),
            "query": pa.array([t for _, t in QUERY_SET], type=pa.string()),
        }
    )
    res = search_table(qt, idx, k=50, with_sha=False).to_pandas()
    out = _rerank_rounded(res, "score", "docid", 10)
    return out[["qid", "docid", "rank", "score"]].rename(
        columns={"score": "score_r"})


def _typo_text(text: str) -> str:
    """Deterministic typo: delete the 2nd character of the first word."""
    ws = text.split()
    ws[0] = ws[0][0] + ws[0][2:]
    return " ".join(ws)


TYPO_QUERY_SET = [(qid, _typo_text(t)) for qid, t in QUERY_SET]


def _q_corrected_bm25_top10(sf_dir: str) -> pd.DataFrame:
    """Query spelling correction (functions/spelling.py): OOV query terms
    are replaced by their best Levenshtein-1 dictionary neighbor (highest
    df, term-ascending ties; no neighbor -> dropped), then plain BM25 —
    the did-you-mean pipeline over deterministic one-deletion typos of
    the standard query set."""
    import pyarrow as pa

    from colbert_ray.functions.spelling import correct_terms
    from colbert_ray.pipelines.search import search_table
    from colbert_ray.state.decoded import DecodedIndex

    idx_dir = _ensure_index(sf_dir)
    idx = DecodedIndex.load_cached(idx_dir, load_sha=False)
    rows = []
    for qid, text in TYPO_QUERY_SET:
        toks = tokenize_query(text, CFG)[0]
        fixed = correct_terms(idx.dict_terms, idx.dict_dfs, toks)
        rows.append((qid, " ".join(fixed)))
    qt = pa.table({
        "qid": pa.array([q for q, _ in rows], type=pa.int64()),
        "query": pa.array([t for _, t in rows], type=pa.string()),
    })
    res = search_table(qt, idx_dir, k=50, with_sha=False).to_pandas()
    out = _rerank_rounded(res, "score", "docid", 10)
    return out[["qid", "docid", "rank", "score"]].rename(
        columns={"score": "score_r"})


def _q_lm_dirichlet_top10(sf_dir: str) -> pd.DataFrame:
    """Dirichlet query-likelihood ranking over the SAME index as
    bm25_top10 (functions/ql.py) — the pluggable-scorer gate: one stored
    index, two exact rankers. Memoized per source identity (rrf reuses
    it, like _q_bm25_top10's memo)."""
    import pyarrow as pa

    from colbert_ray.pipelines.search import search_table

    src = _doc_path(sf_dir, "documents")
    st = os.stat(src)
    key = (os.path.abspath(src), st.st_mtime_ns, st.st_size)
    hit = _QL_TOP10_MEMO.get(key)
    if hit is not None:
        return hit.copy()
    idx = _ensure_index(sf_dir)
    qt = pa.table(
        {
            "qid": pa.array([q for q, _ in QUERY_SET], type=pa.int64()),
            "query": pa.array([t for _, t in QUERY_SET], type=pa.string()),
        }
    )
    res = search_table(qt, idx, k=50, with_sha=False, ranker="ql",
                       mu=QL_MU).to_pandas()
    out = _rerank_rounded(res, "score", "docid", 10)
    out = out[["qid", "docid", "rank", "score"]].rename(
        columns={"score": "score_r"})
    _QL_TOP10_MEMO[key] = out
    return out.copy()


# IndexUpdater gate (T6): deterministic delta scenario applied on a COPY
# of the documents index. Removed docids exist at every sf; added docs
# include the otherwise-OOV term of query 7 ("zzznotaterm"), exercising
# the brand-new-term delta path (idf from delta df, frozen n_docs).
UPD_REMOVED = [3, 8, 21, 34, 47]
UPD_ADDED_TEXTS = [
    "join merge sort join stream window",
    "window agg stream window agg",
    "hash join spark hash data",
    "customer order line customer batch",
    "the fast scan the slow filter",
    "dup key value zzznotaterm dup key",
]


def _q_updated_bm25_top10(sf_dir: str) -> pd.DataFrame:
    """End-to-end IndexUpdater pipeline (T6, index_updater.py:28-65 analog):
    build -> remove_docids (tombstones) -> add_documents (delta segment) ->
    search the updated view WITHOUT a rebuild. Frozen-statistics semantics
    (idf/avgdl of the last full build; delta-only terms get delta-df idf)
    are replicated exactly by the SQL twin."""
    import pyarrow as pa

    from colbert_ray.pipelines.build import build_index
    from colbert_ray.pipelines.search import search_table
    from colbert_ray.state.updates import IndexUpdater

    src = _doc_path(sf_dir, "documents")
    st = os.stat(src)
    scenario = repr((UPD_REMOVED, UPD_ADDED_TEXTS))
    root = os.path.join("/tmp/colbert_ray_driver",
                        "upd_" + hashlib.sha256(
                            f"{os.path.abspath(src)}:{st.st_mtime_ns}:"
                            f"{st.st_size}:{scenario}".encode()
                        ).hexdigest()[:12])
    idx = os.path.join(root, "index")
    build_index(src, idx, CFG, content_col="text", key_cols=(),
                meta_cols=("lang", "source"), docid_col="doc_id")
    marker = os.path.join(root, "_updates_applied")
    if not os.path.exists(marker):
        import shutil

        # stale partial application (crashed between remove and add):
        # reset to the clean post-build state and reapply atomically
        shutil.rmtree(os.path.join(idx, "deltas"), ignore_errors=True)
        try:
            os.remove(os.path.join(idx, "tombstones.json"))
        except FileNotFoundError:
            pass
        os.utime(os.path.join(idx, "metadata.json"))
        upd = IndexUpdater(idx)
        upd.remove_docids(UPD_REMOVED)
        added = pa.table({"text": pa.array(UPD_ADDED_TEXTS, type=pa.string())})
        upd.add_documents(added, content_col="text")
        with open(marker, "w") as f:
            f.write("ok")
    qt = pa.table(
        {
            "qid": pa.array([q for q, _ in QUERY_SET], type=pa.int64()),
            "query": pa.array([t for _, t in QUERY_SET], type=pa.string()),
        }
    )
    res = search_table(qt, idx, k=50, with_sha=False).to_pandas()
    out = _rerank_rounded(res, "score", "docid", 10)
    return out[["qid", "docid", "rank", "score"]].rename(
        columns={"score": "score_r"})


PROX_QUERY = "join merge sort"


def _q_proximity_top10(sf_dir: str) -> pd.DataFrame:
    """Proximity ranking (pipelines/phrase.py:proximity_search): docs with
    ALL query words ranked by smallest covering token window — integer-
    exact, conjunctive candidates + candidate-only verify."""
    from colbert_ray.pipelines.phrase import proximity_search

    idx = _ensure_index(sf_dir)
    t = proximity_search(idx, _read(sf_dir, "documents", ["doc_id", "text"]),
                         PROX_QUERY, k=10, cfg=CFG)
    return t.to_pandas().reset_index(drop=True)


SNIPPET_WINDOW = 8


def _q_search_snippets(sf_dir: str) -> pd.DataFrame:
    """Result presentation (pipelines/snippets.py): best 8-token window
    per (query, top-3 hit) — corpus streams through a broadcast semi-join,
    window scan is a vectorized cumsum over the query-term mask."""
    from colbert_ray.pipelines.snippets import extract_snippets

    ranking = _q_bm25_top10(sf_dir)
    ranking = ranking[ranking["rank"] <= 3]
    qterms = {qid: tokenize_query(text, CFG)[0] for qid, text in QUERY_SET}
    return extract_snippets(
        ranking, _read(sf_dir, "documents", ["doc_id", "text"]),
        qterms, CFG, window=SNIPPET_WINDOW)


RM3_N_EXP = 5
RM3_ALPHA = 0.5


def _q_rm3_bm25_top10(sf_dir: str) -> pd.DataFrame:
    """RM3 pseudo-relevance feedback (pipelines/expand.py): BM25 top-10
    -> feedback term stats via streaming semi-join -> weighted expanded
    re-search through the scorer actor pool's weighted-query batch form."""
    from colbert_ray.pipelines.expand import (feedback_term_stats,
                                              rm3_expansions,
                                              weighted_query_table)
    from colbert_ray.pipelines.search import search_table

    idx = _ensure_index(sf_dir)
    ranking = _q_bm25_top10(sf_dir)
    fb = feedback_term_stats(
        ranking, _read(sf_dir, "documents", ["doc_id", "text"]), CFG)
    orig = {qid: tokenize_query(text, CFG)[0] for qid, text in QUERY_SET}
    exp = rm3_expansions(ranking, fb, orig, n_expansion=RM3_N_EXP,
                         alpha=RM3_ALPHA)
    res = search_table(weighted_query_table(exp), idx, k=50,
                       with_sha=False).to_pandas()
    out = _rerank_rounded(res, "score", "docid", 10)
    return out[["qid", "docid", "rank", "score"]].rename(
        columns={"score": "score_r"})


def _q_search_facets(sf_dir: str) -> pd.DataFrame:
    """Faceted retrieval (pipelines/evaluate.py:facet_counts): BM25 top-10
    per query, then per-(qid, lang, source) hit counts via a broadcast
    semi-join against the streaming documents table."""
    from colbert_ray.pipelines.evaluate import facet_counts

    ranking = _q_bm25_top10(sf_dir)
    docs = _read(sf_dir, "documents", ["doc_id", "lang", "source"])
    return facet_counts(ranking, docs, facet_cols=("lang", "source"))


def _q_rrf_bm25_ql_top5(sf_dir: str) -> pd.DataFrame:
    """Reciprocal-rank fusion (pipelines/evaluate.py:reciprocal_rank_fusion)
    of the BM25 and Dirichlet-QL top-10 lists over the same index — fusing
    incomparable scorers by rank, the K7/D6 rank-based complement. Both
    input rankings come from the per-source memos (no re-search)."""
    from colbert_ray.pipelines.evaluate import reciprocal_rank_fusion

    bm = _q_bm25_top10(sf_dir)
    ql = _q_lm_dirichlet_top10(sf_dir)
    fused = reciprocal_rank_fusion([bm, ql], k=50)
    out = _rerank_rounded(fused, "fused", "docid", 5)
    return out[["qid", "docid", "rank", "fused"]].rename(
        columns={"fused": "fused_r"})


def _q_merged_bm25_top10(sf_dir: str) -> pd.DataFrame:
    """Index-merge gate (pipelines/merge.merge_indexes — the Lucene
    addIndexes / SPIMI multi-way merge analog): documents split into two
    disjoint halves by doc_id, each half built into its OWN index, the two
    merged with full global stats refresh (df / avgdl / tfsat), then the
    standard query set searched on the MERGED index. Twin: the plain
    single-corpus BM25 oracle — merge must be indistinguishable from one
    build over the union."""
    import pyarrow as pa
    import pyarrow.parquet as _pq

    from colbert_ray.pipelines.build import build_index
    from colbert_ray.pipelines.merge import merge_indexes
    from colbert_ray.pipelines.search import search_table

    src = _doc_path(sf_dir, "documents")
    st = os.stat(src)
    root = os.path.join("/tmp/colbert_ray_driver",
                        "mrg_" + hashlib.sha256(
                            f"{os.path.abspath(src)}:{st.st_mtime_ns}:"
                            f"{st.st_size}".encode()).hexdigest()[:12])
    merged = os.path.join(root, "merged")
    marker = os.path.join(root, "_merged")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(root, exist_ok=True)
        t = _pq.read_table(src, columns=["doc_id", "text"])
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        cut = int(np.median(ids))
        lo = t.filter(pa.array(ids <= cut))
        hi = t.filter(pa.array(ids > cut))
        pa_lo = os.path.join(root, "lo.parquet")
        pa_hi = os.path.join(root, "hi.parquet")
        _pq.write_table(lo, pa_lo)
        _pq.write_table(hi, pa_hi)
        ia, ib = os.path.join(root, "idx_lo"), os.path.join(root, "idx_hi")
        for p, d in ((pa_lo, ia), (pa_hi, ib)):
            build_index(p, d, CFG, content_col="text", key_cols=(),
                        meta_cols=(), docid_col="doc_id")
        merge_indexes([ia, ib], merged, CFG)
        with open(marker, "w") as f:
            f.write("ok")
    qt = pa.table({
        "qid": pa.array([q for q, _ in QUERY_SET], type=pa.int64()),
        "query": pa.array([t for _, t in QUERY_SET], type=pa.string()),
    })
    res = search_table(qt, merged, k=50, with_sha=False).to_pandas()
    out = _rerank_rounded(res, "score", "docid", 10)
    return out[["qid", "docid", "rank", "score"]].rename(
        columns={"score": "score_r"})


def _q_compacted_bm25_top10(sf_dir: str) -> pd.DataFrame:
    """The stats-refresh complement of updated_bm25_top10: the same delta
    scenario followed by IndexUpdater.compact() (persist+reindex analog,
    index_updater.py:150-274) — deltas/tombstones clear and ALL statistics
    (n_docs, avgdl, df) refresh over the live corpus, which the twin
    computes live-side throughout."""
    import pyarrow as pa
    import pyarrow.parquet as _pq

    from colbert_ray.pipelines.build import build_index
    from colbert_ray.pipelines.search import search_table
    from colbert_ray.state.updates import IndexUpdater

    src = _doc_path(sf_dir, "documents")
    st = os.stat(src)
    scenario = repr((UPD_REMOVED, UPD_ADDED_TEXTS))
    root = os.path.join("/tmp/colbert_ray_driver",
                        "cmp_" + hashlib.sha256(
                            f"{os.path.abspath(src)}:{st.st_mtime_ns}:"
                            f"{st.st_size}:{scenario}".encode()
                        ).hexdigest()[:12])
    idx = os.path.join(root, "index")
    live_path = os.path.join(root, "live.parquet")
    marker = os.path.join(root, "_compacted")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(root, exist_ok=True)
        # deterministic live corpus: original minus removed, plus added
        # docs appended after max(doc_id) — same scenario as the delta gate
        orig = _pq.read_table(src, columns=["doc_id", "text"])
        keep = ~np.isin(orig.column("doc_id").to_numpy(zero_copy_only=False),
                        np.asarray(UPD_REMOVED, dtype=np.int64))
        kept = orig.filter(pa.array(keep))
        base = int(orig.column("doc_id").to_numpy(
            zero_copy_only=False).max()) + 1
        added = pa.table({
            "doc_id": pa.array(
                np.arange(base, base + len(UPD_ADDED_TEXTS), dtype=np.int64)),
            "text": pa.array(UPD_ADDED_TEXTS, type=pa.string()),
        })
        _pq.write_table(pa.concat_tables([kept, added]), live_path)
        # exercise the full updater lifecycle: build -> deltas -> compact
        build_index(src, idx, CFG, content_col="text", key_cols=(),
                    meta_cols=(), docid_col="doc_id")
        upd = IndexUpdater(idx)
        upd.remove_docids(UPD_REMOVED)
        upd.add_documents(
            pa.table({"text": pa.array(UPD_ADDED_TEXTS, type=pa.string())}),
            content_col="text")
        upd.compact(live_path, content_col="text", key_cols=(),
                    meta_cols=(), docid_col="doc_id")
        with open(marker, "w") as f:
            f.write("ok")
    qt = pa.table(
        {
            "qid": pa.array([q for q, _ in QUERY_SET], type=pa.int64()),
            "query": pa.array([t for _, t in QUERY_SET], type=pa.string()),
        }
    )
    res = search_table(qt, idx, k=50, with_sha=False).to_pandas()
    out = _rerank_rounded(res, "score", "docid", 10)
    return out[["qid", "docid", "rank", "score"]].rename(
        columns={"score": "score_r"})


_BM25_TOP10_MEMO: dict = {}


def _q_bm25_top10(sf_dir: str) -> pd.DataFrame:
    import pyarrow as pa

    from colbert_ray.pipelines.search import search_table

    # memoized per source identity: the composites built on this ranking
    # (rm3 / rrf / facets / snippets / ndcg) each call it, and the search
    # is deterministic for a given documents.parquet
    src = _doc_path(sf_dir, "documents")
    st = os.stat(src)
    key = (os.path.abspath(src), st.st_mtime_ns, st.st_size)
    hit = _BM25_TOP10_MEMO.get(key)
    if hit is not None:
        return hit.copy()
    idx = _ensure_index(sf_dir)
    qt = pa.table(
        {
            "qid": pa.array([q for q, _ in QUERY_SET], type=pa.int64()),
            "query": pa.array([t for _, t in QUERY_SET], type=pa.string()),
        }
    )
    res = search_table(qt, idx, k=50, with_sha=False).to_pandas()
    out = _rerank_rounded(res, "score", "docid", 10)
    out = out[["qid", "docid", "rank", "score"]].rename(
        columns={"score": "score_r"})
    _BM25_TOP10_MEMO[key] = out
    return out.copy()


def _q_bm25_explain(sf_dir: str) -> pd.DataFrame:
    """Lucene-explain analog (BM25Scorer.explain, state/index.py): the
    per-(query term, docid) scoring breakdown for each query's rounded
    top-10 — the served tf, df, idf and the exact float64 contribution
    ``idf * tfsat`` that score_query sums. Floats rounded to 6 per the
    float policy; the twin restricts the same per-term CTEs to the
    bm25_top10 docid set."""
    from colbert_ray.state.index import BM25Scorer

    top = _q_bm25_top10(sf_dir)
    scorer = BM25Scorer(_ensure_index(sf_dir), k=10, with_sha=False)
    parts = []
    for qid, text in QUERY_SET:
        docids = top.loc[top["qid"] == qid, "docid"].to_numpy(dtype=np.int64)
        t = scorer.explain(text, docids).to_pandas()
        t.insert(0, "qid", np.int64(qid))
        parts.append(t)
    out = pd.concat(parts, ignore_index=True)
    out["idf_r"] = out.pop("idf").round(6)
    out["contrib_r"] = out.pop("contribution").round(6)
    return out[["qid", "term", "docid", "tf", "df", "idf_r", "contrib_r"]]


def _bm25_explain_sql() -> str:
    """Twin of BM25Scorer.explain over the bm25_top10 result set. The
    saturation is parenthesized exactly as the engine computes it
    (idf * ((tf * (k1+1)) / denom), functions/bm25.py:34)."""
    values = ",\n      ".join(
        f"({qid}, '{term}')"
        for qid, text in QUERY_SET
        for term in tokenize_query(text, CFG)[0]
    )
    k1, b = CFG.k1, CFG.b
    return f"""
WITH docs AS (
  SELECT doc_id, {_toks_expr()} AS toks FROM documents
),
stats AS (
  SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM docs
),
tok AS (
  SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM docs
),
tf AS (
  SELECT doc_id, term, any_value(dl) AS dl, count(*) AS tf
  FROM tok GROUP BY doc_id, term
),
df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
),
q(qid, term) AS (
  VALUES {values}
),
top AS (
  SELECT qid, docid FROM ({_bm25_sql()})
),
rows AS (
  SELECT q.qid::BIGINT AS qid, q.term, tf.doc_id AS docid,
         tf.tf::BIGINT AS tf, df.df::BIGINT AS df,
         ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0) AS idf,
         ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * ( (tf.tf * ({k1} + 1.0))
               / (tf.tf + {k1} * (1.0 - {b} + {b} * tf.dl / s.avgdl)) )
           AS contribution
  FROM q
  JOIN df ON df.term = q.term
  JOIN tf ON tf.term = q.term
  CROSS JOIN stats s
)
SELECT r.qid, r.term, r.docid, r.tf, r.df,
       round(r.idf, 6) AS idf_r, round(r.contribution, 6) AS contrib_r
FROM rows r JOIN top t ON t.qid = r.qid AND t.docid = r.docid
ORDER BY r.qid, r.term, r.docid
"""


# BM25F field weights: title = first BM25F_TITLE_LEN tokens (deterministic
# field derivation shared with the SQL twin), body = the rest
BM25F_TITLE_LEN = 5
BM25F_W_TITLE, BM25F_B_TITLE = 2.5, 0.6
BM25F_W_BODY, BM25F_B_BODY = 1.0, 0.75


def _q_ltr_features(sf_dir: str) -> pd.DataFrame:
    """Learning-to-rank feature export: per (qid, docid in the bm25 top-10)
    the classical LTR feature vector — rounded BM25, rounded Dirichlet-QL
    (same index, functions/ql.py), doc length, matched-term count and
    summed tf. The extraction reuses BM25Scorer.explain and the QL
    accumulator restricted to the candidate set — the reference's
    feature/extraction stage re-expressed classically."""
    from colbert_ray.state.index import BM25Scorer

    top = _q_bm25_top10(sf_dir)
    idx_dir = _ensure_index(sf_dir)
    bm = BM25Scorer(idx_dir, k=10, with_sha=False)
    ql = BM25Scorer(idx_dir, k=10, with_sha=False, ranker="ql")
    parts = []
    for qid, text in QUERY_SET:
        sub = top[top["qid"] == qid]
        docids = np.sort(sub["docid"].to_numpy(dtype=np.int64))
        if not len(docids):
            continue
        ex = bm.explain(text, docids).to_pandas()
        agg = (ex.groupby("docid")
               .agg(n_match=("term", "size"), sum_tf=("tf", "sum"))
               .reset_index())
        tids = ql.idx.lookup_terms(tokenize_query(text, CFG)[0])
        d, s = ql._ql_all_match_scores(tids, docid_filter=docids)
        qls = dict(zip(d.tolist(), s.tolist()))
        agg["qid"] = np.int64(qid)
        agg["ql_r"] = agg["docid"].map(qls).round(6)
        agg["dl"] = np.asarray(ql.idx.doclens)[
            agg["docid"].to_numpy() - ql.idx.docid_base].astype(np.int64)
        parts.append(agg)
    out = pd.concat(parts, ignore_index=True)
    out = out.merge(top[["qid", "docid", "score_r"]], on=["qid", "docid"])
    out = out.rename(columns={"score_r": "bm25_r"})
    out["n_match"] = out["n_match"].astype(np.int64)
    out["sum_tf"] = out["sum_tf"].astype(np.int64)
    return (out[["qid", "docid", "bm25_r", "ql_r", "dl",
                 "n_match", "sum_tf"]]
            .sort_values(["qid", "docid"]).reset_index(drop=True))


def _ltr_features_sql() -> str:
    values = ",\n      ".join(
        f"({qid}, '{term}')"
        for qid, text in QUERY_SET
        for term in tokenize_query(text, CFG)[0]
    )
    mu = QL_MU
    return f"""
WITH docs AS (
  SELECT doc_id, {_toks_expr()} AS toks FROM documents
),
coll AS (
  SELECT sum(len(toks)) AS n_tokens FROM docs
),
tok AS (
  SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM docs
),
tf AS (
  SELECT doc_id, term, any_value(dl) AS dl, count(*) AS tf
  FROM tok GROUP BY doc_id, term
),
cf AS (
  SELECT term, sum(tf) AS cf FROM tf GROUP BY term
),
q(qid, term) AS (
  VALUES {values}
),
qn AS (
  SELECT q.qid, count(*) AS nq FROM q JOIN cf ON cf.term = q.term
  GROUP BY q.qid
),
top AS (
  SELECT qid, docid, score_r FROM ({_bm25_sql()})
),
agg AS (
  SELECT q.qid, tf.doc_id AS docid,
         count(*)::BIGINT AS n_match,
         sum(tf.tf)::BIGINT AS sum_tf,
         any_value(tf.dl)::BIGINT AS dl,
         sum( ln(1.0 + tf.tf * c.n_tokens / ({mu} * cf.cf)) ) AS mscore
  FROM q
  JOIN cf ON cf.term = q.term
  JOIN tf ON tf.term = q.term
  CROSS JOIN coll c
  GROUP BY q.qid, tf.doc_id
)
SELECT t.qid, t.docid, t.score_r AS bm25_r,
       round(a.mscore + qn.nq * ln({mu} / (a.dl + {mu})), 6) AS ql_r,
       a.dl, a.n_match, a.sum_tf
FROM top t
JOIN agg a ON a.qid = t.qid AND a.docid = t.docid
JOIN qn ON qn.qid = t.qid
ORDER BY t.qid, t.docid
"""


SUGGEST_PREFIX = "s"
SUGGEST_K = 10


def _q_suggest_terms(sf_dir: str) -> pd.DataFrame:
    """Query autocompletion (pipelines/phrase.suggest_terms): top-10
    dictionary terms for a prefix by (df DESC, term ASC) over the mmap'd
    dictionary range probe."""
    from colbert_ray.pipelines.phrase import suggest_terms

    return suggest_terms(_ensure_index(sf_dir), SUGGEST_PREFIX,
                         k=SUGGEST_K).to_pandas()


def _suggest_terms_sql() -> str:
    return f"""
WITH d AS (SELECT doc_id, {_toks_expr()} AS toks FROM documents),
tf AS (
  SELECT term, count(DISTINCT doc_id) AS df
  FROM (SELECT doc_id, unnest(toks) AS term FROM d)
  WHERE term LIKE '{SUGGEST_PREFIX}%'
  GROUP BY term
)
SELECT term, df::BIGINT AS df,
       row_number() OVER (ORDER BY df DESC, term) AS rank
FROM tf QUALIFY rank <= {SUGGEST_K} ORDER BY rank
"""


def _q_bm25f_top10(sf_dir: str) -> pd.DataFrame:
    """Field-weighted BM25F top-10 (extras/fields.bm25f_rank): per-field
    length-normalized tfs combined with field weights BEFORE saturation,
    cross-field df idf — over the deterministic (title, body) split."""
    from colbert_ray.extras.fields import FieldSpec, bm25f_rank, field_split

    fds = field_split(_read(sf_dir, "documents", ["doc_id", "text"]),
                      title_len=BM25F_TITLE_LEN, cfg=CFG)
    ranked = bm25f_rank(
        fds, QUERY_SET,
        [FieldSpec("title", BM25F_W_TITLE, BM25F_B_TITLE),
         FieldSpec("body", BM25F_W_BODY, BM25F_B_BODY)],
        k=10, cfg=CFG)
    return (ranked.to_pandas().sort_values(["qid", "rank"])
            .reset_index(drop=True))


def _bm25f_sql() -> str:
    """Twin of bm25f_rank over the toks[1:T] / toks[T+1:] field split:
    per-field tf full-join, cross-field df, combine-then-saturate."""
    values = ",\n      ".join(
        f"({qid}, '{term}')"
        for qid, text in QUERY_SET
        for term in tokenize_query(text, CFG)[0]
    )
    T, k1 = BM25F_TITLE_LEN, CFG.k1
    wt, bt = BM25F_W_TITLE, BM25F_B_TITLE
    wb, bb = BM25F_W_BODY, BM25F_B_BODY
    tfn = (f"( {wt} * m.tf_t / (1.0 - {bt} + {bt} * len(f.tt) / s.avgdl_t)"
           f" + {wb} * m.tf_b / (1.0 - {bb} + {bb} * len(f.tb) / s.avgdl_b) )")
    return f"""
WITH d AS (SELECT doc_id, {_toks_expr()} AS toks FROM documents),
f AS (
  SELECT doc_id, toks[1:{T}] AS tt, toks[{T + 1}:len(toks)] AS tb FROM d
),
stats AS (
  SELECT count(*) AS n_docs, avg(len(tt)) AS avgdl_t, avg(len(tb)) AS avgdl_b
  FROM f
),
tftc AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(tt) AS term FROM f) GROUP BY doc_id, term
),
tfbc AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(tb) AS term FROM f) GROUP BY doc_id, term
),
m AS (
  SELECT coalesce(t.doc_id, b.doc_id) AS doc_id,
         coalesce(t.term, b.term) AS term,
         coalesce(t.tf, 0) AS tf_t, coalesce(b.tf, 0) AS tf_b
  FROM tftc t FULL JOIN tfbc b
    ON t.doc_id = b.doc_id AND t.term = b.term
),
df AS (SELECT term, count(*) AS df FROM m GROUP BY term),
q(qid, term) AS (VALUES {values}),
scores AS (
  SELECT q.qid, m.doc_id AS docid,
         sum( ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
              * {tfn} / ( {k1} + {tfn} ) ) AS score
  FROM q
  JOIN m ON m.term = q.term
  JOIN df ON df.term = q.term
  JOIN f ON f.doc_id = m.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, m.doc_id
)
SELECT qid::BIGINT AS qid, docid,
       row_number() OVER (PARTITION BY qid ORDER BY round(score, 6) DESC, docid) AS rank,
       round(score, 6) AS score_r
FROM scores
QUALIFY rank <= 10
ORDER BY qid, rank
"""


def _q_bm25_top10_bmw(sf_dir: str) -> pd.DataFrame:
    """Same ranking as bm25_top10 but scored with the Block-Max WAND
    strategy (`prune_strategy="bmw"`, state/index.py:_bmw_query) — exact,
    so it shares bm25_top10's SQL oracle."""
    import pyarrow as pa

    from colbert_ray.pipelines.search import search_table

    idx = _ensure_index(sf_dir)
    qt = pa.table(
        {
            "qid": pa.array([q for q, _ in QUERY_SET], type=pa.int64()),
            "query": pa.array([t for _, t in QUERY_SET], type=pa.string()),
        }
    )
    res = search_table(qt, idx, k=50, with_sha=False,
                       prune_strategy="bmw").to_pandas()
    out = _rerank_rounded(res, "score", "docid", 10)
    return out[["qid", "docid", "rank", "score"]].rename(columns={"score": "score_r"})


def _q_bm25_top10_pfor(sf_dir: str) -> pd.DataFrame:
    """Same ranking as bm25_top10 but over an index whose segments are
    PForDelta-compressed (`segment_codec="pfor"`, functions/codec.py) —
    codec changes file bytes only, so it shares bm25_top10's SQL oracle."""
    import pyarrow as pa

    from colbert_ray.config import EngineConfig
    from colbert_ray.pipelines.build import build_index
    from colbert_ray.pipelines.search import search_table

    idx = _index_dir_for(sf_dir) + "_pfor"
    build_index(
        _doc_path(sf_dir, "documents"), idx,
        EngineConfig(segment_codec="pfor"),
        content_col="text", key_cols=(), meta_cols=("lang", "source"),
        docid_col="doc_id",
    )
    qt = pa.table(
        {
            "qid": pa.array([q for q, _ in QUERY_SET], type=pa.int64()),
            "query": pa.array([t for _, t in QUERY_SET], type=pa.string()),
        }
    )
    res = search_table(qt, idx, k=50, with_sha=False).to_pandas()
    out = _rerank_rounded(res, "score", "docid", 10)
    return out[["qid", "docid", "rank", "score"]].rename(columns={"score": "score_r"})


def _q_bm25_top10_ef(sf_dir: str) -> pd.DataFrame:
    """Same ranking as bm25_top10 but over an index whose segments are
    Elias-Fano-compressed (`segment_codec="ef"`, functions/codec.py — the
    quasi-succinct representation, Vigna WSDM'13) — codec changes file
    bytes only, so it shares bm25_top10's SQL oracle."""
    import pyarrow as pa

    from colbert_ray.config import EngineConfig
    from colbert_ray.pipelines.build import build_index
    from colbert_ray.pipelines.search import search_table

    idx = _index_dir_for(sf_dir) + "_ef"
    build_index(
        _doc_path(sf_dir, "documents"), idx,
        EngineConfig(segment_codec="ef"),
        content_col="text", key_cols=(), meta_cols=("lang", "source"),
        docid_col="doc_id",
    )
    qt = pa.table(
        {
            "qid": pa.array([q for q, _ in QUERY_SET], type=pa.int64()),
            "query": pa.array([t for _, t in QUERY_SET], type=pa.string()),
        }
    )
    res = search_table(qt, idx, k=50, with_sha=False).to_pandas()
    out = _rerank_rounded(res, "score", "docid", 10)
    return out[["qid", "docid", "rank", "score"]].rename(columns={"score": "score_r"})


DSL_QUERIES = [
    (1, 'table AND window'),
    (2, 'key OR vector'),
    (3, '"fast table" AND NOT slow'),
    (4, '(scan OR batch) AND filt*'),
    (5, 'quer* AND NOT (window OR sort)'),
    (6, '*ow AND table'),
    (7, '*alu* AND NOT row'),
    (8, 'customer "value table"'),
    (9, 'table AND lang:fr'),
    (10, 'lang:zh OR (source:src7 AND NOT slow)'),
    (11, 'window AND doclen>=40 AND doclen<70'),
    (12, '"key scan"~4 AND lang:en'),
    (13, 'tabl~1 AND window'),
    (14, 'windwo~ AND NOT key'),
]


def _q_dsl_search(sf_dir: str) -> pd.DataFrame:
    """Boolean query-language gate (pipelines/querylang — the Lucene
    QueryParser analog composing term/phrase/wildcard atoms with
    AND/OR/NOT over the index primitives): the DSL_QUERIES list covers
    every construct (boolean ops, phrase, slop, wildcard forms, field and
    range atoms); BM25 over positive literal terms restricted
    to the boolean candidate set, constant-score wildcards, score 0 for
    unscored candidates. Twin: per-query translated predicate + the shared
    BM25 CTE, UNION ALL."""
    from colbert_ray.pipelines.querylang import dsl_search

    idx = _ensure_index(sf_dir)
    corpus = _read(sf_dir, "documents", ["doc_id", "text"])
    parts = []
    for did, q in DSL_QUERIES:
        t = dsl_search(idx, corpus, q, k=10, cfg=CFG).to_pandas()
        t.insert(0, "dsl_id", np.int64(did))
        parts.append(t)
    out = pd.concat(parts, ignore_index=True)
    out["score_r"] = out.pop("score").round(6)
    return out[["dsl_id", "docid", "rank", "score_r"]]


def _dsl_search_sql() -> str:
    from colbert_ray.pipelines.querylang import sql_dsl_search

    parts = [
        f"SELECT {did}::BIGINT AS dsl_id, docid, rank, score_r FROM "
        f"({sql_dsl_search('documents', q, k=10, cfg=CFG, fields=('lang', 'source'))})"
        for did, q in DSL_QUERIES
    ]
    return "\nUNION ALL\n".join(parts) + "\nORDER BY dsl_id, rank"


PAGE_SIZE = 3


def _q_paged_bm25(sf_dir: str) -> pd.DataFrame:
    """Cursor pagination (pipelines/search.search_after — the stateless
    Elasticsearch search_after analog): pages 2 and 3 (size 3) of every
    standard query, fetched strictly via the cursor returned by the
    previous page; global rank = 3 * (page - 1) + page rank. Twin: the
    full BM25 ranking's rows 4..9 under the shared rounded ordering."""
    from colbert_ray.pipelines.search import search_after
    from colbert_ray.state.index import BM25Scorer

    idx = _ensure_index(sf_dir)
    scorer = BM25Scorer(idx, k=PAGE_SIZE, with_sha=False)
    rows = []
    for qid, q in QUERY_SET:
        _, cursor = search_after(idx, q, k=PAGE_SIZE, cfg=CFG,
                                 scorer=scorer)
        for page_no in (2, 3):
            if cursor is None:
                break
            page, cursor = search_after(idx, q, k=PAGE_SIZE, after=cursor,
                                        cfg=CFG, scorer=scorer)
            t = page.to_pandas()
            t.insert(0, "qid", np.int64(qid))
            t["rank"] = t["rank"] + PAGE_SIZE * (page_no - 1)
            rows.append(t)
    out = pd.concat(rows, ignore_index=True)
    return out[["qid", "docid", "rank", "score_r"]]


def _paged_bm25_sql() -> str:
    base = _bm25_sql().replace("QUALIFY rank <= 10",
                               f"QUALIFY rank BETWEEN {PAGE_SIZE + 1} "
                               f"AND {3 * PAGE_SIZE}")
    return base


COLLAPSE_K = 5


def _q_collapsed_by_lang(sf_dir: str) -> pd.DataFrame:
    """Field collapsing (pipelines/search.collapse_search — the
    Elasticsearch `collapse` analog): per query, the top-5 hits with at
    most one doc per lang; each hit carries its lang group's total match
    count. Group representative/order under the shared rounded policy.
    (testdata lang is non-null, so the engine's NULL-singleton rule and
    the SQL PARTITION BY never diverge here.)"""
    from colbert_ray.pipelines.search import collapse_search
    from colbert_ray.state.index import BM25Scorer

    idx = _ensure_index(sf_dir)
    scorer = BM25Scorer(idx, k=COLLAPSE_K, with_sha=False)
    rows = []
    for qid, q in QUERY_SET:
        t = collapse_search(idx, q, "lang", k=COLLAPSE_K, cfg=CFG,
                            scorer=scorer).to_pandas()
        t.insert(0, "qid", np.int64(qid))
        rows.append(t)
    out = pd.concat(rows, ignore_index=True)
    return out[["qid", "docid", "rank", "score_r", "lang", "group_count"]]


def _q_match_stats(sf_dir: str) -> pd.DataFrame:
    """Match-set stats aggregation (pipelines/search.match_stats — ES
    track_total_hits + stats agg): per query, total hits, max rounded
    score and doclen sum/avg over the FULL match set, index-only."""
    from colbert_ray.pipelines.search import match_stats
    from colbert_ray.state.index import BM25Scorer

    idx = _ensure_index(sf_dir)
    scorer = BM25Scorer(idx, k=1, with_sha=False)
    rows = []
    for qid, q in QUERY_SET:
        t = match_stats(idx, q, cfg=CFG, scorer=scorer).to_pandas()
        t.insert(0, "qid", np.int64(qid))
        rows.append(t)
    return pd.concat(rows, ignore_index=True)[
        ["qid", "total_hits", "max_score_r", "sum_doclen", "avg_doclen"]]


def _match_stats_sql() -> str:
    # LEFT JOIN from the qid list: the engine emits a (0, 0.0, 0, 0.0)
    # row for a zero-match query, so the twin must too — a GROUP BY over
    # scores alone would silently drop that qid and fail the row-count
    # gate the day a query stops matching at some scale factor
    base = _bm25_sql()
    head, _ = base.rsplit("SELECT qid::BIGINT AS qid", 1)
    return head + """
, agg AS (
  SELECT s.qid,
         count(*) AS total_hits,
         max(round(s.score, 6)) AS max_score_r,
         sum(len(d.toks))::BIGINT AS sum_doclen,
         round(sum(len(d.toks))::BIGINT / count(*), 6) AS avg_doclen
  FROM scores s JOIN docs d ON d.doc_id = s.docid
  GROUP BY s.qid
)
SELECT ql.qid::BIGINT AS qid,
       coalesce(agg.total_hits, 0)::BIGINT AS total_hits,
       coalesce(agg.max_score_r, 0.0) AS max_score_r,
       coalesce(agg.sum_doclen, 0)::BIGINT AS sum_doclen,
       coalesce(agg.avg_doclen, 0.0) AS avg_doclen
FROM (SELECT DISTINCT qid FROM q) ql
LEFT JOIN agg ON agg.qid = ql.qid
ORDER BY qid
"""


MATCH_SAMPLE_RATE = 0.3


def _q_sampled_matches(sf_dir: str) -> pd.DataFrame:
    """Deterministic match-set sampling (pipelines/search.sampled_matches
    — reproducible seeded random_score): matching docs surviving the
    FNV+fmix64 docid hash gate at rate 0.3, with rounded scores."""
    from colbert_ray.pipelines.search import sampled_matches
    from colbert_ray.state.index import BM25Scorer

    idx = _ensure_index(sf_dir)
    scorer = BM25Scorer(idx, k=1, with_sha=False)
    rows = []
    for qid, q in QUERY_SET:
        t = sampled_matches(idx, q, rate=MATCH_SAMPLE_RATE, cfg=CFG,
                            scorer=scorer).to_pandas()
        t.insert(0, "qid", np.int64(qid))
        rows.append(t)
    return pd.concat(rows, ignore_index=True)[["qid", "docid", "score_r"]]


def _sampled_matches_sql() -> str:
    from colbert_ray.extras.sampling import (
        sample_threshold,
        sql_key_hash_expr,
    )

    base = _bm25_sql()
    head, _ = base.rsplit("SELECT qid::BIGINT AS qid", 1)
    h = sql_key_hash_expr("CAST(s.docid AS VARCHAR)")
    return head + f"""
SELECT s.qid::BIGINT AS qid, s.docid, round(s.score, 6) AS score_r
FROM scores s
WHERE ({h}) <= {sample_threshold(MATCH_SAMPLE_RATE)}::HUGEINT
ORDER BY qid, docid
"""


MSM_M = 2


def _q_msm_bm25(sf_dir: str) -> pd.DataFrame:
    """minimum_should_match (pipelines/search.min_should_match_search —
    the ES/Lucene knob between OR and AND): only docs matching >= 2
    distinct query terms rank; BM25 order under the rounded policy."""
    from colbert_ray.pipelines.search import min_should_match_search
    from colbert_ray.state.index import BM25Scorer

    idx = _ensure_index(sf_dir)
    scorer = BM25Scorer(idx, k=10, with_sha=False)
    rows = []
    for qid, q in QUERY_SET:
        t = min_should_match_search(idx, q, m=MSM_M, k=10, cfg=CFG,
                                    scorer=scorer).to_pandas()
        t.insert(0, "qid", np.int64(qid))
        rows.append(t)
    return pd.concat(rows, ignore_index=True)[
        ["qid", "docid", "rank", "score_r", "n_match"]]


def _msm_sql() -> str:
    base = _bm25_sql()
    head, _ = base.rsplit("SELECT qid::BIGINT AS qid", 1)
    return head + f"""
, nm AS (
  SELECT qd.qid, tf.doc_id AS docid, count(DISTINCT qd.term) AS n_match
  FROM (SELECT DISTINCT qid, term FROM q) qd
  JOIN tf ON tf.term = qd.term
  GROUP BY qd.qid, tf.doc_id
)
SELECT s.qid::BIGINT AS qid, s.docid,
       row_number() OVER (PARTITION BY s.qid
                          ORDER BY round(s.score, 6) DESC, s.docid)
         AS rank,
       round(s.score, 6) AS score_r, nm.n_match::BIGINT AS n_match
FROM scores s
JOIN nm ON nm.qid = s.qid AND nm.docid = s.docid
WHERE nm.n_match >= {MSM_M}
QUALIFY rank <= 10
ORDER BY qid, rank
"""


TV_DOCIDS = (0, 1, 2, 7)


def _q_term_vectors(sf_dir: str) -> pd.DataFrame:
    """Per-doc term vectors (pipelines/termvec.py — ES _termvectors with
    term_statistics): (docid, term, tf, df) for four fixed docs; tf from
    a streamed semi-join re-tokenize, df from the dictionary probe."""
    from colbert_ray.pipelines.termvec import doc_term_vectors

    idx = _ensure_index(sf_dir)
    return doc_term_vectors(
        idx, _read(sf_dir, "documents", ["doc_id", "text"]),
        TV_DOCIDS, cfg=CFG).to_pandas()


def _term_vectors_sql() -> str:
    ids = ", ".join(str(d) for d in TV_DOCIDS)
    return f"""
WITH docs AS (
  SELECT doc_id, {_toks_expr()} AS toks FROM documents
),
tok AS (
  SELECT doc_id, unnest(toks) AS term FROM docs
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
),
df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term
)
SELECT tf.doc_id AS docid, tf.term,
       tf.tf::BIGINT AS tf, df.df::BIGINT AS df
FROM tf JOIN df USING (term)
WHERE tf.doc_id IN ({ids})
ORDER BY docid, term
"""


FUNCSCORE_FACTOR = 1.5


def _q_funcscore_bm25(sf_dir: str) -> pd.DataFrame:
    """Function-score query (pipelines/search.function_score_search — ES
    field_value_factor, modifier ln1p, boost_mode multiply): every match
    rescored as round(base_r * 1.5 * ln(1 + doclen), 6), top-10."""
    from colbert_ray.pipelines.search import function_score_search
    from colbert_ray.state.index import BM25Scorer

    idx = _ensure_index(sf_dir)
    scorer = BM25Scorer(idx, k=10, with_sha=False)
    rows = []
    for qid, q in QUERY_SET:
        t = function_score_search(idx, q, field="doclen",
                                  factor=FUNCSCORE_FACTOR, k=10, cfg=CFG,
                                  scorer=scorer).to_pandas()
        t.insert(0, "qid", np.int64(qid))
        rows.append(t)
    return pd.concat(rows, ignore_index=True)[
        ["qid", "docid", "rank", "score_r", "base_r", "doclen"]]


def _funcscore_sql() -> str:
    base = _bm25_sql()
    head, _ = base.rsplit("SELECT qid::BIGINT AS qid", 1)
    f = FUNCSCORE_FACTOR
    return head + f"""
, fin AS (
  SELECT s.qid, s.docid, round(s.score, 6) AS base_r,
         len(d.toks)::DOUBLE AS doclen
  FROM scores s JOIN docs d ON d.doc_id = s.docid
)
SELECT qid::BIGINT AS qid, docid,
       row_number() OVER (PARTITION BY qid
         ORDER BY round(base_r * {f!r} * ln(1 + doclen), 6) DESC, docid)
         AS rank,
       round(base_r * {f!r} * ln(1 + doclen), 6) AS score_r,
       base_r, doclen
FROM fin QUALIFY rank <= 10
ORDER BY qid, rank
"""


SIGTERMS_K = 10


def _q_significant_terms(sf_dir: str) -> pd.DataFrame:
    """Significant-terms aggregation (pipelines/sigterms.py — ES
    significant_terms analog, JLH score): per query, top-10 terms
    overrepresented in the matching set vs the corpus background."""
    from colbert_ray.pipelines.sigterms import significant_terms
    from colbert_ray.state.index import BM25Scorer

    idx = _ensure_index(sf_dir)
    scorer = BM25Scorer(idx, k=SIGTERMS_K, with_sha=False)
    corpus = _read(sf_dir, "documents", ["doc_id", "text"])
    rows = []
    for qid, q in QUERY_SET:
        t = significant_terms(idx, corpus, q, k=SIGTERMS_K, cfg=CFG,
                              scorer=scorer).to_pandas()
        t.insert(0, "qid", np.int64(qid))
        rows.append(t)
    return pd.concat(rows, ignore_index=True)[
        ["qid", "term", "fg_df", "bg_df", "score_r"]]


def _sigterms_sql() -> str:
    values = ",\n      ".join(
        f"({qid}, '{term}')"
        for qid, text in QUERY_SET
        for term in tokenize_query(text, CFG)[0]
    )
    return f"""
WITH docs AS (
  SELECT doc_id, {_toks_expr()} AS toks FROM documents
),
dt AS (
  SELECT DISTINCT doc_id, unnest(toks) AS term FROM docs
),
bg AS (SELECT term, count(*) AS bg_df FROM dt GROUP BY term),
q(qid, term) AS (
  VALUES {values}
),
fgdocs AS (
  SELECT DISTINCT q.qid, dt.doc_id FROM q JOIN dt USING (term)
),
nfg AS (SELECT qid, count(*) AS n_fg FROM fgdocs GROUP BY qid),
nd AS (SELECT count(*) AS n_docs FROM docs),
fg AS (
  SELECT f.qid, dt.term, count(*) AS fg_df
  FROM fgdocs f JOIN dt ON dt.doc_id = f.doc_id
  GROUP BY f.qid, dt.term
)
SELECT fg.qid::BIGINT AS qid, fg.term,
       fg.fg_df::BIGINT AS fg_df, bg.bg_df::BIGINT AS bg_df,
       round((fg.fg_df::DOUBLE / nfg.n_fg - bg.bg_df::DOUBLE / nd.n_docs)
             * (fg.fg_df::DOUBLE / nfg.n_fg)
             / (bg.bg_df::DOUBLE / nd.n_docs), 6) AS score_r
FROM fg JOIN bg USING (term) JOIN nfg USING (qid) CROSS JOIN nd
QUALIFY row_number() OVER (PARTITION BY fg.qid
                           ORDER BY score_r DESC, fg.term)
        <= {SIGTERMS_K}
ORDER BY qid, score_r DESC, term
"""


RESCORE_WINDOW = 20
RESCORE_WEIGHT = 2.0


def _q_rescored_bm25(sf_dir: str) -> pd.DataFrame:
    """Two-stage rescoring (pipelines/rescore.py — ES rescore analog):
    BM25 top-20 window, then a proximity bonus weight/min_span for window
    docs containing every query term, final order by the rounded blend."""
    from colbert_ray.pipelines.rescore import rescore_search
    from colbert_ray.state.index import BM25Scorer

    idx = _ensure_index(sf_dir)
    scorer = BM25Scorer(idx, k=10, with_sha=False)
    corpus = _read(sf_dir, "documents", ["doc_id", "text"])
    rows = []
    for qid, q in QUERY_SET:
        t = rescore_search(idx, corpus, q, k=10, window=RESCORE_WINDOW,
                           weight=RESCORE_WEIGHT, cfg=CFG,
                           scorer=scorer).to_pandas()
        t.insert(0, "qid", np.int64(qid))
        rows.append(t)
    out = pd.concat(rows, ignore_index=True)
    return out[["qid", "docid", "rank", "score_r", "base_r", "span"]]


def _rescored_sql() -> str:
    """Twin: the bm25 CTE chain + exact min covering span per (qid, window
    doc). Min-span formulation: the optimal window starts at some query-
    term occurrence s; its tightest cover ends at max over terms of the
    first occurrence >= s — min over s of that cover length equals the
    two-pointer sweep's result."""
    base = _bm25_sql()
    head, _ = base.rsplit("SELECT qid::BIGINT AS qid", 1)
    return head + f"""
, win AS (
  SELECT qid, docid, round(score, 6) AS base_r,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, docid) AS rn
  FROM scores QUALIFY rn <= {RESCORE_WINDOW}
),
pos AS (
  SELECT doc_id, unnest(toks) AS term,
         generate_subscripts(toks, 1) AS p
  FROM docs
),
per AS (
  SELECT q.qid, w.docid, q.term, pos.p
  FROM (SELECT DISTINCT qid, term FROM q) q
  JOIN win w USING (qid)
  JOIN pos ON pos.doc_id = w.docid AND pos.term = q.term
),
nterms AS (
  SELECT qid, count(DISTINCT term) AS nt FROM q GROUP BY qid
),
starts AS (SELECT DISTINCT qid, docid, p AS s FROM per),
c2 AS (
  SELECT st.qid, st.docid, st.s, per.term, min(per.p) AS minp
  FROM starts st
  JOIN per ON per.qid = st.qid AND per.docid = st.docid
          AND per.p >= st.s
  GROUP BY st.qid, st.docid, st.s, per.term
),
covers AS (
  SELECT qid, docid, s, max(minp) - s + 1 AS cover, count(*) AS np
  FROM c2 GROUP BY qid, docid, s
),
spans AS (
  SELECT covers.qid, covers.docid, min(cover) AS span
  FROM covers JOIN nterms USING (qid)
  WHERE np = nt GROUP BY covers.qid, covers.docid
),
fin AS (
  SELECT w.qid, w.docid,
         round(w.base_r + CASE WHEN sp.span IS NOT NULL
               THEN {RESCORE_WEIGHT!r} / sp.span ELSE 0.0 END, 6)
           AS score_r,
         w.base_r,
         coalesce(sp.span, 0)::BIGINT AS span
  FROM win w
  LEFT JOIN spans sp ON sp.qid = w.qid AND sp.docid = w.docid
)
SELECT qid::BIGINT AS qid, docid,
       row_number() OVER (PARTITION BY qid
                          ORDER BY score_r DESC, docid) AS rank,
       score_r, base_r, span
FROM fin QUALIFY rank <= 10
ORDER BY qid, rank
"""


def _collapsed_sql() -> str:
    base = _bm25_sql()
    head, _ = base.rsplit("SELECT qid::BIGINT AS qid", 1)
    return head + f"""
, g AS (
  SELECT s.qid, s.docid, round(s.score, 6) AS score_r, d.lang,
         row_number() OVER (PARTITION BY s.qid, d.lang
                            ORDER BY round(s.score, 6) DESC, s.docid)
           AS rn,
         count(*) OVER (PARTITION BY s.qid, d.lang) AS group_count
  FROM scores s JOIN documents d ON d.doc_id = s.docid
)
SELECT qid::BIGINT AS qid, docid,
       row_number() OVER (PARTITION BY qid
                          ORDER BY score_r DESC, docid) AS rank,
       score_r, lang, group_count::BIGINT AS group_count
FROM g WHERE rn = 1
QUALIFY rank <= {COLLAPSE_K}
ORDER BY qid, rank
"""


SYN_MAP = {
    "join": ["merge"],
    "stream": ["batch", "data"],
    "scan": ["filter"],
    "zzznotaterm": ["value"],      # OOV primary rescued by its synonym
}


def _q_synonym_bm25_top10(sf_dir: str) -> pd.DataFrame:
    """Query-time synonym expansion (pipelines/synonyms — Lucene
    SynonymQuery analog): each query token + its SYN_MAP synonyms score
    as ONE term with blended stats (df = max over members, tf = summed,
    integer-exact), empty map degenerates to plain BM25 bit-exactly
    (pytest). Twin: per-(qid, group) max-df / sum-tf CTEs + the shared
    BM25 expression."""
    from colbert_ray.pipelines.synonyms import synonym_search

    idx = _ensure_index(sf_dir)
    res = synonym_search(QUERY_SET, idx, SYN_MAP, k=50, cfg=CFG).to_pandas()
    out = _rerank_rounded(res, "score", "docid", 10)
    return out[["qid", "docid", "rank", "score"]].rename(
        columns={"score": "score_r"})


def _synonym_bm25_sql() -> str:
    from colbert_ray.pipelines.synonyms import sql_synonym_search

    return sql_synonym_search("documents", QUERY_SET, SYN_MAP, k=10,
                              cfg=CFG)


def _q_percolate_matches(sf_dir: str) -> pd.DataFrame:
    """Percolator / reverse search (pipelines/percolate): the DSL_QUERIES
    set is STORED (parsed once per actor, required-term prefilter), the
    documents table STREAMS through one embarrassingly parallel
    map_batches pass — every (query_id, doc_id) boolean match, no index,
    no shuffle. Twin: sql_predicate per stored query over the shared
    tokenize CTE, UNION ALL."""
    from colbert_ray.pipelines.percolate import percolate

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang", "source"])
    out = percolate(docs, DSL_QUERIES, CFG,
                    fields=("lang", "source")).to_pandas()
    return (out.sort_values(["query_id", "doc_id"])
               .reset_index(drop=True))


def _percolate_sql() -> str:
    from colbert_ray.pipelines.percolate import sql_percolate

    return sql_percolate("documents", DSL_QUERIES, CFG,
                         fields=("lang", "source"))


def _q_bm25_top10_sharded(sf_dir: str) -> pd.DataFrame:
    """Same ranking as bm25_top10 but served through docid-range-sharded
    actor pools + cross-shard merge (multi-node serving topology) — must be
    identical, so it shares bm25_top10's SQL oracle."""
    import pyarrow as pa

    from colbert_ray.pipelines.search import search_sharded

    idx = _ensure_index(sf_dir)
    qt = pa.table(
        {
            "qid": pa.array([q for q, _ in QUERY_SET], type=pa.int64()),
            "query": pa.array([t for _, t in QUERY_SET], type=pa.string()),
        }
    )
    res = search_sharded(qt, idx, k=50, n_shards=3, with_sha=False).to_pandas()
    out = _rerank_rounded(res, "score", "docid", 10)
    return out[["qid", "docid", "rank", "score"]].rename(columns={"score": "score_r"})


PASSAGE_MAX_WORDS = 30
PASSAGE_OVERLAP = 5
PASSAGE_PID_BASE = 1_000_000


def _q_passage_bm25_top5(sf_dir: str) -> pd.DataFrame:
    """Composite long-document retrieval pipeline (the reference's
    docs2passages → index → search → doc-level max-passage workflow, M12 +
    build + K1/K7 in one stream): documents are split into overlapping
    word windows, a passage-level index is built, passages are retrieved,
    and documents are ranked by their best passage."""
    import pyarrow as pa
    import ray.data

    from colbert_ray.pipelines.build import build_index
    from colbert_ray.pipelines.search import search_table
    from colbert_ray.stages.passages import split_documents

    # cache key covers the SOURCE table's identity (path + mtime + size),
    # not just the path — regenerating documents.parquet in place must
    # invalidate the cached passage split
    src = _doc_path(sf_dir, "documents")
    st = os.stat(src)
    root = os.path.join("/tmp/colbert_ray_driver",
                        "psg_" + hashlib.sha256(
                            f"{os.path.abspath(src)}:{st.st_mtime_ns}:"
                            f"{st.st_size}".encode()).hexdigest()[:12])
    corpus_dir = os.path.join(root, "passages")
    idx = os.path.join(root, "index")
    if not os.path.exists(os.path.join(corpus_dir, "_done")):
        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        passages = split_documents(docs, max_words=PASSAGE_MAX_WORDS,
                                   overlap=PASSAGE_OVERLAP,
                                   text_col="text", id_col="doc_id")

        def add_pid(batch: pa.Table) -> pa.Table:
            pid = (batch.column("doc_id").to_numpy(zero_copy_only=False)
                   * PASSAGE_PID_BASE
                   + batch.column("passage_idx").to_numpy(zero_copy_only=False))
            return batch.append_column("pid", pa.array(pid.astype(np.int64)))

        os.makedirs(corpus_dir, exist_ok=True)
        passages.map_batches(add_pid, batch_format="pyarrow").write_parquet(
            corpus_dir, mode="overwrite")
        with open(os.path.join(corpus_dir, "_done"), "w") as f:
            f.write("ok")
    import glob as _glob

    files = sorted(_glob.glob(os.path.join(corpus_dir, "*.parquet")))
    build_index(files, idx, CFG, content_col="text", key_cols=(),
                meta_cols=("doc_id", "passage_idx"), docid_col="pid")
    qt = pa.table(
        {"qid": pa.array([q for q, _ in QUERY_SET], type=pa.int64()),
         "query": pa.array([t for _, t in QUERY_SET], type=pa.string())})
    # max-passage INSIDE the scorer (parent_base): every matching passage
    # is scored exactly, the per-parent max is reduced in the actor, and
    # only the top-k PARENTS per query leave it — bounded output at any
    # corpus size (replaces the r3 k=10^6 full-match materialization,
    # which returned EVERY passage row). k=10_000 parents is a constant
    # bound that (a) covers every parent at driver-gate scales (sf0.01 has
    # 500 docs, sf0.1 has 5000), so the engine's unrounded cut can never
    # drop a parent the oracle's 6-dp rounded re-rank would promote, and
    # (b) stays a tiny fixed row count per query at 100-TB scale.
    res = search_table(qt, idx, k=10_000, with_sha=False,
                       parent_base=PASSAGE_PID_BASE).to_pandas()
    # docid is already the parent; score = best passage score (M12 + K7)
    doc = res[["qid", "docid", "score"]]
    out = _rerank_rounded(doc, "score", "docid", 5)
    return out[["qid", "docid", "rank", "score"]].rename(
        columns={"score": "score_r"})


def _q_phrase_search(sf_dir: str) -> pd.DataFrame:
    """Exact-phrase top-10 over the documents index: conjunctive candidate
    intersection on the inverted index, positional verify on candidates
    only (pipelines/phrase.py)."""
    from colbert_ray.pipelines.phrase import phrase_search

    idx = _ensure_index(sf_dir)
    corpus = _read(sf_dir, "documents", ["doc_id", "text"])
    return phrase_search(idx, corpus, PHRASE_QUERY, k=10, cfg=CFG).to_pandas()


def _q_boolean_and_docs(sf_dir: str) -> pd.DataFrame:
    """Documents containing ALL of BOOL_TERMS — the index-side conjunctive
    intersection exposed directly (smallest-df-first posting merge)."""
    from colbert_ray.pipelines.phrase import conjunctive_candidates
    from colbert_ray.state.decoded import DecodedIndex

    idx = DecodedIndex.load_cached(_ensure_index(sf_dir), load_sha=False)
    cand = conjunctive_candidates(idx, BOOL_TERMS)
    return pd.DataFrame({"doc_id": cand})


def _q_corpus_stats(sf_dir: str) -> pd.DataFrame:
    ds = x_text.corpus_stats(_read(sf_dir, "documents", ["doc_id", "text"]))
    df = ds.to_pandas()
    df["avgdl"] = df["avgdl"].round(6)
    return df[["n_docs", "total_tokens", "avgdl"]]


def _q_term_df_top100(sf_dir: str) -> pd.DataFrame:
    ds = x_text.term_stats(_read(sf_dir, "documents", ["text"]))
    df = ds.to_pandas().sort_values(["df", "term"], ascending=[False, True]).head(100)
    return df[["term", "df", "cf"]].reset_index(drop=True)


PACK_SEQ_LEN = 512


def _q_packed_sequences(sf_dir: str) -> pd.DataFrame:
    """GPT-style training-sequence packing metadata
    (extras/packing.pack_sequences): concatenate docs in ascending doc_id
    order, cut every PACK_SEQ_LEN whitespace tokens; per doc the global
    token offset and sequence span. A cross-partition prefix sum
    (bucket partials -> driver exclusive prefix -> seeded local scan);
    integer-exact."""
    from colbert_ray.extras.packing import pack_sequences

    ds = pack_sequences(_read(sf_dir, "documents", ["doc_id", "text"]),
                        seq_len=PACK_SEQ_LEN)
    return (ds.to_pandas()
            [["doc_id", "n_tokens", "tok_start", "seq_first", "seq_last"]]
            .sort_values("doc_id").reset_index(drop=True))


def _packed_sequences_sql() -> str:
    L = PACK_SEQ_LEN
    return f"""
WITH t AS (
  SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         (sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
          - n_tokens)::BIGINT AS tok_start
  FROM t
)
SELECT doc_id, n_tokens, tok_start,
       (tok_start // {L})::BIGINT AS seq_first,
       ((tok_start + n_tokens - 1) // {L})::BIGINT AS seq_last
FROM c ORDER BY doc_id
"""


BPE_N_MERGES = 8


def _q_bpe_merges(sf_dir: str) -> pd.DataFrame:
    """BPE tokenizer training (extras/bpe.bpe_train — Sennrich learn_bpe):
    ONE distributed word-count shuffle, then the merge loop over the
    vocab-bounded (word, freq) table; selection = (max count, lex smallest
    pair), a total order => exactly reproducible by the unrolled SQL twin."""
    from colbert_ray.extras.bpe import bpe_train

    t = bpe_train(_read(sf_dir, "documents", ["text"]),
                  n_merges=BPE_N_MERGES)
    return t.to_pandas()[["rank", "left", "right", "cnt"]]


def _q_bpe_token_counts(sf_dir: str) -> pd.DataFrame:
    """Distributed BPE APPLY (extras/bpe.bpe_token_counts): broadcast merge
    list, per-batch segmentation of DISTINCT words only, per-doc token
    counts under the learned tokenizer."""
    from colbert_ray.extras.bpe import bpe_token_counts, bpe_train

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    merges = bpe_train(_read(sf_dir, "documents", ["text"]),
                       n_merges=BPE_N_MERGES)
    return (bpe_token_counts(docs, merges).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))


def _bpe_merge_sql_expr(s: str, pl: str, pr: str) -> str:
    """DuckDB twin of extras/bpe._merge_syms: greedy left-to-right
    non-overlapping pair merge via list_reduce with a chr(1) just-merged
    marker (prevents a merged symbol from re-matching as a left side)."""
    return (
        f"ltrim(replace(list_reduce(list_prepend('', string_split({s}, ' ')), "
        f"(a, x) -> CASE WHEN right(a, length({pl}) + 1) = ' ' || {pl} "
        f"AND x = {pr} "
        f"THEN left(a, length(a) - length({pl}) - 1) "
        f"|| ' ' || {pl} || {pr} || chr(1) "
        f"ELSE a || ' ' || x END), chr(1), ''))"
    )


def _bpe_ctes(n: int) -> str:
    """The shared unrolled learn CTE chain w0..w{n} / b1..b{n} (same
    unrolled-iteration twin pattern as the PageRank oracle)."""
    parts = [f"""
wc AS (
  SELECT word, count(*)::BIGINT AS f
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  GROUP BY word
),
w0 AS (SELECT word, array_to_string(string_split(word, ''), ' ') AS s, f
       FROM wc)"""]
    for i in range(1, n + 1):
        prev = f"w{i - 1}"
        parts.append(f"""
p{i} AS (
  SELECT l[j] AS pl, l[j + 1] AS pr, sum(f)::BIGINT AS cnt
  FROM (SELECT string_split(s, ' ') AS l, f FROM {prev}),
       LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) AS j) js
  GROUP BY pl, pr
),
b{i} AS (SELECT pl, pr, cnt FROM p{i} ORDER BY cnt DESC, pl, pr LIMIT 1),
w{i} AS (
  SELECT word,
         {_bpe_merge_sql_expr(f'{prev}.s', f'b{i}.pl', f'b{i}.pr')} AS s, f
  FROM {prev}, b{i}
)""")
    return ",".join(parts)


def _bpe_merges_sql() -> str:
    n = BPE_N_MERGES
    rows = "\nUNION ALL\n".join(
        f'SELECT {i}::BIGINT AS rank, pl AS "left", pr AS "right", cnt '
        f"FROM b{i}" for i in range(1, n + 1))
    return f"WITH {_bpe_ctes(n)}\n{rows}\nORDER BY rank"


def _bpe_token_counts_sql() -> str:
    n = BPE_N_MERGES
    return f"""
WITH {_bpe_ctes(n)},
seg AS (
  SELECT word, len(string_split(s, ' '))::BIGINT AS n_sym FROM w{n}
),
tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
SELECT doc_id, sum(n_sym)::BIGINT AS n_bpe_tokens
FROM tok JOIN seg USING (word)
GROUP BY doc_id ORDER BY doc_id
"""


def _q_packed_seq_text(sf_dir: str) -> pd.DataFrame:
    """Materialized packed sequences (extras/packing.materialize_sequences):
    the actual fixed-512-token training rows — docs split at boundaries,
    fragments reassembled per sequence in global-offset order."""
    from colbert_ray.extras.packing import materialize_sequences

    ds = materialize_sequences(_read(sf_dir, "documents", ["doc_id", "text"]),
                               seq_len=PACK_SEQ_LEN)
    return (ds.to_pandas().sort_values("seq_id").reset_index(drop=True)
            [["seq_id", "n_tokens", "n_docs", "text"]])


def _packed_seq_text_sql() -> str:
    L = PACK_SEQ_LEN
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
c AS (
  SELECT doc_id, l,
         (sum(len(l)) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
          - len(l))::BIGINT AS st
  FROM t
),
tok AS (
  SELECT doc_id, st + i - 1 AS gpos, l[i] AS w
  FROM c, LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) js
)
SELECT (gpos // {L})::BIGINT AS seq_id,
       count(*)::BIGINT AS n_tokens,
       count(DISTINCT doc_id)::BIGINT AS n_docs,
       string_agg(w, ' ' ORDER BY gpos) AS text
FROM tok GROUP BY seq_id ORDER BY seq_id
"""


def _q_token_counts(sf_dir: str) -> pd.DataFrame:
    ds = x_text.token_counts(_read(sf_dir, "documents", ["doc_id", "text"]))
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


def _q_exact_dedup(sf_dir: str) -> pd.DataFrame:
    ds = x_dedup.exact_dedup(_read(sf_dir, "documents", ["doc_id", "text"]))
    return (
        ds.to_pandas()[["doc_id", "dup_count"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


SPAN_DEDUP_W = 10


def _q_span_dedup(sf_dir: str) -> pd.DataFrame:
    """C4/Lee-et-al-style duplicated-span REMOVAL with doc rewrite
    (extras/dedup.span_window_dedup): consecutive 10-word windows, every
    duplicate window survives only at its globally-first (doc_id, span_no)
    occurrence, docs reassembled from surviving windows. Integer-exact
    (counts + rebuilt strings); the engine decides on fnv64(span) — the
    string-equality twin doubles as a collision check."""
    ds = x_dedup.span_window_dedup(
        _read(sf_dir, "documents", ["doc_id", "text"]), span_w=SPAN_DEDUP_W)
    return (ds.to_pandas()[["doc_id", "text_dedup", "n_kept", "n_dropped"]]
            .sort_values("doc_id").reset_index(drop=True))


def _span_dedup_sql() -> str:
    W, M = SPAN_DEDUP_W, 1 << 20
    return f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
sp AS (
  SELECT doc_id, len(l) AS nl, l,
         unnest(generate_series(0, CAST(ceil(len(l) / {W}.0) AS BIGINT) - 1))
           AS span_no
  FROM d
),
spans AS (
  SELECT doc_id, span_no,
         array_to_string(
           l[span_no * {W} + 1 : least((span_no + 1) * {W}, nl)], ' ') AS span
  FROM sp
),
win AS (
  SELECT span, min(doc_id * {M} + span_no) AS wp FROM spans GROUP BY span
),
k AS (
  SELECT s.doc_id, s.span_no, s.span,
         (s.doc_id * {M} + s.span_no) = w.wp AS keep
  FROM spans s JOIN win w ON w.span = s.span
)
SELECT doc_id,
       coalesce(string_agg(span, ' ' ORDER BY span_no)
                FILTER (WHERE keep), '') AS text_dedup,
       (count(*) FILTER (WHERE keep))::BIGINT AS n_kept,
       (count(*) FILTER (WHERE NOT keep))::BIGINT AS n_dropped
FROM k GROUP BY doc_id ORDER BY doc_id
"""


def _q_repetition_stats(sf_dir: str) -> pd.DataFrame:
    """Gopher-style repetition quality signals: per-doc duplicated-word and
    duplicated-2-gram fractions (pre-training data cleaning filters)."""
    ds = x_text.repetition_stats(_read(sf_dir, "documents", ["doc_id", "text"]))
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    df["dup_word_frac"] = df["dup_word_frac"].round(6)
    df["dup_2gram_frac"] = df["dup_2gram_frac"].round(6)
    return df[["doc_id", "n_tokens", "dup_word_frac", "dup_2gram_frac"]]


def _q_quality_scores(sf_dir: str) -> pd.DataFrame:
    ds = x_text.quality_scores(_read(sf_dir, "documents", ["doc_id", "text"]))
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    df["stopword_ratio"] = df["stopword_ratio"].round(6)
    df["mean_token_len"] = df["mean_token_len"].round(6)
    return df[["doc_id", "n_tokens", "n_chars", "stopword_ratio", "mean_token_len"]]


def _q_clean_corpus_stats(sf_dir: str) -> pd.DataFrame:
    ds = x_text.clean_corpus_stats(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        min_tokens=10, max_stopword_ratio=0.5)
    df = ds.to_pandas()
    df["avg_tokens"] = df["avg_tokens"].round(6)
    df["total_tokens"] = df["total_tokens"].astype(np.int64)
    return df[["n_docs", "total_tokens", "avg_tokens"]]


def _q_lang_doc_counts(sf_dir: str) -> pd.DataFrame:
    from ray.data.aggregate import Count, Mean

    ds = (
        _read(sf_dir, "documents", ["lang", "n_chars"])
        .groupby("lang")
        .aggregate(Count(alias_name="n_docs"), Mean("n_chars", alias_name="avg_chars"))
    )
    df = ds.to_pandas().sort_values("lang").reset_index(drop=True)
    df["avg_chars"] = df["avg_chars"].round(6)
    return df


def _q_jaccard_dup_pairs(sf_dir: str) -> pd.DataFrame:
    ds = x_dedup.jaccard_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        threshold_num=JACCARD_THRESHOLD_NUM,
        threshold_den=JACCARD_THRESHOLD_DEN,
        max_id=JACCARD_MAX_ID,
    )
    return ds.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)


CONTAIN_MAX_ID = 60
CONTAIN_NUM, CONTAIN_DEN = 9, 10


def _q_containment_pairs(sf_dir: str) -> pd.DataFrame:
    """Directional trigram-containment pairs (extras/dedup.
    containment_pairs) — the asymmetric quote/boilerplate near-dup signal;
    integer-exact threshold, bounded verify tier like jaccard_dup_pairs."""
    ds = x_dedup.containment_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        threshold_num=CONTAIN_NUM, threshold_den=CONTAIN_DEN,
        max_id=CONTAIN_MAX_ID)
    return (ds.to_pandas().sort_values(["id_src", "id_dst"])
            .reset_index(drop=True))


def _containment_sql() -> str:
    return f"""
WITH t AS (
  SELECT doc_id, text FROM documents WHERE doc_id < {CONTAIN_MAX_ID}
),
g AS (
  SELECT doc_id, list(DISTINCT substr(text, n.n::int, 3)) AS grams
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(text) - 2)) AS n) n
  GROUP BY doc_id
),
p AS (
  SELECT a.doc_id AS id_src, b.doc_id AS id_dst,
         len(list_intersect(a.grams, b.grams)) AS n_common,
         len(a.grams) AS n_src
  FROM g a JOIN g b ON a.doc_id <> b.doc_id
)
SELECT id_src, id_dst, n_common, n_src
FROM p
WHERE n_common * {CONTAIN_DEN} >= {CONTAIN_NUM} * n_src
ORDER BY id_src, id_dst
"""


def _q_containment_prefix_pairs(sf_dir: str) -> pd.DataFrame:
    """Unbounded directional containment join (extras/dedup.
    prefix_filter_containment_pairs — probe-side-only prefix filter):
    identical contract to containment_pairs but over the ENTIRE documents
    table, no O(n^2) stage, no corpus broadcast."""
    ds = x_dedup.prefix_filter_containment_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        threshold_num=CONTAIN_NUM, threshold_den=CONTAIN_DEN)
    return (ds.to_pandas().sort_values(["id_src", "id_dst"])
            .reset_index(drop=True))


def _containment_prefix_sql() -> str:
    """Unbounded twin of ``_containment_sql`` (no doc_id cut)."""
    return f"""
WITH g AS (
  SELECT doc_id, list(DISTINCT substr(text, n.n::int, 3)) AS grams
  FROM documents,
       LATERAL (SELECT unnest(generate_series(1, len(text) - 2)) AS n) n
  GROUP BY doc_id
),
p AS (
  SELECT a.doc_id AS id_src, b.doc_id AS id_dst,
         len(list_intersect(a.grams, b.grams)) AS n_common,
         len(a.grams) AS n_src
  FROM g a JOIN g b ON a.doc_id <> b.doc_id
)
SELECT id_src, id_dst, n_common, n_src
FROM p
WHERE n_common * {CONTAIN_DEN} >= {CONTAIN_NUM} * n_src
ORDER BY id_src, id_dst
"""


def _q_jaccard_prefix_pairs(sf_dir: str) -> pd.DataFrame:
    """Prefix-filtered similarity join (extras/dedup.
    prefix_filter_jaccard_pairs — AllPairs/PPJoin): identical output
    contract to the all-pairs path but over the ENTIRE documents table with
    no O(n^2) stage and no corpus broadcast — df-ranked shingle prefixes
    ride one groupby, candidates verify exactly in-group."""
    ds = x_dedup.prefix_filter_jaccard_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        threshold_num=JACCARD_THRESHOLD_NUM,
        threshold_den=JACCARD_THRESHOLD_DEN,
    )
    return ds.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)


def _q_dup_clusters(sf_dir: str) -> pd.DataFrame:
    """Transitive dup clustering (extras/dedup.connected_components —
    hash-min label propagation with pointer jumping over the jaccard dup
    pairs): (doc_id, cluster_id) with cluster_id = component-min doc_id."""
    pairs = x_dedup.jaccard_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        threshold_num=JACCARD_THRESHOLD_NUM,
        threshold_den=JACCARD_THRESHOLD_DEN,
        max_id=JACCARD_MAX_ID,
    )
    cc = x_dedup.connected_components(pairs, node_col="doc_id",
                                      cluster_col="cluster_id")
    return cc.to_pandas().sort_values("doc_id").reset_index(drop=True)


DUP_SPAN_GRAM = 8      # token n-gram length for exact-substring dedup


def _q_dup_spans(sf_dir: str) -> pd.DataFrame:
    """Exact duplicated-substring spans (extras/dedup.duplicate_spans — the
    Lee-et-al-2022 repeated-substring operator: candidate rolling-hash
    groupby, broadcast dup-hash set, exact-string verify, per-doc island
    merge). One row per maximal token span shared with another doc."""
    ds = x_dedup.duplicate_spans(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        gram_len=DUP_SPAN_GRAM, cfg=CFG)
    return (ds.to_pandas()
            .sort_values(["doc_id", "start_tok"]).reset_index(drop=True))


def _dup_spans_sql() -> str:
    """Twin of duplicate_spans: the plain SQL definition — every L-token
    window, windows whose gram occurs in >= 2 distinct docs, covered
    positions, gaps-and-islands merge. 1-based SQL positions mapped to the
    engine's 0-based start / exclusive end."""
    toks, L = _toks_expr(), DUP_SPAN_GRAM
    return f"""
WITH d AS (SELECT doc_id, {toks} AS toks FROM documents),
g AS (
  SELECT doc_id, i AS pos, array_to_string(toks[i:i+{L - 1}], ' ') AS gram
  FROM d, unnest(generate_series(1, len(toks) - {L} + 1)) AS t(i)
),
dup AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
cov AS (
  SELECT DISTINCT g.doc_id, u.p AS tokpos
  FROM g JOIN dup USING (gram),
       unnest(generate_series(g.pos, g.pos + {L} - 1)) AS u(p)
),
isl AS (
  SELECT doc_id, tokpos,
         tokpos - row_number() OVER (PARTITION BY doc_id ORDER BY tokpos) AS grp
  FROM cov
)
SELECT doc_id, CAST(min(tokpos) - 1 AS BIGINT) AS start_tok,
       CAST(max(tokpos) AS BIGINT) AS end_tok,
       CAST(max(tokpos) - min(tokpos) + 1 AS BIGINT) AS n_toks
FROM isl GROUP BY doc_id, grp ORDER BY doc_id, start_tok
"""


CONTAM_MOD = 29        # doc_id % CONTAM_MOD == 0 -> "benchmark" split
CONTAM_NGRAM = 4       # word n-gram size


def _q_contaminated_docs(sf_dir: str) -> pd.DataFrame:
    """Benchmark decontamination: docs sharing a word CONTAM_NGRAM-gram
    with the deterministic doc_id%CONTAM_MOD==0 'benchmark' split
    (extras/dedup.py: benchmark_contamination — broadcast semi-join,
    no shuffle)."""
    import pyarrow as pa

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def _mod_filter(keep_zero: bool):
        def f(b: "pa.Table") -> "pa.Table":
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            m = (ids % CONTAM_MOD == 0) if keep_zero else \
                (ids % CONTAM_MOD != 0)
            return b.filter(pa.array(m))
        return f

    bench = docs.map_batches(_mod_filter(True), batch_format="pyarrow")
    scan = docs.map_batches(_mod_filter(False), batch_format="pyarrow")
    out = x_dedup.benchmark_contamination(
        scan, bench, n=CONTAM_NGRAM).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _contam_sql() -> str:
    from colbert_ray.functions.tokenizer import sql_tokenize_expr

    tok = sql_tokenize_expr("text")
    n = CONTAM_NGRAM
    return f"""
        WITH tok AS (SELECT doc_id, {tok} AS toks FROM documents),
        grams AS (
          SELECT doc_id,
                 array_to_string(list_slice(toks, p, p + {n - 1}), ' ') AS g
          FROM tok, unnest(generate_series(1, len(toks) - {n - 1})) AS t(p)
          WHERE len(toks) >= {n}
        )
        SELECT s.doc_id AS doc_id, count(DISTINCT s.g) AS n_matched
        FROM (SELECT * FROM grams WHERE doc_id % {CONTAM_MOD} <> 0) s
        JOIN (SELECT DISTINCT g FROM grams
              WHERE doc_id % {CONTAM_MOD} = 0) b USING (g)
        GROUP BY s.doc_id ORDER BY s.doc_id
    """


def _knn_queries(sf_dir: str):
    import pyarrow.parquet as pq

    t = pq.read_table(_doc_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    mask = np.isin(t.column("vec_id").to_numpy(zero_copy_only=False), KNN_QUERY_IDS)
    idxs = np.flatnonzero(mask)
    sub = t.take(idxs)
    ids = sub.column("vec_id").to_numpy(zero_copy_only=False)
    vecs = np.stack(
        [np.asarray(v, dtype=np.float64) for v in sub.column("embedding").to_pylist()]
    )
    order = np.argsort(ids)
    return vecs[order], ids[order]


def _q_knn_cosine_top5(sf_dir: str) -> pd.DataFrame:
    vecs, ids = _knn_queries(sf_dir)
    # oversample raw top-50 before the rounded re-rank to 5: the embeddings
    # table contains deliberate near-duplicates, and a rounded-tie member
    # outside a narrow raw window could be in the SQL top-5 but not ours
    ds = x_sim.knn_cosine(_read(sf_dir, "embeddings"), vecs, ids, k=50)
    df = ds.to_pandas()
    out = _rerank_rounded(df, "cosine", "vec_id", 5)
    return out[["qid", "vec_id", "rank", "cosine"]].rename(columns={"cosine": "cosine_r"})


RPLSH_THRESHOLD = 0.45   # max pair cosine in the test embeddings is ~0.51
RPLSH_PLANES = 32
RPLSH_BANDS = 8
RPLSH_DIM = 64                   # embeddings table vector width


def _q_rplsh_dup_pairs(sf_dir: str) -> pd.DataFrame:
    """Random-hyperplane LSH near-dup pairs over int8-quantized embeddings
    (extras/simsearch.py:rp_lsh_dup_pairs) — the embedding-side LSH scale
    path; signatures and verification are integer-exact."""
    return x_sim.rp_lsh_dup_pairs(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        threshold=RPLSH_THRESHOLD, n_planes=RPLSH_PLANES,
        n_bands=RPLSH_BANDS)


MMR_LAM = 0.7
MMR_N_CAND = 20


MLT_SEEDS = [0, 1, 2, 3, 4]
MLT_TERMS = 5


def _q_more_like_this(sf_dir: str) -> pd.DataFrame:
    """More-like-this recommendation: each seed document's top-5 TF-IDF
    keywords (corpus-wide df, extras/textstats.tfidf_topk subset path)
    become a BM25 query; the seed itself is excluded from its results."""
    import pyarrow as pa

    from colbert_ray.extras import textstats as x_ts
    from colbert_ray.pipelines.search import search_table

    idx = _ensure_index(sf_dir)
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    kw = x_ts.tfidf_topk(docs, k=MLT_TERMS,
                         subset_ids=MLT_SEEDS).to_pandas()
    kw = kw.sort_values(["doc_id", "rank"])
    qrows = [(int(seed),
              " ".join(kw[kw.doc_id == seed]["term"].tolist()))
             for seed in MLT_SEEDS]
    qt = pa.table({
        "qid": pa.array([q for q, _ in qrows], type=pa.int64()),
        "query": pa.array([t for _, t in qrows], type=pa.string()),
    })
    res = search_table(qt, idx, k=50, with_sha=False).to_pandas()
    res = res[res["docid"] != res["qid"]]        # never recommend the seed
    out = _rerank_rounded(res, "score", "docid", 5)
    return out[["qid", "docid", "rank", "score"]].rename(
        columns={"score": "score_r", "qid": "seed_id"})


def _q_hybrid_mlt_top5(sf_dir: str) -> pd.DataFrame:
    """Hybrid dense+sparse similar-docs retrieval: RRF fusion of the
    more-like-this BM25 ranking (sparse) and the exact embedding-kNN
    ranking (dense) for the same seed ids — the modern two-tower hybrid
    pattern, composed from two already-gated rankings."""
    from colbert_ray.pipelines.evaluate import reciprocal_rank_fusion

    bm = _q_more_like_this(sf_dir).rename(columns={"seed_id": "qid"})
    kn = _q_knn_cosine_top5(sf_dir).rename(columns={"vec_id": "docid"})
    fused = reciprocal_rank_fusion(
        [bm[["qid", "docid", "rank"]], kn[["qid", "docid", "rank"]]], k=50)
    out = _rerank_rounded(fused, "fused", "docid", 5)
    out = out[["qid", "docid", "rank", "fused"]].rename(
        columns={"qid": "seed_id", "fused": "fused_r"})
    return out


def _q_mmr_knn_top5(sf_dir: str) -> pd.DataFrame:
    """MMR diversification (extras/simsearch.py:mmr_diversify) of the
    exact-kNN top-20: greedy lam*rel - (1-lam)*max-sim-to-selected over
    rounded similarities, fully deterministic."""
    vecs, ids = _knn_queries(sf_dir)
    ds = x_sim.knn_cosine(_read(sf_dir, "embeddings"), vecs, ids, k=60)
    cand = _rerank_rounded(ds.to_pandas(), "cosine", "vec_id", MMR_N_CAND)
    cand = cand.rename(columns={"cosine": "rel"})
    return x_sim.mmr_diversify(_read(sf_dir, "embeddings"),
                               cand[["qid", "vec_id", "rel"]],
                               k=5, lam=MMR_LAM)


MUTUAL_KNN_K = 3
MUTUAL_KNN_MAX_ID = 200


def _q_mutual_knn_pairs(sf_dir: str) -> pd.DataFrame:
    """Reciprocal-nearest-neighbor pairs (extras/simsearch.mutual_knn_pairs)
    — b in a's top-k AND a in b's (rounded cosine, ties by id): the
    high-precision embedding-dedup / bitext-mining criterion."""
    t = x_sim.mutual_knn_pairs(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        k=MUTUAL_KNN_K, max_id=MUTUAL_KNN_MAX_ID)
    return t.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)


def _mutual_knn_sql() -> str:
    return f"""
WITH t AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id < {MUTUAL_KNN_MAX_ID}
),
s AS (
  SELECT a.vec_id AS src, b.vec_id AS nbr,
         round(list_cosine_similarity(a.v, b.v), 6) AS c
  FROM t a JOIN t b ON a.vec_id <> b.vec_id
),
r AS (
  SELECT src, nbr, c,
         row_number() OVER (PARTITION BY src ORDER BY c DESC, nbr) AS rk
  FROM s
)
SELECT x.src AS id_a, x.nbr AS id_b, x.c AS cosine_r
FROM r x JOIN r y ON y.src = x.nbr AND y.nbr = x.src
WHERE x.rk <= {MUTUAL_KNN_K} AND y.rk <= {MUTUAL_KNN_K} AND x.src < x.nbr
ORDER BY id_a, id_b
"""


MUTUAL_IVF_NPROBE = 4


def _q_mutual_knn_ivf_pairs(sf_dir: str) -> pd.DataFrame:
    """IVF-blocked mutual-kNN (extras/simsearch.mutual_knn_pairs_ivf) —
    the SCALE path the bounded tier documents, now implemented: bucketed
    neighbor search + shuffle-shaped reciprocity join, nothing O(n) on the
    driver. Whole embeddings table; FIXED deterministic centroids shared
    with the SQL twin (same GRAFT_ORACLE_SF_DIR caveat as ivf_knn_top5)."""
    t = x_sim.mutual_knn_pairs_ivf(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        k=MUTUAL_KNN_K, nprobe=MUTUAL_IVF_NPROBE,
        centroids=_ivf_centroids(sf_dir))
    return t.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)


def _mutual_knn_ivf_sql() -> str:
    """Twin of mutual_knn_pairs_ivf: same centroid literals, same rounded-
    cosine assignment/probe/rank policy, reciprocity as a self-join of the
    per-src restricted top-k."""
    cents = _ivf_centroids(ORACLE_SF_DIR)
    cent_rows = ",\n    ".join(
        "({}, [{}]::DOUBLE[])".format(
            ci, ", ".join(f"{v:.17g}" for v in cents[ci]))
        for ci in range(len(cents)))
    return f"""
WITH cents(cid, cv) AS (VALUES
    {cent_rows}
),
t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
ad AS (
  SELECT t.vec_id, c.cid,
         round(list_cosine_similarity(t.v, c.cv), 6) AS d
  FROM t CROSS JOIN cents c
),
assign AS (
  SELECT vec_id, cid AS bucket FROM ad
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) = 1
),
probe AS (
  SELECT vec_id, cid FROM ad
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid)
          <= {MUTUAL_IVF_NPROBE}
),
sims AS (
  SELECT p.vec_id AS src, m.vec_id AS nbr,
         round(list_cosine_similarity(a.v, b.v), 6) AS c
  FROM probe p
       JOIN assign m ON m.bucket = p.cid AND m.vec_id <> p.vec_id
       JOIN t a ON a.vec_id = p.vec_id
       JOIN t b ON b.vec_id = m.vec_id
),
r AS (
  SELECT src, nbr, c,
         row_number() OVER (PARTITION BY src ORDER BY c DESC, nbr) AS rk
  FROM sims
)
SELECT x.src AS id_a, x.nbr AS id_b, x.c AS cosine_r
FROM r x JOIN r y ON y.src = x.nbr AND y.nbr = x.src
WHERE x.rk <= {MUTUAL_KNN_K} AND y.rk <= {MUTUAL_KNN_K} AND x.src < x.nbr
ORDER BY id_a, id_b
"""


def _q_embedding_dup_pairs(sf_dir: str) -> pd.DataFrame:
    ds = x_sim.embedding_dup_pairs(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        threshold=EMB_DUP_THRESHOLD, max_id=EMB_DUP_MAX_ID)
    df = ds.to_pandas()
    if df.empty:
        return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                             "id_b": pd.Series(dtype=np.int64),
                             "cosine_r": pd.Series(dtype=np.float64)})
    df = df.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    return df.rename(columns={"cosine": "cosine_r"})


def _q_embedding_covariance(sf_dir: str) -> pd.DataFrame:
    """Upper triangle of the population covariance of the embedding column.

    One map_batches reduction to d(d+1)/2 Gram partials per batch + a tiny
    groupby — corpus size never reaches the driver (simsearch.py
    ``embedding_covariance``). cov_r follows the float policy (round 6)."""
    mo = x_sim.embedding_covariance(
        _read(sf_dir, "embeddings", ["embedding"]))
    cov = mo["cov"]
    iu, ju = np.triu_indices(cov.shape[0])
    return pd.DataFrame({"i": iu.astype(np.int64),
                         "j": ju.astype(np.int64),
                         "cov_r": cov[iu, ju].astype(np.float64)})


def _q_embedding_int8(sf_dir: str) -> pd.DataFrame:
    """int8 scalar quantization (extras/simsearch.quantize_int8): per-vector
    code sums + scale. The half-up floor(x/scale + 0.5) rule is chosen so the
    codes are bit-reproducible in SQL; sums of |q|<=127 codes are exact
    integers. Stats reduce per batch (reduceat), stream to a tiny frame."""
    import pyarrow as pa

    qds = x_sim.quantize_int8(_read(sf_dir, "embeddings",
                                    ["vec_id", "embedding"]))

    def stats(b: "pa.Table") -> "pa.Table":
        arr = b.column("q").combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        # flatten() re-bases values to 0; offsets of a sliced chunk don't —
        # rebase so reduceat windows line up
        offs = arr.offsets.to_numpy(zero_copy_only=False)
        offs = offs - offs[0]
        sq = np.add.reduceat(flat, offs[:-1]) if len(flat) else np.zeros(0, np.int64)
        sq2 = np.add.reduceat(flat * flat, offs[:-1]) if len(flat) else np.zeros(0, np.int64)
        return pa.table({"vec_id": b.column("vec_id"),
                         "sum_q": pa.array(sq, type=pa.int64()),
                         "sum_q2": pa.array(sq2, type=pa.int64()),
                         "scale_r": pa.array(
                             np.round(b.column("scale").to_numpy(
                                 zero_copy_only=False), 6))})

    df = (qds.map_batches(stats, batch_format="pyarrow",
                          zero_copy_batch=True)
          .to_pandas().sort_values("vec_id").reset_index(drop=True))
    return df


def _q_knn_q8_top5(sf_dir: str) -> pd.DataFrame:
    """Quantized-cosine top-5 (extras/simsearch.knn_cosine_q8): integer-code
    cosine is bit-reproducible (exact int dots in float64, same
    dot/(sqrt*sqrt) operation order as the SQL twin), so no rounded-tie
    oversampling is needed — raw ranks match the oracle exactly."""
    vecs, ids = _knn_queries(sf_dir)
    ds = x_sim.knn_cosine_q8(_read(sf_dir, "embeddings"), vecs, ids, k=5)
    df = ds.to_pandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    df["cosine_r"] = df["cosine"].round(6)
    df["rank"] = df["rank"].astype(np.int64)
    return df[["qid", "vec_id", "rank", "cosine_r"]]


def _pq_codebook(sf_dir: str) -> np.ndarray:
    """Deterministic PQ codebook for the driver query/oracle pair: pure-numpy
    per-subspace L2 k-means (extras/simsearch.train_pq_codebook) over the
    embeddings table read in file order — no Ray dependency, so the query
    side and the SQL-constant side are identical by construction."""
    import pyarrow.parquet as pq

    from colbert_ray.extras.simsearch import train_pq_codebook

    t = pq.read_table(_doc_path(sf_dir, "embeddings"), columns=["embedding"])
    arr = t.column("embedding").combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    offs = arr.offsets.to_numpy(zero_copy_only=False)
    dim = int(offs[1] - offs[0]) if len(offs) > 1 else 0
    return train_pq_codebook(flat.reshape(-1, dim)[:16384])


def _q_pq_adc_top5(sf_dir: str) -> pd.DataFrame:
    """Product-quantization ADC top-5 (extras/simsearch.pq_encode +
    pq_adc_knn) with a FIXED deterministic codebook shared with the SQL
    twin (which inlines the same centroids as literals). Same
    GRAFT_ORACLE_SF_DIR caveat as the IVF gate: the twin's literals come
    from the driver's comparison scale."""
    vecs, ids = _knn_queries(sf_dir)
    book = _pq_codebook(sf_dir)
    codes = x_sim.pq_encode(_read(sf_dir, "embeddings",
                                  ["vec_id", "embedding"]), book)
    df = (x_sim.pq_adc_knn(codes, vecs, ids, book, k=5)
          .to_pandas().sort_values(["qid", "rank"]).reset_index(drop=True))
    df["rank"] = df["rank"].astype(np.int64)
    return df.rename(columns={"adc": "adc_r"})


def _pq_sql() -> str:
    """DuckDB twin of pq_encode + pq_adc_knn given the FIXED codebook
    (17-significant-digit literals round-trip float64 exactly). Both code
    assignment and the per-query lookup tables use the 6-decimal-ROUNDED
    euclidean distance with centroid-id tie-break — the engine's
    _pq_dists/argmin float policy — and the ADC sum of rounded entries is
    rounded again before ranking on (adc, vec_id)."""
    book = _pq_codebook(ORACLE_SF_DIR)
    n_sub, _, dsub = book.shape
    rows = ",\n    ".join(
        "({}, {}, [{}]::DOUBLE[])".format(
            s, c, ", ".join(f"{v:.17g}" for v in book[s, c]))
        for s in range(n_sub) for c in range(book.shape[1]))
    qids = ", ".join(str(i) for i in KNN_QUERY_IDS)
    return f"""
WITH book(s, cid, cv) AS (VALUES
    {rows}
),
q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id IN ({qids})
),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
ed AS (
  SELECT e.vec_id, b.s, b.cid,
         round(list_distance(e.v[b.s * {dsub} + 1 : b.s * {dsub} + {dsub}],
                             b.cv), 6) AS d
  FROM e CROSS JOIN book b
),
codes AS (
  SELECT vec_id, s, cid FROM ed
  QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY d, cid) = 1
),
qd AS (
  SELECT q.qid, b.s, b.cid,
         round(list_distance(q.qv[b.s * {dsub} + 1 : b.s * {dsub} + {dsub}],
                             b.cv), 6) AS d
  FROM q CROSS JOIN book b
),
adc AS (
  SELECT qd.qid, c.vec_id, round(sum(qd.d), 6) AS adc_r
  FROM codes c JOIN qd ON qd.s = c.s AND qd.cid = c.cid
  WHERE c.vec_id <> qd.qid
  GROUP BY qd.qid, c.vec_id
)
SELECT qid, vec_id,
       row_number() OVER (PARTITION BY qid ORDER BY adc_r, vec_id) AS rank,
       adc_r
FROM adc
QUALIFY rank <= 5
ORDER BY qid, rank
"""


IVFPQ_COARSE = 4     # coarse centroids (C); tiny because the gate corpus is
IVFPQ_NPROBE = 2     # probed buckets per query


def _ivfpq_consts(sf_dir: str):
    """Deterministic (coarse, book) for the IVF-PQ query/oracle pair — the
    same pure-numpy seeded training (extras/simsearch.train_ivfpq) over the
    embeddings table in file order, shared by both sides by construction
    (sampling-at-scale caveat as _pq_codebook)."""
    import pyarrow.parquet as pq

    from colbert_ray.extras.simsearch import train_ivfpq

    t = pq.read_table(_doc_path(sf_dir, "embeddings"), columns=["embedding"])
    arr = t.column("embedding").combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    offs = arr.offsets.to_numpy(zero_copy_only=False)
    dim = int(offs[1] - offs[0]) if len(offs) > 1 else 0
    return train_ivfpq(flat.reshape(-1, dim)[:16384], n_coarse=IVFPQ_COARSE)


def _q_ivfpq_top5(sf_dir: str) -> pd.DataFrame:
    """IVF-PQ ADC top-5 (extras/simsearch.train_ivfpq/ivfpq_encode/
    ivfpq_search — the reference's coarse-centroid + compressed-residual
    architecture, residual_codec.py analog): folded combined centroids make
    the engine and the SQL twin evaluate the identical float expression;
    only probed-bucket rows are ever scored."""
    vecs, ids = _knn_queries(sf_dir)
    coarse, book = _ivfpq_consts(sf_dir)
    codes = x_sim.ivfpq_encode(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]), coarse, book)
    df = (x_sim.ivfpq_search(codes, vecs, ids, coarse, book, k=5,
                             nprobe=IVFPQ_NPROBE)
          .to_pandas().sort_values(["qid", "rank"]).reset_index(drop=True))
    df["rank"] = df["rank"].astype(np.int64)
    return df.rename(columns={"adc": "adc_r"})


def _ivfpq_sql() -> str:
    """DuckDB twin of ivfpq_encode + ivfpq_search with FIXED constants:
    literal coarse centroids for bucket assignment / query probing and
    literal FOLDED (coarse-slice + residual-centroid) vectors for code
    assignment and LUTs — both at the 6-decimal-rounded euclidean with
    lowest-id tie-breaks, ADC = rounded sum of rounded entries, rank by
    (adc, vec_id). An unprobed bucket's rows simply never join."""
    from colbert_ray.extras.simsearch import _ivfpq_combined

    coarse, book = _ivfpq_consts(ORACLE_SF_DIR)
    comb = _ivfpq_combined(coarse, book)
    n_sub, dsub = book.shape[0], book.shape[2]
    coarse_rows = ",\n    ".join(
        "({}, [{}]::DOUBLE[])".format(
            b, ", ".join(f"{v:.17g}" for v in coarse[b]))
        for b in range(len(coarse)))
    comb_rows = ",\n    ".join(
        "({}, {}, {}, [{}]::DOUBLE[])".format(
            b, s, c, ", ".join(f"{v:.17g}" for v in comb[b, s, c]))
        for b in range(len(coarse)) for s in range(n_sub)
        for c in range(comb.shape[2]))
    qids = ", ".join(str(i) for i in KNN_QUERY_IDS)
    return f"""
WITH coarse(b, cv) AS (VALUES
    {coarse_rows}
),
cb(b, s, cid, cv) AS (VALUES
    {comb_rows}
),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id IN ({qids})
),
bd AS (
  SELECT e.vec_id, c.b, round(list_distance(e.v, c.cv), 6) AS d
  FROM e CROSS JOIN coarse c
),
buck AS (
  SELECT vec_id, b FROM bd
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, b) = 1
),
ed AS (
  SELECT e.vec_id, cb.s, cb.cid,
         round(list_distance(e.v[cb.s * {dsub} + 1 : cb.s * {dsub} + {dsub}],
                             cb.cv), 6) AS d,
         cb.b
  FROM e JOIN buck USING (vec_id) JOIN cb ON cb.b = buck.b
),
codes AS (
  SELECT vec_id, b, s, cid FROM ed
  QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY d, cid) = 1
),
qbd AS (
  SELECT q.qid, c.b, round(list_distance(q.qv, c.cv), 6) AS d
  FROM q CROSS JOIN coarse c
),
probes AS (
  SELECT qid, b FROM qbd
  QUALIFY row_number() OVER (PARTITION BY qid ORDER BY d, b) <= {IVFPQ_NPROBE}
),
qlut AS (
  SELECT q.qid, cb.b, cb.s, cb.cid,
         round(list_distance(q.qv[cb.s * {dsub} + 1 : cb.s * {dsub} + {dsub}],
                             cb.cv), 6) AS d
  FROM q JOIN probes p ON p.qid = q.qid JOIN cb ON cb.b = p.b
),
adc AS (
  SELECT l.qid, c.vec_id, round(sum(l.d), 6) AS adc_r
  FROM codes c JOIN qlut l ON l.b = c.b AND l.s = c.s AND l.cid = c.cid
  WHERE c.vec_id <> l.qid
  GROUP BY l.qid, c.vec_id
)
SELECT qid, vec_id,
       row_number() OVER (PARTITION BY qid ORDER BY adc_r, vec_id) AS rank,
       adc_r
FROM adc
QUALIFY rank <= 5
ORDER BY qid, rank
"""


PAGERANK_DAMPING = 0.85
PAGERANK_ITERS = 5


def _q_cust_supp_pagerank(sf_dir: str) -> pd.DataFrame:
    """Distributed PageRank (extras/graph.pagerank — Pregel-style rounds:
    broadcast rank/degree vectors, per-batch np.add.at partials, one small
    groupby(node) exchange per round) over the symmetrized customer–supplier
    co-order graph. Ranks rounded to 6 decimals after EVERY round on both
    sides, so iteration cannot compound float skew."""
    edges = x_graph.bipartite_pagerank_edges(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]),
        _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"]))
    t = x_graph.pagerank(edges, damping=PAGERANK_DAMPING,
                         n_iter=PAGERANK_ITERS)
    return t.to_pandas().sort_values("node").reset_index(drop=True)


def _pagerank_sql(n_iter: int = PAGERANK_ITERS) -> str:
    """DuckDB twin of extras/graph.pagerank on the same graph: iterations
    unrolled as chained CTEs, each one `round((1-d)/N + d*sum(r/deg), 6)`
    — identical expression and rounding point as the engine's rounds."""
    its = []
    prev = "r0"
    for i in range(1, n_iter + 1):
        its.append(f"""r{i} AS (
  SELECT deg.node,
         round((1 - {PAGERANK_DAMPING}) / (SELECT cnt FROM n)
               + {PAGERANK_DAMPING} * coalesce(s.m, 0), 6) AS r
  FROM deg LEFT JOIN (
    SELECT e.dst AS node, sum(p.r / deg.d) AS m
    FROM edges e JOIN {prev} p ON p.node = e.src
                 JOIN deg ON deg.node = e.src
    GROUP BY e.dst
  ) s USING (node)
)""")
        prev = f"r{i}"
    chain = ",\n".join(its)
    return f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
edges AS (
  SELECT src, dst FROM pairs
  UNION ALL
  SELECT dst AS src, src AS dst FROM pairs
),
deg AS (SELECT src AS node, count(*)::DOUBLE AS d FROM edges GROUP BY src),
n AS (SELECT count(*)::DOUBLE AS cnt FROM deg),
r0 AS (SELECT node, round(1.0 / (SELECT cnt FROM n), 6) AS r FROM deg),
{chain}
SELECT node, r AS rank_r FROM {prev} ORDER BY node
"""


BFS_SEED_CUSTKEY = 1     # seed = customer node 2*1 in the even/odd encoding
BFS_MAX_HOPS = 4


def _q_supply_chain_hops(sf_dir: str) -> pd.DataFrame:
    """BFS minimum hops (extras/graph.bfs_hops — broadcast-frontier
    expansion, one streaming edge pass per hop) from customer 1 over the
    symmetrized customer–supplier co-order graph. Integer-exact."""
    edges = x_graph.bipartite_pagerank_edges(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]),
        _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"]))
    t = x_graph.bfs_hops(edges, seed=2 * BFS_SEED_CUSTKEY,
                         max_hops=BFS_MAX_HOPS)
    return t.to_pandas()


def _bfs_sql() -> str:
    """Recursive-CTE twin of bfs_hops: level-deduped UNION recursion capped
    at BFS_MAX_HOPS, min(hop) per reached node."""
    return f"""
WITH RECURSIVE pairs AS (
  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
edges AS (
  SELECT src, dst FROM pairs
  UNION ALL
  SELECT dst AS src, src AS dst FROM pairs
),
bfs(node, hop) AS (
  SELECT CAST({2 * BFS_SEED_CUSTKEY} AS BIGINT), CAST(0 AS BIGINT)
  UNION
  SELECT e.dst, bfs.hop + 1
  FROM bfs JOIN edges e ON e.src = bfs.node
  WHERE bfs.hop < {BFS_MAX_HOPS}
)
SELECT node, min(hop)::BIGINT AS hops FROM bfs GROUP BY node ORDER BY node
"""


TRI_MIN_COUNT = 35       # bigram-count edge threshold for the term graph


def _q_term_triangles(sf_dir: str) -> pd.DataFrame:
    """Per-term triangle counts (extras/graph.triangle_counts — degree-
    oriented wedge join, each triangle materialized once) over the term
    co-occurrence graph: terms are adjacent-bigram neighbors with count >=
    TRI_MIN_COUNT (extras/textstats.bigram_stats). Integer-exact."""
    import pyarrow as pa

    big = x_text.bigram_stats(_read(sf_dir, "documents", ["text"]))

    def to_edges(b: pa.Table) -> pa.Table:
        n = b.column("n_p" if "n_p" in b.column_names
                     else "n").to_numpy(zero_copy_only=False)
        grams = b.column("gram").to_numpy(zero_copy_only=False)
        keep = n >= TRI_MIN_COUNT
        xs, ys = [], []
        for g in grams[keep]:
            x, y = g.split(" ", 1)
            if x != y:
                xs.append(x)
                ys.append(y)
        return pa.table({"src": pa.array(xs, type=pa.string()),
                         "dst": pa.array(ys, type=pa.string())})

    edges = big.map_batches(to_edges, batch_format="pyarrow")
    t = x_graph.triangle_counts(edges)
    df = t.to_pandas().rename(columns={"node": "term"})
    return df.sort_values("term").reset_index(drop=True)


def _triangles_sql() -> str:
    """Twin of triangle_counts on the bigram-threshold term graph: each
    triangle found once via the a<b<c ordered triple join (same triangle
    set as the engine's degree orientation), corners unioned and counted."""
    toks = _toks_expr()
    return f"""
WITH d AS (SELECT {toks} AS toks FROM documents),
b AS (
  SELECT toks[i] AS x, toks[i + 1] AS y
  FROM d, unnest(generate_series(1, len(toks) - 1)) AS t(i)
  WHERE len(toks) >= 2
),
cnt AS (SELECT x, y, count(*) AS n FROM b GROUP BY x, y),
edges AS (
  SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
  FROM cnt WHERE n >= {TRI_MIN_COUNT} AND x <> y
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM edges e1
  JOIN edges e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN edges e3 ON e3.a = e1.b AND e3.b = e2.b
),
corners AS (
  SELECT x AS term FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
SELECT term, count(*)::BIGINT AS n_tri FROM corners
GROUP BY term ORDER BY term
"""


def _q_pricing_summary(sf_dir: str) -> pd.DataFrame:
    ds = x_rel.pricing_summary(
        _read(sf_dir, "lineitem",
              ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"])
    )
    df = ds.to_pandas().sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    for c in ("sum_qty", "sum_base_price", "sum_revenue"):
        df[c] = df[c].round(2)
    df["avg_qty"] = df["avg_qty"].round(6)
    df["count_order"] = df["count_order"].astype(np.int64)
    return df


def _q_top_revenue_orders(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q3 analog (extras/relational.py:top_revenue_orders): broadcast
    customer filter + map-side combined lineitem + hash-partitioned
    Dataset.join + grouped revenue top-10."""
    t = x_rel.top_revenue_orders(
        _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]),
        _read(sf_dir, "orders",
              ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]),
        _read(sf_dir, "lineitem",
              ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"]),
    )
    return t.to_pandas().reset_index(drop=True)


def _q_returned_revenue_by_customer(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q10 analog (extras/relational.py:returned_revenue_by_customer):
    four-table join — map-side combined lineitem returns ⋈ date-filtered
    orders (hash join) -> per-customer sum ⋈ customer (hash join) +
    broadcast nation lookup; driver sees only the top-20."""
    t = x_rel.returned_revenue_by_customer(
        _read(sf_dir, "customer",
              ["c_custkey", "c_name", "c_nationkey", "c_acctbal"]),
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]),
        _read(sf_dir, "lineitem",
              ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"]),
        _read(sf_dir, "nation", ["n_nationkey", "n_name"]),
    )
    return t.to_pandas().reset_index(drop=True)


HIST_LO, HIST_HI, HIST_BINS = 0.0, 120000.0, 64
HIST_QS = [0.25, 0.5, 0.75, 0.9, 0.99]


def _q_price_hist_quantiles(sf_dir: str) -> pd.DataFrame:
    """Histogram-sketch quantiles (extras/sketches.histogram_quantiles):
    one streaming pass of fixed-width bincount partials (mergeable and
    parallelism-invariant by construction); estimate = lower edge of the
    first bucket reaching ceil(q * n_inside)."""
    from colbert_ray.extras.sketches import histogram_quantiles

    ests, _, _, _ = histogram_quantiles(
        _read(sf_dir, "lineitem", ["l_extendedprice"]),
        "l_extendedprice", HIST_LO, HIST_HI, HIST_QS, n_bins=HIST_BINS)
    return pd.DataFrame({
        "q": np.array([q for q, _ in ests], dtype=np.float64),
        "est_r": np.round([e for _, e in ests], 6)})


def _hist_sql() -> str:
    """Twin of histogram_quantiles: width_bucket counts, cumulative sum over
    PRESENT buckets (empty buckets cannot be the first to reach a target),
    lower-edge estimate with the identical inlined bucket width."""
    w = (HIST_HI - HIST_LO) / HIST_BINS
    qvals = ", ".join(f"({q})" for q in HIST_QS)
    # no width_bucket in DuckDB: the CASE mirrors the engine's
    # floor((v - lo) / w) + 1 with clip-to-[0, n+1] arithmetic literally
    bucket = (f"CASE WHEN l_extendedprice < {HIST_LO:.17g} THEN 0 "
              f"WHEN l_extendedprice >= {HIST_HI:.17g} THEN {HIST_BINS + 1} "
              f"ELSE least(greatest(CAST(floor((l_extendedprice - "
              f"{HIST_LO:.17g}) / {w:.17g}) AS BIGINT) + 1, 0), "
              f"{HIST_BINS + 1}) END")
    return f"""
WITH h AS (
  SELECT {bucket} AS b, count(*)::BIGINT AS n
  FROM lineitem GROUP BY b
),
inside AS (SELECT b, n FROM h WHERE b BETWEEN 1 AND {HIST_BINS}),
tot AS (SELECT COALESCE(sum(n), 0)::BIGINT AS ni FROM inside),
cum AS (SELECT b, sum(n) OVER (ORDER BY b)::BIGINT AS c FROM inside),
qs(q) AS (VALUES {qvals}),
est AS (
  SELECT q,
         (SELECT min(b) FROM cum
          WHERE c >= greatest(CAST(ceil(q * tot.ni) AS BIGINT), 1)) AS bkt
  FROM qs CROSS JOIN tot
)
SELECT CAST(q AS DOUBLE) AS q,
       round({HIST_LO:.17g} + (bkt - 1) * {w:.17g}, 6) AS est_r
FROM est ORDER BY q
"""


def _q_user_mode_event(sf_dir: str) -> pd.DataFrame:
    """MODE per group (extras/relational.user_mode_event): per-(user,type)
    partial counts -> one groupby -> vectorized per-user argmax with
    (n DESC, type ASC) tie-break."""
    ds = x_rel.user_mode_event(
        _read(sf_dir, "events", ["user_id", "event_type"]))
    return ds.to_pandas().sort_values("user_id").reset_index(drop=True)


def _q_label_centroids(sf_dir: str) -> pd.DataFrame:
    """Grouped vector mean (extras/simsearch.label_centroids): per-batch
    np.add.at partials, one (label, dim) groupby, driver finish."""
    return x_sim.label_centroids(
        _read(sf_dir, "embeddings", ["label", "embedding"]))


VALIDATE_PRICE_HI = 200000.0
VALIDATE_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM"]


def _q_validate_orders(sf_dir: str) -> pd.DataFrame:
    """Declarative expectations suite (extras/validate.expect): all
    row-local rules share one streaming pass of per-batch partial counts;
    the unique rule adds one (value, count) groupby whose duplicate AND
    total tallies reduce in the same execution."""
    from colbert_ray.extras.validate import expect

    return expect(
        _read(sf_dir, "orders",
              ["o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"]),
        [
            {"rule": "custkey_not_null", "kind": "not_null",
             "col": "o_custkey"},
            {"rule": "price_range", "kind": "range", "col": "o_totalprice",
             "lo": 0.0, "hi": VALIDATE_PRICE_HI},
            {"rule": "priority_vocab", "kind": "in_set",
             "col": "o_orderpriority", "values": VALIDATE_PRIORITIES},
            {"rule": "priority_format", "kind": "regex",
             "col": "o_orderpriority", "pattern": "^[0-9]-"},
            {"rule": "custkey_unique", "kind": "unique",
             "col": "o_custkey"},
        ])


def _validate_sql() -> str:
    vocab = ", ".join(f"'{v}'" for v in VALIDATE_PRIORITIES)
    return f"""
SELECT * FROM (
  SELECT 'custkey_not_null' AS rule,
         (count(*) FILTER (WHERE o_custkey IS NULL))::BIGINT AS n_violations,
         count(*)::BIGINT AS n_checked FROM orders
  UNION ALL
  SELECT 'price_range',
         (count(*) FILTER (WHERE NOT (o_totalprice >= 0.0
                                      AND o_totalprice <= {VALIDATE_PRICE_HI})))::BIGINT,
         count(*)::BIGINT FROM orders
  UNION ALL
  SELECT 'priority_vocab',
         (count(*) FILTER (WHERE o_orderpriority NOT IN ({vocab})))::BIGINT,
         count(*)::BIGINT FROM orders
  UNION ALL
  SELECT 'priority_format',
         (count(*) FILTER (WHERE NOT regexp_matches(o_orderpriority,
                                                    '^[0-9]-')))::BIGINT,
         count(*)::BIGINT FROM orders
  UNION ALL
  SELECT 'custkey_unique',
         (SELECT COALESCE(sum(n), 0) FROM (
            SELECT count(*) AS n FROM orders GROUP BY o_custkey
            HAVING count(*) > 1))::BIGINT,
         count(*)::BIGINT FROM orders
)
ORDER BY rule
"""


def _q_event_transitions(sf_dir: str) -> pd.DataFrame:
    """Markov transition matrix over event types
    (extras/relational.event_transitions): one groupby(user) with
    vectorized in-group pair counting, tiny pair groupby, driver finish."""
    return x_rel.event_transitions(
        _read(sf_dir, "events",
              ["user_id", "event_id", "ts", "event_type"]))


def _q_customer_order_activity(sf_dir: str) -> pd.DataFrame:
    """LEFT OUTER join gate (extras/relational.customer_order_activity):
    customers with no orders survive with coalesced zeros; order side is
    pre-aggregated to one row per custkey before the exchange."""
    ds = x_rel.customer_order_activity(
        _read(sf_dir, "customer", ["c_custkey", "c_name"]),
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]))
    return (ds.to_pandas().sort_values("c_custkey")
            .reset_index(drop=True))


def _q_user_click_purchase(sf_dir: str) -> pd.DataFrame:
    """FULL OUTER join gate (extras/relational.user_click_purchase_matrix):
    per-user click vs purchase counts; one-sided users survive with a
    coalesced key and zeros."""
    ds = x_rel.user_click_purchase_matrix(
        _read(sf_dir, "events", ["user_id", "event_type"]))
    return ds.to_pandas().sort_values("user_id").reset_index(drop=True)


def _q_props_value_stats(sf_dir: str) -> pd.DataFrame:
    """Semi-structured JSON extraction (extras/relational.py:
    json_props_stats): vectorized regex pull of props.k with a json.loads
    fallback for non-matching rows, map-side partial aggregation."""
    t = x_rel.json_props_stats(_read(sf_dir, "events",
                                     ["event_type", "props"]))
    return t.to_pandas().reset_index(drop=True)


def _q_session_funnel(sf_dir: str) -> pd.DataFrame:
    """Ordered view->click->purchase funnel within 30-min sessions
    (extras/relational.py:session_funnel)."""
    t = x_rel.session_funnel(_read(sf_dir, "events",
                                   ["user_id", "ts", "event_type",
                                    "event_id"]))
    return t.to_pandas().reset_index(drop=True)


def _q_cohort_retention(sf_dir: str) -> pd.DataFrame:
    """Cohort retention (extras/relational.py:cohort_retention): per-user
    first week -> distinct weekly activity -> hash join -> grouped
    distinct-user counts per (cohort_week, week_offset)."""
    t = x_rel.cohort_retention(_read(sf_dir, "events", ["user_id", "ts"]))
    return t.to_pandas().reset_index(drop=True)


def _q_late_events(sf_dir: str) -> pd.DataFrame:
    """Watermark late-data detection (extras/relational.py:late_events):
    global running high-water-mark over arrival order via bucket partials
    + driver exclusive prefix + ONE seeded groupby scan — the distributed
    prefix-scan decomposition."""
    t = x_rel.late_events(_read(sf_dir, "events",
                                ["event_id", "ts", "event_type"]))
    return t.to_pandas().reset_index(drop=True)


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _q_running_total(sf_dir: str) -> pd.DataFrame:
    """Per-user running sum in (ts, event_id) order
    (extras/relational.running_total — one groupby(user), vectorized
    lexsort + cumsum per group). event_id joins the sort key on BOTH sides:
    ties in ts would leave the prefix sum nondeterministic."""
    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])
    out = x_rel.running_total(ev).to_pandas()
    out["running_r"] = out["running"].round(6)
    return (out[["user_id", "event_id", "running_r"]]
            .sort_values(["user_id", "event_id"]).reset_index(drop=True))


def _q_event_type_pivot(sf_dir: str) -> pd.DataFrame:
    """Bounded-width pivot (extras/relational.pivot_counts): per-user event
    counts by type via vectorized 2-D bincount partials + one groupby-Sum;
    the exchange moves groups x blocks partial rows, never raw events."""
    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    out = (x_rel.pivot_counts(ev, "user_id", "event_type", EVENT_TYPES)
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    for c in out.columns:
        if c.startswith("n_"):
            out[c] = out[c].astype(np.int64)
    return out


def _q_session_paths(sf_dir: str) -> pd.DataFrame:
    """Per-session event-type path strings (extras/relational.py:
    session_event_paths) — group-concat in arrival order."""
    out = (x_rel.session_event_paths(
        _read(sf_dir, "events", ["user_id", "ts", "event_type", "event_id"]))
        .to_pandas().sort_values(["user_id", "session_id"])
        .reset_index(drop=True))
    return out[["user_id", "session_id", "path", "n_events"]]


def _q_event_ntiles(sf_dir: str) -> pd.DataFrame:
    """NTILE(4) per user over arrival order (extras/relational.py:
    user_value_ntile) — SQL's equal-frequency bucket rule, vectorized."""
    out = (x_rel.user_value_ntile(
        _read(sf_dir, "events", ["user_id", "ts", "event_id"]), n=4)
        .to_pandas().sort_values("event_id").reset_index(drop=True))
    return out[["event_id", "user_id", "tile"]]


def _q_suppliers_per_region(sf_dir: str) -> pd.DataFrame:
    """Dimension-table join coverage: supplier ⋈ nation ⋈ region grouped
    counts + balance sums. All three tables are small dimensions, so the
    whole chain is two broadcast lookups inside one streaming pass over
    supplier (no shuffle at any scale where dimensions stay dimension-
    sized)."""
    import ray as _ray

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey", "s_acctbal"])
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    n2r = dict(zip(nat["n_nationkey"].astype(int),
                   nat["n_regionkey"].astype(int)))
    r2n = dict(zip(reg["r_regionkey"].astype(int), reg["r_name"]))
    luts = _ray.put((n2r, r2n))

    def partial(b):
        import pyarrow as pa

        n2r_, r2n_ = _ray.get(luts)
        nk = b.column("s_nationkey").to_numpy(zero_copy_only=False)
        bal = b.column("s_acctbal").to_numpy(zero_copy_only=False)
        names = np.array([r2n_[n2r_[int(x)]] for x in nk], dtype=object)
        un, inv = np.unique(names, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        sums = np.zeros(len(un), dtype=np.float64)
        np.add.at(sums, inv, bal)
        return pa.table({"r_name": pa.array(un, type=pa.string()),
                         "n_suppliers": pa.array(cnt),
                         "bal_p": pa.array(sums)})

    from ray.data.aggregate import Sum as _Sum

    out = (sup.map_batches(partial, batch_format="pyarrow")
           .groupby("r_name")
           .aggregate(_Sum("n_suppliers", alias_name="n_suppliers"),
                      _Sum("bal_p", alias_name="sum_bal"))
           .to_pandas().sort_values("r_name").reset_index(drop=True))
    out["n_suppliers"] = out["n_suppliers"].astype(np.int64)
    out["sum_bal"] = out["sum_bal"].round(4)
    return out


def _q_top_terms_per_lang(sf_dir: str) -> pd.DataFrame:
    """Grouped vocabulary profile (extras/textstats.top_terms_per_group):
    top-5 terms by occurrence count per language."""
    out = x_text.top_terms_per_group(
        _read(sf_dir, "documents", ["lang", "text"]), group_col="lang", k=5)
    return out[["lang", "term", "cnt", "rank"]]


def _q_event_type_unpivot(sf_dir: str) -> pd.DataFrame:
    """Wide->long reshape (extras/relational.unpivot): the pivot gate's
    output melted back to (user_id, event_type, n) — round-trip proof of
    the pivot/unpivot pair; stateless map_batches, no shuffle."""
    import ray.data

    wide = _q_event_type_pivot(sf_dir)
    ds = ray.data.from_pandas(wide)
    out = (x_rel.unpivot(ds, "user_id",
                         [f"n_{v}" for v in EVENT_TYPES],
                         name_col="event_type", value_col="n")
           .to_pandas())
    out["event_type"] = out["event_type"].str.removeprefix("n_")
    out = out.sort_values(["user_id", "event_type"]).reset_index(drop=True)
    out["n"] = out["n"].astype(np.int64)
    return out


def _q_weighted_sample_docs(sf_dir: str) -> pd.DataFrame:
    """Sequential Poisson weighted sampling (extras/sampling.weighted_sample,
    Ohlsson 1998): 50 docs, inclusion ~ length(text)+1. Priority = one IEEE
    division of the hash-as-double by the weight — bit-portable, so the twin
    reproduces MEMBERSHIP exactly (unlike an exp/ln-based u^(1/w) rule)."""
    import pyarrow.compute as pc

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def wcol(b):
        return b.append_column(
            "w", pc.add(pc.utf8_length(b.column("text")), 1))

    dw = (docs.map_batches(wcol, batch_format="pyarrow",
                           zero_copy_batch=True)
          .select_columns(["doc_id", "w"]))
    from colbert_ray.extras.sampling import weighted_sample

    out = weighted_sample(dw, "doc_id", "w", 50, seed=7).to_pandas()
    out["w"] = out["w"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)[["doc_id", "w"]]


def _q_zscore_quantity(sf_dir: str) -> pd.DataFrame:
    """Per-group z-score normalization (extras/relational.group_zscore):
    l_quantity standardized within each l_returnflag. Broadcast-not-shuffle:
    one tiny moments groupby, then the corpus streams through a stateless
    vectorized lookup. (l_orderkey, l_linenumber) is NOT unique in the test
    data, so z_r joins the sort key on both sides."""
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"])
    z = x_rel.group_zscore(li, "l_returnflag", "l_quantity").to_pandas()
    z["z_r"] = z["z"].round(6)
    out = (z[["l_orderkey", "l_linenumber", "z_r"]]
           .sort_values(["l_orderkey", "l_linenumber", "z_r"])
           .reset_index(drop=True))
    out["l_linenumber"] = out["l_linenumber"].astype(np.int32)
    return out


def _q_pricing_rollup(sf_dir: str) -> pd.DataFrame:
    """ROLLUP(l_returnflag, l_linestatus) — one finest-granularity pass over
    the corpus, coarser levels re-derived from the tiny grouped frame
    (extras/relational.pricing_rollup); lvl is the GROUPING() bitmask."""
    t = x_rel.pricing_rollup(
        _read(sf_dir, "lineitem",
              ["l_returnflag", "l_linestatus", "l_quantity",
               "l_extendedprice", "l_discount"]))
    return t.to_pandas()


def _q_pricing_cube(sf_dir: str) -> pd.DataFrame:
    """CUBE(l_returnflag, l_linestatus) — all four grouping sets from ONE
    finest-granularity pass (extras/relational.pricing_cube); lvl is the
    GROUPING() bitmask (2 = returnflag rolled up)."""
    t = x_rel.pricing_cube(
        _read(sf_dir, "lineitem",
              ["l_returnflag", "l_linestatus", "l_quantity",
               "l_extendedprice", "l_discount"]))
    return t.to_pandas()


def _q_order_skyline(sf_dir: str) -> pd.DataFrame:
    """Skyline / Pareto frontier over orders — maximize o_totalprice,
    minimize o_orderdate ("highest value, earliest") via the distributive
    per-block local-skyline + candidate-merge shape
    (extras/relational.skyline)."""
    t = x_rel.skyline(
        _read(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderdate"]),
        maximize=["o_totalprice"], minimize=["o_orderdate"],
        keep_cols=["o_orderkey", "o_totalprice", "o_orderdate"])
    df = t.to_pandas().sort_values("o_orderkey").reset_index(drop=True)
    df["o_totalprice"] = df["o_totalprice"].round(2)
    return df


def _q_event_sessions(sf_dir: str) -> pd.DataFrame:
    """Per-user 30-min-gap sessionization (extras/relational.sessionize —
    groupby(user) + vectorized per-group sort/diff/cumsum)."""
    ds = x_rel.sessionize(_read(sf_dir, "events", ["user_id", "ts"]))
    return (ds.to_pandas()
            .sort_values(["user_id", "session_id"]).reset_index(drop=True))


def _q_user_value_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact per-user discrete quantiles (extras/relational.py:
    user_value_quantiles — percentile_disc selection, element-exact)."""
    ds = x_rel.user_value_quantiles(
        _read(sf_dir, "events", ["user_id", "value"]))
    df = ds.to_pandas().sort_values("user_id").reset_index(drop=True)
    for c in ("p50", "p90"):
        df[c] = df[c].round(6)
    df["n_events"] = df["n_events"].astype(np.int64)
    return df


def _q_events_hourly(sf_dir: str) -> pd.DataFrame:
    ds = x_rel.events_hourly_window(_read(sf_dir, "events", ["user_id", "ts", "value"]))
    df = ds.to_pandas().sort_values(["user_id", "window_start"]).reset_index(drop=True)
    df["sum_value"] = df["sum_value"].round(4)
    df["n_events"] = df["n_events"].astype(np.int64)
    return df


def _q_events_sliding_3h(sf_dir: str) -> pd.DataFrame:
    ds = x_rel.events_sliding_window(
        _read(sf_dir, "events", ["user_id", "ts", "value"]), hours=3)
    df = ds.to_pandas().sort_values(["user_id", "window_start"]).reset_index(drop=True)
    df["sum_value_3h"] = df["sum_value_3h"].round(4)
    df["n_events_3h"] = df["n_events_3h"].astype(np.int64)
    return df


def _q_purchase_attribution(sf_dir: str) -> pd.DataFrame:
    """Backward as-of join (extras/relational.asof_join): every purchase
    attributed to the user's most recent strictly-prior click — single
    co-group shuffle + per-key vectorized searchsorted."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    ds = x_rel.purchase_attribution(ev)
    return (ds.to_pandas()
            .sort_values(["user_id", "event_id"]).reset_index(drop=True))


def _q_click_conversions(sf_dir: str) -> pd.DataFrame:
    """Banded range join (extras/relational.range_join): all click→purchase
    pairs of the same user within 24h, pair expansion fully vectorized."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    ds = x_rel.click_conversions(ev, window_hours=24)
    return (ds.to_pandas()
            .sort_values(["user_id", "click_event_id", "purchase_event_id"])
            .reset_index(drop=True))


def _q_hll_user_count(sf_dir: str) -> pd.DataFrame:
    """HyperLogLog distinct users per event_type (extras/sketches.py —
    mergeable-sketch shape: per-batch register partials, tiny groupby(reg)
    shuffle, exact-integer harmonic fold). Hash-exact SQL twin."""
    from colbert_ray.extras import sketches as x_sk

    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    t = x_sk.hll_distinct(ev, "user_id", "event_type")
    return (t.to_pandas().sort_values("event_type").reset_index(drop=True))


def _q_hll_event_count(sf_dir: str) -> pd.DataFrame:
    """Ungrouped HLL distinct event_id count — exercises the harmonic-mean
    branch of the estimator (cardinality >> 2.5m at sf>=0.01)."""
    from colbert_ray.extras import sketches as x_sk

    ev = _read(sf_dir, "events", ["event_id"])
    return x_sk.hll_distinct(ev, "event_id").to_pandas()


CM_PROBE_K = 20


def _q_cm_user_counts(sf_dir: str) -> pd.DataFrame:
    """Count-Min frequency sketch (extras/sketches.count_min_sketch —
    mergeable partials like HLL; the only shuffle moves <= depth x width
    bucket rows per batch). Probes the exact top-20 users: cm_est >= exact
    by construction, and every estimate is hash-exact SQL-twinnable."""
    from ray.data.aggregate import Count

    from colbert_ray.extras import sketches as x_sk

    ev = _read(sf_dir, "events", ["user_id"])
    sk = x_sk.count_min_sketch(ev, "user_id")
    g = ev.groupby("user_id").aggregate(Count(alias_name="n_events")).to_pandas()
    top = (g.sort_values(["n_events", "user_id"], ascending=[False, True])
           .head(CM_PROBE_K).reset_index(drop=True))
    top["cm_est"] = x_sk.cm_estimate(sk, top["user_id"].tolist()).astype(np.int64)
    return top[["user_id", "n_events", "cm_est"]]


SPLIT_FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}
SAMPLE_RATE = 0.2
STRAT_N_PER_LANG = 20          # stratified sample: exact quota per lang


def _q_hash_sample_docs(sf_dir: str) -> pd.DataFrame:
    """Deterministic hash-gate sampling (extras/sampling.hash_sample):
    reproducible at any parallelism, no shuffle; decisions are integer
    hash compares so the SQL twin is bit-exact."""
    from colbert_ray.extras import sampling as x_samp

    docs = _read(sf_dir, "documents", ["doc_id"])
    ds = x_samp.hash_sample(docs, "doc_id", SAMPLE_RATE)
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


def _q_stratified_sample(sf_dir: str) -> pd.DataFrame:
    """Exact per-lang quota sampling (extras/sampling.stratified_sample):
    the n smallest key-hashes win per group — a deterministic total order,
    so quotas are exact and the sample is parallelism-invariant."""
    from colbert_ray.extras import sampling as x_samp

    docs = _read(sf_dir, "documents", ["doc_id", "lang"])
    ds = x_samp.stratified_sample(docs, "lang", "doc_id", STRAT_N_PER_LANG)
    df = ds.to_pandas()[["doc_id", "lang"]]
    return df.sort_values(["lang", "doc_id"]).reset_index(drop=True)


def _q_bigram_top100(sf_dir: str) -> pd.DataFrame:
    """Corpus bigram frequencies (extras/textstats.bigram_stats), top 100
    by (n DESC, gram)."""
    ds = x_text.bigram_stats(_read(sf_dir, "documents", ["text"]))
    df = ds.to_pandas().sort_values(["n", "gram"], ascending=[False, True])
    return df.head(100)[["gram", "n"]].reset_index(drop=True)


PREFIX_QUERY = "s"             # dictionary-prefix wildcard query
INFIX_QUERY = "or"             # *or* infix wildcard query
SUFFIX_QUERY = "er"            # *er suffix wildcard (reversed-dict search)
WILDCARD_PRE, WILDCARD_SUF = "s", "n"    # s*n combined wildcard
OR_TERMS = ["window", "vector", "stream"]  # disjunctive (min 2 of 3)
NOT_TERMS = ["slow"]                       # ... AND NOT slow
MIN_SHOULD_MATCH = 2
REGEX_PATTERN = r"(join|sort)\s+\w+"   # RE2 on both sides


def _q_prefix_search(sf_dir: str) -> pd.DataFrame:
    """Wildcard term expansion over the BUILT index
    (pipelines/phrase.prefix_search): binary-search the sorted mmap'd
    dictionary for the prefix range, roll up only those terms' posting
    slices per doc."""
    from colbert_ray.pipelines.phrase import prefix_search

    idx_dir = _ensure_index(sf_dir)
    t = prefix_search(idx_dir, PREFIX_QUERY)
    return (t.to_pandas().sort_values("doc_id").reset_index(drop=True))


def _q_infix_search(sf_dir: str) -> pd.DataFrame:
    """Infix wildcard over the BUILT index (pipelines/phrase.infix_search):
    vectorized substring scan of the vocab-bounded dictionary, shared
    posting rollup."""
    from colbert_ray.pipelines.phrase import infix_search

    idx_dir = _ensure_index(sf_dir)
    t = infix_search(idx_dir, INFIX_QUERY)
    return t.to_pandas().sort_values("doc_id").reset_index(drop=True)


def _q_suffix_search(sf_dir: str) -> pd.DataFrame:
    """Suffix wildcard (*er) over the BUILT index
    (pipelines/phrase.suffix_search): binary search on a reversed-sorted
    dictionary copy (built once per actor, vocab-bounded) — index-native,
    not a vocab scan — then the shared posting rollup."""
    from colbert_ray.pipelines.phrase import suffix_search

    idx_dir = _ensure_index(sf_dir)
    t = suffix_search(idx_dir, SUFFIX_QUERY)
    return t.to_pandas().sort_values("doc_id").reset_index(drop=True)


def _q_wildcard_search(sf_dir: str) -> pd.DataFrame:
    """Combined wildcard (s*n, LIKE 's%n') over the BUILT index
    (pipelines/phrase.wildcard_search): prefix range ∩ suffix range over
    dictionary positions + the non-overlap length constraint."""
    from colbert_ray.pipelines.phrase import wildcard_search

    idx_dir = _ensure_index(sf_dir)
    t = wildcard_search(idx_dir, WILDCARD_PRE, WILDCARD_SUF)
    return t.to_pandas().sort_values("doc_id").reset_index(drop=True)


def _q_boolean_or_not_docs(sf_dir: str) -> pd.DataFrame:
    """Boolean OR/NOT with min-should-match over the BUILT index
    (pipelines/phrase.disjunctive_docs): ≥2 of OR_TERMS and none of
    NOT_TERMS — one posting rollup + sorted-array exclusion."""
    from colbert_ray.pipelines.phrase import disjunctive_docs

    idx_dir = _ensure_index(sf_dir)
    t = disjunctive_docs(idx_dir, OR_TERMS, NOT_TERMS,
                         min_should_match=MIN_SHOULD_MATCH)
    return t.to_pandas().sort_values("doc_id").reset_index(drop=True)


def _q_regex_match_docs(sf_dir: str) -> pd.DataFrame:
    """Corpus regex scan (extras/textstats.regex_match_stats): RE2
    non-overlapping match counts, matching docs only."""
    ds = x_text.regex_match_stats(
        _read(sf_dir, "documents", ["doc_id", "text"]), REGEX_PATTERN)
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


def _q_regex_index_docs(sf_dir: str) -> pd.DataFrame:
    """Index-accelerated regex (pipelines/regex_index.regex_search — the
    Google Code Search literal-pruning plan): required literals {join,
    sort} from the pattern's alternation, dictionary infix probe, posting
    union as broadcast candidate filter, RE2 verify on candidates only.
    Same contract (and same oracle) as regex_match_docs."""
    from colbert_ray.pipelines.regex_index import regex_plan, regex_search

    idx_dir = _ensure_index(sf_dir)
    plan = regex_plan(idx_dir, REGEX_PATTERN, CFG)
    assert plan["path"] == "index", plan    # the gate exists to prove pruning
    ds = regex_search(idx_dir, _read(sf_dir, "documents", ["doc_id", "text"]),
                      REGEX_PATTERN, CFG)
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


def _prefix_search_sql() -> str:
    from colbert_ray.pipelines.phrase import sql_prefix_search

    return sql_prefix_search("documents", PREFIX_QUERY, CFG)


def _infix_search_sql() -> str:
    from colbert_ray.pipelines.phrase import sql_infix_search

    return sql_infix_search("documents", INFIX_QUERY, CFG)


def _suffix_search_sql() -> str:
    from colbert_ray.pipelines.phrase import sql_suffix_search

    return sql_suffix_search("documents", SUFFIX_QUERY, CFG)


def _wildcard_search_sql() -> str:
    from colbert_ray.pipelines.phrase import sql_wildcard_search

    return sql_wildcard_search("documents", WILDCARD_PRE, WILDCARD_SUF, CFG)


def _boolean_or_not_sql() -> str:
    from colbert_ray.pipelines.phrase import sql_disjunctive_docs

    return sql_disjunctive_docs(
        "documents", OR_TERMS, NOT_TERMS, MIN_SHOULD_MATCH, CFG)


PMI_K = 50
PMI_MIN_COUNT = 3


def _q_pmi_top50(sf_dir: str) -> pd.DataFrame:
    """PMI collocations (extras/textstats.pmi_collocations): top-50 by
    (rounded PMI DESC, gram). Unigram/bigram tables from the existing
    partial-agg passes; cf map broadcast once."""
    ds = x_text.pmi_collocations(_read(sf_dir, "documents", ["text"]),
                                 min_count=PMI_MIN_COUNT)
    df = ds.to_pandas().sort_values(["pmi_r", "gram"],
                                    ascending=[False, True])
    return df.head(PMI_K)[["gram", "n", "pmi_r"]].reset_index(drop=True)


def _pmi_sql() -> str:
    """Twin of pmi_collocations — identical multiply/divide composition
    inside ln() so the 6-decimal rounding sees the same float64 value."""
    toks = _toks_expr()
    return f"""
WITH d AS (SELECT {toks} AS toks FROM documents),
b AS (
  SELECT toks[i] AS x, toks[i + 1] AS y, toks[i] || ' ' || toks[i + 1] AS gram
  FROM d, unnest(generate_series(1, len(toks) - 1)) AS t(i)
  WHERE len(toks) >= 2
),
bg AS (SELECT gram, any_value(x) AS x, any_value(y) AS y,
              count(*)::BIGINT AS n
       FROM b GROUP BY gram),
u AS (SELECT term, count(*)::BIGINT AS cf
      FROM (SELECT unnest(toks) AS term FROM d) GROUP BY term),
tot AS (SELECT (SELECT count(*)::BIGINT FROM b) AS nb,
               (SELECT sum(cf)::BIGINT FROM u) AS nu),
scored AS (
  SELECT bg.gram, bg.n,
         round(ln(((bg.n::DOUBLE * tot.nu) * tot.nu)
                  / ((tot.nb::DOUBLE * ux.cf) * uy.cf)), 6) AS pmi_r
  FROM bg CROSS JOIN tot
  JOIN u ux ON ux.term = bg.x
  JOIN u uy ON uy.term = bg.y
  WHERE bg.n >= {PMI_MIN_COUNT}
)
SELECT gram, n, pmi_r FROM scored
ORDER BY pmi_r DESC, gram
LIMIT {PMI_K}
"""


def _q_doclen_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact global doc-length quantiles via the value-histogram shape
    (extras/textstats.doclen_quantiles — no global sort; the shuffle moves
    (length, count) partials only)."""
    t = x_text.doclen_quantiles(_read(sf_dir, "documents", ["doc_id", "text"]))
    return t.to_pandas()


TFIDF_K = 5


def _q_tfidf_top5(sf_dir: str) -> pd.DataFrame:
    """Per-doc TF-IDF keyword extraction (extras/textstats.tfidf_topk):
    broadcast-df scoring pass, per-doc vectorized top-k, round-6 policy."""
    ds = x_text.tfidf_topk(_read(sf_dir, "documents", ["doc_id", "text"]),
                           k=TFIDF_K)
    df = ds.to_pandas().sort_values(["doc_id", "rank"]).reset_index(drop=True)
    return df[["doc_id", "term", "tfidf", "rank"]]


def _q_doc_split_counts(sf_dir: str) -> pd.DataFrame:
    """Deterministic train/val/test assignment (extras/sampling.hash_split)
    + per-split count — exact disjoint partitions of the key space."""
    import ray.data
    from ray.data.aggregate import Count

    from colbert_ray.extras import sampling as x_samp

    docs = _read(sf_dir, "documents", ["doc_id"])
    tagged = x_samp.hash_split(docs, "doc_id", SPLIT_FRACTIONS)
    df = (tagged.groupby("split").aggregate(Count(alias_name="n_docs"))
          .to_pandas().sort_values("split").reset_index(drop=True))
    df["n_docs"] = df["n_docs"].astype(np.int64)
    return df


BLOOM_BITS = 1024       # deliberately small so false positives occur and
BLOOM_K = 2             # the oracle must reproduce them bit-exactly


def _q_bloom_filtered_orders(sf_dir: str) -> pd.DataFrame:
    """Bloom-filter semi-join (extras/bloom.py): orders probed against a
    fixed-size bitset of BUILDING-segment custkeys. The bitset is sized to
    FORCE false positives — the oracle recomputes the same occupied bits, so
    a hash-exact match proves the bloom mechanics, not just the join."""
    import pyarrow.compute as pc

    from colbert_ray.extras import bloom as x_bloom

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]) \
        .map_batches(lambda b: b.filter(
            pc.equal(b.column("c_mktsegment"), "BUILDING")),
            batch_format="pyarrow")
    bits = x_bloom.build_bloom(cust, "c_custkey",
                               n_bits=BLOOM_BITS, k=BLOOM_K)
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    kept = x_bloom.bloom_semijoin(orders, bits, "o_custkey", k=BLOOM_K)
    return (kept.to_pandas()[["o_orderkey", "o_custkey"]]
            .sort_values("o_orderkey").reset_index(drop=True))


def _q_customers_no_urgent(sf_dir: str) -> pd.DataFrame:
    """Anti join (extras/bloom.py anti_join): customers with NO 1-URGENT
    order. Bloom misses stream through as definite non-matches; only
    bloom-maybe rows enter the left_outer join against distinct custkeys."""
    from colbert_ray.extras import bloom as x_bloom

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    urgent = (_read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
              .filter(expr="o_orderpriority == '1-URGENT'")
              .select_columns(["o_custkey"]))
    out = x_bloom.anti_join(cust, urgent, on="c_custkey",
                            right_on="o_custkey")
    df = out.to_pandas()
    if df.empty:
        return pd.DataFrame({"c_custkey": pd.Series(dtype=np.int64),
                             "c_name": pd.Series(dtype=object)})
    return df.sort_values("c_custkey").reset_index(drop=True)


def _q_top_orders_per_cust(sf_dir: str) -> pd.DataFrame:
    """Grouped top-k (extras/relational.py grouped_topk): top-3 orders per
    customer by o_totalprice (row_number() window semantics, o_orderkey
    tie-break). Ordering compares the RAW stored doubles — no arithmetic on
    either side — so engine and oracle rank identically; price is rounded
    only for the hashed output column (float policy)."""
    ods = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    tk = x_rel.grouped_topk(ods, "o_custkey", "o_totalprice", 3,
                            tie_col="o_orderkey")
    df = tk.to_pandas().sort_values(["o_custkey", "rn"]).reset_index(drop=True)
    df["price_r"] = df["o_totalprice"].round(2)
    return df[["o_custkey", "o_orderkey", "rn", "price_r"]]


def _q_ndcg10(sf_dir: str) -> pd.DataFrame:
    """Per-query NDCG@10 of the BM25 ranking against the same rule-derived
    qrels as retrieval_metrics (binary relevance; queries with no relevant
    doc score 0). DCG = sum 1/log2(rank+1) over relevant ranked docs;
    IDCG over min(n_rel, 10) ideal ranks; round-6 both sides."""
    rdf = _q_bm25_top10(sf_dir)          # memoized rounded top-10
    qr = _rule_qrels(sf_dir).to_pandas()
    rows = []
    for qid, _text in QUERY_SET:
        rel = set(qr[qr.qid == qid]["docid"].tolist())
        n_rel = len(rel)
        g = rdf[rdf.qid == qid]
        dcg = float(sum(1.0 / np.log2(r + 1)
                        for r, d in zip(g["rank"], g["docid"]) if d in rel))
        m = min(n_rel, 10)
        idcg = float(sum(1.0 / np.log2(i + 1) for i in range(1, m + 1)))
        ndcg = round(dcg / idcg, 6) if idcg > 0 else 0.0
        rows.append({"qid": qid, "n_rel": n_rel, "ndcg10": ndcg})
    out = pd.DataFrame(rows)
    out["qid"] = out["qid"].astype(np.int64)
    out["n_rel"] = out["n_rel"].astype(np.int64)
    return out


def _rule_qrels(sf_dir: str) -> "object":
    """Rule-derived qrels Dataset (qid, docid): a doc is relevant iff it
    contains ALL the query's terms — shared by retrieval_metrics and
    ndcg10; computed distributed over the streaming documents table."""
    from colbert_ray.functions.tokenizer import tokenize_column

    qterms = [(qid, tokenize_query(text, CFG)[0]) for qid, text in QUERY_SET]

    def qrels_batch(batch: "pa.Table") -> "pa.Table":
        import pyarrow as pa
        import pyarrow.compute as pc

        toks = tokenize_column(batch.column("text"), CFG)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        out_q, out_d = [], []
        n = batch.num_rows
        for qid, terms in qterms:
            if not terms:
                continue
            ok = np.ones(n, dtype=bool)
            for t in terms:
                has = np.zeros(n, dtype=bool)
                sel = flat == t
                has[np.unique(parents[sel])] = True
                ok &= has
            out_q.extend([qid] * int(ok.sum()))
            out_d.extend(ids[ok].tolist())
        return pa.table({"qid": pa.array(out_q, type=pa.int64()),
                         "docid": pa.array(out_d, type=pa.int64())})

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        qrels_batch, batch_format="pyarrow", zero_copy_batch=True)


def _q_retrieval_metrics(sf_dir: str) -> pd.DataFrame:
    """MRR@10 / Recall@10 / Success@{1,5} of the BM25 ranking against
    rule-derived qrels (a doc is relevant to a query iff it contains ALL the
    query's terms) — metric-harness analog (msmarco_passages.py:73-114)."""
    import pyarrow as pa
    import ray.data

    from colbert_ray.pipelines import evaluate as ev
    from colbert_ray.pipelines.search import search

    idx = _ensure_index(sf_dir)
    qt = pa.table(
        {"qid": pa.array([q for q, _ in QUERY_SET], type=pa.int64()),
         "query": pa.array([t for _, t in QUERY_SET], type=pa.string())}
    )
    # float policy: rank by ROUNDED score on both sides (oversample raw
    # top-50, re-rank by (round(score,6) desc, docid), cut to 10) so
    # numpy-vs-DuckDB summation-order ulps can't flip a rank-10 boundary
    raw = search(qt, idx, k=50, with_sha=False).to_pandas()
    rdf = _rerank_rounded(raw, "score", "docid", 10)
    ranking = ray.data.from_pandas(rdf)

    # qrels by rule (shared helper; computed distributed)
    qrels = _rule_qrels(sf_dir)
    m = ev.ranking_metrics(ranking, qrels, mrr_at=10, recall_at=(10,),
                           success_at=(1, 5))
    for c in ("mrr@10", "recall@10", "success@1", "success@5"):
        m[c] = m[c].round(6)
    return m[["mrr@10", "recall@10", "success@1", "success@5",
              "n_judged"]].rename(
        columns={"mrr@10": "mrr10", "recall@10": "recall10",
                 "success@1": "success1", "success@5": "success5"})


# ---- rows-only (non-SQL-expressible) --------------------------------------

def _q_minhash_dup_pairs(sf_dir: str) -> pd.DataFrame:
    ds = x_dedup.minhash_lsh_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]), threshold=0.8
    )
    df = ds.to_pandas()
    if df.empty:
        return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                             "id_b": pd.Series(dtype=np.int64),
                             "jaccard": pd.Series(dtype=np.float64)})
    return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def _q_simhash(sf_dir: str) -> pd.DataFrame:
    ds = x_dedup.simhash(_read(sf_dir, "documents", ["doc_id", "text"]))
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


SIMHASH_MAX_HAMMING = 3      # Manku et al. 2007's web-crawl threshold


def _q_simhash_dup_pairs(sf_dir: str) -> pd.DataFrame:
    """SimHash near-dup pairs (extras/dedup.simhash_dup_pairs): Hamming <=
    3 over the 63-bit tf-weighted SimHash, mined via the EXACT pigeonhole
    banding shared with the aHash scale path — signatures-only shuffle,
    no driver all-pairs."""
    t = x_dedup.simhash_dup_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        max_hamming=SIMHASH_MAX_HAMMING)
    return t.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)


def _simhash_pairs_sql() -> str:
    """All-pairs twin over the simhash CTE (banding is exact by pigeonhole,
    so the banded engine result equals this quadratic reference)."""
    base = _simhash_sql().replace("ORDER BY doc_id", "")
    return f"""
WITH sigs AS ({base})
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
ORDER BY id_a, id_b
"""


def _q_fingerprints(sf_dir: str) -> pd.DataFrame:
    ds = x_text.fingerprints(_read(sf_dir, "documents", ["doc_id", "text"]))
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


def _q_lang_id(sf_dir: str) -> pd.DataFrame:
    ds = x_text.lang_id(_read(sf_dir, "documents", ["doc_id", "text"]))
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


def _q_ivf_knn_top5(sf_dir: str) -> pd.DataFrame:
    """IVF ANN top-5 with FIXED deterministic centroids (`_ivf_centroids`,
    shared with the SQL oracle, which inlines the same values as literals).
    Oversample k=10 raw, then re-rank on the rounded cosine (float policy).

    NOTE: the SQL twin's centroid literals are generated from
    GRAFT_ORACLE_SF_DIR (default sf0.01 — the driver's comparison scale);
    comparing query-vs-oracle at a DIFFERENT sf requires pointing that env
    var at the same sf_dir, otherwise the two sides train on different
    embeddings and legitimately diverge."""
    vecs, ids = _knn_queries(sf_dir)
    cents = _ivf_centroids(sf_dir)
    ds = x_sim.ivf_knn(_read(sf_dir, "embeddings"), vecs, ids, k=10,
                       centroids=cents)
    df = ds.to_pandas()
    out = _rerank_rounded(df, "cosine", "vec_id", 5)
    return out[["qid", "vec_id", "rank", "cosine"]].rename(
        columns={"cosine": "cosine_r"})


def _q_media_dedup(sf_dir: str) -> pd.DataFrame:
    """Binary-payload exact dedup (extras/multimodal.dedup_payloads):
    md5 digests ride the shuffle, payload bytes never do."""
    import pyarrow.parquet as pq
    import ray.data

    from colbert_ray.extras.multimodal import (dedup_payloads,
                                               make_payload_table)

    t = pq.read_table(_doc_path(sf_dir, "documents"),
                      columns=["doc_id", "text"])
    order = np.argsort(t.column("doc_id").to_numpy(zero_copy_only=False))[:240]
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)[order]
    texts = [t.column("text")[int(i)].as_py() for i in order]
    # plant EXACT duplicate payloads under fresh ids (1000 + k for every
    # 15th source doc) so the dedup has real work on any corpus
    dup_src = [i for i in range(240) if i % 15 == 0]
    all_ids = np.concatenate([ids, np.array([1000 + i // 15
                                             for i in dup_src])])
    blobs = [x.encode() for x in texts] + [texts[i].encode()
                                           for i in dup_src]
    payloads = ray.data.from_arrow(make_payload_table(all_ids, blobs))
    return dedup_payloads(payloads).to_pandas().reset_index(drop=True)


def _q_media_features(sf_dir: str) -> pd.DataFrame:
    """Multimodal plumbing demo: documents' bytes as opaque payloads."""
    import pyarrow.parquet as pq
    import ray.data

    from colbert_ray.extras.multimodal import extract_media_features, make_payload_table

    t = pq.read_table(_doc_path(sf_dir, "documents"), columns=["doc_id", "text"])
    order = np.argsort(t.column("doc_id").to_numpy(zero_copy_only=False))[:256]
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)[order]
    blobs = [t.column("text")[int(i)].as_py().encode() for i in order]
    payloads = ray.data.from_arrow(make_payload_table(ids, blobs))
    df = extract_media_features(payloads).to_pandas()
    df["pixel_mean"] = df["pixel_mean"].round(6)
    return (
        df[["item_id", "n_bytes", "pixel_mean", "decoded"]]
        .sort_values("item_id").reset_index(drop=True)
    )


AHASH_N_ITEMS = 256
AHASH_MAX_HAMMING = 8


def _payloads_ds(sf_dir: str):
    import pyarrow.parquet as pq
    import ray.data

    from colbert_ray.extras.multimodal import make_payload_table

    t = pq.read_table(_doc_path(sf_dir, "documents"),
                      columns=["doc_id", "text"])
    order = np.argsort(
        t.column("doc_id").to_numpy(zero_copy_only=False))[:AHASH_N_ITEMS]
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)[order]
    blobs = [t.column("text")[int(i)].as_py().encode() for i in order]
    return ray.data.from_arrow(make_payload_table(ids, blobs))


def _q_image_ahash(sf_dir: str) -> pd.DataFrame:
    """Perceptual average-hash per payload (extras/multimodal.image_ahash):
    64-bit aHash over the stub decode — all-integer bit rule
    (64*pixel_sum >= total), so the twin recomputes the identical hash."""
    from colbert_ray.extras.multimodal import image_ahash

    return (image_ahash(_payloads_ds(sf_dir)).to_pandas()
            .sort_values("item_id").reset_index(drop=True))


def _q_ahash_dup_pairs(sf_dir: str) -> pd.DataFrame:
    """Perceptual near-dup pairs: Hamming(aHash) <= 8 (the multimodal
    simhash analog; integer-exact)."""
    from colbert_ray.extras.multimodal import ahash_dup_pairs

    return (ahash_dup_pairs(_payloads_ds(sf_dir),
                            max_hamming=AHASH_MAX_HAMMING)
            .to_pandas().sort_values(["id_a", "id_b"])
            .reset_index(drop=True))


def _q_ahash_banded_pairs(sf_dir: str) -> pd.DataFrame:
    """The Hamming-LSH SCALE path for perceptual near-dup: disjoint-band
    blocking + in-bucket verify, EXACT by pigeonhole (a pair within
    max_hamming bits agrees on >= 1 of max_hamming+1 bands) — so it shares
    ahash_dup_pairs's SQL twin verbatim. Only 8-byte hashes ride one
    groupby shuffle; no driver all-pairs."""
    from colbert_ray.extras.multimodal import banded_ahash_dup_pairs

    return (banded_ahash_dup_pairs(_payloads_ds(sf_dir),
                                   max_hamming=AHASH_MAX_HAMMING)
            .to_pandas().sort_values(["id_a", "id_b"])
            .reset_index(drop=True))


def _ahash_cte() -> str:
    """Shared aHash CTE chain (ASCII-guarded: the engine hashes the
    utf-8 BYTES of text; codepoints match only for ASCII)."""
    return f"""
t AS (
  SELECT doc_id AS item_id,
         CASE WHEN length(text) <> octet_length(encode(text))
              THEN error('non-ascii input to ahash oracle')
              ELSE text END AS text
  FROM documents
  WHERE doc_id IN (SELECT doc_id FROM documents ORDER BY doc_id
                   LIMIT {AHASH_N_ITEMS})
),
ps AS (
  -- empty text guard: the engine's stub decodes b'' to zeros (ahash -1);
  -- ps = 0 reproduces that, and keeps % length(text) off a 0 modulus
  SELECT item_id, j,
         (CASE WHEN length(text) = 0 THEN 0 ELSE
          ord(substr(text, ((3 * j + 0) % length(text)) + 1, 1))
        + ord(substr(text, ((3 * j + 1) % length(text)) + 1, 1))
        + ord(substr(text, ((3 * j + 2) % length(text)) + 1, 1))
          END)::BIGINT AS ps
  FROM t, LATERAL (SELECT unnest(generate_series(0, 63)) AS j) js
),
tot AS (SELECT item_id, sum(ps) AS total FROM ps GROUP BY item_id),
bits AS (
  SELECT ps.item_id, ps.j,
         CASE WHEN 64 * ps.ps >= tot.total THEN 1 ELSE 0 END AS b
  FROM ps JOIN tot USING (item_id)
),
h AS (
  SELECT item_id, sum(b::HUGEINT * (1::HUGEINT << j)) AS hu
  FROM bits GROUP BY item_id
),
ah AS (
  SELECT item_id,
         (CASE WHEN hu < 9223372036854775808::HUGEINT THEN hu
               ELSE hu - 18446744073709551616::HUGEINT END)::BIGINT AS ahash
  FROM h
)"""


def _image_ahash_sql() -> str:
    return f"WITH {_ahash_cte()}\nSELECT item_id, ahash FROM ah ORDER BY item_id"


def _ahash_pairs_sql() -> str:
    return f"""
WITH {_ahash_cte()}
SELECT a.item_id AS id_a, b.item_id AS id_b,
       bit_count(xor(a.ahash, b.ahash))::BIGINT AS hamming
FROM ah a JOIN ah b ON a.item_id < b.item_id
WHERE bit_count(xor(a.ahash, b.ahash)) <= {AHASH_MAX_HAMMING}
ORDER BY id_a, id_b
"""


VIDEO_DUP_MIN_SHARED = 2


def _q_video_dup_pairs(sf_dir: str) -> pd.DataFrame:
    """Frame-fingerprint video dedup (extras/multimodal.video_dup_pairs):
    videos sharing >= 2 distinct sampled-frame aHashes; fingerprints join
    by hash — payloads never shuffle, no all-pairs stage."""
    from colbert_ray.extras.multimodal import video_dup_pairs

    df = video_dup_pairs(_payloads_ds(sf_dir),
                         min_shared=VIDEO_DUP_MIN_SHARED).to_pandas()
    # Ray's to_pandas drops the schema of an all-empty dataset — pin it
    df = df.reindex(columns=["id_a", "id_b", "n_shared"])
    for c in df.columns:
        df[c] = df[c].astype(np.int64)
    return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def _video_dup_sql() -> str:
    """Twin: frames fi in {0,4,...,28} ∩ [0, 4 + L%28) (FrameSampler's
    range(0, n_frames, 4)[:8]); frame byte k = text[(37*fi + k) mod L];
    the same all-integer aHash rule; DISTINCT per-item hashes; self-join
    on hash + pair count."""
    return f"""
WITH t AS (
  SELECT doc_id AS item_id,
         CASE WHEN length(text) <> octet_length(encode(text))
              THEN error('non-ascii input to video-ahash oracle')
              ELSE text END AS text
  FROM documents
  WHERE doc_id IN (SELECT doc_id FROM documents ORDER BY doc_id
                   LIMIT {AHASH_N_ITEMS})
),
fr AS (
  SELECT item_id, text, fi
  FROM t, LATERAL (SELECT unnest(generate_series(
       0, least(3 + length(text) % 28, 28), 4)) AS fi) fs
),
ps AS (
  -- empty text guard: decode_frame(b'') is all-zero pixels (see the
  -- image twin's note) — ps = 0, and no 0 modulus
  SELECT item_id, fi, j,
         (CASE WHEN length(text) = 0 THEN 0 ELSE
          ord(substr(text, ((37 * fi + 3 * j + 0) % length(text)) + 1, 1))
        + ord(substr(text, ((37 * fi + 3 * j + 1) % length(text)) + 1, 1))
        + ord(substr(text, ((37 * fi + 3 * j + 2) % length(text)) + 1, 1))
          END)::BIGINT AS ps
  FROM fr, LATERAL (SELECT unnest(generate_series(0, 63)) AS j) js
),
tot AS (SELECT item_id, fi, sum(ps) AS total FROM ps GROUP BY item_id, fi),
bits AS (
  SELECT ps.item_id, ps.fi, ps.j,
         CASE WHEN 64 * ps.ps >= tot.total THEN 1 ELSE 0 END AS b
  FROM ps JOIN tot USING (item_id, fi)
),
h AS (
  SELECT DISTINCT item_id,
         sum(b::HUGEINT * (1::HUGEINT << j)) AS hu
  FROM bits GROUP BY item_id, fi
)
SELECT a.item_id AS id_a, b.item_id AS id_b, count(*)::BIGINT AS n_shared
FROM h a JOIN h b ON a.hu = b.hu AND a.item_id < b.item_id
GROUP BY 1, 2
HAVING count(*) >= {VIDEO_DUP_MIN_SHARED}
ORDER BY id_a, id_b
"""


def _q_audio_fingerprints(sf_dir: str) -> pd.DataFrame:
    """31-bit audio energy-trend fingerprints
    (extras/multimodal.audio_fingerprints): bit w = window w+1 louder than
    w over 32 equal windows — ALL-integer (window sum-of-squares compare),
    twin recomputes identical bits from the int16-LE sample view."""
    from colbert_ray.extras.multimodal import audio_fingerprints

    return (audio_fingerprints(_payloads_ds(sf_dir)).to_pandas()
            .sort_values("item_id").reset_index(drop=True))


def _audio_fp_sql() -> str:
    W = 32
    return f"""
WITH t AS (
  SELECT doc_id AS item_id,
         CASE WHEN length(text) <> octet_length(encode(text))
              THEN error('non-ascii input to audio-fp oracle')
              ELSE text END AS text
  FROM documents
  WHERE doc_id IN (SELECT doc_id FROM documents ORDER BY doc_id
                   LIMIT {AHASH_N_ITEMS})
),
par AS (
  SELECT item_id, text,
         (length(text) - length(text) % 2) // 2 AS n,
         greatest((length(text) - length(text) % 2) // 2, 1) AS n1
  FROM t
),
wl AS (
  SELECT item_id, text, n, n1,
         (n1 + ((-n1) % {W} + {W}) % {W}) // {W} AS wlen
  FROM par
),
samp AS (
  SELECT item_id, wlen, k,
         -- bound by the TRUE sample count n (n1 only sizes the windows);
         -- an odd/empty tail pads with zeros exactly like the engine
         CASE WHEN k < n THEN
           (CASE WHEN ord(substr(text, 2 * k + 1, 1))
                      + 256 * ord(substr(text, 2 * k + 2, 1)) >= 32768
                 THEN ord(substr(text, 2 * k + 1, 1))
                      + 256 * ord(substr(text, 2 * k + 2, 1)) - 65536
                 ELSE ord(substr(text, 2 * k + 1, 1))
                      + 256 * ord(substr(text, 2 * k + 2, 1)) END)
         ELSE 0 END AS x
  FROM wl, LATERAL (SELECT unnest(generate_series(0, wlen * {W} - 1)) AS k) ks
),
ss AS (
  SELECT item_id, k // wlen AS w, sum(x * x)::HUGEINT AS ss
  FROM samp GROUP BY item_id, k // wlen
),
bits AS (
  SELECT a.item_id, a.w - 1 AS wb,
         CASE WHEN a.ss > b.ss THEN 1 ELSE 0 END AS b
  FROM ss a JOIN ss b ON b.item_id = a.item_id AND b.w = a.w - 1
)
SELECT item_id, sum(b::BIGINT * (1::BIGINT << wb))::BIGINT AS afp
FROM bits GROUP BY item_id ORDER BY item_id
"""


def _q_audio_dup_groups(sf_dir: str) -> pd.DataFrame:
    """Exact-fingerprint audio dedup groups
    (extras/multimodal.audio_dup_groups): fingerprints shared by >= 2
    items, with group size and min-id representative — ONE groupby over
    8-byte rows."""
    from colbert_ray.extras.multimodal import audio_dup_groups

    df = audio_dup_groups(_payloads_ds(sf_dir)).to_pandas()
    df = df.reindex(columns=["afp", "n_items", "rep_id"])
    for c in df.columns:
        df[c] = df[c].astype(np.int64)
    return df.sort_values("afp").reset_index(drop=True)


def _audio_dup_groups_sql() -> str:
    return f"""
WITH fp AS ({_audio_fp_sql()})
SELECT afp, count(*)::BIGINT AS n_items, min(item_id) AS rep_id
FROM fp GROUP BY afp HAVING count(*) >= 2 ORDER BY afp
"""


def _q_video_dup_clusters(sf_dir: str) -> pd.DataFrame:
    """Connected components over the video near-dup pair graph
    (extras/graph.connected_components over video_dup_pairs): one row per
    clustered video with its min-id cluster representative."""
    import pyarrow as pa

    from colbert_ray.extras.multimodal import video_dup_pairs

    pairs = video_dup_pairs(_payloads_ds(sf_dir),
                            min_shared=VIDEO_DUP_MIN_SHARED).to_pandas()
    pairs = pairs.reindex(columns=["id_a", "id_b", "n_shared"])
    if pairs.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                             "cluster_id": pd.Series(dtype=np.int64)})
    import ray.data

    edges = ray.data.from_arrow(pa.table({
        "id_a": pa.array(pairs["id_a"].to_numpy(dtype=np.int64)),
        "id_b": pa.array(pairs["id_b"].to_numpy(dtype=np.int64)),
    }))
    cc = x_dedup.connected_components(edges, node_col="doc_id",
                                      cluster_col="cluster_id")
    out = cc.to_pandas()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def _video_dup_clusters_sql() -> str:
    return f"""
WITH RECURSIVE p AS ({_video_dup_sql()}),
e AS (SELECT id_a AS u, id_b AS v FROM p UNION SELECT id_b, id_a FROM p),
reach(n, m) AS (
  SELECT u, u FROM e
  UNION
  SELECT e.u, r.m FROM e JOIN reach r ON e.v = r.n
)
SELECT n AS doc_id, min(m) AS cluster_id FROM reach
GROUP BY n ORDER BY doc_id
"""


def _q_video_frame_sample(sf_dir: str) -> pd.DataFrame:
    """Multimodal frame-sampling plumbing (decode stubbed per brief):
    documents' bytes as opaque 'video' payloads -> one row per sampled
    frame. Deterministic; rows-only check."""
    import pyarrow.parquet as pq
    import ray.data

    from colbert_ray.extras.multimodal import make_payload_table, sample_video_frames

    t = pq.read_table(_doc_path(sf_dir, "documents"), columns=["doc_id", "text"])
    order = np.argsort(t.column("doc_id").to_numpy(zero_copy_only=False))[:128]
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)[order]
    blobs = [t.column("text")[int(i)].as_py().encode() for i in order]
    payloads = ray.data.from_arrow(
        make_payload_table(ids, blobs, media_type="video"))
    df = sample_video_frames(payloads, stride=4, max_frames=4).to_pandas()
    df["frame_mean"] = df["frame_mean"].round(6)
    return df.sort_values(["item_id", "frame_idx"]).reset_index(drop=True)


def _q_code_corpus_rankings(sf_dir: str) -> pd.DataFrame:
    """Flagship end-to-end on the input_hint-shaped CODE corpus (generated
    deterministically — the testdata star schema has no such table). Scale of
    the generated corpus follows the sf directory name."""
    import pyarrow.parquet as pq

    from colbert_ray.fixtures import ensure_fixture
    from colbert_ray.pipelines.build import build_index
    from colbert_ray.pipelines.search import search_table

    base = os.path.basename(os.path.normpath(sf_dir))
    try:
        n_files = max(200, int(float(base.removeprefix("sf")) * 50_000))
    except ValueError:          # non-"sf<number>" dir name -> default scale
        n_files = 500
    root = os.path.join("/tmp/colbert_ray_driver", f"code_{n_files}")
    corpus_dir, queries_path = ensure_fixture(root, n_files, 100)
    idx = os.path.join(root, "index")
    build_index(corpus_dir, idx, CFG)
    res = search_table(pq.read_table(queries_path), idx, k=10)
    out = res.to_pandas()
    if n_files <= 2000:
        # self-check (VERDICT #8): the distributed ranking must be
        # rank-identical (exact float64) to the single-process oracle
        import glob as _glob

        import pyarrow as pa

        from colbert_ray.oracle import OracleIndex, assign_docids_oracle

        corpus = pa.concat_tables(
            pq.read_table(f)
            for f in sorted(_glob.glob(os.path.join(corpus_dir, "*.parquet"))))
        oi = OracleIndex.build(assign_docids_oracle(corpus), CFG)
        sample_q = pq.read_table(queries_path).slice(0, 20)
        want = oi.search_all(sample_q, k=10).to_pandas()
        got = out[out.qid.isin(set(want.qid))].reset_index(drop=True)
        cols = ["qid", "docid", "rank", "score"]
        if not got[cols].reset_index(drop=True).equals(
                want[cols].reset_index(drop=True)):
            raise AssertionError(
                "code_corpus_rankings diverged from the in-process oracle")
    return out


# ---------------------------------------------------------------------------
# driver API
# ---------------------------------------------------------------------------

def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: BM25 build + search."""
    return _q_bm25_top10("/root/testdata/sf0.001")


FREQ_CAPACITY = 128            # frequent_terms: freq > 1/128 of all tokens


def _augment_pii(sf_dir: str):
    """Documents text with deterministic synthetic PII appended (the corpus
    itself is PII-free word soup) — the SAME concatenation is inlined in the
    SQL twin, so redaction has real matches to scrub on both sides."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def augment(b: pa.Table) -> pa.Table:
        did = b.column("doc_id")
        dn = did.to_numpy(zero_copy_only=False)
        ds_ = pc.cast(did, pa.string())
        p3 = pc.cast(pa.array(dn % 900 + 100), pa.string())
        p4 = pc.cast(pa.array(dn % 9000 + 1000), pa.string())
        oct_ = pc.cast(pa.array(dn % 256), pa.string())
        t = pc.binary_join_element_wise(
            pc.cast(b.column("text"), pa.string()),
            " contact user", ds_, "@example.com call +1-", p3, "-555-", p4,
            " from 10.", oct_, ".0.1", "")
        return pa.table({"doc_id": did, "text": t})

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        augment, batch_format="pyarrow", zero_copy_batch=True)


_PII_AUG_SQL = ("text || ' contact user' || doc_id || '@example.com call "
                "+1-' || (doc_id % 900 + 100) || '-555-' || "
                "(doc_id % 9000 + 1000) || ' from 10.' || (doc_id % 256) "
                "|| '.0.1'")


def _q_pii_redaction(sf_dir: str) -> pd.DataFrame:
    """PII scrub (extras/redact.redact_pii): RE2 email/phone/IPv4 redaction
    with per-doc match counts, over the PII-augmented documents table."""
    from colbert_ray.extras import redact as x_red

    ds = x_red.redact_pii(_augment_pii(sf_dir))
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


def _q_normalized_text(sf_dir: str) -> pd.DataFrame:
    """Canonical normalization (extras/redact.normalize_text): lowercase +
    whitespace collapse + trim, with normalized char counts."""
    from colbert_ray.extras import redact as x_red

    ds = x_red.normalize_text(_read(sf_dir, "documents", ["doc_id", "text"]))
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


def _q_frequent_terms(sf_dir: str) -> pd.DataFrame:
    """EXACT heavy hitters (extras/sketches.frequent_terms): terms with
    corpus frequency > 1/FREQ_CAPACITY via the two-pass candidates-then-
    count scheme (per-batch frequent-items lemma gives the candidate
    superset; pass 2 exact-counts only candidates)."""
    from colbert_ray.extras import sketches as x_sk

    t = x_sk.frequent_terms(_read(sf_dir, "documents", ["text"]),
                            capacity=FREQ_CAPACITY)
    return t.to_pandas()


def _q_event_gaps(sf_dir: str) -> pd.DataFrame:
    """Per-user lag window (extras/relational.event_gaps): microsecond gap
    to the previous event of the same user, (ts, event_id)-ordered."""
    ds = x_rel.event_gaps(_read(sf_dir, "events",
                                ["event_id", "user_id", "ts"]))
    return ds.to_pandas().sort_values("event_id").reset_index(drop=True)


def _q_bigram_nll(sf_dir: str) -> pd.DataFrame:
    """Bigram-LM quality score (extras/textstats.bigram_nll): per-doc
    conditional NLL under an add-1-smoothed order-2 count model trained on
    the corpus itself (the CCNet perplexity-filter shape, order-2)."""
    ds = x_text.bigram_nll(_read(sf_dir, "documents", ["doc_id", "text"]))
    return (ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
            [["doc_id", "n_tokens", "bigram_nll"]])


def _bigram_nll_sql() -> str:
    return f"""
WITH d AS (SELECT doc_id, {_toks_expr()} AS toks FROM documents),
pairs AS (
  SELECT doc_id, toks[i] AS a, toks[i + 1] AS b
  FROM d, LATERAL (SELECT unnest(generate_series(1, len(toks) - 1)) AS i) js
),
big AS (SELECT a, b, count(*)::DOUBLE AS c FROM pairs GROUP BY a, b),
ctx AS (SELECT a, sum(c) AS ca FROM big GROUP BY a),
v AS (SELECT count(DISTINCT t)::DOUBLE AS vs
      FROM (SELECT unnest(toks) AS t FROM d)),
sc AS (
  SELECT p.doc_id,
         -ln((big.c + 1.0) / (ctx.ca + 1.0 * v.vs)) AS nl
  FROM pairs p JOIN big ON big.a = p.a AND big.b = p.b
  JOIN ctx ON ctx.a = p.a CROSS JOIN v
)
SELECT doc_id,
       (count(*) + 1)::BIGINT AS n_tokens,
       round(sum(nl) / count(*), 6) AS bigram_nll
FROM sc GROUP BY doc_id ORDER BY doc_id
"""


OOV_VOCAB_SIZE = 25


def _q_oov_rate(sf_dir: str) -> pd.DataFrame:
    """Truncated-vocabulary OOV rate (extras/textstats.oov_rate): per-doc
    token count, OOV token count and fraction under the top-25-by-cf vocab
    (ties term ASC) — the tokenizer-coverage planning signal."""
    ds = x_text.oov_rate(_read(sf_dir, "documents", ["doc_id", "text"]),
                         vocab_size=OOV_VOCAB_SIZE)
    return (ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
            [["doc_id", "n_tokens", "n_oov", "oov_frac"]])


def _oov_rate_sql() -> str:
    V = OOV_VOCAB_SIZE
    return f"""
WITH d AS (SELECT doc_id, {_toks_expr()} AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS term FROM d),
cf AS (SELECT term, count(*) AS cf FROM tok GROUP BY term),
v AS (SELECT term FROM cf ORDER BY cf DESC, term LIMIT {V}),
agg AS (
  SELECT tok.doc_id,
         count(*) AS n_tokens,
         count(*) FILTER (WHERE v.term IS NULL) AS n_oov
  FROM tok LEFT JOIN v ON v.term = tok.term
  GROUP BY tok.doc_id
)
SELECT d.doc_id,
       coalesce(agg.n_tokens, 0)::BIGINT AS n_tokens,
       coalesce(agg.n_oov, 0)::BIGINT AS n_oov,
       round(coalesce(agg.n_oov / agg.n_tokens::DOUBLE, 0.0), 6) AS oov_frac
FROM d LEFT JOIN agg ON agg.doc_id = d.doc_id
ORDER BY d.doc_id
"""


def _q_lang_mixture_weights(sf_dir: str) -> pd.DataFrame:
    """Temperature (alpha=1/2) mixture reweighting per lang
    (extras/sampling.temperature_mixture_weights — the mC4/XLM-R
    alpha-sampling rule): weight = c^alpha / sum, boost vs natural mix."""
    from colbert_ray.extras import sampling as x_samp

    t = x_samp.temperature_mixture_weights(
        _read(sf_dir, "documents", ["lang"]), group_col="lang",
        alpha_num=1, alpha_den=2)
    return (t.to_pandas().sort_values("lang").reset_index(drop=True)
            [["lang", "n_docs", "weight", "boost"]])


def _lang_mixture_sql() -> str:
    return """
WITH c AS (SELECT lang, count(*)::DOUBLE AS n FROM documents GROUP BY lang),
s AS (SELECT sum(pow(n, 0.5)) AS sp, sum(n) AS sn FROM c)
SELECT lang, n::BIGINT AS n_docs,
       round(pow(n, 0.5) / s.sp, 6) AS weight,
       round((pow(n, 0.5) / s.sp) / (n / s.sn), 6) AS boost
FROM c CROSS JOIN s ORDER BY lang
"""


def _q_quality_percentiles(sf_dir: str) -> pd.DataFrame:
    """Global percentile rank of the unigram-LM quality score
    (extras/textstats.quality_percentile_rank) — exact distributed
    sort-rank (the engine's docid/term_id machinery) over (nll, doc_id)."""
    ds = x_text.quality_percentile_rank(
        _read(sf_dir, "documents", ["doc_id", "text"]))
    return (ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
            [["doc_id", "nll", "rank", "pct"]])


def _quality_percentiles_sql() -> str:
    return f"""
WITH d AS (SELECT doc_id, {_toks_expr()} AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS term FROM d),
cf AS (SELECT term, count(*)::DOUBLE AS c FROM tok GROUP BY term),
tot AS (SELECT sum(c) AS n FROM cf),
sc AS (
  SELECT tok.doc_id,
         round(sum(-ln(cf.c / tot.n)) / count(*), 6) AS nll
  FROM tok JOIN cf USING (term) CROSS JOIN tot
  GROUP BY tok.doc_id
),
r AS (
  SELECT doc_id, nll,
         (row_number() OVER (ORDER BY nll, doc_id) - 1)::BIGINT AS rank,
         count(*) OVER ()::BIGINT AS n
  FROM sc
)
SELECT doc_id, nll, rank,
       round(CASE WHEN n > 1 THEN rank / (n - 1.0) ELSE 0.0 END, 6) AS pct
FROM r ORDER BY doc_id
"""


def _q_lang_kl(sf_dir: str) -> pd.DataFrame:
    """KL(P_lang || P_corpus) over unigram distributions
    (extras/textstats.group_kl_divergence) — the mixture-weighting /
    domain-balance signal; groups x vocab bounded shuffle, driver fold."""
    t = x_text.group_kl_divergence(
        _read(sf_dir, "documents", ["lang", "text"]), group_col="lang")
    return (t.to_pandas().sort_values("lang").reset_index(drop=True)
            [["lang", "n_terms", "n_tokens", "kl"]])


def _lang_kl_sql() -> str:
    return f"""
WITH d AS (SELECT lang, {_toks_expr()} AS toks FROM documents),
tok AS (SELECT lang, unnest(toks) AS term FROM d),
lt AS (SELECT lang, term, count(*)::DOUBLE AS c FROM tok GROUP BY lang, term),
lsum AS (SELECT lang, sum(c) AS nl FROM lt GROUP BY lang),
ct AS (SELECT term, sum(c) AS cc FROM lt GROUP BY term),
tot AS (SELECT sum(c) AS n FROM lt)
SELECT lt.lang,
       count(*)::BIGINT AS n_terms,
       any_value(lsum.nl)::BIGINT AS n_tokens,
       round(sum((lt.c / lsum.nl)
                 * ln((lt.c / lsum.nl) / (ct.cc / tot.n))), 6) AS kl
FROM lt JOIN lsum USING (lang) JOIN ct USING (term) CROSS JOIN tot
GROUP BY lt.lang
ORDER BY lt.lang
"""


CUR2_MIN_ENTROPY = 2.8
CUR2_MAX_OOV = 0.16
CUR2_MAX_NLL = 3.39


def _q_curation_v2_stats(sf_dir: str) -> pd.DataFrame:
    """Composite quality gate over the round-4 signals: keep docs with
    char entropy >= 2.8 AND oov_frac <= 0.16 (top-25 vocab) AND
    bigram_nll <= 3.39 — one summary row with per-reason reject counts
    (non-exclusive) and the kept docs' mean bigram NLL. The three per-doc
    signal streams (each its own broadcast-model map) meet in a driver
    merge over doc_id — at corpus scale the same signals fuse into one
    map pass (the extras/curate composite pattern)."""
    ent = _q_char_entropy(sf_dir)[["doc_id", "entropy"]]
    oov = _q_oov_rate(sf_dir)[["doc_id", "oov_frac"]]
    nll = _q_bigram_nll(sf_dir)[["doc_id", "bigram_nll"]]
    df = ent.merge(oov, on="doc_id").merge(nll, on="doc_id", how="left")
    # docs with < 2 tokens have no bigram NLL: treat as rejected by NLL
    bad_ent = df["entropy"] < CUR2_MIN_ENTROPY
    bad_oov = df["oov_frac"] > CUR2_MAX_OOV
    bad_nll = df["bigram_nll"].isna() | (df["bigram_nll"] > CUR2_MAX_NLL)
    keep = ~(bad_ent | bad_oov | bad_nll)
    return pd.DataFrame({
        "n_total": [np.int64(len(ent))],
        "n_kept": [np.int64(int(keep.sum()))],
        "n_low_entropy": [np.int64(int(bad_ent.sum()))],
        "n_high_oov": [np.int64(int(bad_oov.sum()))],
        "n_high_nll": [np.int64(int(bad_nll.sum()))],
        "kept_nll_mean": [round(float(df.loc[keep, "bigram_nll"].mean()), 6)
                          if keep.any() else 0.0],
    })


def _curation_v2_sql() -> str:
    return f"""
WITH e AS ({_char_entropy_sql()}),
o AS ({_oov_rate_sql()}),
b AS ({_bigram_nll_sql()}),
j AS (
  SELECT e.doc_id, e.entropy, o.oov_frac, b.bigram_nll
  FROM e JOIN o USING (doc_id) LEFT JOIN b USING (doc_id)
),
f AS (
  SELECT *,
         (entropy < {CUR2_MIN_ENTROPY}) AS bad_ent,
         (oov_frac > {CUR2_MAX_OOV}) AS bad_oov,
         (bigram_nll IS NULL OR bigram_nll > {CUR2_MAX_NLL}) AS bad_nll
  FROM j
)
SELECT count(*)::BIGINT AS n_total,
       (count(*) FILTER (WHERE NOT (bad_ent OR bad_oov OR bad_nll)))::BIGINT
         AS n_kept,
       (count(*) FILTER (WHERE bad_ent))::BIGINT AS n_low_entropy,
       (count(*) FILTER (WHERE bad_oov))::BIGINT AS n_high_oov,
       (count(*) FILTER (WHERE bad_nll))::BIGINT AS n_high_nll,
       round(coalesce(avg(bigram_nll) FILTER (
         WHERE NOT (bad_ent OR bad_oov OR bad_nll)), 0.0), 6)
         AS kept_nll_mean
FROM f
"""


def _q_char_entropy(sf_dir: str) -> pd.DataFrame:
    """Per-doc Shannon character entropy (extras/textstats.char_entropy) —
    the low-entropy junk filter; one bincount per batch, no per-row loop."""
    ds = x_text.char_entropy(_read(sf_dir, "documents", ["doc_id", "text"]))
    return (ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
            [["doc_id", "n_chars", "entropy"]])


def _char_entropy_sql() -> str:
    return """
WITH ch AS (
  SELECT doc_id, substr(text, i, 1) AS c
  FROM documents,
       LATERAL (SELECT unnest(generate_series(1, len(text))) AS i) js
),
f AS (SELECT doc_id, c, count(*)::DOUBLE AS n FROM ch GROUP BY doc_id, c),
tot AS (SELECT doc_id, sum(n) AS nc FROM f GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(tot.nc, 0)::BIGINT AS n_chars,
       round(coalesce(-sum((f.n / tot.nc) * ln(f.n / tot.nc)), 0.0), 6)
         AS entropy
FROM documents d
LEFT JOIN tot ON tot.doc_id = d.doc_id
LEFT JOIN f ON f.doc_id = d.doc_id
GROUP BY d.doc_id, tot.nc
ORDER BY d.doc_id
"""


def _q_unigram_nll(sf_dir: str) -> pd.DataFrame:
    """Unigram-LM quality score (extras/textstats.unigram_nll): per-doc
    average negative log-likelihood under the corpus-trained unigram LM
    (the CCNet-style perplexity filter signal)."""
    ds = x_text.unigram_nll(_read(sf_dir, "documents", ["doc_id", "text"]))
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


def _q_corr_qty_price(sf_dir: str) -> pd.DataFrame:
    """Per-returnflag Pearson corr(l_quantity, l_extendedprice)
    (extras/relational.grouped_corr — one-pass raw moments)."""
    t = x_rel.grouped_corr(
        _read(sf_dir, "lineitem",
              ["l_returnflag", "l_quantity", "l_extendedprice"]),
        "l_returnflag", "l_quantity", "l_extendedprice")
    return t.to_pandas()


def _q_fuzzy_term_pairs(sf_dir: str) -> pd.DataFrame:
    """Typo-level vocabulary pairs at Levenshtein distance exactly 1
    (extras/dedup.fuzzy_term_pairs — SymSpell deletion-neighborhood join +
    vectorized verify) over the part-name vocabulary, which actually
    contains ed-1 word pairs (the documents vocab has none)."""
    t = x_dedup.fuzzy_term_pairs(_read(sf_dir, "part", ["p_name"]),
                                 text_col="p_name")
    return t.to_pandas()


def _q_ohlc_hourly(sf_dir: str) -> pd.DataFrame:
    """Per-(user, hour) OHLC bars (extras/relational.ohlc_hourly — mergeable
    first/last/min/max combiner; raw events never shuffle)."""
    ds = x_rel.ohlc_hourly(_read(sf_dir, "events",
                                 ["event_id", "user_id", "ts", "value"]))
    return (ds.to_pandas().sort_values(["user_id", "hour"])
            .reset_index(drop=True))


def _q_user_quantiles_cont(sf_dir: str) -> pd.DataFrame:
    """Per-user interpolated quantiles, percentile_cont rule
    (extras/relational.user_value_quantiles_cont)."""
    ds = x_rel.user_value_quantiles_cont(
        _read(sf_dir, "events", ["user_id", "value"]))
    return ds.to_pandas().sort_values("user_id").reset_index(drop=True)


def _q_curated_corpus(sf_dir: str) -> pd.DataFrame:
    """End-to-end curation composite (extras/curate.curate_corpus):
    normalize -> token gate -> corpus-LM NLL gate -> exact dedup on the
    normalized text; survivors with their stats and dup counts."""
    from colbert_ray.extras import curate as x_cur

    ds = x_cur.curate_corpus(_read(sf_dir, "documents", ["doc_id", "text"]))
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "bm25_top10": _q_bm25_top10,
        "lm_dirichlet_top10": _q_lm_dirichlet_top10,
        "corrected_bm25_top10": _q_corrected_bm25_top10,
        "pruned_bm25_top10": _q_pruned_bm25_top10,
        "updated_bm25_top10": _q_updated_bm25_top10,
        "compacted_bm25_top10": _q_compacted_bm25_top10,
        "merged_bm25_top10": _q_merged_bm25_top10,
        "rrf_bm25_ql_top5": _q_rrf_bm25_ql_top5,
        "search_facets": _q_search_facets,
        "rm3_bm25_top10": _q_rm3_bm25_top10,
        "search_snippets": _q_search_snippets,
        "proximity_top10": _q_proximity_top10,
        "bm25f_top10": _q_bm25f_top10,
        "bm25_explain": _q_bm25_explain,
        "ltr_features": _q_ltr_features,
        "suggest_terms": _q_suggest_terms,
        "bm25_top10_bmw": _q_bm25_top10_bmw,
        "bm25_top10_pfor": _q_bm25_top10_pfor,
        "bm25_top10_ef": _q_bm25_top10_ef,
        "dsl_search_top10": _q_dsl_search,
        "percolate_matches": _q_percolate_matches,
        "synonym_bm25_top10": _q_synonym_bm25_top10,
        "paged_bm25_pages23": _q_paged_bm25,
        "collapsed_by_lang_top5": _q_collapsed_by_lang,
        "rescored_bm25_top10": _q_rescored_bm25,
        "significant_terms_top10": _q_significant_terms,
        "funcscore_bm25_top10": _q_funcscore_bm25,
        "term_vectors_docs": _q_term_vectors,
        "msm_bm25_top10": _q_msm_bm25,
        "match_stats": _q_match_stats,
        "sampled_bm25_matches": _q_sampled_matches,
        "bm25_top10_sharded": _q_bm25_top10_sharded,
        "passage_bm25_top5": _q_passage_bm25_top5,
        "phrase_search_top10": _q_phrase_search,
        "boolean_and_docs": _q_boolean_and_docs,
        "corpus_stats": _q_corpus_stats,
        "term_df_top100": _q_term_df_top100,
        "token_counts": _q_token_counts,
        "packed_sequences": _q_packed_sequences,
        "packed_seq_text": _q_packed_seq_text,
        "bpe_merges": _q_bpe_merges,
        "bpe_token_counts": _q_bpe_token_counts,
        "exact_dedup": _q_exact_dedup,
        "span_dedup_docs": _q_span_dedup,
        "clean_corpus_stats": _q_clean_corpus_stats,
        "quality_scores": _q_quality_scores,
        "lang_doc_counts": _q_lang_doc_counts,
        "jaccard_dup_pairs": _q_jaccard_dup_pairs,
        "containment_pairs": _q_containment_pairs,
        "containment_prefix_pairs": _q_containment_prefix_pairs,
        "jaccard_prefix_pairs": _q_jaccard_prefix_pairs,
        "dup_clusters": _q_dup_clusters,
        "dup_spans": _q_dup_spans,
        "contaminated_docs": _q_contaminated_docs,
        "knn_cosine_top5": _q_knn_cosine_top5,
        "more_like_this": _q_more_like_this,
        "hybrid_mlt_top5": _q_hybrid_mlt_top5,
        "mmr_knn_top5": _q_mmr_knn_top5,
        "rplsh_dup_pairs": _q_rplsh_dup_pairs,
        "embedding_dup_pairs": _q_embedding_dup_pairs,
        "mutual_knn_pairs": _q_mutual_knn_pairs,
        "mutual_knn_ivf_pairs": _q_mutual_knn_ivf_pairs,
        "embedding_covariance": _q_embedding_covariance,
        "embedding_int8": _q_embedding_int8,
        "knn_q8_top5": _q_knn_q8_top5,
        "pq_adc_top5": _q_pq_adc_top5,
        "ivfpq_top5": _q_ivfpq_top5,
        "cust_supp_pagerank": _q_cust_supp_pagerank,
        "supply_chain_hops": _q_supply_chain_hops,
        "term_triangles": _q_term_triangles,
        "retrieval_metrics": _q_retrieval_metrics,
        "ndcg10": _q_ndcg10,
        "pricing_summary": _q_pricing_summary,
        "pricing_rollup": _q_pricing_rollup,
        "pricing_cube": _q_pricing_cube,
        "order_skyline": _q_order_skyline,
        "weighted_sample_docs": _q_weighted_sample_docs,
        "event_type_pivot": _q_event_type_pivot,
        "event_type_unpivot": _q_event_type_unpivot,
        "top_terms_per_lang": _q_top_terms_per_lang,
        "suppliers_per_region": _q_suppliers_per_region,
        "event_ntiles": _q_event_ntiles,
        "session_paths": _q_session_paths,
        "running_total": _q_running_total,
        "zscore_quantity": _q_zscore_quantity,
        "top_revenue_orders": _q_top_revenue_orders,
        "returned_revenue_by_customer": _q_returned_revenue_by_customer,
        "customer_order_activity": _q_customer_order_activity,
        "user_click_purchase": _q_user_click_purchase,
        "validate_orders": _q_validate_orders,
        "event_transitions": _q_event_transitions,
        "price_hist_quantiles": _q_price_hist_quantiles,
        "user_mode_event": _q_user_mode_event,
        "label_centroids": _q_label_centroids,
        "props_value_stats": _q_props_value_stats,
        "late_events": _q_late_events,
        "cohort_retention": _q_cohort_retention,
        "session_funnel": _q_session_funnel,
        "events_hourly": _q_events_hourly,
        "event_sessions": _q_event_sessions,
        "user_value_quantiles": _q_user_value_quantiles,
        "events_sliding_3h": _q_events_sliding_3h,
        "purchase_attribution": _q_purchase_attribution,
        "click_conversions": _q_click_conversions,
        "hll_user_count": _q_hll_user_count,
        "hll_event_count": _q_hll_event_count,
        "cm_user_counts": _q_cm_user_counts,
        "hash_sample_docs": _q_hash_sample_docs,
        "doc_split_counts": _q_doc_split_counts,
        "stratified_sample_docs": _q_stratified_sample,
        "bigram_top100": _q_bigram_top100,
        "pmi_top50": _q_pmi_top50,
        "prefix_search_docs": _q_prefix_search,
        "infix_search_docs": _q_infix_search,
        "suffix_search_docs": _q_suffix_search,
        "wildcard_search_docs": _q_wildcard_search,
        "boolean_or_not_docs": _q_boolean_or_not_docs,
        "regex_match_docs": _q_regex_match_docs,
        "regex_index_docs": _q_regex_index_docs,
        "tfidf_top5": _q_tfidf_top5,
        "doclen_quantiles": _q_doclen_quantiles,
        "bloom_filtered_orders": _q_bloom_filtered_orders,
        "customers_no_urgent": _q_customers_no_urgent,
        "top_orders_per_cust": _q_top_orders_per_cust,
        "simhash64": _q_simhash,
        "simhash_dup_pairs": _q_simhash_dup_pairs,
        "winnow_fingerprints": _q_winnow_fingerprints,
        "code_clone_pairs": _q_code_clone_pairs,
        "fingerprints": _q_fingerprints,
        "lang_id_pred": _q_lang_id,
        "repetition_stats": _q_repetition_stats,
        "pii_redaction": _q_pii_redaction,
        "normalized_text": _q_normalized_text,
        "frequent_terms": _q_frequent_terms,
        "event_gaps": _q_event_gaps,
        "unigram_nll": _q_unigram_nll,
        "bigram_nll": _q_bigram_nll,
        "oov_rate": _q_oov_rate,
        "char_entropy": _q_char_entropy,
        "lang_kl": _q_lang_kl,
        "quality_percentiles": _q_quality_percentiles,
        "lang_mixture_weights": _q_lang_mixture_weights,
        "curation_v2_stats": _q_curation_v2_stats,
        "corr_qty_price": _q_corr_qty_price,
        "fuzzy_term_pairs": _q_fuzzy_term_pairs,
        "ohlc_hourly": _q_ohlc_hourly,
        "user_quantiles_cont": _q_user_quantiles_cont,
        "curated_corpus": _q_curated_corpus,
        # minhash/ivf gained exact SQL oracles in round 3 (modular-arithmetic
        # minhash twin; fixed-centroid IVF twin); both ALSO keep their pytest
        # recall gates vs the exact baselines
        "minhash_dup_pairs": _q_minhash_dup_pairs,
        "ivf_knn_top5": _q_ivf_knn_top5,
        # media queries have full SQL oracles (arithmetic-deterministic
        # stubs) plus the media pytest suite
        "media_features": _q_media_features,
        "image_ahash": _q_image_ahash,
        "video_dup_pairs": _q_video_dup_pairs,
        "audio_fingerprints": _q_audio_fingerprints,
        "audio_dup_groups": _q_audio_dup_groups,
        "video_dup_clusters": _q_video_dup_clusters,
        "ahash_dup_pairs": _q_ahash_dup_pairs,
        "ahash_banded_pairs": _q_ahash_banded_pairs,
        "media_dedup": _q_media_dedup,
        "video_frame_sample": _q_video_frame_sample,
        # rows-only: gated by the in-process oracle self-check inside the
        # query (1000 queries; ranking sha asserted) — no SQL twin
        "code_corpus_rankings": _q_code_corpus_rankings,
    }


# ---------------------------------------------------------------------------
# oracle SQL
# ---------------------------------------------------------------------------

def _toks_expr() -> str:
    return sql_tokenize_expr("text", CFG)


def _hash_sample_sql() -> str:
    """Twin of extras/sampling.hash_sample — same integer hash gate."""
    from colbert_ray.extras.sampling import sample_threshold, sql_key_hash_expr

    h = sql_key_hash_expr("CAST(doc_id AS VARCHAR)")
    return f"""
SELECT doc_id FROM documents
WHERE ({h}) <= {sample_threshold(SAMPLE_RATE)}::HUGEINT
ORDER BY doc_id
"""


def _doc_split_sql() -> str:
    """Twin of extras/sampling.hash_split + grouped count — the CASE ladder
    uses the SAME cumulative integer edges (h < edge <=> h <= edge-1)."""
    from colbert_ray.extras.sampling import _thresholds, sql_key_hash_expr

    h = sql_key_hash_expr("CAST(doc_id AS VARCHAR)")
    edges = _thresholds(SPLIT_FRACTIONS)
    branches = "\n            ".join(
        f"WHEN h <= {e - 1}::HUGEINT THEN '{lab}'" for lab, e in edges[:-1])
    return f"""
WITH h AS (SELECT ({h}) AS h FROM documents),
tagged AS (SELECT CASE {branches}
                       ELSE '{edges[-1][0]}' END AS split
           FROM h)
SELECT split, count(*) AS n_docs FROM tagged
GROUP BY split ORDER BY split
"""


def _stratified_sql() -> str:
    """Twin of extras/sampling.stratified_sample — the same hash total
    order, expressed as a windowed rank."""
    from colbert_ray.extras.sampling import sql_key_hash_expr

    h = sql_key_hash_expr("CAST(doc_id AS VARCHAR)")
    return f"""
WITH ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY ({h}), doc_id) AS rn
  FROM documents
)
SELECT doc_id, lang FROM ranked
WHERE rn <= {STRAT_N_PER_LANG}
ORDER BY lang, doc_id
"""


def _bloom_sql() -> str:
    """Twin of extras/bloom.py semi-join — same double-hashed bit positions,
    so false positives reproduce exactly."""
    from colbert_ray.extras.bloom import sql_bloom_semijoin

    return sql_bloom_semijoin(
        probe_table="orders", probe_key="CAST(o_custkey AS VARCHAR)",
        build_table="(SELECT c_custkey FROM customer "
                    "WHERE c_mktsegment = 'BUILDING')",
        build_key="CAST(c_custkey AS VARCHAR)",
        select="o_orderkey, o_custkey",
        n_bits=BLOOM_BITS, k=BLOOM_K, order_by="o_orderkey")


def _hll_sql(table: str, group_col: str | None = None) -> str:
    """Exact DuckDB twin of extras/sketches.hll_distinct (same FNV+fmix64
    hash, integer register fold, exact-integer harmonic denominator)."""
    from colbert_ray.extras.sketches import sql_hll_distinct_expr

    return sql_hll_distinct_expr(table=table, key_expr="k",
                                 group_col=group_col)


def _cm_sql() -> str:
    """Exact DuckDB twin of extras/sketches.count_min_sketch + cm_estimate
    (same FNV + additive depth seed + fmix64 + mod-width bucketing)."""
    from colbert_ray.extras.sketches import sql_count_min_expr

    return sql_count_min_expr(
        table="events", key_expr="CAST(user_id AS VARCHAR)",
        probe_cte=("SELECT user_id, count(*)::BIGINT AS n_events FROM events "
                   f"GROUP BY user_id ORDER BY n_events DESC, user_id "
                   f"LIMIT {CM_PROBE_K}"),
        probe_key_expr="CAST(probe.user_id AS VARCHAR)",
    ) + "\nORDER BY n_events DESC, user_id"


def _bm25_sql() -> str:
    values = ",\n      ".join(
        f"({qid}, '{term}')"
        for qid, text in QUERY_SET
        for term in tokenize_query(text, CFG)[0]
    )
    k1, b = CFG.k1, CFG.b
    return f"""
WITH docs AS (
  SELECT doc_id, {_toks_expr()} AS toks FROM documents
),
stats AS (
  SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM docs
),
tok AS (
  SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM docs
),
tf AS (
  SELECT doc_id, term, any_value(dl) AS dl, count(*) AS tf
  FROM tok GROUP BY doc_id, term
),
df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
),
q(qid, term) AS (
  VALUES {values}
),
scores AS (
  SELECT q.qid, tf.doc_id AS docid,
         sum( ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
              * tf.tf * ({k1} + 1.0)
              / (tf.tf + {k1} * (1.0 - {b} + {b} * tf.dl / s.avgdl)) ) AS score
  FROM q
  JOIN df ON df.term = q.term
  JOIN tf ON tf.term = q.term
  CROSS JOIN stats s
  GROUP BY q.qid, tf.doc_id
)
SELECT qid::BIGINT AS qid, docid,
       row_number() OVER (PARTITION BY qid ORDER BY round(score, 6) DESC, docid) AS rank,
       round(score, 6) AS score_r
FROM scores
QUALIFY rank <= 10
ORDER BY qid, rank
"""


def _compacted_bm25_sql() -> str:
    """Twin of the post-compaction view: plain BM25 with ALL statistics
    over the LIVE corpus (original minus removed plus appended added)."""
    values = ",\n      ".join(
        f"({qid}, '{term}')"
        for qid, text in QUERY_SET
        for term in tokenize_query(text, CFG)[0]
    )
    added_vals = ",\n      ".join(
        f"({i}, '{t}')" for i, t in enumerate(UPD_ADDED_TEXTS))
    removed = ", ".join(str(d) for d in UPD_REMOVED)
    k1, b = CFG.k1, CFG.b
    return f"""
WITH added0(i, text) AS (
  VALUES {added_vals}
),
live AS (
  SELECT doc_id, {_toks_expr()} AS toks FROM documents
  WHERE doc_id NOT IN ({removed})
  UNION ALL
  SELECT (SELECT max(doc_id) FROM documents) + 1 + i AS doc_id,
         {_toks_expr()} AS toks
  FROM added0
),
stats AS (
  SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM live
),
tok AS (
  SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM live
),
tf AS (
  SELECT doc_id, term, any_value(dl) AS dl, count(*) AS tf
  FROM tok GROUP BY doc_id, term
),
df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
),
q(qid, term) AS (
  VALUES {values}
),
scores AS (
  SELECT q.qid, tf.doc_id AS docid,
         sum( ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
              * tf.tf * ({k1} + 1.0)
              / (tf.tf + {k1} * (1.0 - {b} + {b} * tf.dl / s.avgdl)) ) AS score
  FROM q
  JOIN df ON df.term = q.term
  JOIN tf ON tf.term = q.term
  CROSS JOIN stats s
  GROUP BY q.qid, tf.doc_id
)
SELECT qid::BIGINT AS qid, docid,
       row_number() OVER (PARTITION BY qid ORDER BY round(score, 6) DESC, docid) AS rank,
       round(score, 6) AS score_r
FROM scores
QUALIFY rank <= 10
ORDER BY qid, rank
"""


def _proximity_sql() -> str:
    """Twin of proximity_search for the fixed 3-word query: positions via
    generate_subscripts over the same filtered token list; min span =
    min over the per-doc position cross product (small per doc); integer-
    exact so no float policy is involved."""
    words = sorted(set(PROX_QUERY.split()))
    assert len(words) == 3
    w1, w2, w3 = words
    return f"""
WITH docs AS (
  SELECT doc_id, {_toks_expr()} AS toks FROM documents
),
pos AS (
  SELECT doc_id, unnest(toks) AS term,
         generate_subscripts(toks, 1) AS p
  FROM docs
),
p1 AS (SELECT doc_id, p FROM pos WHERE term = '{w1}'),
p2 AS (SELECT doc_id, p FROM pos WHERE term = '{w2}'),
p3 AS (SELECT doc_id, p FROM pos WHERE term = '{w3}'),
spans AS (
  SELECT p1.doc_id,
         min(greatest(p1.p, p2.p, p3.p)
             - least(p1.p, p2.p, p3.p) + 1) AS span
  FROM p1
  JOIN p2 ON p2.doc_id = p1.doc_id
  JOIN p3 ON p3.doc_id = p1.doc_id
  GROUP BY p1.doc_id
)
SELECT doc_id, CAST(span AS BIGINT) AS span
FROM spans ORDER BY span, doc_id LIMIT 10
"""


def _snippets_sql() -> str:
    """Twin of extract_snippets: DuckDB 1-based inclusive list slices over
    the same token lists; windows ranked by (hits DESC, start ASC)."""
    values = ",\n      ".join(
        f"({qid}, '{term}')"
        for qid, text in QUERY_SET
        for term in tokenize_query(text, CFG)[0]
    )
    w = SNIPPET_WINDOW
    return f"""
WITH q(qid, term) AS (
  VALUES {values}
),
qt AS (
  SELECT qid, list(DISTINCT term) AS terms FROM q GROUP BY qid
),
docs AS (
  SELECT doc_id, {_toks_expr()} AS toks FROM documents
),
bm AS (
  SELECT qid, docid FROM ({_bm25_sql()}) WHERE rank <= 3
),
cand AS (
  SELECT bm.qid, bm.docid, d.toks, qt.terms
  FROM bm
  JOIN docs d ON d.doc_id = bm.docid
  JOIN qt ON qt.qid = bm.qid
),
wins AS (
  SELECT qid, docid, toks, g.s,
         len(list_filter(toks[g.s : g.s + {w - 1}],
                         t -> list_contains(terms, t))) AS hits
  FROM cand,
       LATERAL (SELECT unnest(generate_series(
                    1, greatest(1, len(toks) - {w} + 1))) AS s) g
),
best AS (
  SELECT qid, docid, s, hits, toks,
         row_number() OVER (PARTITION BY qid, docid
                            ORDER BY hits DESC, s) AS r
  FROM wins
  QUALIFY r = 1
)
SELECT qid, docid, s AS start, hits AS n_hits,
       array_to_string(toks[s : s + {w - 1}], ' ') AS snippet
FROM best
ORDER BY qid, docid
"""


def _rm3_sql() -> str:
    """Twin of the RM3 pipeline: feedback docs from the bm25 twin's
    top-10; rm_w(q,t) = round(sum tf/dl over feedback docs, 6) with term
    tie-break; top-5 non-original terms join the query at weight 0.5;
    weighted BM25 re-scores (originals weight 1.0)."""
    values = ",\n      ".join(
        f"({qid}, '{term}')"
        for qid, text in QUERY_SET
        for term in tokenize_query(text, CFG)[0]
    )
    k1, b = CFG.k1, CFG.b
    return f"""
WITH docs AS (
  SELECT doc_id, {_toks_expr()} AS toks FROM documents
),
stats AS (
  SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM docs
),
tok AS (
  SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM docs
),
tf AS (
  SELECT doc_id, term, any_value(dl) AS dl, count(*) AS tf
  FROM tok GROUP BY doc_id, term
),
df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
),
q(qid, term) AS (
  VALUES {values}
),
bm AS (
  SELECT qid, docid FROM ({_bm25_sql()})
),
fbw AS (
  SELECT bm.qid, tf.term, round(sum(tf.tf * 1.0 / tf.dl), 6) AS w
  FROM bm JOIN tf ON tf.doc_id = bm.docid
  GROUP BY bm.qid, tf.term
),
exp AS (
  SELECT qid, term, w,
         row_number() OVER (PARTITION BY qid ORDER BY w DESC, term) AS r
  FROM fbw
  WHERE NOT EXISTS (SELECT 1 FROM q
                    WHERE q.qid = fbw.qid AND q.term = fbw.term)
  QUALIFY r <= {RM3_N_EXP}
),
wq AS (
  SELECT qid, term, 1.0 AS wt FROM q
  UNION ALL
  SELECT qid, term, {RM3_ALPHA} AS wt FROM exp
),
scores AS (
  SELECT wq.qid, tf.doc_id AS docid,
         sum( wq.wt
              * ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
              * tf.tf * ({k1} + 1.0)
              / (tf.tf + {k1} * (1.0 - {b} + {b} * tf.dl / s.avgdl)) ) AS score
  FROM wq
  JOIN df ON df.term = wq.term
  JOIN tf ON tf.term = wq.term
  CROSS JOIN stats s
  GROUP BY wq.qid, tf.doc_id
)
SELECT qid::BIGINT AS qid, docid,
       row_number() OVER (PARTITION BY qid ORDER BY round(score, 6) DESC, docid) AS rank,
       round(score, 6) AS score_r
FROM scores
QUALIFY rank <= 10
ORDER BY qid, rank
"""


def _ndcg_sql() -> str:
    """Twin of ndcg10: rule qrels (ALL query terms present), DCG over the
    bm25 twin's top-10, IDCG over min(n_rel, 10) ideal ranks."""
    values = ",\n      ".join(
        f"({qid}, '{term}')"
        for qid, text in QUERY_SET
        for term in tokenize_query(text, CFG)[0]
    )
    return f"""
WITH docs AS (
  SELECT doc_id, {_toks_expr()} AS toks FROM documents
),
tok AS (
  SELECT doc_id, unnest(toks) AS term FROM docs
),
tf AS (
  SELECT DISTINCT doc_id, term FROM tok
),
q(qid, term) AS (
  VALUES {values}
),
qn AS (
  SELECT qid, count(DISTINCT term) AS nt FROM q GROUP BY qid
),
qrels AS (
  SELECT q.qid, tf.doc_id AS docid
  FROM q
  JOIN tf ON tf.term = q.term
  JOIN qn ON qn.qid = q.qid
  GROUP BY q.qid, tf.doc_id, qn.nt
  HAVING count(DISTINCT q.term) = qn.nt
),
bm AS (
  SELECT qid, docid, rank FROM ({_bm25_sql()})
),
dcg AS (
  SELECT bm.qid, sum(1.0 / log2(bm.rank + 1)) AS dcg
  FROM bm JOIN qrels ON qrels.qid = bm.qid AND qrels.docid = bm.docid
  GROUP BY bm.qid
),
nrel AS (
  SELECT qid, count(*) AS n_rel FROM qrels GROUP BY qid
),
idcg AS (
  SELECT n.qid, sum(1.0 / log2(g.i + 1)) AS idcg
  FROM nrel n,
       LATERAL (SELECT unnest(generate_series(1, least(n.n_rel, 10))) AS i) g
  GROUP BY n.qid
),
base AS (
  SELECT DISTINCT qid FROM q
)
SELECT b.qid::BIGINT AS qid,
       coalesce(n.n_rel, 0)::BIGINT AS n_rel,
       CASE WHEN i.idcg > 0
            THEN round(coalesce(d.dcg, 0) / i.idcg, 6)
            ELSE 0.0 END AS ndcg10
FROM base b
LEFT JOIN nrel n ON n.qid = b.qid
LEFT JOIN dcg d ON d.qid = b.qid
LEFT JOIN idcg i ON i.qid = b.qid
ORDER BY qid
"""


def _rrf_sql() -> str:
    """Twin of reciprocal_rank_fusion over the bm25/ql twins' top-10s."""
    return f"""
WITH bm AS ({_bm25_sql()}),
ql AS ({_ql_sql()}),
u AS (
  SELECT qid, docid, 1.0 / (60.0 + rank) AS contrib FROM bm
  UNION ALL
  SELECT qid, docid, 1.0 / (60.0 + rank) AS contrib FROM ql
),
f AS (
  SELECT qid, docid, sum(contrib) AS fused FROM u GROUP BY qid, docid
)
SELECT qid, docid,
       row_number() OVER (PARTITION BY qid ORDER BY round(fused, 6) DESC, docid) AS rank,
       round(fused, 6) AS fused_r
FROM f
QUALIFY rank <= 5
ORDER BY qid, rank
"""


def _updated_bm25_sql() -> str:
    """DuckDB twin of the post-update index view (state/updates.py +
    DecodedIndex._fold_in_deltas semantics): stats (n_docs, avgdl) and the
    df of build-time terms are FROZEN over the original corpus (tombstoned
    docs still count); terms first seen in a delta take df = distinct added
    docs containing them; candidates come from live docs only (original
    minus removed, plus added, with added docids appended after max)."""
    values = ",\n      ".join(
        f"({qid}, '{term}')"
        for qid, text in QUERY_SET
        for term in tokenize_query(text, CFG)[0]
    )
    added_vals = ",\n      ".join(
        f"({i}, '{t}')" for i, t in enumerate(UPD_ADDED_TEXTS))
    removed = ", ".join(str(d) for d in UPD_REMOVED)
    k1, b = CFG.k1, CFG.b
    return f"""
WITH docs0 AS (
  SELECT doc_id, {_toks_expr()} AS toks FROM documents
),
stats AS (
  SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM docs0
),
tok0 AS (
  SELECT doc_id, unnest(toks) AS term FROM docs0
),
df0 AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tok0 GROUP BY term
),
added0(i, text) AS (
  VALUES {added_vals}
),
added AS (
  SELECT (SELECT max(doc_id) FROM documents) + 1 + i AS doc_id,
         {_toks_expr()} AS toks
  FROM added0
),
dfd AS (
  SELECT term, count(DISTINCT doc_id) AS df
  FROM (SELECT doc_id, unnest(toks) AS term FROM added) GROUP BY term
),
df AS (
  SELECT coalesce(df0.term, dfd.term) AS term,
         coalesce(df0.df, dfd.df) AS df
  FROM df0 FULL OUTER JOIN dfd ON df0.term = dfd.term
),
live AS (
  SELECT doc_id, toks FROM docs0 WHERE doc_id NOT IN ({removed})
  UNION ALL
  SELECT doc_id, toks FROM added
),
tok AS (
  SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM live
),
tf AS (
  SELECT doc_id, term, any_value(dl) AS dl, count(*) AS tf
  FROM tok GROUP BY doc_id, term
),
q(qid, term) AS (
  VALUES {values}
),
scores AS (
  SELECT q.qid, tf.doc_id AS docid,
         sum( ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
              * tf.tf * ({k1} + 1.0)
              / (tf.tf + {k1} * (1.0 - {b} + {b} * tf.dl / s.avgdl)) ) AS score
  FROM q
  JOIN df ON df.term = q.term
  JOIN tf ON tf.term = q.term
  CROSS JOIN stats s
  GROUP BY q.qid, tf.doc_id
)
SELECT qid::BIGINT AS qid, docid,
       row_number() OVER (PARTITION BY qid ORDER BY round(score, 6) DESC, docid) AS rank,
       round(score, 6) AS score_r
FROM scores
QUALIFY rank <= 10
ORDER BY qid, rank
"""


def _pruned_bm25_sql() -> str:
    """Twin of pruned_bm25_top10: the standard BM25 twin with query terms
    whose df exceeds ratio*n_docs removed (their posting lists are gone;
    everything else scores identically — idf stays build-time)."""
    values = ",\n      ".join(
        f"({qid}, '{term}')"
        for qid, text in QUERY_SET
        for term in tokenize_query(text, CFG)[0]
    )
    k1, b = CFG.k1, CFG.b
    return f"""
WITH docs AS (
  SELECT doc_id, {_toks_expr()} AS toks FROM documents
),
stats AS (
  SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM docs
),
tok AS (
  SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM docs
),
tf AS (
  SELECT doc_id, term, any_value(dl) AS dl, count(*) AS tf
  FROM tok GROUP BY doc_id, term
),
df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
),
qall(qid, term) AS (
  VALUES {values}
),
q AS (
  SELECT qall.qid, qall.term
  FROM qall JOIN df ON df.term = qall.term CROSS JOIN stats s
  WHERE df.df <= {PRUNE_RATIO} * s.n_docs
),
scores AS (
  SELECT q.qid, tf.doc_id AS docid,
         sum( ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
              * tf.tf * ({k1} + 1.0)
              / (tf.tf + {k1} * (1.0 - {b} + {b} * tf.dl / s.avgdl)) ) AS score
  FROM q
  JOIN df ON df.term = q.term
  JOIN tf ON tf.term = q.term
  CROSS JOIN stats s
  GROUP BY q.qid, tf.doc_id
)
SELECT qid::BIGINT AS qid, docid,
       row_number() OVER (PARTITION BY qid ORDER BY round(score, 6) DESC, docid) AS rank,
       round(score, 6) AS score_r
FROM scores
QUALIFY rank <= 10
ORDER BY qid, rank
"""


def _corrected_bm25_sql() -> str:
    """Twin of corrected_bm25_top10: per-term correction in SQL — keep
    in-vocab terms, else the levenshtein=1 neighbor with (df DESC, term
    ASC), else drop — then the standard BM25 CTEs."""
    values = ",\n      ".join(
        f"({qid}, '{term}')"
        for qid, text in TYPO_QUERY_SET
        for term in tokenize_query(text, CFG)[0]
    )
    k1, b = CFG.k1, CFG.b
    return f"""
WITH docs AS (
  SELECT doc_id, {_toks_expr()} AS toks FROM documents
),
stats AS (
  SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM docs
),
tok AS (
  SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM docs
),
tf AS (
  SELECT doc_id, term, any_value(dl) AS dl, count(*) AS tf
  FROM tok GROUP BY doc_id, term
),
df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
),
qraw(qid, term) AS (
  VALUES {values}
),
q AS (
  SELECT qid, term FROM (
    SELECT qraw.qid,
           CASE WHEN EXISTS (SELECT 1 FROM df WHERE df.term = qraw.term)
                THEN qraw.term
                ELSE (SELECT d.term FROM df d
                      WHERE levenshtein(d.term, qraw.term) = 1
                      ORDER BY d.df DESC, d.term LIMIT 1) END AS term
    FROM qraw
  ) WHERE term IS NOT NULL
),
scores AS (
  SELECT q.qid, tf.doc_id AS docid,
         sum( ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
              * tf.tf * ({k1} + 1.0)
              / (tf.tf + {k1} * (1.0 - {b} + {b} * tf.dl / s.avgdl)) ) AS score
  FROM q
  JOIN df ON df.term = q.term
  JOIN tf ON tf.term = q.term
  CROSS JOIN stats s
  GROUP BY q.qid, tf.doc_id
)
SELECT qid::BIGINT AS qid, docid,
       row_number() OVER (PARTITION BY qid ORDER BY round(score, 6) DESC, docid) AS rank,
       round(score, 6) AS score_r
FROM scores
QUALIFY rank <= 10
ORDER BY qid, rank
"""


def _ql_sql() -> str:
    """DuckDB twin of the Dirichlet-QL ranker (functions/ql.py): candidate
    set = docs matching >=1 in-vocab query term; score = matching-term sum
    + |q|*ln(mu/(dl+mu)) length tail; |q| counts in-vocabulary query term
    occurrences (OOV drops on BOTH sides: lookup_terms vs the q JOIN cf)."""
    values = ",\n      ".join(
        f"({qid}, '{term}')"
        for qid, text in QUERY_SET
        for term in tokenize_query(text, CFG)[0]
    )
    mu = QL_MU
    return f"""
WITH docs AS (
  SELECT doc_id, {_toks_expr()} AS toks FROM documents
),
coll AS (
  SELECT sum(len(toks)) AS n_tokens FROM docs
),
tok AS (
  SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM docs
),
tf AS (
  SELECT doc_id, term, any_value(dl) AS dl, count(*) AS tf
  FROM tok GROUP BY doc_id, term
),
cf AS (
  SELECT term, sum(tf) AS cf FROM tf GROUP BY term
),
q(qid, term) AS (
  VALUES {values}
),
qn AS (
  SELECT q.qid, count(*) AS nq FROM q JOIN cf ON cf.term = q.term
  GROUP BY q.qid
),
match AS (
  SELECT q.qid, tf.doc_id AS docid, any_value(tf.dl) AS dl,
         sum( ln(1.0 + tf.tf * c.n_tokens / ({mu} * cf.cf)) ) AS mscore
  FROM q
  JOIN cf ON cf.term = q.term
  JOIN tf ON tf.term = q.term
  CROSS JOIN coll c
  GROUP BY q.qid, tf.doc_id
),
scores AS (
  SELECT m.qid, m.docid,
         m.mscore + qn.nq * ln({mu} / (m.dl + {mu})) AS score
  FROM match m JOIN qn ON qn.qid = m.qid
)
SELECT qid::BIGINT AS qid, docid,
       row_number() OVER (PARTITION BY qid ORDER BY round(score, 6) DESC, docid) AS rank,
       round(score, 6) AS score_r
FROM scores
QUALIFY rank <= 10
ORDER BY qid, rank
"""


def _jaccard_sql() -> str:
    return f"""
WITH t AS (
  SELECT doc_id, text FROM documents WHERE doc_id < {JACCARD_MAX_ID}
),
g AS (
  SELECT doc_id, list(DISTINCT substr(text, n.n::int, 3)) AS grams
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(text) - 2)) AS n) n
  GROUP BY doc_id
),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.grams, b.grams)) AS n_common,
         len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)) AS n_union
  FROM g a JOIN g b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b, n_common, n_union
FROM p
WHERE n_common > 0
  AND n_common * {JACCARD_THRESHOLD_DEN} >= {JACCARD_THRESHOLD_NUM} * n_union
ORDER BY id_a, id_b
"""


def _jaccard_prefix_sql() -> str:
    """Unbounded twin of ``_jaccard_sql`` — the prefix-filter join covers
    the whole table, so the oracle does too (no doc_id cut)."""
    return f"""
WITH g AS (
  SELECT doc_id, list(DISTINCT substr(text, n.n::int, 3)) AS grams
  FROM documents, LATERAL (SELECT unnest(generate_series(1, len(text) - 2)) AS n) n
  GROUP BY doc_id
),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.grams, b.grams)) AS n_common,
         len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)) AS n_union
  FROM g a JOIN g b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b, n_common, n_union
FROM p
WHERE n_common > 0
  AND n_common * {JACCARD_THRESHOLD_DEN} >= {JACCARD_THRESHOLD_NUM} * n_union
ORDER BY id_a, id_b
"""


def _knn_sql() -> str:
    ids = ", ".join(str(i) for i in KNN_QUERY_IDS)
    return f"""
WITH q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id IN ({ids})
),
sims AS (
  SELECT q.qid, e.vec_id,
         list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS cosine
  FROM q JOIN embeddings e ON e.vec_id <> q.qid
)
SELECT qid, vec_id,
       row_number() OVER (PARTITION BY qid ORDER BY round(cosine, 6) DESC, vec_id) AS rank,
       round(cosine, 6) AS cosine_r
FROM sims
QUALIFY rank <= 5
ORDER BY qid, rank
"""


def _rplsh_sql() -> str:
    """Twin of rp_lsh_dup_pairs — the ALGORITHM (bucket candidates then
    verify), not ground truth: same half-up int8 codes, +-1 plane signs
    from the shared fmix64, integer sign dots, 4-bit band keys, then the
    bit-exact quantized-cosine verify."""
    from colbert_ray.functions.hashing import sql_fmix64_expr

    bpb = RPLSH_PLANES // RPLSH_BANDS
    fmix = sql_fmix64_expr(
        f"CAST(pl0.j * {RPLSH_DIM} + pl0.pos + 1 AS HUGEINT)")
    return f"""
WITH u AS (
  SELECT vec_id, unnest(generate_series(0, len(embedding) - 1)) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings
),
s AS (SELECT vec_id, max(abs(val)) / 127 AS scale FROM u GROUP BY vec_id),
q AS (
  SELECT u.vec_id, u.pos,
         CASE WHEN s.scale = 0 THEN 0
              ELSE floor(u.val / s.scale + 0.5) END AS qv
  FROM u JOIN s USING (vec_id)
),
pl AS (
  SELECT pl0.j, pl0.pos,
         CASE WHEN ({fmix}) % 2 = 0 THEN 1 ELSE -1 END AS sign
  FROM (SELECT j0.j, p0.pos
        FROM (SELECT unnest(generate_series(0, {RPLSH_PLANES - 1})) AS j) j0,
             (SELECT unnest(generate_series(0, {RPLSH_DIM - 1})) AS pos) p0
       ) pl0
),
bits AS (
  SELECT q.vec_id, pl.j,
         CASE WHEN sum(pl.sign * q.qv) > 0 THEN 1 ELSE 0 END AS bit
  FROM q JOIN pl ON pl.pos = q.pos
  GROUP BY q.vec_id, pl.j
),
keys AS (
  SELECT vec_id, j // {bpb} AS band,
         CAST(sum(bit * (1 << (j % {bpb}))) AS BIGINT) AS key
  FROM bits GROUP BY vec_id, j // {bpb}
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM keys a
  JOIN keys b ON b.band = a.band AND b.key = a.key AND a.vec_id < b.vec_id
),
n AS (SELECT vec_id, sqrt(sum(qv * qv)) AS nrm FROM q GROUP BY vec_id),
ver AS (
  SELECT c.id_a, c.id_b,
         sum(qa.qv * qb.qv)
         / (any_value(na.nrm) * any_value(nb.nrm)) AS cosine
  FROM cand c
  JOIN q qa ON qa.vec_id = c.id_a
  JOIN q qb ON qb.vec_id = c.id_b AND qb.pos = qa.pos
  JOIN n na ON na.vec_id = c.id_a
  JOIN n nb ON nb.vec_id = c.id_b
  WHERE na.nrm > 0 AND nb.nrm > 0
  GROUP BY c.id_a, c.id_b
)
SELECT id_a, id_b, round(cosine, 6) AS cosine_r
FROM ver WHERE cosine >= {RPLSH_THRESHOLD}
ORDER BY id_a, id_b
"""


def _mlt_sql() -> str:
    """Twin of more_like_this: tfidf keyword selection (tfidf_top5's exact
    conventions, corpus-wide df) for the seed docs, then plain BM25 with
    those keywords as the query, seed excluded before ranking."""
    seeds = ", ".join(str(i) for i in MLT_SEEDS)
    k1, b = CFG.k1, CFG.b
    return f"""
WITH docs AS (
  SELECT doc_id, {_toks_expr()} AS toks FROM documents
),
stats AS (
  SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM docs
),
tok AS (
  SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM docs
),
tf AS (
  SELECT doc_id, term, any_value(dl) AS dl, count(*) AS tf
  FROM tok GROUP BY doc_id, term
),
df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
),
kw AS (
  SELECT doc_id AS seed_id, term FROM (
    SELECT tf.doc_id, tf.term,
           round(tf.tf::DOUBLE
                 * ln((SELECT count(*)::DOUBLE FROM documents)
                      / df.df::DOUBLE), 6) AS tfidf,
           row_number() OVER (
             PARTITION BY tf.doc_id
             ORDER BY round(tf.tf::DOUBLE
                            * ln((SELECT count(*)::DOUBLE FROM documents)
                                 / df.df::DOUBLE), 6) DESC, tf.term) AS r
    FROM tf JOIN df USING (term)
    WHERE tf.doc_id IN ({seeds})
  ) WHERE r <= {MLT_TERMS}
),
scores AS (
  SELECT kw.seed_id, tf.doc_id AS docid,
         sum( ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
              * tf.tf * ({k1} + 1.0)
              / (tf.tf + {k1} * (1.0 - {b} + {b} * tf.dl / s.avgdl)) ) AS score
  FROM kw
  JOIN df ON df.term = kw.term
  JOIN tf ON tf.term = kw.term
  CROSS JOIN stats s
  WHERE tf.doc_id <> kw.seed_id
  GROUP BY kw.seed_id, tf.doc_id
)
SELECT seed_id, docid,
       row_number() OVER (PARTITION BY seed_id ORDER BY round(score, 6) DESC, docid) AS rank,
       round(score, 6) AS score_r
FROM scores
QUALIFY rank <= 5
ORDER BY seed_id, rank
"""


def _hybrid_mlt_sql() -> str:
    """Twin of hybrid_mlt_top5: RRF over the mlt and knn twins' rankings."""
    return f"""
WITH bm AS (
  SELECT seed_id AS qid, docid, rank FROM ({_mlt_sql()})
),
kn AS (
  SELECT qid, vec_id AS docid, rank FROM ({_knn_sql()})
),
u AS (
  SELECT qid, docid, 1.0 / (60.0 + rank) AS contrib FROM bm
  UNION ALL
  SELECT qid, docid, 1.0 / (60.0 + rank) AS contrib FROM kn
),
f AS (
  SELECT qid, docid, sum(contrib) AS fused FROM u GROUP BY qid, docid
)
SELECT qid AS seed_id, docid,
       row_number() OVER (PARTITION BY qid ORDER BY round(fused, 6) DESC, docid) AS rank,
       round(fused, 6) AS fused_r
FROM f
QUALIFY rank <= 5
ORDER BY seed_id, rank
"""


def _mmr_sql() -> str:
    """Twin of mmr_diversify: greedy selection unrolled to 5 steps, each
    carrying the selected set as a LIST; input similarities rounded 6 dp,
    scores left UNROUNDED (bit-equal by identical IEEE arithmetic over
    identical rounded inputs — a final round() would re-introduce the
    numpy-half-even vs SQL-half-away ambiguity at the ...5 boundary that
    0.7 x a 6-dp decimal always produces), (score DESC, vec_id ASC)
    tie-break."""
    ids = ", ".join(str(i) for i in KNN_QUERY_IDS)
    lam, olam = MMR_LAM, 1.0 - MMR_LAM
    steps = []
    for i in range(2, 6):
        prev = i - 1
        steps.append(f"""
s{i} AS (
  SELECT qid, vec_id, score FROM (
    SELECT qid, vec_id, score,
           row_number() OVER (PARTITION BY qid
                              ORDER BY score DESC, vec_id) AS rr
    FROM (
      SELECT c.qid, c.vec_id,
             {lam} * c.rel - {olam} * max(p.s) AS score
      FROM cand c
      JOIN sel{prev} ON sel{prev}.qid = c.qid
      JOIN p ON p.qid = c.qid AND p.ia = c.vec_id
            AND list_contains(sel{prev}.sel, p.ib)
      WHERE NOT list_contains(sel{prev}.sel, c.vec_id)
      GROUP BY c.qid, c.vec_id, c.rel
    )
  ) WHERE rr = 1
),
sel{i} AS (
  SELECT sel{prev}.qid, list_append(sel{prev}.sel, s{i}.vec_id) AS sel
  FROM sel{prev} JOIN s{i} ON s{i}.qid = sel{prev}.qid
)""")
    steps_sql = ",".join(steps)
    union = "\nUNION ALL\n".join(
        f"SELECT qid, vec_id, {r} AS rank, score FROM s{r}"
        for r in range(1, 6))
    return f"""
WITH q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id IN ({ids})
),
sims AS (
  SELECT q.qid, e.vec_id,
         list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS cosine
  FROM q JOIN embeddings e ON e.vec_id <> q.qid
),
cand AS (
  SELECT qid, vec_id, round(cosine, 6) AS rel
  FROM (
    SELECT qid, vec_id, cosine,
           row_number() OVER (PARTITION BY qid
                              ORDER BY round(cosine, 6) DESC, vec_id) AS r
    FROM sims
  ) WHERE r <= {MMR_N_CAND}
),
p AS (
  SELECT a.qid, a.vec_id AS ia, b.vec_id AS ib,
         round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                      CAST(eb.embedding AS DOUBLE[])), 6) AS s
  FROM cand a
  JOIN cand b ON b.qid = a.qid AND b.vec_id <> a.vec_id
  JOIN embeddings ea ON ea.vec_id = a.vec_id
  JOIN embeddings eb ON eb.vec_id = b.vec_id
),
s1 AS (
  SELECT qid, vec_id, {lam} * rel AS score FROM (
    SELECT qid, vec_id, rel,
           row_number() OVER (PARTITION BY qid
                              ORDER BY rel DESC, vec_id) AS rr
    FROM cand
  ) WHERE rr = 1
),
sel1 AS (
  SELECT qid, [vec_id] AS sel FROM s1
),{steps_sql}
SELECT qid, vec_id, rank::BIGINT AS rank, score AS mmr_score
FROM ({union})
ORDER BY qid, rank
"""


def _weighted_sample_sql() -> str:
    from colbert_ray.extras.sampling import sql_weighted_sample

    return sql_weighted_sample(
        table="(SELECT doc_id, length(text) + 1 AS w FROM documents)",
        key_expr="CAST(doc_id AS VARCHAR)", weight_expr="w", n=50,
        select="doc_id, CAST(w AS BIGINT) AS w", seed=7,
        tie_expr="doc_id", order_by="doc_id")


def _knn_q8_sql() -> str:
    """Twin of ``knn_cosine_q8``: same half-up quantization, integer dots,
    and dot/(sqrt*sqrt) operation order — bit-exact, raw rank order (no
    rounded-tie oversampling needed, unlike the float-accumulated exact
    kNN)."""
    ids = ", ".join(str(i) for i in KNN_QUERY_IDS)
    return f"""
WITH u AS (SELECT vec_id, unnest(generate_series(0, len(embedding) - 1)) AS pos,
                  CAST(unnest(embedding) AS DOUBLE) AS val FROM embeddings),
s AS (SELECT vec_id, max(abs(val)) / 127 AS scale FROM u GROUP BY vec_id),
q AS (SELECT u.vec_id, u.pos,
             CASE WHEN s.scale = 0 THEN 0
                  ELSE floor(u.val / s.scale + 0.5) END AS qv
      FROM u JOIN s USING (vec_id)),
n AS (SELECT vec_id, sqrt(sum(qv * qv)) AS nrm FROM q GROUP BY vec_id),
sims AS (
  SELECT a.vec_id AS qid, b.vec_id AS vec_id,
         sum(a.qv * b.qv) / (any_value(na.nrm) * any_value(nb.nrm)) AS cosine
  FROM q a JOIN q b ON a.pos = b.pos AND b.vec_id <> a.vec_id
  JOIN n na ON na.vec_id = a.vec_id JOIN n nb ON nb.vec_id = b.vec_id
  WHERE a.vec_id IN ({ids}) AND na.nrm > 0 AND nb.nrm > 0
  GROUP BY a.vec_id, b.vec_id)
SELECT qid, vec_id,
       row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rank,
       round(cosine, 6) AS cosine_r
FROM sims QUALIFY rank <= 5 ORDER BY qid, rank
"""


def _minhash_sql() -> str:
    """Exact DuckDB twin of ``minhash_lsh_pairs`` (threshold 0.8): the whole
    path is modular arithmetic — 24-bit byte-trigram codes, 64 universal-hash
    permutations ``(a*code+b) mod 2^64``, per-band multiply-mix + splitmix64
    finalizer, same-bucket candidates prefiltered on the estimated jaccard
    (matching-minhash fraction), then verified by true trigram jaccard.
    The permutation/mixer constants are inlined from the SAME
    ``minhash_params()`` the engine uses. ASCII-guarded like the other
    byte-hash oracles (engine hashes UTF-8 bytes; SQL sees codepoints)."""
    from colbert_ray.extras.dedup import minhash_params

    a, b, mixer = minhash_params()
    perm_rows = ",\n    ".join(
        f"({i}, {int(a[i])}::HUGEINT, {int(b[i])}::HUGEINT)"
        for i in range(len(a)))
    mixer_rows = ",\n    ".join(
        f"({bd}, {r}, {int(mixer[bd, r])}::HUGEINT)"
        for bd in range(mixer.shape[0]) for r in range(mixer.shape[1]))
    M64 = "18446744073709551616::HUGEINT"          # 2^64
    M63 = "9223372036854775808::HUGEINT"           # 2^63
    SPLITMIX = "13787848793156543929::HUGEINT"     # 0xBF58476D1CE4E5B9
    return f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN length(text) <> octet_length(encode(text))
              THEN error('non-ascii input to minhash oracle')
              ELSE text END AS text
  FROM documents
),
tri AS (
  SELECT DISTINCT doc_id,
         (ascii(substr(text, j, 1)) * 65536
          + ascii(substr(text, j + 1, 1)) * 256
          + ascii(substr(text, j + 2, 1)))::HUGEINT AS code
  FROM d, LATERAL (SELECT unnest(generate_series(1, len(text) - 2)) AS j) js
),
perm(i, pa, pb) AS (VALUES
    {perm_rows}
),
mh AS (
  SELECT tri.doc_id, perm.i,
         min((perm.pa * tri.code + perm.pb) % {M64}) AS v
  FROM tri CROSS JOIN perm
  GROUP BY tri.doc_id, perm.i
),
mixer(band, r, m) AS (VALUES
    {mixer_rows}
),
bsum AS (
  SELECT mh.doc_id, x.band,
         (sum((mh.v * x.m) % {M64}) % {M64}) AS s
  FROM mh JOIN mixer x ON mh.i = x.band * 8 + x.r
  GROUP BY mh.doc_id, x.band
),
bands AS (
  -- (u * SPLITMIX) mod 2^64 via 32-bit split: u*c = (u>>32)*c*2^32 + (u&m32)*c,
  -- each partial < 2^96 so the INT128 multiply cannot overflow
  SELECT doc_id, band,
         (xor(w::UBIGINT, w::UBIGINT >> 27)::HUGEINT % {M63})::BIGINT
           AS band_hash
  FROM (
    SELECT doc_id, band,
           (((u % 4294967296::HUGEINT) * {SPLITMIX}
             + (((u // 4294967296::HUGEINT) * {SPLITMIX})
                % 4294967296::HUGEINT) * 4294967296::HUGEINT)
            % {M64}) AS w
    FROM (
      SELECT doc_id, band,
             xor(s::UBIGINT, s::UBIGINT >> 30)::HUGEINT AS u
      FROM bsum))
),
bp AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_hash = b.band_hash
              AND a.doc_id < b.doc_id
),
est AS (
  SELECT bp.id_a, bp.id_b,
         count(*) FILTER (WHERE ma.v = mb.v) AS n_match
  FROM bp JOIN mh ma ON ma.doc_id = bp.id_a
          JOIN mh mb ON mb.doc_id = bp.id_b AND mb.i = ma.i
  GROUP BY bp.id_a, bp.id_b
),
cand AS (
  SELECT id_a, id_b FROM est
  WHERE n_match / 64.0 >= (0.8::DOUBLE - 0.15::DOUBLE)
),
tcnt AS (SELECT doc_id, count(*) AS n FROM tri GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS n_common
  FROM cand c JOIN tri ta ON ta.doc_id = c.id_a
              JOIN tri tb ON tb.doc_id = c.id_b AND tb.code = ta.code
  GROUP BY c.id_a, c.id_b
),
ver AS (
  SELECT i.id_a, i.id_b,
         i.n_common::DOUBLE / (ca.n + cb.n - i.n_common)::DOUBLE AS jaccard
  FROM inter i JOIN tcnt ca ON ca.doc_id = i.id_a
               JOIN tcnt cb ON cb.doc_id = i.id_b
)
SELECT id_a, id_b, jaccard FROM ver
WHERE jaccard >= 0.8::DOUBLE
ORDER BY id_a, id_b
"""


# the driver's side-by-side comparison runs at sf0.01 (brief protocol); the
# IVF oracle inlines centroids computed from that table by the SAME seeded
# numpy k-means the query side uses
ORACLE_SF_DIR = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def _ivf_centroids(sf_dir: str) -> np.ndarray:
    """Deterministic IVF centroids for the driver query/oracle pair: the
    pure-numpy ``kmeans_core`` over the embeddings table read in file order
    (no Ray dependency, so query side and SQL-constant side are identical
    by construction)."""
    import pyarrow.parquet as pq

    from colbert_ray.extras.simsearch import _normalize, kmeans_core

    t = pq.read_table(_doc_path(sf_dir, "embeddings"), columns=["embedding"])
    arr = t.column("embedding").combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    offs = arr.offsets.to_numpy(zero_copy_only=False)
    dim = int(offs[1] - offs[0]) if len(offs) > 1 else 0
    m = _normalize(flat.reshape(-1, dim)[:16384])
    return kmeans_core(m, n_centroids=16, n_iter=10, seed=123)


def _ivf_sql() -> str:
    """DuckDB twin of ``ivf_knn`` (nprobe=4, k=5) given FIXED centroids
    (inlined as literals from ``_ivf_centroids`` — 17-significant-digit
    decimals round-trip float64 exactly). Assignment and probe selection
    rank the 6-decimal-ROUNDED cosine with centroid-id tie-break — the same
    float policy the engine applies in ``_assign_buckets``/``_probe_buckets``
    — so bucket decisions cannot flip on summation-order ulps."""
    cents = _ivf_centroids(ORACLE_SF_DIR)
    cent_rows = ",\n    ".join(
        "({}, [{}]::DOUBLE[])".format(
            ci, ", ".join(f"{v:.17g}" for v in cents[ci]))
        for ci in range(len(cents)))
    qids = ", ".join(str(i) for i in KNN_QUERY_IDS)
    return f"""
WITH cents(cid, cv) AS (VALUES
    {cent_rows}
),
q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id IN ({qids})
),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
ad AS (
  SELECT e.vec_id, c.cid,
         round(list_cosine_similarity(e.v, c.cv), 6) AS d
  FROM e CROSS JOIN cents c
),
assign AS (
  SELECT vec_id, cid AS bucket FROM ad
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) = 1
),
qd AS (
  SELECT q.qid, c.cid,
         round(list_cosine_similarity(q.qv, c.cv), 6) AS d
  FROM q CROSS JOIN cents c
),
probe AS (
  SELECT qid, cid FROM qd
  QUALIFY row_number() OVER (PARTITION BY qid ORDER BY d DESC, cid) <= 4
),
sims AS (
  SELECT q.qid, e.vec_id,
         list_cosine_similarity(q.qv, e.v) AS cosine
  FROM q JOIN probe p ON p.qid = q.qid
         JOIN assign a ON a.bucket = p.cid
         JOIN e ON e.vec_id = a.vec_id AND e.vec_id <> q.qid
)
SELECT qid, vec_id,
       row_number() OVER (PARTITION BY qid ORDER BY round(cosine, 6) DESC, vec_id) AS rank,
       round(cosine, 6) AS cosine_r
FROM sims
QUALIFY rank <= 5
ORDER BY qid, rank
"""


def _metrics_sql() -> str:
    """MRR/recall/success of the SQL BM25 top-10 against all-terms qrels."""
    values = ",\n      ".join(
        f"({qid}, '{term}')"
        for qid, text in QUERY_SET
        for term in tokenize_query(text, CFG)[0]
    )
    k1, b = CFG.k1, CFG.b
    return f"""
WITH docs AS (
  SELECT doc_id, {_toks_expr()} AS toks FROM documents
),
stats AS (SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM docs),
tok AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM docs),
tf AS (SELECT doc_id, term, any_value(dl) AS dl, count(*) AS tf
       FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
q(qid, term) AS (VALUES {values}),
qt AS (SELECT qid, count(*) AS nt FROM q GROUP BY qid),
matched AS (
  SELECT q.qid, tf.doc_id, count(*) AS m
  FROM q JOIN tf ON tf.term = q.term GROUP BY q.qid, tf.doc_id
),
qrels AS (
  SELECT matched.qid, matched.doc_id
  FROM matched JOIN qt ON qt.qid = matched.qid AND matched.m = qt.nt
),
judged AS (SELECT DISTINCT qid FROM qrels),
scores AS (
  SELECT q.qid, tf.doc_id AS docid,
         sum( ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
              * tf.tf * ({k1} + 1.0)
              / (tf.tf + {k1} * (1.0 - {b} + {b} * tf.dl / s.avgdl)) ) AS score
  FROM q JOIN df ON df.term = q.term JOIN tf ON tf.term = q.term
  CROSS JOIN stats s
  GROUP BY q.qid, tf.doc_id
),
ranking AS (
  -- float policy: rank by ROUNDED score (matches the engine's re-rank)
  SELECT qid, docid,
         row_number() OVER (PARTITION BY qid
                            ORDER BY round(score, 6) DESC, docid) AS rank
  FROM scores QUALIFY rank <= 10
),
hits AS (
  SELECT r.qid, r.rank,
         EXISTS(SELECT 1 FROM qrels x
                WHERE x.qid = r.qid AND x.doc_id = r.docid) AS rel
  FROM ranking r JOIN judged j ON j.qid = r.qid
),
per_q AS (
  SELECT j.qid,
         coalesce((SELECT 1.0 / min(h.rank) FROM hits h
                   WHERE h.qid = j.qid AND h.rel), 0.0) AS mrr,
         coalesce((SELECT count(*)::DOUBLE FROM hits h
                   WHERE h.qid = j.qid AND h.rel), 0.0)
           / (SELECT count(*) FROM qrels x WHERE x.qid = j.qid) AS recall10,
         coalesce((SELECT max(CASE WHEN h.rank <= 1 AND h.rel THEN 1.0 ELSE 0.0 END)
                   FROM hits h WHERE h.qid = j.qid), 0.0) AS s1,
         coalesce((SELECT max(CASE WHEN h.rank <= 5 AND h.rel THEN 1.0 ELSE 0.0 END)
                   FROM hits h WHERE h.qid = j.qid), 0.0) AS s5
  FROM judged j
)
SELECT round(sum(mrr) / count(*), 6) AS mrr10,
       round(sum(recall10) / count(*), 6) AS recall10,
       round(sum(s1) / count(*), 6) AS success1,
       round(sum(s5) / count(*), 6) AS success5,
       count(*) AS n_judged
FROM per_q
"""


def _passage_bm25_sql() -> str:
    """SQL twin of the passage pipeline: identical word-window split
    (incl. the wrap-around final window), passage-level BM25 with passage
    corpus statistics, then doc = max over its passages."""
    from colbert_ray.functions.tokenizer import sql_tokenize_expr

    values = ",\n      ".join(
        f"({qid}, '{term}')"
        for qid, text in QUERY_SET
        for term in tokenize_query(text, CFG)[0]
    )
    k1, b = CFG.k1, CFG.b
    maxw, stride = PASSAGE_MAX_WORDS, PASSAGE_MAX_WORDS - PASSAGE_OVERLAP
    ptoks = sql_tokenize_expr("ptext", CFG)
    return f"""
WITH wordsrc AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '') AS ws
  FROM documents
),
base AS (SELECT doc_id, ws, len(ws) AS n FROM wordsrc),
single AS (
  SELECT doc_id, 0 AS k, ws AS pw FROM base WHERE n <= {maxw}
),
multi AS (
  SELECT doc_id, kk.k AS k,
         CASE WHEN kk.k < ((n - {maxw}) // {stride}) + 1
              THEN ws[kk.k * {stride} + 1 : kk.k * {stride} + {maxw}]
              ELSE ws[n - {maxw} + 1 : n] END AS pw
  FROM base, LATERAL (
    SELECT unnest(generate_series(0, ((n - {maxw}) // {stride}) + 1)) AS k) kk
  WHERE n > {maxw}
),
passages AS (
  SELECT doc_id * {PASSAGE_PID_BASE} + k AS pid,
         array_to_string(pw, ' ') AS ptext
  FROM (SELECT * FROM single UNION ALL SELECT * FROM multi)
),
pdocs AS (SELECT pid, {ptoks} AS toks FROM passages),
stats AS (SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM pdocs),
tok AS (SELECT pid, len(toks) AS dl, unnest(toks) AS term FROM pdocs),
tf AS (SELECT pid, term, any_value(dl) AS dl, count(*) AS tf
       FROM tok GROUP BY pid, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
q(qid, term) AS (VALUES {values}),
scores AS (
  SELECT q.qid, tf.pid,
         sum( ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
              * tf.tf * ({k1} + 1.0)
              / (tf.tf + {k1} * (1.0 - {b} + {b} * tf.dl / s.avgdl)) ) AS score
  FROM q JOIN df ON df.term = q.term JOIN tf ON tf.term = q.term
  CROSS JOIN stats s
  GROUP BY q.qid, tf.pid
),
docsc AS (
  SELECT qid, pid // {PASSAGE_PID_BASE} AS docid, max(score) AS score
  FROM scores GROUP BY qid, docid
)
SELECT qid::BIGINT AS qid, docid,
       row_number() OVER (PARTITION BY qid ORDER BY round(score, 6) DESC, docid) AS rank,
       round(score, 6) AS score_r
FROM docsc
QUALIFY rank <= 5
ORDER BY qid, rank
"""


def _fingerprint_sql() -> str:
    """Same polynomial-FNV rolling hash as extras/textstats.fingerprints,
    in pure HUGEINT-mod-2^64 arithmetic (hash equality is exact)."""
    from colbert_ray.functions.hashing import FNV_PRIME, sql_fnv1a64_expr

    toks, fnv = _toks_expr(), sql_fnv1a64_expr("term")
    M, B = 1 << 64, int(FNV_PRIME)
    return f"""
WITH d AS (SELECT doc_id, {toks} AS toks FROM documents),
tok AS (
  SELECT doc_id, s.i, toks[s.i] AS term
  FROM d, LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) s
),
th AS (SELECT doc_id, i, {fnv} AS h FROM tok),
agg AS (
  SELECT doc_id,
         list_reduce(list_prepend(0::HUGEINT, list(h ORDER BY i)),
                     (a, x) -> ((a * {B}::HUGEINT + x) % {M}::HUGEINT)) AS f
  FROM th GROUP BY doc_id
)
SELECT d.doc_id,
  CASE WHEN f2 >= {2 ** 63}::HUGEINT THEN (f2 - {M}::HUGEINT)::BIGINT
       ELSE f2::BIGINT END AS fingerprint
FROM (SELECT d.doc_id, coalesce(agg.f, 0::HUGEINT) AS f2
      FROM d LEFT JOIN agg USING (doc_id)) d
ORDER BY doc_id
"""


WINNOW_K = 5
WINNOW_W = 4
CLONE_MIN_SHARED = 2


def _q_winnow_fingerprints(sf_dir: str) -> pd.DataFrame:
    """Winnowed k-gram fingerprints (extras/dedup.winnow_fingerprints):
    the MOSS local-fingerprint selection — every w-gram window keeps its
    leftmost-minimum k-gram polynomial-FNV hash; distinct (doc, fp)."""
    ds = x_dedup.winnow_fingerprints(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        k=WINNOW_K, w=WINNOW_W)
    return (ds.to_pandas().sort_values(["doc_id", "fp"])
            .reset_index(drop=True))


def _q_code_clone_pairs(sf_dir: str) -> pd.DataFrame:
    """MOSS-style clone pairs (extras/dedup.code_clone_pairs): docs sharing
    >= 2 distinct winnowed fingerprints — partial-overlap near-dup mining
    via ONE groupby(fp) shuffle of 16-byte rows, never the text."""
    t = x_dedup.code_clone_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        k=WINNOW_K, w=WINNOW_W, min_shared=CLONE_MIN_SHARED)
    return t.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)


def _winnow_cte() -> str:
    """Shared winnowing CTE chain: per-doc token FNV hashes -> k-gram
    Horner hashes (HUGEINT mod 2^64) -> per-window leftmost-minimum
    selection (ORDER BY gh, gi mirrors the engine's argmin tie-break);
    docs with fewer than w grams get one clipped window."""
    from colbert_ray.functions.hashing import FNV_PRIME, sql_fnv1a64_expr

    toks, fnv = _toks_expr(), sql_fnv1a64_expr("term")
    M, B, k, w = 1 << 64, int(FNV_PRIME), WINNOW_K, WINNOW_W
    return f"""
d AS (SELECT doc_id, {toks} AS toks FROM documents),
tok AS (
  SELECT doc_id, s.i, toks[s.i] AS term
  FROM d, LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) s
),
th AS (SELECT doc_id, i, {fnv} AS h FROM tok),
hl AS (SELECT doc_id, list(h ORDER BY i) AS hs FROM th GROUP BY doc_id),
kg AS (
  SELECT hl.doc_id, s.i AS gi,
         list_reduce(list_prepend(0::HUGEINT, hs[s.i:s.i + {k - 1}]),
                     (a, x) -> ((a * {B}::HUGEINT + x) % {M}::HUGEINT)) AS gh
  FROM hl, LATERAL (
    SELECT unnest(generate_series(1, len(hs) - {k} + 1)) AS i) s
),
ng AS (SELECT doc_id, count(*) AS n FROM kg GROUP BY doc_id),
wins AS (
  SELECT kg.doc_id, t.t, kg.gi, kg.gh
  FROM ng, LATERAL (
    SELECT unnest(generate_series(1, greatest(1, ng.n - {w} + 1))) AS t) t
  JOIN kg ON kg.doc_id = ng.doc_id
         AND kg.gi BETWEEN t.t AND t.t + {w} - 1
),
sel AS (
  SELECT doc_id, t, gi, gh FROM wins
  QUALIFY row_number() OVER (PARTITION BY doc_id, t ORDER BY gh, gi) = 1
),
fps AS (
  SELECT DISTINCT doc_id,
         CASE WHEN gh >= {2 ** 63}::HUGEINT
              THEN (gh - {M}::HUGEINT)::BIGINT ELSE gh::BIGINT END AS fp
  FROM sel
)"""


def _winnow_sql() -> str:
    return f"WITH {_winnow_cte()}\nSELECT doc_id, fp FROM fps ORDER BY doc_id, fp"


def _clone_pairs_sql() -> str:
    return f"""
WITH {_winnow_cte()}
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS n_shared
FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= {CLONE_MIN_SHARED}
ORDER BY id_a, id_b
"""


def _simhash_sql() -> str:
    """Same 63-bit SimHash as extras/dedup.simhash (FNV token hashes,
    tf-weighted ±1 bit votes) in SQL."""
    from colbert_ray.functions.hashing import sql_fnv1a64_expr

    toks, fnv = _toks_expr(), sql_fnv1a64_expr("term")
    pw = ", ".join(f"({b}, {2 ** b}::HUGEINT)" for b in range(63))
    return f"""
WITH d AS (SELECT doc_id, {toks} AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS term FROM d),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
th AS (SELECT doc_id, tf, {fnv} AS h FROM tf),
pw(b, p) AS (VALUES {pw}),
s AS (SELECT doc_id, pw.b, any_value(pw.p) AS p,
             sum(tf * (2 * ((h // pw.p) % 2) - 1)) AS sgn
      FROM th CROSS JOIN pw GROUP BY doc_id, pw.b),
sig AS (SELECT doc_id, sum(CASE WHEN sgn > 0 THEN p::BIGINT ELSE 0 END) AS simhash
        FROM s GROUP BY doc_id)
SELECT d.doc_id, coalesce(sig.simhash, 0)::BIGINT AS simhash
FROM d LEFT JOIN sig USING (doc_id) ORDER BY doc_id
"""


def _lang_id_sql() -> str:
    """Marker-word voting with first-alphabetical tie-break, mirroring
    extras/textstats.lang_id exactly."""
    from colbert_ray.extras.textstats import _LANG_MARKERS

    toks = _toks_expr()
    langs = sorted(_LANG_MARKERS)

    def lst(lang):
        return "[" + ", ".join(f"'{w}'" for w in sorted(_LANG_MARKERS[lang])) + "]"

    votes = ",\n  ".join(
        f"len(list_filter(toks, t -> list_contains({lst(lang)}, t))) AS v_{lang}"
        for lang in langs)
    branches = []
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(f"v_{lang} >= v_{r}" for r in langs[i + 1:])
        branches.append(f"WHEN {conds} THEN '{lang}'")
    case = ("CASE WHEN greatest(" + ", ".join(f"v_{lang}" for lang in langs)
            + ") = 0 THEN 'unknown' " + " ".join(branches)
            + f" ELSE '{langs[-1]}' END")
    return f"""
WITH d AS (SELECT doc_id, {toks} AS toks FROM documents),
v AS (SELECT doc_id,
  {votes}
FROM d)
SELECT doc_id, {case} AS pred_lang FROM v ORDER BY doc_id
"""


def _pii_sql() -> str:
    """Exact DuckDB twin of extras/redact.redact_pii over the PII-augmented
    text: DuckDB's regexp_* are RE2 like pyarrow's, so the module patterns
    are embedded verbatim and both sides run the same automaton, counting
    (non-overlapping) then replacing in the same email->phone->ipv4 order."""
    from colbert_ray.extras.redact import REDACTIONS

    (e_name, e_re, e_rep), (p_name, p_re, p_rep), (i_name, i_re, i_rep) = \
        REDACTIONS
    return f"""
WITH aug AS (SELECT doc_id, {_PII_AUG_SQL} AS t0 FROM documents),
s1 AS (SELECT doc_id,
              len(regexp_extract_all(t0, '{e_re}'))::BIGINT AS n_{e_name},
              regexp_replace(t0, '{e_re}', '{e_rep}', 'g') AS t1 FROM aug),
s2 AS (SELECT doc_id, n_{e_name},
              len(regexp_extract_all(t1, '{p_re}'))::BIGINT AS n_{p_name},
              regexp_replace(t1, '{p_re}', '{p_rep}', 'g') AS t2 FROM s1),
s3 AS (SELECT doc_id, n_{e_name}, n_{p_name},
              len(regexp_extract_all(t2, '{i_re}'))::BIGINT AS n_{i_name},
              regexp_replace(t2, '{i_re}', '{i_rep}', 'g') AS t3 FROM s2)
SELECT doc_id, n_{e_name}, n_{p_name}, n_{i_name}, t3 AS clean_text
FROM s3 ORDER BY doc_id
"""


def _fuzzy_pairs_sql() -> str:
    """Plain-definition twin of extras/dedup.fuzzy_term_pairs (levenshtein
    over the distinct part-name vocabulary self-join)."""
    from colbert_ray.extras.dedup import sql_fuzzy_pairs_expr

    return sql_fuzzy_pairs_expr(table="part", text_col="p_name")


def _curate_sql() -> str:
    """Exact CTE-chain twin of extras/curate.curate_corpus: the normalize /
    LM-NLL / gate / dedup stages compose the already-proven normalized_text,
    unigram_nll and exact_dedup twins; gates compare against the ROUND-6 nll
    on both sides and stats are constant within a normalized-text group."""
    from colbert_ray.extras.curate import MAX_NLL, MAX_TOKENS, MIN_TOKENS
    from colbert_ray.functions.tokenizer import sql_tokenize_expr

    tok = sql_tokenize_expr("nt", CFG)
    return f"""
WITH n AS (SELECT doc_id,
                  trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
           FROM documents),
toks AS (SELECT doc_id, unnest({tok}) AS term FROM n),
cf AS (SELECT term, count(*)::DOUBLE AS c FROM toks GROUP BY term),
tot AS (SELECT count(*)::DOUBLE AS nn FROM toks),
per AS (SELECT doc_id, term, count(*)::DOUBLE AS tf
        FROM toks GROUP BY doc_id, term),
stats AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
                 round(sum(tf * -ln(c / (SELECT nn FROM tot))) / sum(tf), 6)
                 AS nll
          FROM per JOIN cf USING (term) GROUP BY doc_id),
kept AS (SELECT s.doc_id, s.n_tokens, s.nll, n.nt
         FROM stats s JOIN n USING (doc_id)
         WHERE s.n_tokens >= {MIN_TOKENS} AND s.n_tokens <= {MAX_TOKENS}
           AND s.nll <= {MAX_NLL})
SELECT min(doc_id) AS doc_id, min(n_tokens) AS n_tokens, min(nll) AS nll,
       count(*)::BIGINT AS dup_count
FROM kept GROUP BY nt ORDER BY doc_id
"""


def _frequent_terms_sql() -> str:
    """Exact-definition twin of extras/sketches.frequent_terms (the two-pass
    scheme is an execution strategy; the semantics are the plain global
    HAVING cnt * capacity > total)."""
    from colbert_ray.extras.sketches import sql_frequent_terms_expr

    return sql_frequent_terms_expr(table="documents", text_col="text",
                                   capacity=FREQ_CAPACITY)


def oracle_sql() -> dict[str, str]:
    toks = _toks_expr()
    stop = x_text.sql_stopword_list()
    return {
        "bm25_top10": _bm25_sql(),
        "lm_dirichlet_top10": _ql_sql(),
        "corrected_bm25_top10": _corrected_bm25_sql(),
        "pruned_bm25_top10": _pruned_bm25_sql(),
        "updated_bm25_top10": _updated_bm25_sql(),
        "compacted_bm25_top10": _compacted_bm25_sql(),
        "merged_bm25_top10": _bm25_sql(),   # merge == single union build
        "rrf_bm25_ql_top5": _rrf_sql(),
        "rm3_bm25_top10": _rm3_sql(),
        "search_snippets": _snippets_sql(),
        "proximity_top10": _proximity_sql(),
        "search_facets": f"""
WITH bm AS ({_bm25_sql()})
SELECT bm.qid, d.lang, d.source, count(*) AS n_docs
FROM bm JOIN documents d ON d.doc_id = bm.docid
GROUP BY bm.qid, d.lang, d.source
ORDER BY bm.qid, d.lang, d.source
""",
        "bm25f_top10": _bm25f_sql(),
        "bm25_explain": _bm25_explain_sql(),
        "ltr_features": _ltr_features_sql(),
        "suggest_terms": _suggest_terms_sql(),
        "bm25_top10_bmw": _bm25_sql(),       # BMW pruning is exact
        "bm25_top10_pfor": _bm25_sql(),      # codec changes bytes, not content
        "bm25_top10_ef": _bm25_sql(),        # codec changes bytes, not content
        "dsl_search_top10": _dsl_search_sql(),
        "percolate_matches": _percolate_sql(),
        "synonym_bm25_top10": _synonym_bm25_sql(),
        "paged_bm25_pages23": _paged_bm25_sql(),
        "collapsed_by_lang_top5": _collapsed_sql(),
        "rescored_bm25_top10": _rescored_sql(),
        "significant_terms_top10": _sigterms_sql(),
        "funcscore_bm25_top10": _funcscore_sql(),
        "term_vectors_docs": _term_vectors_sql(),
        "msm_bm25_top10": _msm_sql(),
        "match_stats": _match_stats_sql(),
        "sampled_bm25_matches": _sampled_matches_sql(),
        "bm25_top10_sharded": _bm25_sql(),   # sharding must not change results
        "passage_bm25_top5": _passage_bm25_sql(),
        "phrase_search_top10": x_phrase.sql_phrase_search(
            "documents", PHRASE_QUERY, 10, CFG),
        "boolean_and_docs": x_phrase.sql_conjunctive_docs(
            "documents", BOOL_TERMS, CFG),
        "corpus_stats": f"""
SELECT count(*) AS n_docs,
       sum(len(toks))::BIGINT AS total_tokens,
       round(avg(len(toks)), 6) AS avgdl
FROM (SELECT {toks} AS toks FROM documents)
""",
        "term_df_top100": f"""
WITH tok AS (
  SELECT doc_id, unnest({toks}) AS term FROM documents
)
SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf
FROM tok GROUP BY term
ORDER BY df DESC, term
LIMIT 100
""",
        "token_counts": f"""
SELECT doc_id,
       len(toks) AS n_tokens,
       len(list_distinct(toks)) AS n_unique_terms
FROM (SELECT doc_id, {toks} AS toks FROM documents)
ORDER BY doc_id
""",
        "span_dedup_docs": _span_dedup_sql(),
        "packed_sequences": _packed_sequences_sql(),
        "packed_seq_text": _packed_seq_text_sql(),
        "bpe_merges": _bpe_merges_sql(),
        "bpe_token_counts": _bpe_token_counts_sql(),
        "bigram_nll": _bigram_nll_sql(),
        "oov_rate": _oov_rate_sql(),
        "char_entropy": _char_entropy_sql(),
        "lang_kl": _lang_kl_sql(),
        "quality_percentiles": _quality_percentiles_sql(),
        "lang_mixture_weights": _lang_mixture_sql(),
        "curation_v2_stats": _curation_v2_sql(),
        "exact_dedup": """
SELECT min(doc_id) AS doc_id, count(*) AS dup_count
FROM documents GROUP BY text ORDER BY doc_id
""",
        "clean_corpus_stats": f"""
WITH scored AS (
  SELECT doc_id, text,
         len(toks) AS n_tokens,
         len(list_filter(toks, t -> list_contains({stop}, t)))::DOUBLE
           / greatest(1, len(toks)) AS stop_ratio
  FROM (SELECT doc_id, text, {toks} AS toks FROM documents)
),
kept AS (
  SELECT doc_id, text, n_tokens FROM scored
  WHERE n_tokens >= 10 AND stop_ratio < 0.5
),
dedup AS (
  SELECT min(doc_id) AS doc_id, any_value(n_tokens) AS n_tokens
  FROM kept GROUP BY text
)
SELECT count(*) AS n_docs,
       sum(n_tokens)::BIGINT AS total_tokens,
       round(avg(n_tokens), 6) AS avg_tokens
FROM dedup
""",
        "quality_scores": f"""
SELECT doc_id,
       len(toks) AS n_tokens,
       len(text) AS n_chars,
       round(len(list_filter(toks, t -> list_contains({stop}, t)))::DOUBLE
             / greatest(1, len(toks)), 6) AS stopword_ratio,
       round(list_sum(list_transform(toks, t -> len(t)))::DOUBLE
             / greatest(1, len(toks)), 6) AS mean_token_len
FROM (SELECT doc_id, text, {toks} AS toks FROM documents)
ORDER BY doc_id
""",
        "lang_doc_counts": """
SELECT lang, count(*) AS n_docs, round(avg(n_chars), 6) AS avg_chars
FROM documents GROUP BY lang ORDER BY lang
""",
        # bigram i (1-based) = toks[i] || ' ' || toks[i+1]; range(1, max(n,1))
        # is empty for n_tokens <= 1, mirroring the engine's 0.0 default
        "repetition_stats": f"""
WITH d AS (SELECT doc_id, {toks} AS toks FROM documents),
b AS (
  SELECT doc_id, toks, len(toks) AS n_tokens,
         list_transform(range(1, greatest(len(toks), 1)),
                        i -> toks[i] || ' ' || toks[i + 1]) AS bigrams
  FROM d
)
SELECT doc_id, n_tokens,
       round(CASE WHEN n_tokens = 0 THEN 0.0
             ELSE 1.0 - len(list_distinct(toks))::DOUBLE / n_tokens END,
             6) AS dup_word_frac,
       round(CASE WHEN len(bigrams) = 0 THEN 0.0
             ELSE 1.0 - len(list_distinct(bigrams))::DOUBLE / len(bigrams) END,
             6) AS dup_2gram_frac
FROM b ORDER BY doc_id
""",
        "jaccard_dup_pairs": _jaccard_sql(),
        "containment_pairs": _containment_sql(),
        "containment_prefix_pairs": _containment_prefix_sql(),
        "jaccard_prefix_pairs": _jaccard_prefix_sql(),
        "dup_clusters": f"""
WITH RECURSIVE p AS ({_jaccard_sql()}),
e AS (SELECT id_a AS u, id_b AS v FROM p UNION SELECT id_b, id_a FROM p),
reach(n, m) AS (
  SELECT u, u FROM e
  UNION
  SELECT e.u, r.m FROM e JOIN reach r ON e.v = r.n
)
SELECT n AS doc_id, min(m) AS cluster_id FROM reach
GROUP BY n ORDER BY doc_id
""",
        "dup_spans": _dup_spans_sql(),
        "contaminated_docs": _contam_sql(),
        "knn_cosine_top5": _knn_sql(),
        "more_like_this": _mlt_sql(),
        "hybrid_mlt_top5": _hybrid_mlt_sql(),
        "mmr_knn_top5": _mmr_sql(),
        "rplsh_dup_pairs": _rplsh_sql(),
        "mutual_knn_pairs": _mutual_knn_sql(),
        "mutual_knn_ivf_pairs": _mutual_knn_ivf_sql(),
        "image_ahash": _image_ahash_sql(),
        "video_dup_pairs": _video_dup_sql(),
        "audio_fingerprints": _audio_fp_sql(),
        "audio_dup_groups": _audio_dup_groups_sql(),
        "video_dup_clusters": _video_dup_clusters_sql(),
        "ahash_dup_pairs": _ahash_pairs_sql(),
        "ahash_banded_pairs": _ahash_pairs_sql(),
        "embedding_dup_pairs": f"""
WITH t AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id < {EMB_DUP_MAX_ID}
),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(list_cosine_similarity(a.v, b.v), 6) AS cosine_r
  FROM t a JOIN t b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, cosine_r FROM p
WHERE cosine_r >= {EMB_DUP_THRESHOLD}
ORDER BY id_a, id_b
""",
        # population covariance, textbook E[xy] - E[x]E[y] on BOTH sides so
        # round-6 absorbs summation-order drift (engine sums float64 partials)
        "embedding_covariance": """
WITH u AS (
  SELECT vec_id,
         unnest(generate_series(0, len(embedding) - 1)) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings
)
SELECT a.pos AS i, b.pos AS j,
       round(avg(a.val * b.val) - avg(a.val) * avg(b.val), 6) AS cov_r
FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.pos <= b.pos
GROUP BY a.pos, b.pos ORDER BY i, j
""",
        # floor(x/scale + 0.5) is the engine's half-up rule verbatim; code
        # sums are exact integers, so this twin is bit-exact (no rounding)
        "embedding_int8": """
WITH u AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS val
           FROM embeddings),
s AS (SELECT vec_id, max(abs(val)) / 127 AS scale FROM u GROUP BY vec_id),
q AS (SELECT u.vec_id, CASE WHEN s.scale = 0 THEN 0
                            ELSE floor(u.val / s.scale + 0.5) END AS qv,
             s.scale
      FROM u JOIN s USING (vec_id))
SELECT vec_id, CAST(sum(qv) AS BIGINT) AS sum_q,
       CAST(sum(qv * qv) AS BIGINT) AS sum_q2,
       round(any_value(scale), 6) AS scale_r
FROM q GROUP BY vec_id ORDER BY vec_id
""",
        "knn_q8_top5": _knn_q8_sql(),
        "pq_adc_top5": _pq_sql(),
        "ivfpq_top5": _ivfpq_sql(),
        "cust_supp_pagerank": _pagerank_sql(),
        "supply_chain_hops": _bfs_sql(),
        "term_triangles": _triangles_sql(),
        "retrieval_metrics": _metrics_sql(),
        "ndcg10": _ndcg_sql(),
        "minhash_dup_pairs": _minhash_sql(),
        "ivf_knn_top5": _ivf_sql(),
        "fingerprints": _fingerprint_sql(),
        "pii_redaction": _pii_sql(),
        "normalized_text": """
WITH n AS (SELECT doc_id,
                  trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))
                  AS norm_text
           FROM documents)
SELECT doc_id, norm_text, length(norm_text)::BIGINT AS n_chars_norm
FROM n ORDER BY doc_id
""",
        "frequent_terms": _frequent_terms_sql(),
        "fuzzy_term_pairs": _fuzzy_pairs_sql(),
        "ohlc_hourly": """
WITH e AS (SELECT user_id, epoch_us(ts) // 3600000000 AS hour,
                  ts, event_id, value
           FROM events)
SELECT user_id, CAST(hour AS BIGINT) AS hour,
       first(value ORDER BY ts, event_id) AS open,
       max(value) AS high,
       min(value) AS low,
       last(value ORDER BY ts, event_id) AS close,
       count(*)::BIGINT AS n_events,
       round(sum(value), 6) AS volume
FROM e GROUP BY user_id, hour ORDER BY user_id, hour
""",
        # quantile_cont uses the same (n-1)q linear-interpolation rule as
        # user_value_quantiles_cont (round-6 both sides, float policy)
        "curated_corpus": _curate_sql(),
        "user_quantiles_cont": """
SELECT user_id, count(*)::BIGINT AS n_events,
       round(quantile_cont(value, 0.25), 6) AS p25c,
       round(quantile_cont(value, 0.50), 6) AS p50c,
       round(quantile_cont(value, 0.75), 6) AS p75c
FROM events GROUP BY user_id ORDER BY user_id
""",
        "unigram_nll": f"""
WITH toks AS (SELECT doc_id, unnest({_toks_expr()}) AS term FROM documents),
cf AS (SELECT term, count(*)::DOUBLE AS c FROM toks GROUP BY term),
tot AS (SELECT count(*)::DOUBLE AS n FROM toks),
per AS (SELECT doc_id, term, count(*)::DOUBLE AS tf
        FROM toks GROUP BY doc_id, term)
SELECT doc_id,
       CAST(sum(tf) AS BIGINT) AS n_tokens,
       round(sum(tf * -ln(c / (SELECT n FROM tot))) / sum(tf), 6) AS nll
FROM per JOIN cf USING (term)
GROUP BY doc_id ORDER BY doc_id
""",
        # same raw-moment formula as grouped_corr (NOT corr()) — one shared
        # arithmetic path, round-6 (float policy)
        "corr_qty_price": """
WITH m AS (SELECT l_returnflag,
                  count(*)::DOUBLE AS n,
                  sum(l_quantity::DOUBLE) AS sx,
                  sum(l_extendedprice::DOUBLE) AS sy,
                  sum(l_quantity::DOUBLE * l_quantity::DOUBLE) AS sxx,
                  sum(l_extendedprice::DOUBLE * l_extendedprice::DOUBLE) AS syy,
                  sum(l_quantity::DOUBLE * l_extendedprice::DOUBLE) AS sxy
           FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
       CASE WHEN (n*sxx - sx*sx) > 0 AND (n*syy - sy*sy) > 0
            THEN round((n*sxy - sx*sy) /
                       sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)), 6)
            ELSE NULL END AS corr_xy
FROM m ORDER BY l_returnflag
""",
        "event_gaps": """
SELECT event_id, user_id,
       (epoch_us(ts) - epoch_us(lag(ts) OVER
            (PARTITION BY user_id ORDER BY ts, event_id)))::BIGINT AS gap_us
FROM events
QUALIFY lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NOT NULL
ORDER BY event_id
""",
        "simhash64": _simhash_sql(),
        "simhash_dup_pairs": _simhash_pairs_sql(),
        "winnow_fingerprints": _winnow_sql(),
        "code_clone_pairs": _clone_pairs_sql(),
        "lang_id_pred": _lang_id_sql(),
        # the decode stub tiles payload bytes into the 8x8x3 pixel grid, so
        # pixel_mean is the mean of the first 192 cyclically-tiled bytes
        "media_dedup": """
WITH pay AS (
  SELECT doc_id AS item_id, text FROM documents WHERE doc_id < 240
  UNION ALL
  SELECT 1000 + doc_id // 15 AS item_id, text
  FROM documents WHERE doc_id < 240 AND doc_id % 15 = 0
)
SELECT min(item_id) AS item_id, count(*) AS n_copies
FROM pay GROUP BY text ORDER BY item_id
""",
        "media_features": """
WITH d AS (SELECT doc_id AS item_id,
                  CASE WHEN length(text) <> octet_length(encode(text))
                       THEN error('non-ascii input to media_features oracle')
                       ELSE text END AS text
           FROM documents ORDER BY doc_id LIMIT 256),
px AS (
  SELECT item_id,
         len(text)::BIGINT AS n_bytes,
         CASE WHEN len(text) = 0 THEN 0.0
              ELSE (SELECT avg(ascii(substr(d.text, ((i - 1) % len(d.text))::INT + 1, 1)))
                    FROM (SELECT unnest(generate_series(1, 192)) AS i))
         END AS pm
  FROM d)
SELECT item_id, n_bytes, round(pm, 6) AS pixel_mean, TRUE AS decoded
FROM px ORDER BY item_id
""",
        # video stub: frame i = 192 payload bytes read cyclically from
        # offset i*37; n_frames = 4 + len % 28; picks = range(0, nf, 4)[:4]
        "video_frame_sample": """
WITH d AS (SELECT doc_id AS item_id,
                  CASE WHEN length(text) <> octet_length(encode(text))
                       THEN error('non-ascii input to video oracle')
                       ELSE text END AS text
           FROM documents ORDER BY doc_id LIMIT 128),
f AS (SELECT item_id, text, len(text) AS n, 4 + len(text) % 28 AS nf FROM d),
frames AS (
  SELECT item_id, text, n, (k.k * 4)::INT AS frame_idx
  FROM f, LATERAL (
    SELECT unnest(generate_series(0, least(3, (nf - 1) // 4))) AS k) k
),
m AS (
  SELECT item_id, frame_idx,
         CASE WHEN n = 0 THEN 0.0
              ELSE (SELECT avg(ascii(substr(frames.text,
                        ((frames.frame_idx * 37 + j) % frames.n)::INT + 1, 1)))
                    FROM (SELECT unnest(generate_series(0, 191)) AS j))
         END AS fm
  FROM frames
)
SELECT item_id, frame_idx, round(fm, 6) AS frame_mean
FROM m ORDER BY item_id, frame_idx
""",
        "pricing_summary": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_revenue,
       round(avg(l_quantity), 6) AS avg_qty,
       count(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
        "weighted_sample_docs": _weighted_sample_sql(),
        "session_paths": """
WITH d AS (
  SELECT user_id, ts, event_type, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts, event_type, event_id,
         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM d
)
SELECT user_id, session_id,
       string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
       count(*) AS n_events
FROM s GROUP BY user_id, session_id
ORDER BY user_id, session_id
""",
        "event_ntiles": """
SELECT event_id, user_id,
       ntile(4) OVER (PARTITION BY user_id ORDER BY ts, event_id)::BIGINT AS tile
FROM events ORDER BY event_id
""",
        "suppliers_per_region": """
SELECT r.r_name, count(*) AS n_suppliers,
       round(sum(s.s_acctbal), 4) AS sum_bal
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY r.r_name ORDER BY r.r_name
""",
        "top_terms_per_lang": f"""
WITH tok AS (
  SELECT lang, unnest({_toks_expr()}) AS term FROM documents
),
cnt AS (
  SELECT lang, term, count(*) AS cnt FROM tok GROUP BY lang, term
)
SELECT lang, term, cnt,
       row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, term) AS rank
FROM cnt
QUALIFY rank <= 5
ORDER BY lang, rank
""",
        "event_type_unpivot": """
SELECT u.user_id, t.event_type, count(e.user_id) AS n
FROM (SELECT user_id FROM events GROUP BY user_id) u
CROSS JOIN (VALUES ('click'), ('error'), ('purchase'),
                   ('signup'), ('view')) t(event_type)
LEFT JOIN events e ON e.user_id = u.user_id AND e.event_type = t.event_type
GROUP BY u.user_id, t.event_type
ORDER BY u.user_id, t.event_type
""",
        "event_type_pivot": """
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click') AS n_click,
       count(*) FILTER (WHERE event_type = 'error') AS n_error,
       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
       count(*) FILTER (WHERE event_type = 'view') AS n_view
FROM events GROUP BY user_id ORDER BY user_id
""",
        # engine cumsum is strictly sequential per user; DuckDB's windowed
        # sum may tree-aggregate — round-6 absorbs the accumulation drift
        "running_total": """
SELECT user_id, event_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING), 6) AS running_r
FROM events ORDER BY user_id, event_id
""",
        # engine Chan-combined (n, mean, M2) moments vs DuckDB window aggs:
        # round-6 absorbs accumulation-order drift on O(1) z values;
        # (l_orderkey, l_linenumber) is non-unique, hence z_r in the sort
        "zscore_quantity": """
SELECT l_orderkey, l_linenumber,
       round(CASE WHEN stddev_pop(l_quantity) OVER w = 0 THEN 0
                  ELSE (l_quantity - avg(l_quantity) OVER w)
                       / stddev_pop(l_quantity) OVER w END, 6) AS z_r
FROM lineitem WINDOW w AS (PARTITION BY l_returnflag)
ORDER BY l_orderkey, l_linenumber, z_r
""",
        # engine re-derives coarser levels from the finest grouped frame;
        # round-2 on both sides absorbs summation-order drift
        "pricing_rollup": """
SELECT coalesce(l_returnflag, '') AS l_returnflag,
       coalesce(l_linestatus, '') AS l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS lvl,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_revenue,
       count(*) AS count_order
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
ORDER BY lvl, l_returnflag, l_linestatus
""",
        "pricing_cube": """
SELECT coalesce(l_returnflag, '') AS l_returnflag,
       coalesce(l_linestatus, '') AS l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS lvl,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_revenue,
       count(*) AS count_order
FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
ORDER BY lvl, l_returnflag, l_linestatus
""",
        "order_skyline": """
WITH g AS (
  SELECT o_totalprice AS p, min(o_orderdate) AS dmin
  FROM orders GROUP BY o_totalprice
),
w AS (
  SELECT p, dmin,
         min(dmin) OVER (ORDER BY p DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS best_d
  FROM g
)
SELECT o.o_orderkey, round(o.o_totalprice, 2) AS o_totalprice, o.o_orderdate
FROM orders o JOIN w ON o.o_totalprice = w.p AND o.o_orderdate = w.dmin
WHERE w.best_d IS NULL OR w.best_d > w.dmin
ORDER BY o_orderkey
""",
        "top_revenue_orders": """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-06-15'
  AND l_shipdate > TIMESTAMP '1998-06-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
        "validate_orders": _validate_sql(),
        "price_hist_quantiles": _hist_sql(),
        "user_mode_event": """
WITH c AS (SELECT user_id, event_type, count(*)::BIGINT AS n
           FROM events GROUP BY user_id, event_type)
SELECT user_id, event_type AS mode_type, n
FROM c
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY n DESC, event_type) = 1
ORDER BY user_id
""",
        "label_centroids": """
WITH e AS (
  SELECT label, t.dim - 1 AS dim,
         CAST(embedding[t.dim] AS DOUBLE) AS v
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(dim)
)
SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
       round(sum(v) / count(*), 6) AS mean_r,
       count(*)::BIGINT AS n
FROM e GROUP BY label, dim
ORDER BY label, dim
""",
        "event_transitions": """
WITH s AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events
),
pairs AS (
  SELECT event_type AS from_type, nxt AS to_type, count(*)::BIGINT AS n
  FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2
),
tot AS (SELECT from_type, sum(n) AS tn FROM pairs GROUP BY from_type)
SELECT p.from_type, p.to_type, p.n,
       round(p.n::DOUBLE / t.tn::DOUBLE, 6) AS p_r
FROM pairs p JOIN tot t USING (from_type)
ORDER BY from_type, to_type
""",
        "user_click_purchase": """
WITH c AS (SELECT user_id, count(*)::BIGINT AS n_clicks
           FROM events WHERE event_type = 'click' GROUP BY user_id),
p AS (SELECT user_id, count(*)::BIGINT AS n_purchases
      FROM events WHERE event_type = 'purchase' GROUP BY user_id)
SELECT COALESCE(c.user_id, p.user_id) AS user_id,
       COALESCE(n_clicks, 0)::BIGINT AS n_clicks,
       COALESCE(n_purchases, 0)::BIGINT AS n_purchases
FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
ORDER BY user_id
""",
        "customer_order_activity": """
SELECT c_custkey, c_name,
       COALESCE(o.n_orders, 0)::BIGINT AS n_orders,
       round(COALESCE(o.total_spent, 0.0), 2) AS total_spent
FROM customer LEFT JOIN (
  SELECT o_custkey, count(*)::BIGINT AS n_orders,
         sum(o_totalprice) AS total_spent
  FROM orders GROUP BY o_custkey) o ON o.o_custkey = c_custkey
ORDER BY c_custkey
""",
        "returned_revenue_by_customer": """
SELECT c.c_custkey, any_value(c.c_name) AS c_name,
       any_value(n.n_name) AS n_name,
       any_value(c.c_acctbal) AS c_acctbal,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM customer c, orders o, lineitem l, nation n
WHERE c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01'
  AND l.l_returnflag = 'R' AND c.c_nationkey = n.n_nationkey
GROUP BY c.c_custkey
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
        "session_funnel": """
WITH d AS (
  SELECT user_id, ts, event_type, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts, event_type,
         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
  FROM d
),
t1 AS (
  SELECT user_id, sid, min(ts) AS t1 FROM s
  WHERE event_type = 'view' GROUP BY user_id, sid
),
t2 AS (
  SELECT s.user_id, s.sid, min(s.ts) AS t2
  FROM s JOIN t1 ON t1.user_id = s.user_id AND t1.sid = s.sid
  WHERE s.event_type = 'click' AND s.ts >= t1.t1
  GROUP BY s.user_id, s.sid
),
t3 AS (
  SELECT DISTINCT s.user_id, s.sid
  FROM s JOIN t2 ON t2.user_id = s.user_id AND t2.sid = s.sid
  WHERE s.event_type = 'purchase' AND s.ts >= t2.t2
)
SELECT (SELECT count(*) FROM (SELECT DISTINCT user_id, sid FROM s)) AS n_sessions,
       (SELECT count(*) FROM t1) AS n_s1,
       (SELECT count(*) FROM t2) AS n_s12,
       (SELECT count(*) FROM t3) AS n_s123
""",
        "cohort_retention": """
WITH wk AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week
  FROM events
),
first AS (
  SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY user_id
)
SELECT f.cohort_week, wk.week - f.cohort_week AS week_offset,
       count(*) AS n_users
FROM wk JOIN first f USING (user_id)
GROUP BY f.cohort_week, week_offset
ORDER BY cohort_week, week_offset
""",
        "late_events": """
WITH w AS (
  SELECT event_type, ts,
         max(ts) OVER (ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
  FROM events
)
SELECT event_type,
       coalesce(CAST(sum(CASE WHEN hwm IS NOT NULL
                               AND ts < hwm - INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END) AS BIGINT), 0) AS n_late,
       count(*) AS n_events
FROM w GROUP BY event_type ORDER BY event_type
""",
        "props_value_stats": """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_v,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_v,
       round(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
             / count(*), 6) AS avg_v
FROM events
WHERE json_extract_string(props, '$.k') IS NOT NULL
GROUP BY event_type ORDER BY event_type
""",
        "user_value_quantiles": """
SELECT user_id,
       round(quantile_disc(value, 0.5), 6) AS p50,
       round(quantile_disc(value, 0.9), 6) AS p90,
       count(*) AS n_events
FROM events GROUP BY user_id ORDER BY user_id
""",
        "event_sessions": """
WITH d AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts,
         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM d
)
SELECT user_id, session_id,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events
FROM s GROUP BY user_id, session_id
ORDER BY user_id, session_id
""",
        "purchase_attribution": """
SELECT e.user_id, e.event_id, e.ts,
       c.event_id AS click_event_id, c.ts AS click_ts,
       (epoch_us(e.ts) - epoch_us(c.ts)) AS lag_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') e
ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON e.user_id = c.user_id AND e.ts > c.ts
ORDER BY e.user_id, e.event_id
""",
        "click_conversions": """
SELECT a.user_id, a.event_id AS click_event_id,
       b.event_id AS purchase_event_id,
       epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_type = 'click' AND b.event_type = 'purchase'
 AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 24 HOUR
ORDER BY a.user_id, click_event_id, purchase_event_id
""",
        "hash_sample_docs": _hash_sample_sql(),
        "doc_split_counts": _doc_split_sql(),
        "stratified_sample_docs": _stratified_sql(),
        "pmi_top50": _pmi_sql(),
        "prefix_search_docs": _prefix_search_sql(),
        "infix_search_docs": _infix_search_sql(),
        "suffix_search_docs": _suffix_search_sql(),
        "wildcard_search_docs": _wildcard_search_sql(),
        "boolean_or_not_docs": _boolean_or_not_sql(),
        "regex_match_docs": f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{REGEX_PATTERN}'))::BIGINT AS n_matches
FROM documents
WHERE len(regexp_extract_all(text, '{REGEX_PATTERN}')) > 0
ORDER BY doc_id
""",
        "regex_index_docs": f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{REGEX_PATTERN}'))::BIGINT AS n_matches
FROM documents
WHERE len(regexp_extract_all(text, '{REGEX_PATTERN}')) > 0
ORDER BY doc_id
""",
        "bigram_top100": f"""
WITH d AS (SELECT {toks} AS toks FROM documents),
b AS (
  SELECT toks[i] || ' ' || toks[i + 1] AS gram
  FROM d, unnest(generate_series(1, len(toks) - 1)) AS t(i)
  WHERE len(toks) >= 2
)
SELECT gram, count(*)::BIGINT AS n FROM b
GROUP BY gram ORDER BY n DESC, gram
LIMIT 100
""",
        "tfidf_top5": f"""
WITH tok AS (
  SELECT doc_id, unnest({toks}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY doc_id, term
),
df AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tok GROUP BY term
),
scored AS (
  SELECT tf.doc_id, tf.term,
         round(tf.tf * ln((SELECT count(*)::DOUBLE FROM documents) / df.df),
               6) AS tfidf
  FROM tf JOIN df USING (term)
)
SELECT doc_id, term, tfidf,
       row_number() OVER (PARTITION BY doc_id
                          ORDER BY tfidf DESC, term) AS rank
FROM scored
QUALIFY rank <= {TFIDF_K}
ORDER BY doc_id, rank
""",
        "doclen_quantiles": f"""
SELECT count(*)::BIGINT AS n_docs,
       quantile_disc(n, 0.25)::BIGINT AS p25,
       quantile_disc(n, 0.5)::BIGINT AS p50,
       quantile_disc(n, 0.75)::BIGINT AS p75,
       quantile_disc(n, 0.9)::BIGINT AS p90,
       quantile_disc(n, 0.99)::BIGINT AS p99
FROM (SELECT len({toks}) AS n FROM documents)
""",
        "bloom_filtered_orders": _bloom_sql(),
        # anti join is exact by construction (bloom misses are definite,
        # maybes verified by the join), so the twin is plain NOT EXISTS
        "customers_no_urgent": """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
ORDER BY c_custkey
""",
        # ordering compares raw stored doubles on both sides; price rounded
        # only in the output projection (float policy)
        "top_orders_per_cust": """
WITH r AS (SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders)
SELECT o_custkey, o_orderkey, CAST(rn AS BIGINT) AS rn,
       round(o_totalprice, 2) AS price_r
FROM r WHERE rn <= 3 ORDER BY o_custkey, rn
""",
        "hll_user_count": _hll_sql(
            "(SELECT event_type, CAST(user_id AS VARCHAR) AS k FROM events)",
            group_col="event_type"),
        "hll_event_count": _hll_sql(
            "(SELECT CAST(event_id AS VARCHAR) AS k FROM events)"),
        "cm_user_counts": _cm_sql(),
        "events_hourly": """
SELECT user_id,
       (epoch_us(ts) // 3600000000) * 3600000000 AS window_start,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value
FROM events
GROUP BY user_id, window_start
ORDER BY user_id, window_start
""",
        "events_sliding_3h": """
WITH hourly AS (
  SELECT user_id,
         (epoch_us(ts) // 3600000000) * 3600000000 AS h,
         count(*) AS c, sum(value) AS s
  FROM events GROUP BY user_id, h
),
expanded AS (
  SELECT user_id, h + k.k * 3600000000 AS window_start, c, s
  FROM hourly, (SELECT unnest([0, 1, 2]) AS k) k
)
SELECT user_id, window_start,
       sum(c)::BIGINT AS n_events_3h,
       round(sum(s), 4) AS sum_value_3h
FROM expanded
GROUP BY user_id, window_start
ORDER BY user_id, window_start
""",
    }
