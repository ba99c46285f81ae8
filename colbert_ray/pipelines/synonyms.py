"""Query-time synonym expansion — the Lucene ``SynonymQuery`` analog.

Each query token expands to a GROUP (the token + its synonyms from a
broadcast map); a group scores as if it were ONE term with blended
statistics:

    df(group)    = max over member dfs        (Lucene SynonymQuery's
                                               docFreq = max of members)
    tf(group, d) = sum of member tfs in d     (integer-exact)
    contribution = idf(df_blend) * tf_sat(tf_sum, dl)

With an empty synonym map this degenerates to plain BM25 bit-exactly
(same float64 kernels, ascending-token accumulation) — asserted in
tests/test_synonyms.py.

Scale shape: the synonym map is a tiny broadcast side (driver kwarg into
the actor pool / plain dict here); scoring stays the index probe path —
per group one postings gather per member, a vocab-bounded unique+bincount
tf merge, no corpus scan and no shuffle. Determinism: group tf is an
int64 sum (order-free, exact), per-doc accumulation runs in ascending
primary-token order, float64 throughout (SURVEY.md §7.3 #1 contract).

Reference capability: query encoding / term mapping
(``colbert/modeling/tokenization/query_tokenization.py`` analog — the
lexical stand-in for learned query expansion).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from colbert_ray.config import EngineConfig
from colbert_ray.functions.bm25 import (idf, sql_bm25_score_expr,
                                        tf_saturation, topk_with_ties)
from colbert_ray.functions.tokenizer import sql_tokenize_expr, tokenize_query

__all__ = ["expand_groups", "synonym_search", "sql_synonym_search"]


def expand_groups(query: str, syn_map: dict[str, list[str]],
                  cfg: EngineConfig) -> list[tuple[str, list[str]]]:
    """(primary_token, sorted unique member tokens) per unique query
    token, in ascending primary-token order. Synonym entries go through
    the corpus tokenizer; multi-token synonyms contribute each token."""
    out = []
    for t in sorted(set(tokenize_query(query, cfg)[0])):
        members = {t}
        for s in syn_map.get(t, ()):
            members.update(tokenize_query(s, cfg)[0])
        out.append((t, sorted(members)))
    return out


def _group_postings(idx, members: list[str]):
    """(docids, tf_sums int64, df_blend) for one synonym group — postings
    gathered per member, merged by docid. Empty members -> (None,)*3."""
    tids = idx.lookup_terms(members)
    if not len(tids):
        return None, None, 0
    d_parts, tf_parts, dfs = [], [], []
    for tid in tids:
        d, tf = idx.postings_slice_raw(int(tid))
        d_parts.append(np.asarray(d, dtype=np.int64))
        tf_parts.append(np.asarray(tf, dtype=np.int64))
        dfs.append(len(d_parts[-1]))
    docs = np.concatenate(d_parts)
    tfs = np.concatenate(tf_parts)
    u, inv = np.unique(docs, return_inverse=True)
    tf_sum = np.zeros(len(u), dtype=np.int64)
    np.add.at(tf_sum, inv, tfs)
    return u, tf_sum, max(dfs)


def synonym_search(queries, index_dir: str,
                   syn_map: dict[str, list[str]], k: int = 10,
                   cfg: EngineConfig | None = None) -> pa.Table:
    """BM25 top-k with synonym groups over the built index. ``queries``
    is a (qid, query) Arrow table / list of tuples. Returns
    (qid, docid, rank, score) with raw float64 scores, tie-break
    (-score, docid) as everywhere in the engine."""
    from colbert_ray.state.decoded import DecodedIndex

    if isinstance(queries, pa.Table):
        queries = list(zip(queries.column("qid").to_pylist(),
                           queries.column("query").to_pylist()))
    idx = DecodedIndex.load_cached(index_dir, load_sha=False)
    cfg = cfg or idx.cfg
    out_q, out_d, out_r, out_s = [], [], [], []
    for qid, q in queries:
        d_parts, s_parts = [], []
        for _, members in expand_groups(q, syn_map, cfg):
            u, tf_sum, df = _group_postings(idx, members)
            if u is None:
                continue
            contrib = idf(float(df), idx.n_docs) * tf_saturation(
                tf_sum, np.asarray(idx.doclens[u], dtype=np.float64),
                idx.avgdl, cfg.k1, cfg.b)
            d_parts.append(u)
            s_parts.append(contrib)
        if not d_parts:
            continue
        docs = np.concatenate(d_parts)
        contribs = np.concatenate(s_parts)
        # stable sort keeps ascending-group accumulation order per doc
        order = np.argsort(docs, kind="stable")
        docs, contribs = docs[order], contribs[order]
        starts = np.flatnonzero(np.r_[True, docs[1:] != docs[:-1]])
        scores = np.add.reduceat(contribs, starts)
        docids = docs[starts]
        if len(idx.tombstones):
            pos = np.searchsorted(idx.tombstones, docids)
            pos_c = np.clip(pos, 0, len(idx.tombstones) - 1)
            keep = idx.tombstones[pos_c] != docids
            docids, scores = docids[keep], scores[keep]
        d, s, r = topk_with_ties(scores, docids, k)
        out_q.extend([int(qid)] * len(d))
        out_d.extend(d.tolist())
        out_r.extend(r.tolist())
        out_s.extend(s.tolist())
    return pa.table({
        "qid": pa.array(out_q, type=pa.int64()),
        "docid": pa.array(out_d, type=pa.int64()),
        "rank": pa.array(out_r, type=pa.int64()),
        "score": pa.array(out_s, type=pa.float64()),
    })


def sql_synonym_search(table: str, queries, syn_map: dict[str, list[str]],
                       k: int = 10, cfg: EngineConfig | None = None, *,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> str:
    """DuckDB twin: per (qid, group) the blended df (max over members)
    and summed tf, then the shared BM25 expression, 6-dp rounded re-rank
    (the engine float policy)."""
    cfg = cfg or EngineConfig()
    syn_rows, grp_rows = [], []
    for qid, q in queries:
        for prim, members in expand_groups(q, syn_map, cfg):
            grp = f"{qid}:{prim}"
            grp_rows.append(f"({qid}, '{grp}')")
            for m in members:
                syn_rows.append(f"({qid}, '{grp}', '{m}')")
    if not syn_rows:
        raise ValueError("no query groups")
    k1, b = cfg.k1, cfg.b
    return f"""
WITH d AS (
  SELECT {id_col} AS doc_id, {sql_tokenize_expr(text_col, cfg)} AS toks
  FROM {table}
),
stats AS (SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM d),
tok AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM d),
tfs AS (SELECT doc_id, term, any_value(dl) AS dl, count(*) AS tf
        FROM tok GROUP BY doc_id, term),
dfs AS (SELECT term, count(*) AS df FROM tfs GROUP BY term),
syn(qid, grp, term) AS (VALUES {", ".join(syn_rows)}),
gdf AS (
  SELECT syn.qid, syn.grp, max(dfs.df) AS df
  FROM syn JOIN dfs ON dfs.term = syn.term
  GROUP BY syn.qid, syn.grp
),
gtf AS (
  SELECT syn.qid, syn.grp, tfs.doc_id, sum(tfs.tf) AS tf,
         any_value(tfs.dl) AS dl
  FROM syn JOIN tfs ON tfs.term = syn.term
  GROUP BY syn.qid, syn.grp, tfs.doc_id
),
scores AS (
  SELECT gtf.qid, gtf.doc_id AS docid,
         sum({sql_bm25_score_expr(k1, b)}) AS score
  FROM gtf
  JOIN gdf ON gdf.qid = gtf.qid AND gdf.grp = gtf.grp
  CROSS JOIN stats
  GROUP BY gtf.qid, gtf.doc_id
)
SELECT qid::BIGINT AS qid, docid,
       row_number() OVER (PARTITION BY qid
                          ORDER BY round(score, 6) DESC, docid) AS rank,
       round(score, 6) AS score_r
FROM scores
QUALIFY rank <= {k}
ORDER BY qid, rank
"""
