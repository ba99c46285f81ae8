"""Evaluation harness: ranking metrics, joins, merges, splits.

Analogs:
- MRR@k / Recall@d / Success@d per qid then averaged — the MS MARCO /
  LoTTE metric harness (``utility/evaluate/msmarco_passages.py:73-114``,
  ``evaluate/evaluate_lotte_rankings.py:9-44``; A7).
- ranking ⋈ qrels with unjudged handling (J8); ranking ⋈ corpus annotate
  (J6/J1); ranked-list merge by score with depth cut (K7,
  ``utility/rankings/merge.py:13-41``); seeded deterministic splits
  (K9/K12, ``queries_split.py``); subset-docid translation (J5).

Metric math is float64 and per-qid work runs in ``groupby('qid')`` groups
(small), so results are parallelism-invariant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Mean


def ranking_metrics(
    ranking: "ray.data.Dataset",
    qrels: "ray.data.Dataset",
    mrr_at: int = 10,
    recall_at: tuple[int, ...] = (5, 10, 50),
    success_at: tuple[int, ...] = (1, 5),
) -> pd.DataFrame:
    """-> one-row DataFrame of averaged metrics over JUDGED queries.

    Queries present in qrels but absent from the ranking count as zero
    (reference convention: metrics normalized by judged-query count,
    msmarco_passages.py:95-114); ranked-but-unjudged queries are skipped
    (J8 anti-join semantics).
    """
    qrels_pd = qrels.to_pandas()          # labels are small by construction
    gold: dict[int, set] = {}
    for q, d in zip(qrels_pd["qid"], qrels_pd["docid"]):
        gold.setdefault(int(q), set()).add(int(d))
    import ray as _ray

    gold_ref = _ray.put(gold)
    n_judged = len(gold)

    def per_qid(g: pd.DataFrame) -> pd.DataFrame:
        relset = _ray.get(gold_ref).get(int(g["qid"].iloc[0]))
        if not relset:
            return pd.DataFrame()        # unjudged -> skipped
        g = g.sort_values("rank")
        docs = g["docid"].to_numpy()
        hits = np.isin(docs, list(relset))
        row = {"qid": [int(g["qid"].iloc[0])]}
        first = np.flatnonzero(hits[:mrr_at])
        row[f"mrr@{mrr_at}"] = [1.0 / (first[0] + 1) if len(first) else 0.0]
        for d in recall_at:
            row[f"recall@{d}"] = [float(hits[:d].sum()) / len(relset)]
        for d in success_at:
            row[f"success@{d}"] = [1.0 if hits[:d].any() else 0.0]
        return pd.DataFrame(row)

    per_q = ranking.groupby("qid").map_groups(per_qid, batch_format="pandas")
    pdf = per_q.to_pandas()
    cols = [c for c in pdf.columns if c != "qid"]
    out = {}
    for c in cols:
        # normalize by judged-query count: missing judged queries score 0
        out[c] = [float(pdf[c].sum()) / max(1, n_judged)]
    out["n_judged"] = [n_judged]
    out["n_ranked_judged"] = [len(pdf)]
    return pd.DataFrame(out)


def _ranking_restricted_side(
    ranking: "ray.data.Dataset", corpus: "ray.data.Dataset", cols: list[str]
) -> tuple["ray.data.Dataset", pd.DataFrame]:
    """Shared eval-join shape: materialize the BOUNDED ranking (qids x k
    rows) once, broadcast its docid set, and stream the corpus through
    ``broadcast_semi_join`` so only hit rows' metadata ever reaches the
    driver — the ``facet_counts`` direction, O(qids*k) driver memory instead
    of O(n_docs). Returns (materialized ranking, survivor-side frame)."""
    from colbert_ray.functions.util import broadcast_semi_join

    ranking = ranking.materialize()
    rk = ranking.select_columns(["docid"]).to_pandas()
    # Ray's to_pandas drops the schema at zero rows — an empty ranking (or
    # one whose docids all miss the corpus) must annotate to empty/NaN, not
    # KeyError on the missing column
    docids = (rk["docid"].to_numpy(dtype=np.int64) if "docid" in rk.columns
              else np.empty(0, dtype=np.int64))
    side = broadcast_semi_join(
        corpus.select_columns(cols), docids, "docid").to_pandas()
    if "docid" not in side.columns:
        side = pd.DataFrame({c: pd.Series(
            dtype=(np.int64 if c == "docid" else object)) for c in cols})
    return ranking, side


def annotate_ranking(
    ranking: "ray.data.Dataset",
    corpus: "ray.data.Dataset",
    qrels: "ray.data.Dataset | None" = None,
    corpus_cols: tuple[str, ...] = ("docid", "repo", "path", "lang"),
) -> "ray.data.Dataset":
    """Expand ranking rows with document fields (+ relevance label) —
    annotate-EM analog (utility/evaluate/annotate_EM.py:28-46; J6/J1).

    Join direction: the ranking is the bounded side (qids x k rows), so its
    docid set is broadcast and the corpus STREAMS through a semi-join; only
    the tiny survivor side (<= distinct ranked docids) is then broadcast for
    the final hash join. The corpus is never materialized on the driver —
    the cost is one streamed corpus pass either way, so no separate
    small-corpus fast path is needed."""
    import ray as _ray

    ranking, side = _ranking_restricted_side(ranking, corpus, list(corpus_cols))
    side_ref = _ray.put(side.set_index("docid"))
    gold = None
    if qrels is not None:
        q = qrels.to_pandas()
        gold = {(int(a), int(b)) for a, b in zip(q["qid"], q["docid"])}
    gold_ref = _ray.put(gold)

    def expand(batch: pd.DataFrame) -> pd.DataFrame:
        s = _ray.get(side_ref)
        out = batch.join(s, on="docid")
        g = _ray.get(gold_ref)
        if g is not None:
            out["label"] = [
                (int(q), int(d)) in g for q, d in zip(out["qid"], out["docid"])
            ]
        return out

    return ranking.map_batches(expand, batch_format="pandas")


def merge_rankings(
    rankings: list["ray.data.Dataset"], depth: int = 1000
) -> "ray.data.Dataset":
    """Union >=2 rankings, re-rank per qid by (-score, docid), cut to depth
    (merge.py:13-41 analog; K7 + D6 + K2 tie-break)."""
    ds = rankings[0]
    for other in rankings[1:]:
        ds = ds.union(other)

    def rerank(g: pd.DataFrame) -> pd.DataFrame:
        # sort FIRST so dedup keeps each docid's best-scoring row
        g = g.sort_values(["score", "docid"], ascending=[False, True])
        g = g.drop_duplicates("docid").head(depth)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g

    return ds.groupby("qid").map_groups(rerank, batch_format="pandas")


def facet_counts(
    ranking: pd.DataFrame,
    corpus: "ray.data.Dataset",
    facet_cols: tuple[str, ...] = ("lang",),
    id_col: str = "doc_id",
) -> pd.DataFrame:
    """Facet the search results: per-query counts over document metadata
    columns — the search -> metadata semi-join -> grouped count composite.

    Scale shape is the REVERSE of annotate_ranking's broadcast: the ranking
    is the small side (n_queries x k rows, bounded), so its docid set is
    broadcast via ``ray.put`` and the corpus STREAMS through a map_batches
    semi-join filter — only hit rows' metadata ever leaves a corpus task.
    The per-(qid, facet) count happens on the driver over bounded rows.
    """
    from colbert_ray.functions.util import broadcast_semi_join

    meta = broadcast_semi_join(
        corpus.select_columns([id_col, *facet_cols]),
        ranking["docid"].to_numpy(dtype=np.int64), id_col).to_pandas()
    joined = ranking[["qid", "docid"]].merge(
        meta.rename(columns={id_col: "docid"}), on="docid", how="inner")
    out = (joined.groupby(["qid", *facet_cols], as_index=False)
           .size().rename(columns={"size": "n_docs"}))
    out = out.sort_values(["qid", *facet_cols]).reset_index(drop=True)
    out["n_docs"] = out["n_docs"].astype(np.int64)
    return out


def reciprocal_rank_fusion(
    rankings: list["ray.data.Dataset | pd.DataFrame"],
    k: int = 10,
    c: float = 60.0,
) -> pd.DataFrame:
    """Fuse >=2 per-query ranked lists by reciprocal rank (Cormack et al.
    2009): fused(q,d) = sum over systems with d ranked, 1/(c + rank). The
    rank-based complement of merge_rankings' score-based union (K7/D6) —
    scores from different rankers (BM25 vs QL) are not comparable, ranks
    are. Inputs are per-query top-k lists (bounded rows), so fusion is a
    driver-side frame op by design; tie-break (-fused, docid).
    """
    frames = []
    for r in rankings:
        df = r if isinstance(r, pd.DataFrame) else r.to_pandas()
        frames.append(df[["qid", "docid", "rank"]])
    allr = pd.concat(frames, ignore_index=True)
    allr["contrib"] = 1.0 / (c + allr["rank"].astype(np.float64))
    fused = (allr.groupby(["qid", "docid"], as_index=False)["contrib"].sum()
             .rename(columns={"contrib": "fused"}))
    fused = fused.sort_values(["qid", "fused", "docid"],
                              ascending=[True, False, True])
    fused["rank"] = fused.groupby("qid").cumcount() + 1
    fused = fused[fused["rank"] <= k].reset_index(drop=True)
    fused["rank"] = fused["rank"].astype(np.int64)
    return fused[["qid", "docid", "rank", "fused"]]


def split_ranking_by_queryset(
    ranking: "ray.data.Dataset", querysets: dict[str, "object"]
) -> dict[str, "ray.data.Dataset"]:
    """Split one ranking into per-queryset rankings by qid membership
    (J7, ``utility/rankings/split_by_queryset.py`` analog). Each queryset's
    qids are broadcast once (sorted array) and every batch does a
    vectorized membership test — rows whose qid is in no set are dropped.
    """
    import ray as _ray

    refs = {
        name: _ray.put(np.sort(np.asarray(list(qids), dtype=np.int64)))
        for name, qids in querysets.items()
    }

    def make_filter(ref):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            allowed = _ray.get(ref)
            keep = np.isin(batch["qid"].to_numpy(dtype=np.int64), allowed)
            return batch[keep]

        return fn

    return {
        name: ranking.map_batches(make_filter(ref), batch_format="pandas")
        for name, ref in refs.items()
    }


def split_dataset(
    ds: "ray.data.Dataset", proportions: list[float], seed: int = 12345
) -> list["ray.data.Dataset"]:
    """Seeded deterministic split (K9/K12 analog: randperm + slice,
    queries_split.py:15-55). Shuffle is seeded => reproducible."""
    return ds.random_shuffle(seed=seed).split_proportionately(proportions[:-1])


def translate_ranking(
    ranking: "ray.data.Dataset", mapping: dict[int, int]
) -> "ray.data.Dataset":
    """Map subset-docids -> full-corpus docids (J5, translate_dict analog).
    Broadcast dict; vectorized lookup."""
    import ray as _ray

    ref = _ray.put(mapping)

    def tr(batch: pd.DataFrame) -> pd.DataFrame:
        m = _ray.get(ref)
        batch["docid"] = batch["docid"].map(lambda d: m.get(int(d), d))
        return batch

    return ranking.map_batches(tr, batch_format="pandas")


def normalize_answer(s: str) -> str:
    """DPR-style answer normalization (M15 analog of ``utility/utils/dpr.py``
    as used by ``annotate_EM.py:25-36``): unicode NFD normalize, lowercase,
    strip punctuation and articles, collapse whitespace."""
    import re
    import unicodedata

    s = unicodedata.normalize("NFD", s).lower()
    s = "".join(ch for ch in s if not unicodedata.combining(ch))
    s = re.sub(r"\b(a|an|the)\b", " ", s)
    s = re.sub(r"[^\w\s]", " ", s)
    return " ".join(s.split())


def annotate_exact_match(
    ranking: "ray.data.Dataset",
    corpus: "ray.data.Dataset",
    answers: dict[int, list[str]],
    text_col: str = "content",
) -> "ray.data.Dataset":
    """Label each ranked row with answer-EM: does any gold answer for the
    qid appear (normalized substring) in the document text?
    (annotate_EM.py:28-46 + e2e_test.py:48-55 analog.)

    Same bounded semi-join direction as ``annotate_ranking``: only the
    ranked docids' texts (qids x k at most) are pulled to the driver, never
    the whole corpus."""
    import ray as _ray

    ranking, side = _ranking_restricted_side(ranking, corpus,
                                             ["docid", text_col])
    side[text_col] = side[text_col].map(normalize_answer)
    side_ref = _ray.put(side.set_index("docid")[text_col].to_dict())
    ans_ref = _ray.put({
        int(q): [normalize_answer(a) for a in al] for q, al in answers.items()
    })

    def label(batch: pd.DataFrame) -> pd.DataFrame:
        texts = _ray.get(side_ref)
        gold = _ray.get(ans_ref)
        batch["answer_em"] = [
            any(a in texts.get(int(d), "") for a in gold.get(int(q), []))
            for q, d in zip(batch["qid"], batch["docid"])
        ]
        return batch

    return ranking.map_batches(label, batch_format="pandas")


def scores_to_probs(table: pa.Table, group_col: str = "qid") -> pa.Table:
    """Per-query softmax over scores (server.py:27-28 analog; M17)."""
    df = table.to_pandas()
    e = np.exp(df["score"] - df.groupby(group_col)["score"].transform("max"))
    df["prob"] = e / e.groupby(df[group_col]).transform("sum")
    return pa.Table.from_pandas(df, preserve_index=False)
