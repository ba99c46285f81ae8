"""Single-process pure-Python/pyarrow BM25 oracle — the conformance gate.

Reference pattern: the e2e golden-quality test (``colbert/tests/
e2e_test.py:67-95``) and the StridedTensor micro self-test
(``colbert/search/strided_tensor.py:168-219``) — an independent, naive
implementation the distributed engine must match exactly (docids AND float64
scores, rank-identical).

Deliberately simple: in-memory dict inverted index, no Ray, no compression.
Shares only the leaf scalar functions (tokenizer, bm25 math, tie-break) with
the engine so the comparison is meaningful.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from colbert_ray.config import EngineConfig
from colbert_ray.functions.bm25 import idf, tf_saturation, topk_with_ties
from colbert_ray.functions.tokenizer import doc_term_frequencies, tokenize_query


class OracleIndex:
    def __init__(self, cfg: EngineConfig | None = None):
        self.cfg = cfg or EngineConfig()
        self.postings: dict[str, list[tuple[int, int]]] = {}
        self.doclens: np.ndarray | None = None
        self.sha256: list[str] = []
        self.n_docs = 0
        self.avgdl = 0.0

    @classmethod
    def build(cls, corpus: pa.Table, cfg: EngineConfig | None = None) -> "OracleIndex":
        """corpus must already carry a ``docid`` column (or doc order = docid)."""
        self = cls(cfg)
        if "docid" in corpus.column_names:
            docids = corpus.column("docid").to_numpy(zero_copy_only=False)
        else:
            docids = np.arange(corpus.num_rows, dtype=np.int64)
        contents = corpus.column("content")
        doclens, terms, tfs = doc_term_frequencies(contents, self.cfg)
        self.n_docs = corpus.num_rows
        dl_by_docid = np.zeros(int(docids.max()) + 1 if len(docids) else 0, dtype=np.int64)
        dl_by_docid[docids] = doclens
        self.doclens = dl_by_docid
        self.avgdl = float(np.float64(doclens.sum()) / np.float64(max(1, self.n_docs)))
        content_py = contents.to_pylist()
        self.sha256 = [hashlib.sha256(c.encode()).hexdigest() for c in content_py]
        t_off = terms.offsets.to_numpy(zero_copy_only=False)
        t_flat = terms.flatten().to_pylist()
        f_flat = tfs.flatten().to_pylist()
        for row in range(corpus.num_rows):
            d = int(docids[row])
            for j in range(t_off[row], t_off[row + 1]):
                self.postings.setdefault(t_flat[j], []).append((d, f_flat[j]))
        for term in self.postings:
            self.postings[term].sort()
        return self

    def search(self, query: str, k: int = 10) -> list[tuple[int, int, float]]:
        """-> [(docid, rank, score)] by (-score, docid); exact float64 BM25.

        Terms iterated in lexicographic order => summation order per doc is
        identical to the engine's (terms sorted by term, term_id assignment is
        term-sorted too).
        """
        cfg = self.cfg
        q_terms, _ = tokenize_query(query, cfg)  # already sorted unique
        acc: dict[int, float] = {}
        for term in q_terms:
            plist = self.postings.get(term)
            if not plist:
                continue
            t_idf = float(idf(float(len(plist)), self.n_docs))
            for d, tf in plist:
                contrib = float(
                    t_idf
                    * tf_saturation(
                        np.float64(tf), np.float64(self.doclens[d]), self.avgdl, cfg.k1, cfg.b
                    )
                )
                acc[d] = acc.get(d, 0.0) + contrib
        if not acc:
            return []
        docids = np.fromiter(acc.keys(), dtype=np.int64)
        scores = np.fromiter(acc.values(), dtype=np.float64)
        dd, ss, rr = topk_with_ties(scores, docids, k)
        return [(int(d), int(r), float(s)) for d, s, r in zip(dd, ss, rr)]

    def search_all(self, queries: pa.Table, k: int = 10) -> pa.Table:
        qids_out, docids_out, ranks_out, scores_out = [], [], [], []
        for qid, text in zip(queries.column("qid").to_pylist(), queries.column("query").to_pylist()):
            for d, r, s in self.search(text, k):
                qids_out.append(qid)
                docids_out.append(d)
                ranks_out.append(r)
                scores_out.append(s)
        return pa.table(
            {
                "qid": pa.array(qids_out, type=pa.int64()),
                "docid": pa.array(docids_out, type=pa.int64()),
                "rank": pa.array(ranks_out, type=pa.int32()),
                "score": pa.array(scores_out, type=pa.float64()),
            }
        )


def assign_docids_oracle(corpus: pa.Table) -> pa.Table:
    """docid = rank of (repo, path) under global sort — the oracle version of
    the engine's distributed docid assignment (SURVEY.md §7.0)."""
    import pyarrow.compute as pc

    idx = pc.sort_indices(
        corpus, sort_keys=[("repo", "ascending"), ("path", "ascending")]
    ).to_numpy(zero_copy_only=False)
    docid = np.empty(corpus.num_rows, dtype=np.int64)
    docid[idx] = np.arange(corpus.num_rows, dtype=np.int64)
    return corpus.append_column("docid", pa.array(docid))
