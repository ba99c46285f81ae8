"""Tests for the training-data-pipeline extras: dedup, similarity search,
text stats, multimodal plumbing. Pattern: small in-memory tables + a naive
numpy/python oracle; determinism across batch sizes (parallelism proxy)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from colbert_ray.extras import dedup as x_dedup
from colbert_ray.extras import graph as x_graph
from colbert_ray.extras import simsearch as x_sim
from colbert_ray.extras import textstats as x_text
from colbert_ray.extras.multimodal import (
    MediaFeatureExtractor,
    extract_media_features,
    make_payload_table,
)


def _docs_table():
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",          # exact dup of 0
        "the quick brown fox jumps over the lazy cat today",    # near dup
        "completely different content about database systems",
        "x",
        "",
    ]
    return pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
         "text": pa.array(texts, type=pa.string())}
    )


class TestDedup:
    def test_exact_dedup_keeps_min_id(self):
        ds = ray.data.from_arrow(_docs_table())
        out = x_dedup.exact_dedup(ds).to_pandas().sort_values("doc_id")
        reps = dict(zip(out["doc_id"], out["dup_count"]))
        assert reps[0] == 2          # docs 0,1 merged under min id 0
        assert 1 not in reps
        assert reps[3] == 1

    def test_benchmark_contamination_planted(self):
        import pyarrow as pa

        phrase = "alpha bravo charlie delta echo"
        bench = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([100], type=pa.int64()),
            "text": pa.array([f"benchmark question: {phrase} ?"]),
        }))
        scan = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array([
                f"training doc quoting {phrase} verbatim twice {phrase}",
                "totally unrelated words nothing shared here at all",
                "alpha bravo only a short fragment",   # < n-gram, no hit
            ]),
        }))
        out = (x_dedup.benchmark_contamination(scan, bench, n=5)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert out["doc_id"].tolist() == [1]
        # the phrase window is the ONLY 5-gram doc 1 shares with the bench
        # doc, and it appears twice in doc 1 — distinct count stays 1
        assert int(out["n_matched"].iloc[0]) == 1

    def test_char_trigram_codes_match_set_model(self):
        """Parity of the vectorized 21-bit-packed codepoint trigrams with
        the reference set-of-string-trigrams model (the former _char_ngrams
        helper, kept here as the spec): same per-text distinct sizes and
        same pairwise intersection counts, on unicode incl. astral plane."""
        from colbert_ray.extras.dedup import _char_trigram_codes

        rng = np.random.default_rng(11)
        alphabet = list("abc défg中文字🎉𐍈") + [chr(0x10FFF), chr(0x10FFFF)]
        texts = ["", "a", "ab", "aaa", "🎉🎉🎉🎉"] + [
            "".join(rng.choice(alphabet, size=rng.integers(0, 40)))
            for _ in range(60)
        ]

        def ref_sets(ts):
            return [{t[i:i + 3] for i in range(len(t) - 2)}
                    if len(t) >= 3 else set() for t in ts]

        codes = _char_trigram_codes(texts)
        sets = ref_sets(texts)
        for c, s in zip(codes, sets):
            assert len(c) == len(s)
        for i in range(0, len(texts), 7):
            for j in range(1, len(texts), 11):
                inter = len(np.intersect1d(codes[i], codes[j]))
                assert inter == len(sets[i] & sets[j]), (i, j)

    def test_jaccard_pairs_integer_exact(self):
        ds = ray.data.from_arrow(_docs_table())
        out = x_dedup.jaccard_pairs(ds, threshold_num=6, threshold_den=10).to_pandas()
        pairs = {(a, b) for a, b in zip(out["id_a"], out["id_b"])}
        assert (0, 1) in pairs       # identical -> jaccard 1
        assert (0, 2) in pairs       # near dup above 0.6
        row01 = out[(out.id_a == 0) & (out.id_b == 1)].iloc[0]
        assert row01["n_common"] == row01["n_union"]

    def test_prefix_filter_equals_allpairs(self):
        """The AllPairs/PPJoin completeness property: the prefix-filtered
        join must be EXACTLY the O(n^2) all-pairs result — same pairs, same
        integer n_common/n_union — on a random corpus with planted dups,
        at two thresholds and two parallelism levels."""
        rng = np.random.default_rng(7)
        vocab = ["hash", "join", "merge", "sort", "scan",
                 "filter", "agg", "table", "row", "col"]
        texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 25)))
                 for _ in range(120)]
        for i in range(0, 110, 10):
            texts[i + 1] = texts[i] + " x"          # planted near-dups
        tbl = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                        "text": pa.array(texts)})
        for num, den in ((6, 10), (9, 10)):
            want = (x_dedup.jaccard_pairs(
                ray.data.from_arrow(tbl), threshold_num=num,
                threshold_den=den).to_pandas()
                .sort_values(["id_a", "id_b"]).reset_index(drop=True))
            for nblocks in (1, 7):
                got = (x_dedup.prefix_filter_jaccard_pairs(
                    ray.data.from_arrow(tbl).repartition(nblocks),
                    threshold_num=num, threshold_den=den).to_pandas()
                    .sort_values(["id_a", "id_b"]).reset_index(drop=True))
                pd.testing.assert_frame_equal(
                    want, got[want.columns.tolist()])
            assert len(want) > 5     # non-vacuous

    def test_prefix_filter_short_and_empty_texts(self):
        tbl = pa.table({"doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
                        "text": pa.array(["", "ab", "abcdef", "abcdef"])})
        out = (x_dedup.prefix_filter_jaccard_pairs(
            ray.data.from_arrow(tbl), 6, 10).to_pandas()
            .sort_values(["id_a", "id_b"]).reset_index(drop=True))
        # only the identical pair (2,3) qualifies; <3-char texts shingle
        # to the empty set and can never pair
        assert list(zip(out.id_a, out.id_b)) == [(2, 3)]
        assert out.n_common.iloc[0] == out.n_union.iloc[0] == 4

    def test_minhash_lsh_finds_planted_dups(self):
        ds = ray.data.from_arrow(_docs_table())
        out = x_dedup.minhash_lsh_pairs(ds, threshold=0.8).to_pandas()
        pairs = {(a, b) for a, b in zip(out["id_a"], out["id_b"])}
        assert (0, 1) in pairs
        assert (0, 3) not in pairs

    def test_minhash_subset_and_recall_gate(self):
        """Quality gate (reference pattern e2e_test.py:79): every emitted
        pair must appear in the EXACT jaccard result at the same threshold
        (verification is exact, so false positives are impossible), and LSH
        recall on near-certain dups (true j >= 0.9) must be >= 0.9."""
        import os

        sf = "/root/testdata/sf0.001/documents.parquet"
        if not os.path.exists(sf):
            pytest.skip("testdata not present")
        ds = ray.data.read_parquet(sf, columns=["doc_id", "text"])
        mh = x_dedup.minhash_lsh_pairs(ds, threshold=0.8).to_pandas()
        ex = x_dedup.jaccard_pairs(
            ray.data.read_parquet(sf, columns=["doc_id", "text"]),
            threshold_num=8, threshold_den=10).to_pandas()
        exset = set(zip(ex.id_a, ex.id_b))
        mhset = set(zip(mh.id_a, mh.id_b))
        assert mhset <= exset
        hi = ex[ex.n_common * 10 >= 9 * ex.n_union]
        hiset = set(zip(hi.id_a, hi.id_b))
        if hiset:
            recall = len(mhset & hiset) / len(hiset)
            assert recall >= 0.9, (recall, len(hiset))

    def test_simhash_identical_and_deterministic(self):
        ds = ray.data.from_arrow(_docs_table())
        s1 = x_dedup.simhash(ds).to_pandas().sort_values("doc_id")["simhash"].tolist()
        s2 = x_dedup.simhash(ray.data.from_arrow(_docs_table()).repartition(3)) \
            .to_pandas().sort_values("doc_id")["simhash"].tolist()
        assert s1 == s2                       # parallelism-invariant
        assert s1[0] == s1[1]                 # identical docs -> identical sig
        assert s1[0] != s1[3]

    def test_simhash_dup_pairs_banding_exact(self):
        """simhash_dup_pairs (pigeonhole-banded) == the brute-force
        Hamming filter over the signatures, on a corpus with planted
        near-dups, at two thresholds and two parallelism levels."""
        import itertools

        texts = [f"alpha beta gamma delta w{i} x{i} common tail words"
                 for i in range(30)]
        texts += [t + " extra" for t in texts[:6]]      # planted near-dups
        texts += [texts[0], ""]                         # exact dup + empty
        t = pa.table({"doc_id": pa.array(np.arange(len(texts)),
                                         type=pa.int64()),
                      "text": pa.array(texts)})
        sigs = (x_dedup.simhash(ray.data.from_arrow(t)).to_pandas()
                .sort_values("doc_id"))
        h = sigs["simhash"].to_numpy(dtype=np.int64).astype(np.uint64)
        ids = sigs["doc_id"].to_numpy(dtype=np.int64)
        for mh in (0, 4):
            want = sorted(
                (int(ids[i]), int(ids[j]),
                 int(bin(int(h[i]) ^ int(h[j])).count("1")))
                for i, j in itertools.combinations(range(len(ids)), 2)
                if bin(int(h[i]) ^ int(h[j])).count("1") <= mh)
            for nblocks in (1, 5):
                got = x_dedup.simhash_dup_pairs(
                    ray.data.from_arrow(t).repartition(nblocks),
                    max_hamming=mh).to_pandas()
                assert (list(map(tuple, got.to_numpy())) == want), (mh,
                                                                    nblocks)
            assert want, mh        # the planted dups make every tier real


def _cc_oracle(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Naive union-find: node -> component-min."""
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a), parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


class TestConnectedComponents:
    def test_path_graph_worst_case(self):
        # a path needs O(log n) pointer-jump rounds, not O(n)
        n = 64
        pairs = pa.table({"id_a": list(range(n - 1)),
                          "id_b": list(range(1, n))})
        out = x_dedup.connected_components(
            ray.data.from_arrow(pairs)).to_pandas()
        assert len(out) == n and (out["cluster_id"] == 0).all()

    def test_random_graphs_match_union_find(self):
        rng = np.random.default_rng(7)
        for trial in range(3):
            n_nodes, n_edges = 200, 120
            a = rng.integers(0, n_nodes, n_edges)
            b = rng.integers(0, n_nodes, n_edges)
            keep = a != b
            edges = list(zip(a[keep].tolist(), b[keep].tolist()))
            pairs = pa.table({
                "id_a": pa.array([e[0] for e in edges], type=pa.int64()),
                "id_b": pa.array([e[1] for e in edges], type=pa.int64())})
            got = (x_dedup.connected_components(
                ray.data.from_arrow(pairs).repartition(3))
                .to_pandas().set_index("node")["cluster_id"].to_dict())
            assert got == _cc_oracle(edges)

    def test_empty_pairs(self):
        pairs = pa.table({"id_a": pa.array([], type=pa.int64()),
                          "id_b": pa.array([], type=pa.int64())})
        out = x_dedup.connected_components(ray.data.from_arrow(pairs))
        assert out.count() == 0

    def _span_table(self):
        texts = [
            "aa bb cc dd ee ff gg hh",        # [2,6) shared with doc1/doc2
            "zz yy cc dd ee ff qq ww",        # [2,6)
            "cc dd ee ff",                    # whole doc [0,4)
            "pp qq rr ss tt",                 # unique -> no span
            "mm nn oo pp mm nn oo pp",        # repeats only WITHIN itself
            "xx yy",                          # shorter than gram -> no grams
        ]
        return pa.table(
            {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
             "text": pa.array(texts, type=pa.string())})

    def test_duplicate_spans_exact(self):
        ds = ray.data.from_arrow(self._span_table())
        out = (x_dedup.duplicate_spans(ds, gram_len=4).to_pandas()
               .sort_values(["doc_id", "start_tok"]).reset_index(drop=True))
        got = list(out.itertuples(index=False, name=None))
        # (doc, start, end_exclusive, n) — cross-doc shared 4-grams only:
        # same-doc repetition (doc 4) and unique docs emit nothing
        assert got == [(0, 2, 6, 4), (1, 2, 6, 4), (2, 0, 4, 4)]

    def test_duplicate_spans_merges_overlapping_grams(self):
        # doc0/doc1 share SIX consecutive tokens -> three overlapping
        # 4-grams that must merge into ONE maximal island per doc
        t = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                      "text": pa.array([
                          "aa bb cc dd ee ff gg",
                          "xx bb cc dd ee ff gg"])})
        out = (x_dedup.duplicate_spans(ray.data.from_arrow(t), gram_len=4)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        got = list(out.itertuples(index=False, name=None))
        assert got == [(0, 1, 7, 6), (1, 1, 7, 6)]

    def test_duplicate_spans_parallelism_invariant(self):
        t = self._span_table()
        base = (x_dedup.duplicate_spans(ray.data.from_arrow(t), gram_len=4)
                .to_pandas().sort_values(["doc_id", "start_tok"])
                .reset_index(drop=True))
        split = (x_dedup.duplicate_spans(
                     ray.data.from_arrow(t).repartition(5), gram_len=4)
                 .to_pandas().sort_values(["doc_id", "start_tok"])
                 .reset_index(drop=True))
        pd.testing.assert_frame_equal(base, split)

    def test_dedup_keep_one_survivor_per_cluster(self):
        pairs = pa.table({"id_a": [1, 2, 3, 5], "id_b": [2, 3, 9, 6]})
        clusters = x_dedup.connected_components(ray.data.from_arrow(pairs))
        docs = ray.data.from_arrow(pa.table({
            "doc_id": pa.array(range(12), type=pa.int64()),
            "text": pa.array([f"d{i}" for i in range(12)])}))
        kept = sorted(x_dedup.dedup_keep(docs, clusters)
                      .to_pandas()["doc_id"])
        # survivors: cluster mins 1 and 5, plus all unclustered docs
        assert kept == [0, 1, 4, 5, 7, 8, 10, 11]


class TestSimsearch:
    @pytest.fixture()
    def emb(self):
        rng = np.random.default_rng(7)
        m = rng.standard_normal((50, 16))
        t = pa.table(
            {"vec_id": pa.array(range(50), type=pa.int64()),
             "embedding": pa.array([row.astype(np.float32).tolist() for row in m],
                                    type=pa.list_(pa.float32()))}
        )
        return t, m.astype(np.float32).astype(np.float64)

    def test_knn_matches_numpy_oracle(self, emb):
        t, m = emb
        q = m[:3]
        ds = ray.data.from_arrow(t).repartition(4)
        got = x_sim.knn_cosine(ds, q, np.arange(3), k=5).to_pandas()
        norm = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = norm[:3] @ norm.T
        for qi in range(3):
            row = sims[qi].copy()
            row[qi] = -np.inf
            want = np.lexsort((np.arange(50), -row))[:5]
            g = got[got.qid == qi].sort_values("rank")["vec_id"].tolist()
            assert g == want.tolist()

    def test_pq_adc_matches_numpy_oracle(self, emb):
        t, m = emb
        book = x_sim.train_pq_codebook(m, n_subspaces=4, n_centroids=8)
        ds = ray.data.from_arrow(t).repartition(4)
        codes_ds = x_sim.pq_encode(ds, book)
        codes = (codes_ds.to_pandas().sort_values("vec_id")
                 .reset_index(drop=True))
        cm = np.stack(codes["codes"].to_numpy())
        assert cm.shape == (50, 4) and cm.dtype == np.int8
        assert cm.max() < 8 and cm.min() >= 0
        # naive oracle: same rounded-distance argmin + LUT-sum arithmetic
        dsub = 4
        want_codes = np.empty((50, 4), dtype=np.int64)
        for s in range(4):
            d = np.round(np.sqrt((
                (m[:, None, s*dsub:(s+1)*dsub]
                 - book[s][None, :, :]) ** 2).sum(axis=2)), 6)
            want_codes[:, s] = np.argmin(d, axis=1)
        assert (cm.astype(np.int64) == want_codes).all()
        q = m[:3]
        got = (x_sim.pq_adc_knn(codes_ds, q, np.arange(3), book, k=5)
               .to_pandas())
        lut = np.stack([np.round(np.sqrt((
            (q[:, None, s*dsub:(s+1)*dsub] - book[s][None, :, :]) ** 2
        ).sum(axis=2)), 6) for s in range(4)], axis=1)
        adc = np.zeros((3, 50))
        for s in range(4):
            adc += lut[:, s, :][:, want_codes[:, s]]
        adc = np.round(adc, 6)
        for qi in range(3):
            row = adc[qi].copy()
            row[qi] = np.inf
            want = np.lexsort((np.arange(50), row))[:5]
            g = got[got.qid == qi].sort_values("rank")["vec_id"].tolist()
            assert g == want.tolist()

    def test_pq_duplicate_vector_is_top1(self, emb):
        t, m = emb
        m2 = np.vstack([m, m[0]])          # vec 50 duplicates vec 0
        t2 = pa.table(
            {"vec_id": pa.array(range(51), type=pa.int64()),
             "embedding": pa.array([r.tolist() for r in m2],
                                   type=pa.list_(pa.float32()))})
        book = x_sim.train_pq_codebook(m2, n_subspaces=4, n_centroids=8)
        codes = x_sim.pq_encode(ray.data.from_arrow(t2), book)
        got = (x_sim.pq_adc_knn(codes, m2[:1], np.array([0]), book, k=5)
               .to_pandas().sort_values("rank"))
        # identical vector -> identical codes -> identical ADC: vec 50 must
        # sit in the top-k at the MINIMUM distance (another vector may share
        # the same code cell and win the id tie-break, but never beat it)
        assert 50 in got["vec_id"].tolist()
        adc50 = float(got.loc[got["vec_id"] == 50, "adc"].iloc[0])
        assert adc50 == float(got["adc"].min())

    def test_ivfpq_matches_numpy_oracle(self, emb):
        t, m = emb
        coarse, book = x_sim.train_ivfpq(m, n_coarse=4, n_subspaces=4,
                                         n_centroids=8)
        assert coarse.shape == (4, 16) and book.shape == (4, 8, 4)
        ds = ray.data.from_arrow(t).repartition(4)
        codes_ds = x_sim.ivfpq_encode(ds, coarse, book)
        enc = (codes_ds.to_pandas().sort_values("vec_id")
               .reset_index(drop=True))
        cm = np.stack(enc["codes"].to_numpy()).astype(np.int64)
        buckets = enc["bucket"].to_numpy().astype(np.int64)
        # numpy oracle: same rounded-L2 argmin on the FOLDED centroids
        dsub = 4
        comb = coarse.reshape(4, 4, 1, dsub) + book[None]   # (C, M, K, dsub)
        want_bucket = np.argmin(np.round(np.sqrt((
            (m[:, None, :] - coarse[None]) ** 2).sum(axis=2)), 6), axis=1)
        assert (buckets == want_bucket).all()
        want_codes = np.empty((50, 4), dtype=np.int64)
        for i in range(50):
            for s in range(4):
                d = np.round(np.sqrt((
                    (m[i, s*dsub:(s+1)*dsub] - comb[want_bucket[i], s]) ** 2
                ).sum(axis=1)), 6)
                want_codes[i, s] = np.argmin(d)
        assert (cm == want_codes).all()
        # search oracle: probe 2 buckets, LUT on folded centroids, ADC sum
        q, qids = m[:3], np.arange(3)
        got = (x_sim.ivfpq_search(codes_ds, q, qids, coarse, book,
                                  k=5, nprobe=2)
               .to_pandas())
        dq = np.round(np.sqrt((
            (q[:, None, :] - coarse[None]) ** 2).sum(axis=2)), 6)
        probes = np.argsort(dq, axis=1, kind="stable")[:, :2]
        for qi in range(3):
            adc = np.full(50, np.inf)
            for i in range(50):
                if i == qi or want_bucket[i] not in probes[qi]:
                    continue
                s_adc = 0.0
                for s in range(4):
                    d = np.round(np.sqrt((
                        (q[qi, s*dsub:(s+1)*dsub]
                         - comb[want_bucket[i], s, want_codes[i, s]]) ** 2
                    ).sum()), 6)
                    s_adc += d
                adc[i] = np.round(s_adc, 6)
            want = np.lexsort((np.arange(50), adc))[:5]
            g = got[got.qid == qi].sort_values("rank")["vec_id"].tolist()
            assert g == want.tolist()

    def test_ivfpq_duplicate_vector_min_adc(self, emb):
        t, m = emb
        m2 = np.vstack([m, m[0]])          # vec 50 duplicates vec 0
        t2 = pa.table(
            {"vec_id": pa.array(range(51), type=pa.int64()),
             "embedding": pa.array([r.tolist() for r in m2],
                                   type=pa.list_(pa.float32()))})
        coarse, book = x_sim.train_ivfpq(m2, n_coarse=4, n_subspaces=4,
                                         n_centroids=8)
        codes = x_sim.ivfpq_encode(ray.data.from_arrow(t2), coarse, book)
        # probe ALL buckets so the duplicate is guaranteed to be scored
        got = (x_sim.ivfpq_search(codes, m2[:1], np.array([0]), coarse,
                                  book, k=5, nprobe=4)
               .to_pandas().sort_values("rank"))
        assert 50 in got["vec_id"].tolist()
        adc50 = float(got.loc[got["vec_id"] == 50, "adc"].iloc[0])
        assert adc50 == float(got["adc"].min())

    def test_ivf_recall_reasonable(self, emb):
        t, m = emb
        q = m[:3]
        ds = ray.data.from_arrow(t).repartition(4)
        exact = x_sim.knn_cosine(ds, q, np.arange(3), k=5).to_pandas()
        approx = x_sim.ivf_knn(ds, q, np.arange(3), k=5, n_centroids=4, nprobe=3).to_pandas()
        # nprobe 3/4 buckets -> should recover most exact neighbors
        inter = 0
        for qi in range(3):
            e = set(exact[exact.qid == qi]["vec_id"])
            a = set(approx[approx.qid == qi]["vec_id"])
            inter += len(e & a)
        assert inter >= 9   # >=60% recall on this easy fixture

    @staticmethod
    def _recall(exact, approx, qids):
        hit = total = 0
        for qi in qids:
            e = set(exact[exact.qid == qi]["vec_id"])
            a = set(approx[approx.qid == qi]["vec_id"])
            hit += len(e & a)
            total += len(e)
        return hit / max(1, total)

    def test_ivf_trained_centroids_recall_gate(self):
        """Recall gate on PLANTED clusters: spherical k-means must recover
        the structure, giving recall@5 >= 0.9 vs exact knn at nprobe=4
        (the reference's trained-IVF contract; random centroids fail this)."""
        rng = np.random.default_rng(7)
        centers = rng.standard_normal((8, 32))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        pts = np.concatenate([
            c + 0.12 * rng.standard_normal((64, 32)) for c in centers])
        t = pa.table({
            "vec_id": pa.array(np.arange(len(pts)), type=pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in pts]),
        })
        ds = ray.data.from_arrow(t).repartition(4)
        q = pts[:6]
        qids = np.arange(6)
        exact = x_sim.knn_cosine(ds, q, qids, k=5).to_pandas()
        approx = x_sim.ivf_knn(ds, q, qids, k=5, n_centroids=8,
                               nprobe=4).to_pandas()
        assert self._recall(exact, approx, qids) >= 0.9

    def test_ivf_recall_on_testdata(self):
        """The synthetic test embeddings are UNCLUSTERED (near-uniform
        bucket sizes), so bucket membership of true neighbors is ~random;
        this stability gate bounds recall at nprobe=8/16 (measured ~0.8) —
        the clustered-data contract is the planted-cluster gate above."""
        import os

        sf = "/root/testdata/sf0.001/embeddings.parquet"
        if not os.path.exists(sf):
            pytest.skip("testdata not present")
        ds = ray.data.read_parquet(sf, columns=["vec_id", "embedding"])
        t = ds.limit(5).to_pandas()
        q = np.stack(t["embedding"].to_numpy()).astype(np.float64)
        qids = t["vec_id"].to_numpy()
        exact = x_sim.knn_cosine(ds, q, qids, k=5).to_pandas()
        approx = x_sim.ivf_knn(ds, q, qids, k=5, n_centroids=16,
                               nprobe=8).to_pandas()
        assert self._recall(exact, approx, qids) >= 0.7

    def test_embedding_dup_pairs(self, emb):
        t, m = emb
        # plant a duplicate vector
        dup = pa.table(
            {"vec_id": pa.array([100], type=pa.int64()),
             "embedding": pa.array([t.column("embedding")[0].as_py()],
                                    type=pa.list_(pa.float32()))}
        )
        ds = ray.data.from_arrow(pa.concat_tables([t, dup]))
        out = x_sim.embedding_dup_pairs(ds, threshold=0.999).to_pandas()
        assert (0, 100) in set(zip(out["id_a"], out["id_b"]))

    def test_covariance_matches_numpy(self, emb):
        t, m = emb
        ds = ray.data.from_arrow(t).repartition(4)
        mo = x_sim.embedding_covariance(ds)
        assert mo["n"] == 50
        np.testing.assert_allclose(mo["mean"], m.mean(axis=0), atol=1e-9)
        np.testing.assert_allclose(mo["cov"], np.round(np.cov(m, rowvar=False, ddof=0), 6),
                                   atol=2e-6)
        # symmetric by construction (upper triangle mirrored)
        np.testing.assert_array_equal(mo["cov"], mo["cov"].T)

    def test_pca_project(self, emb):
        t, m = emb
        ds = ray.data.from_arrow(t).repartition(4)
        mo = x_sim.embedding_covariance(ds)
        out = x_sim.pca_project(ds, 4, moments=mo).to_pandas().sort_values("vec_id")
        p = np.stack(out["pca"].to_numpy())
        assert p.shape == (50, 4)
        # projected variance recovers the top-4 eigenvalues, in order
        w = np.sort(np.linalg.eigh(mo["cov"])[0])[::-1][:4]
        np.testing.assert_allclose(p.var(axis=0, ddof=0), w, atol=1e-5)
        assert (np.diff(p.var(axis=0, ddof=0)) <= 1e-12).all()
        # components are orthogonal => projected dims decorrelated
        c = np.cov(p, rowvar=False, ddof=0)
        off = c - np.diag(np.diag(c))
        assert np.abs(off).max() < 1e-6
        # deterministic across runs (sign fix)
        out2 = x_sim.pca_project(ds, 4, moments=mo).to_pandas().sort_values("vec_id")
        np.testing.assert_array_equal(p, np.stack(out2["pca"].to_numpy()))


class TestTextStats:
    def test_token_counts(self):
        ds = ray.data.from_arrow(_docs_table())
        out = x_text.token_counts(ds).to_pandas().sort_values("doc_id")
        assert out.iloc[0]["n_tokens"] == 9
        assert out.iloc[0]["n_unique_terms"] == 8     # 'the' twice
        assert out.iloc[5]["n_tokens"] == 0

    def test_quality_scores(self):
        ds = ray.data.from_arrow(_docs_table())
        out = x_text.quality_scores(ds).to_pandas().sort_values("doc_id")
        r0 = out.iloc[0]
        assert r0["stopword_ratio"] == pytest.approx(2 / 9)   # 'the' x2 of 9
        assert r0["n_chars"] == len(_docs_table().column("text")[0].as_py())

    def test_fingerprints_parallelism_invariant(self):
        ds1 = ray.data.from_arrow(_docs_table())
        ds2 = ray.data.from_arrow(_docs_table()).repartition(3)
        f1 = x_text.fingerprints(ds1).to_pandas().sort_values("doc_id")["fingerprint"].tolist()
        f2 = x_text.fingerprints(ds2).to_pandas().sort_values("doc_id")["fingerprint"].tolist()
        assert f1 == f2
        assert f1[0] == f1[1] and f1[0] != f1[3]

    def test_term_stats_df_cf(self):
        ds = ray.data.from_arrow(_docs_table())
        out = x_text.term_stats(ds).to_pandas().set_index("term")
        assert out.loc["the", "df"] == 3      # docs 0,1,2
        assert out.loc["the", "cf"] == 6      # 2+2+2

    def test_bigram_stats_vs_naive(self):
        """bigram_stats == a naive per-doc adjacent-pair count, at any
        parallelism (pairs never cross doc boundaries)."""
        from collections import Counter

        from colbert_ray.pipelines.phrase import phrase_tokens

        t = _docs_table()
        want = Counter()
        for txt in t.column("text").to_pylist():
            toks = phrase_tokens(txt, x_text._cfg())
            want.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
        for n_parts in (1, 4):
            ds = ray.data.from_arrow(t).repartition(n_parts)
            got = dict(zip(*(x_text.bigram_stats(ds).to_pandas()
                             [c] for c in ("gram", "n"))))
            assert got == dict(want)

    def test_doclen_quantiles_vs_numpy(self):
        """Histogram-shape quantiles == percentile_disc on the raw lengths,
        at any parallelism."""
        import math

        from colbert_ray.pipelines.phrase import phrase_tokens

        t = _docs_table()
        lens = np.sort([len(phrase_tokens(x, x_text._cfg()))
                        for x in t.column("text").to_pylist()])
        for n_parts in (1, 4):
            got = x_text.doclen_quantiles(
                ray.data.from_arrow(t).repartition(n_parts)).to_pandas()
            assert got["n_docs"].iat[0] == len(lens)
            for q in (25, 50, 75, 90, 99):
                idx = max(0, math.ceil(q / 100 * len(lens) - 1e-9) - 1)
                assert got[f"p{q}"].iat[0] == lens[idx]

    def test_tfidf_topk_vs_naive(self):
        """tfidf_topk == a naive per-doc tf*ln(N/df) top-k with (score desc,
        term asc) tie-break, at any parallelism."""
        import math
        from collections import Counter

        from colbert_ray.pipelines.phrase import phrase_tokens

        t = _docs_table()
        texts = t.column("text").to_pylist()
        ids = t.column("doc_id").to_pylist()
        toks = [phrase_tokens(x, x_text._cfg()) for x in texts]
        n = len(texts)
        df = Counter()
        for tk in toks:
            df.update(set(tk))
        want = []
        for did, tk in zip(ids, toks):
            tf = Counter(tk)
            scored = sorted(
                ((round(c * math.log(n / df[w]), 6), w) for w, c in tf.items()),
                key=lambda sw: (-sw[0], sw[1]))[:3]
            want += [(did, w, s, r + 1)
                     for r, (s, w) in enumerate(scored)]
        want_df = pd.DataFrame(want, columns=["doc_id", "term", "tfidf", "rank"])
        for n_parts in (1, 4):
            ds = ray.data.from_arrow(t).repartition(n_parts)
            got = (x_text.tfidf_topk(ds, k=3).to_pandas()
                   .sort_values(["doc_id", "rank"]).reset_index(drop=True))
            pd.testing.assert_frame_equal(got[want_df.columns], want_df)


class TestMultimodal:
    def test_extractor_deterministic_and_typed(self):
        ids = np.arange(5)
        blobs = [bytes([i]) * (10 + i) for i in range(5)]
        ds = ray.data.from_arrow(make_payload_table(ids, blobs))
        out1 = extract_media_features(ds, concurrency=1).to_pandas().sort_values("item_id")
        out2 = extract_media_features(ds, concurrency=2).to_pandas().sort_values("item_id")
        assert out1["pixel_mean"].tolist() == out2["pixel_mean"].tolist()
        assert out1["decoded"].all()
        assert all(len(f) == 48 for f in out1["features"])    # 4x4x3

    def test_unsupported_media_marked_not_decoded(self):
        t = make_payload_table(np.array([0]), [b"audio-bytes"], media_type="audio")
        out = MediaFeatureExtractor()(t)
        assert out.column("decoded").to_pylist() == [False]
        assert out.column("n_bytes").to_pylist() == [11]


class TestMultimodalVideoAudio:
    def test_frame_sampling_deterministic_and_strided(self):
        from colbert_ray.extras.multimodal import (
            FakeVideoDecoder,
            make_payload_table,
            sample_video_frames,
        )

        blobs = [bytes(range(50)), b"x" * 200]
        t = make_payload_table(np.array([7, 8]), blobs, media_type="video")
        ds = ray.data.from_arrow(t)
        out = sample_video_frames(ds, stride=4, max_frames=3).to_pandas()
        dec = FakeVideoDecoder()
        for item, blob in ((7, blobs[0]), (8, blobs[1])):
            rows = out[out.item_id == item].sort_values("frame_idx")
            picks = list(range(0, dec.n_frames(blob), 4))[:3]
            assert rows["frame_idx"].tolist() == picks
            # deterministic: frame mean matches a direct decode
            assert rows["frame_mean"].tolist() == [
                float(dec.decode_frame(blob, i).mean()) for i in picks]
        out2 = sample_video_frames(ray.data.from_arrow(t).repartition(2),
                                   stride=4, max_frames=3).to_pandas()
        assert sorted(map(tuple, out2.values.tolist())) == \
            sorted(map(tuple, out.values.tolist()))

    def test_audio_features_shapes_and_values(self):
        from colbert_ray.extras.multimodal import (
            extract_audio_features,
            make_payload_table,
        )

        x = np.arange(-50, 50, dtype=np.int16).tobytes()
        t = make_payload_table(np.array([1, 2]), [x, b""], media_type="audio")
        out = extract_audio_features(ray.data.from_arrow(t)).to_pandas()
        out = out.sort_values("item_id").reset_index(drop=True)
        assert out["n_samples"].tolist()[0] == 100
        assert len(out["rms_windows"][0]) == 8
        # one sign change in the ramp -> zcr = 1/99
        assert out["zero_crossing_rate"][0] == pytest.approx(1 / 99)


class TestSlidingWindow:
    def test_sessionize_gap_split_and_tie_stability(self):
        import pyarrow as pa

        from colbert_ray.extras import relational as x_rel

        base = np.datetime64("2024-01-01T00:00:00", "us")
        m = np.timedelta64(60_000_000, "us")      # 1 minute
        # user 1: two sessions (40-min gap); duplicate ts inside session 1
        ts = [base, base + 5 * m, base + 5 * m, base + 45 * m,
              base + 46 * m]
        ev = ray.data.from_arrow(pa.table({
            "user_id": pa.array([1] * 5 + [2], type=pa.int64()),
            "ts": pa.array(list(ts) + [base], type=pa.timestamp("us")),
        }))
        out = (x_rel.sessionize(ev, gap_minutes=30).to_pandas()
               .sort_values(["user_id", "session_id"]).reset_index(drop=True))
        u1 = out[out.user_id == 1]
        assert u1["session_id"].tolist() == [1, 2]
        assert u1["n_events"].tolist() == [3, 2]
        assert u1["session_start"].iloc[1] == pd.Timestamp("2024-01-01 00:45:00")
        u2 = out[out.user_id == 2]
        assert u2["n_events"].tolist() == [1]

    def test_sliding_equals_naive(self):
        """Two-level partial-aggregate sliding window == naive per-window
        recount over raw events."""
        from colbert_ray.extras.relational import events_sliding_window

        HOUR = 3_600_000_000
        rng = np.random.default_rng(5)
        n = 400
        ts = (rng.integers(0, 10, size=n) * HOUR
              + rng.integers(0, HOUR, size=n)).astype("datetime64[us]")
        t = pa.table({
            "user_id": pa.array(rng.integers(0, 5, size=n), type=pa.int64()),
            "ts": pa.array(ts),
            "value": pa.array(rng.random(n)),
        })
        out = (events_sliding_window(ray.data.from_arrow(t), hours=3)
               .to_pandas().sort_values(["user_id", "window_start"])
               .reset_index(drop=True))
        df = t.to_pandas()
        df["h"] = (df["ts"].astype("int64") // HOUR) * HOUR
        naive = {}
        for (u, h), g in df.groupby(["user_id", "h"]):
            for k in range(3):
                key = (u, h + k * HOUR)
                c, s = naive.get(key, (0, 0.0))
                naive[key] = (c + len(g), s + g["value"].sum())
        assert len(out) == len(naive)
        for _, r in out.iterrows():
            c, s = naive[(r["user_id"], r["window_start"])]
            assert r["n_events_3h"] == c
            assert abs(r["sum_value_3h"] - s) < 1e-9


class TestPersistedAnnIndex:
    def test_build_then_search_matches_ivf(self, tmp_path):
        """Persisted IVF index: bucket-partitioned parquet + saved
        centroids; ann_search reads only the probed buckets and returns the
        same ranking as the in-memory ivf_knn with identical centroids."""
        import os

        sf = "/root/testdata/sf0.001/embeddings.parquet"
        if not os.path.exists(sf):
            pytest.skip("testdata not present")
        ds = ray.data.read_parquet(sf, columns=["vec_id", "embedding"])
        out = str(tmp_path / "ann")
        man = x_sim.build_ann_index(ds, out, n_centroids=8)
        assert man["n_centroids"] == 8
        assert os.path.exists(os.path.join(out, "centroids.npy"))
        buckets = os.listdir(os.path.join(out, "buckets"))
        assert sum(1 for b in buckets if b.startswith("bucket=")) > 1

        t = ds.limit(4).to_pandas()
        q = np.stack(t["embedding"].to_numpy()).astype(np.float64)
        qids = t["vec_id"].to_numpy()
        got = (x_sim.ann_search(out, q, qids, k=5, nprobe=3)
               .to_pandas().sort_values(["qid", "rank"]).reset_index(drop=True))
        centroids = np.load(os.path.join(out, "centroids.npy"))
        want = (x_sim.ivf_knn(ds, q, qids, k=5, nprobe=3, centroids=centroids)
                .to_pandas().sort_values(["qid", "rank"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want)


class TestCleanCorpusPipeline:
    def test_filter_dedup_aggregate(self):
        from colbert_ray.extras.textstats import clean_corpus_stats

        texts = [
            "alpha beta gamma delta epsilon zeta eta theta iota kappa",  # 10 toks
            "alpha beta gamma delta epsilon zeta eta theta iota kappa",  # dup
            "the the the the the and and and and and of of",  # stopword-heavy
            "short doc",                                       # too short
            "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi",  # 12
        ]
        t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                      "text": pa.array(texts)})
        out = clean_corpus_stats(ray.data.from_arrow(t), min_tokens=10,
                                 max_stopword_ratio=0.5).to_pandas()
        # survivors: one copy of doc0/1 (10 toks) + doc4 (12 toks)
        assert out["n_docs"][0] == 2
        assert out["total_tokens"][0] == 22
        assert out["avg_tokens"][0] == pytest.approx(11.0)


class TestRepetitionStats:
    def test_handcrafted_fractions(self):
        """dup fractions against hand-computed values: 'x x x y' has 4
        tokens / 2 distinct (dup_word 0.5) and bigrams [x x, x x, x y] ->
        3 total / 2 distinct (dup_2gram 1/3); single-token and empty docs
        report 0.0 for both."""
        t = pa.table({
            "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "text": pa.array(["x x x y", "ab cd ab cd", "solo", ""]),
        })
        df = (x_text.repetition_stats(ray.data.from_arrow(t))
              .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert df["n_tokens"].tolist() == [4, 4, 1, 0]
        np.testing.assert_allclose(
            df["dup_word_frac"].to_numpy(), [0.5, 0.5, 0.0, 0.0])
        # doc1 bigrams: [ab cd, cd ab, ab cd] -> 3 total, 2 distinct
        np.testing.assert_allclose(
            df["dup_2gram_frac"].to_numpy(), [1 / 3, 1 / 3, 0.0, 0.0])

    def test_no_repetition_is_zero(self):
        t = pa.table({
            "doc_id": pa.array([0], type=pa.int64()),
            "text": pa.array(["alpha beta gamma delta"]),
        })
        df = x_text.repetition_stats(ray.data.from_arrow(t)).to_pandas()
        assert df["dup_word_frac"].iloc[0] == 0.0
        assert df["dup_2gram_frac"].iloc[0] == 0.0


class TestTemporalJoins:
    """asof_join / range_join (extras/relational.py): the single-shuffle
    co-group shapes, checked against naive per-row python oracles."""

    @staticmethod
    def _events(rows):
        # rows: (event_id, user_id, minutes_offset, event_type)
        base = np.datetime64("2024-01-01T00:00:00", "us")
        m = np.timedelta64(60_000_000, "us")
        return ray.data.from_arrow(pa.table({
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "ts": pa.array([base + r[2] * m for r in rows],
                           type=pa.timestamp("us")),
            "event_type": pa.array([r[3] for r in rows]),
        }))

    def test_asof_strict_backward_and_key_isolation(self):
        from colbert_ray.extras.relational import purchase_attribution

        ev = self._events([
            (1, 1, 0, "click"),
            (2, 1, 10, "click"),
            (3, 1, 10, "purchase"),   # strict: must pick click@0, not @10
            (4, 1, 30, "purchase"),   # picks click@10
            (5, 2, 5, "purchase"),    # user 2 has no click -> dropped
            (6, 3, 0, "click"),       # user 3 has no purchase -> no row
        ])
        out = (purchase_attribution(ev).to_pandas()
               .sort_values("event_id").reset_index(drop=True))
        assert out["event_id"].tolist() == [3, 4]
        assert out["click_event_id"].tolist() == [1, 2]
        assert out["lag_us"].tolist() == [10 * 60_000_000, 20 * 60_000_000]

    def test_asof_tie_break_is_greatest_payload(self):
        from colbert_ray.extras.relational import asof_join

        # two clicks at the SAME timestamp: the greater event_id must win,
        # deterministically, regardless of block order
        ev = self._events([
            (7, 1, 5, "click"),
            (2, 1, 5, "click"),
            (9, 1, 20, "purchase"),
        ])

        def typed(kind):
            def f(b):
                import pyarrow.compute as pc
                return b.filter(pc.equal(b.column("event_type"), kind))
            return f

        out = asof_join(
            ev, ev, by="user_id", left_on="ts", right_on="ts",
            left_payload={"event_id": ("event_id", pa.int64())},
            right_payload={"click_event_id": ("event_id", pa.int64())},
            strict=True, left_filter=typed("purchase"),
            right_filter=typed("click")).to_pandas()
        assert out["click_event_id"].tolist() == [7]

    def test_asof_non_strict_matches_equal_ts(self):
        from colbert_ray.extras.relational import asof_join

        ev = self._events([(1, 1, 10, "click"), (2, 1, 10, "purchase")])

        def typed(kind):
            def f(b):
                import pyarrow.compute as pc
                return b.filter(pc.equal(b.column("event_type"), kind))
            return f

        kw = dict(by="user_id", left_on="ts", right_on="ts",
                  left_payload={"event_id": ("event_id", pa.int64())},
                  right_payload={"click_event_id": ("event_id", pa.int64())},
                  left_filter=typed("purchase"), right_filter=typed("click"))
        assert asof_join(ev, ev, strict=True, **kw).count() == 0
        nonstrict = asof_join(ev, ev, strict=False, **kw).to_pandas()
        assert nonstrict["click_event_id"].tolist() == [1]

    def test_range_join_bounds(self):
        from colbert_ray.extras.relational import click_conversions

        ev = self._events([
            (1, 1, 0, "click"),
            (2, 1, 0, "purchase"),            # gap 0: excluded (strict lower)
            (3, 1, 24 * 60, "purchase"),      # gap = window: included
            (4, 1, 24 * 60 + 1, "purchase"),  # gap > window: excluded
        ])
        out = click_conversions(ev, window_hours=24).to_pandas()
        assert out["purchase_event_id"].tolist() == [3]
        assert out["gap_us"].tolist() == [24 * 3_600_000_000]

    def test_range_join_equals_naive_random(self):
        from colbert_ray.extras.relational import click_conversions

        rng = np.random.default_rng(11)
        n = 400
        rows = [(i, int(rng.integers(0, 5)), int(rng.integers(0, 3000)),
                 str(rng.choice(["click", "purchase", "view"])))
                for i in range(n)]
        out = (click_conversions(self._events(rows), window_hours=6)
               .to_pandas())
        got = set(zip(out["click_event_id"], out["purchase_event_id"]))
        W = 6 * 60  # minutes
        want = {(a[0], b[0]) for a in rows for b in rows
                if a[1] == b[1] and a[3] == "click" and b[3] == "purchase"
                and 0 < b[2] - a[2] <= W}
        assert got == want
        # gaps exact
        gap = dict(zip(zip(out["click_event_id"], out["purchase_event_id"]),
                       out["gap_us"]))
        for a in rows:
            for b in rows:
                if (a[0], b[0]) in want:
                    assert gap[(a[0], b[0])] == (b[2] - a[2]) * 60_000_000

    def test_asof_equals_naive_random(self):
        from colbert_ray.extras.relational import purchase_attribution

        rng = np.random.default_rng(23)
        n = 500
        rows = [(i, int(rng.integers(0, 7)), int(rng.integers(0, 5000)),
                 str(rng.choice(["click", "purchase", "view"])))
                for i in range(n)]
        ev = self._events(rows).repartition(9)
        out = purchase_attribution(ev).to_pandas()
        got = dict(zip(out["event_id"], out["click_event_id"]))
        want = {}
        for eid, uid, t, typ in rows:
            if typ != "purchase":
                continue
            prior = [(t2, e2) for e2, u2, t2, ty2 in rows
                     if u2 == uid and ty2 == "click" and t2 < t]
            if prior:
                want[eid] = max(prior)[1]
        assert got == want


class TestHLLSketch:
    """HyperLogLog distinct counting (extras/sketches.py): accuracy vs exact,
    mergeability (batch-size invariance), and the fmix64 avalanche twin."""

    def test_fmix64_reference_vector_and_sql_twin(self):
        import duckdb

        from colbert_ray.functions.hashing import fmix64, sql_fmix64_expr

        # murmur3 fmix64(1) public test vector
        assert int(fmix64(np.array([1], dtype=np.uint64))[0]) == 0xB456BCFC34C2CB2C
        rng = np.random.default_rng(7)
        vals = np.concatenate([
            np.array([0, 1, 2**63, 2**64 - 1], dtype=np.uint64),
            rng.integers(0, 2**64, 12, dtype=np.uint64)])
        want = fmix64(vals)
        con = duckdb.connect()
        for v, w in zip(vals, want):
            got = con.sql(
                f"select {sql_fmix64_expr(f'{int(v)}::HUGEINT')}").fetchone()[0]
            assert int(got) == int(w)

    def test_accuracy_and_batch_size_invariance(self):
        from colbert_ray.extras.sketches import hll_distinct

        n = 20_000
        keys = pa.array([f"key-{i}" for i in range(n)])
        t = pa.table({"k": keys})
        est1 = hll_distinct(ray.data.from_arrow(t), "k")
        # different block structure -> same registers -> IDENTICAL estimate
        est2 = hll_distinct(
            ray.data.from_arrow(t).repartition(7), "k")
        e1 = est1.column("est_distinct")[0].as_py()
        e2 = est2.column("est_distinct")[0].as_py()
        assert e1 == e2
        assert abs(e1 - n) / n < 0.1  # p=10 -> ~3.25% sigma

    def test_grouped_matches_per_group(self):
        from colbert_ray.extras.sketches import hll_distinct

        t = pa.table({
            "g": pa.array(["a"] * 300 + ["b"] * 50),
            "k": pa.array([f"u{i % 97}" for i in range(300)]
                          + [f"v{i}" for i in range(50)]),
        })
        grouped = (hll_distinct(ray.data.from_arrow(t), "k", "g")
                   .to_pandas().sort_values("g").reset_index(drop=True))
        for i, g in enumerate(["a", "b"]):
            sub = t.filter(pa.compute.equal(t.column("g"), g))
            solo = hll_distinct(ray.data.from_arrow(sub), "k")
            assert grouped["est_distinct"][i] == solo.column("est_distinct")[0].as_py()
            assert grouped["n_used_registers"][i] == solo.column("n_used_registers")[0].as_py()

    def test_duplicates_do_not_move_estimate(self):
        from colbert_ray.extras.sketches import hll_distinct

        base = pa.table({"k": pa.array([f"x{i}" for i in range(500)])})
        dup = pa.table({"k": pa.array([f"x{i % 500}" for i in range(5000)])})
        e1 = hll_distinct(ray.data.from_arrow(base), "k").column("est_distinct")[0].as_py()
        e2 = hll_distinct(ray.data.from_arrow(dup), "k").column("est_distinct")[0].as_py()
        assert e1 == e2


class TestCountMinSketch:
    """Count-Min frequency sketch (extras/sketches.py)."""

    @staticmethod
    def _keys_table(n=4000, n_keys=300, seed=3):
        rng = np.random.default_rng(seed)
        ks = rng.integers(0, n_keys, n)
        return pa.table({"k": pa.array([f"key{v}" for v in ks])}), ks

    def test_overcount_never_undercount_and_batch_invariant(self):
        from collections import Counter

        from colbert_ray.extras.sketches import cm_estimate, count_min_sketch

        t, ks = self._keys_table()
        exact = Counter(ks)
        probe = [f"key{v}" for v in sorted(exact)]
        want_exact = np.array([exact[int(p[3:])] for p in probe])
        sk1 = count_min_sketch(ray.data.from_arrow(t), "k")
        sk2 = count_min_sketch(ray.data.from_arrow(t).repartition(7), "k")
        np.testing.assert_array_equal(sk1, sk2)   # mergeable partials
        est = cm_estimate(sk1, probe)
        assert (est >= want_exact).all()          # CM never undercounts
        assert (est > want_exact).any()           # collisions exist at w=64
        # every sketch row sums to the stream length
        assert (sk1.sum(axis=1) == len(ks)).all()

    def test_exact_when_width_exceeds_keys(self):
        from collections import Counter

        from colbert_ray.extras.sketches import cm_estimate, count_min_sketch

        t, ks = self._keys_table(n=1000, n_keys=20)
        exact = Counter(ks)
        probe = [f"key{v}" for v in sorted(exact)]
        sk = count_min_sketch(ray.data.from_arrow(t), "k", depth=4, width=4096)
        est = cm_estimate(sk, probe)
        want = np.array([exact[int(p[3:])] for p in probe])
        # 20 keys in 4096 buckets x 4 rows: no collision survives the min
        np.testing.assert_array_equal(est, want)

    def test_int_keys_cast_like_sql(self):
        from colbert_ray.extras.sketches import cm_estimate, count_min_sketch

        t = pa.table({"k": pa.array([7, 7, 8], type=pa.int64())})
        sk = count_min_sketch(ray.data.from_arrow(t), "k")
        np.testing.assert_array_equal(cm_estimate(sk, ["7", "8"]),
                                      np.array([2, 1]))


class TestHashSampling:
    """Deterministic hash sampling/splitting (extras/sampling.py)."""

    def test_sample_deterministic_and_near_rate(self):
        from colbert_ray.extras.sampling import hash_sample

        t = pa.table({"k": pa.array([f"id-{i}" for i in range(10_000)])})
        a = hash_sample(ray.data.from_arrow(t), "k", 0.25).to_pandas()
        b = hash_sample(ray.data.from_arrow(t).repartition(9), "k", 0.25).to_pandas()
        assert sorted(a["k"]) == sorted(b["k"])          # parallelism-invariant
        assert abs(len(a) / 10_000 - 0.25) < 0.02        # gate is unbiased

    def test_sample_subset_nesting(self):
        """A 10% sample is a SUBSET of the 30% sample (same seed) — the gate
        property that makes progressive sampling possible."""
        from colbert_ray.extras.sampling import hash_sample

        t = pa.table({"k": pa.array([f"id-{i}" for i in range(5_000)])})
        small = set(hash_sample(ray.data.from_arrow(t), "k", 0.1).to_pandas()["k"])
        big = set(hash_sample(ray.data.from_arrow(t), "k", 0.3).to_pandas()["k"])
        assert small <= big and len(small) < len(big)

    def test_split_disjoint_exhaustive_and_stable(self):
        from colbert_ray.extras.sampling import hash_split

        t = pa.table({"k": pa.array([f"u{i}" for i in range(8_000)])})
        fr = {"train": 0.8, "val": 0.1, "test": 0.1}
        df = hash_split(ray.data.from_arrow(t), "k", fr).to_pandas()
        assert len(df) == 8_000 and set(df["split"]) == set(fr)
        counts = df["split"].value_counts()
        assert abs(counts["train"] / 8_000 - 0.8) < 0.02
        # stable under reshuffling of blocks
        df2 = (hash_split(ray.data.from_arrow(t).repartition(13), "k", fr)
               .to_pandas().sort_values("k").reset_index(drop=True))
        df1 = df.sort_values("k").reset_index(drop=True)
        assert (df1["split"] == df2["split"]).all()

    def test_seed_changes_sample_consistently(self):
        from colbert_ray.extras.sampling import hash_sample

        t = pa.table({"k": pa.array([f"id-{i}" for i in range(4_000)])})
        s0 = set(hash_sample(ray.data.from_arrow(t), "k", 0.2, seed=0).to_pandas()["k"])
        s1 = set(hash_sample(ray.data.from_arrow(t), "k", 0.2, seed=99).to_pandas()["k"])
        assert s0 != s1
        # same seed across two DIFFERENT tables keyed alike -> same decision
        t2 = pa.table({"k": pa.array([f"id-{i}" for i in range(4_000)]),
                       "extra": pa.array(range(4_000))})
        s0b = set(hash_sample(ray.data.from_arrow(t2), "k", 0.2, seed=0).to_pandas()["k"])
        assert s0 == s0b

    def test_bad_fractions_raise(self):
        from colbert_ray.extras.sampling import hash_split

        t = pa.table({"k": pa.array(["a"])})
        with pytest.raises(ValueError):
            hash_split(ray.data.from_arrow(t), "k", {"a": 0.5, "b": 0.4})

    def test_stratified_exact_quota_and_parallelism_invariant(self):
        from colbert_ray.extras.sampling import stratified_sample

        t = pa.table({
            "doc_id": pa.array(range(3_000), type=pa.int64()),
            "grp": pa.array([f"g{i % 7}" for i in range(3_000)]),
        })
        a = (stratified_sample(ray.data.from_arrow(t), "grp", "doc_id", 15)
             .to_pandas().sort_values(["grp", "doc_id"]).reset_index(drop=True))
        assert (a.groupby("grp").size() == 15).all() and len(a) == 7 * 15
        b = (stratified_sample(ray.data.from_arrow(t).repartition(11),
                               "grp", "doc_id", 15)
             .to_pandas().sort_values(["grp", "doc_id"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b[a.columns])

    def test_stratified_small_group_returns_all(self):
        from colbert_ray.extras.sampling import stratified_sample

        t = pa.table({"doc_id": pa.array(range(10), type=pa.int64()),
                      "grp": pa.array(["a"] * 8 + ["b"] * 2)})
        df = stratified_sample(ray.data.from_arrow(t), "grp", "doc_id", 5).to_pandas()
        assert (df.groupby("grp").size().to_dict() == {"a": 5, "b": 2})

    def test_stratified_matches_global_rank_oracle(self):
        """Per-group members must be exactly the n smallest (hash, key) —
        verified against a naive full-sort oracle."""
        import pandas as _pd

        from colbert_ray.extras.sampling import _key_hash, stratified_sample

        t = pa.table({
            "doc_id": pa.array(range(1_000), type=pa.int64()),
            "grp": pa.array([f"g{i % 3}" for i in range(1_000)]),
        })
        got = (stratified_sample(ray.data.from_arrow(t), "grp", "doc_id", 9)
               .to_pandas().sort_values(["grp", "doc_id"]).reset_index(drop=True))
        df = t.to_pandas()
        df["h"] = _key_hash(t, "doc_id", 0)
        want = (df.sort_values(["h", "doc_id"]).groupby("grp").head(9)
                [["doc_id", "grp"]].sort_values(["grp", "doc_id"])
                .reset_index(drop=True))
        _pd.testing.assert_frame_equal(got[["doc_id", "grp"]], want)


class TestBloomSemijoin:
    """Bloom-filter semi-join (extras/bloom.py)."""

    @staticmethod
    def _tables():
        build = pa.table({"k": pa.array([f"b{i}" for i in range(200)])})
        probe = pa.table({
            "k": pa.array([f"b{i}" for i in range(100)]      # 100 true hits
                          + [f"p{i}" for i in range(2000)]),  # 2000 non-members
            "v": pa.array(range(2100)),
        })
        return build, probe

    def test_no_false_negatives_and_fp_rate(self):
        from colbert_ray.extras.bloom import bloom_semijoin, build_bloom

        build, probe = self._tables()
        true_members = {f"b{i}" for i in range(100)}
        # tiny filter -> false positives certain, false negatives impossible
        bits = build_bloom(ray.data.from_arrow(build), "k", n_bits=512, k=2)
        kept = set(bloom_semijoin(ray.data.from_arrow(probe), bits, "k", k=2)
                   .to_pandas()["k"])
        assert true_members <= kept
        fp_small = len(kept) - len(true_members)
        assert fp_small > 0
        # generous filter -> near-zero false positives
        bits_big = build_bloom(ray.data.from_arrow(build), "k",
                               n_bits=1 << 16, k=5)
        kept_big = set(bloom_semijoin(ray.data.from_arrow(probe), bits_big,
                                      "k", k=5).to_pandas()["k"])
        assert true_members <= kept_big
        assert len(kept_big) - len(true_members) <= 2

    def test_parallelism_invariance(self):
        from colbert_ray.extras.bloom import bloom_semijoin, build_bloom

        build, probe = self._tables()
        b1 = build_bloom(ray.data.from_arrow(build), "k", n_bits=512, k=2)
        b2 = build_bloom(ray.data.from_arrow(build).repartition(11),
                         "k", n_bits=512, k=2)
        assert (b1 == b2).all()
        k1 = sorted(bloom_semijoin(ray.data.from_arrow(probe), b1, "k", k=2)
                    .to_pandas()["k"])
        k2 = sorted(bloom_semijoin(ray.data.from_arrow(probe).repartition(7),
                                   b1, "k", k=2).to_pandas()["k"])
        assert k1 == k2

    def test_n_bits_must_be_power_of_two(self):
        from colbert_ray.extras.bloom import build_bloom

        with pytest.raises(AssertionError):
            build_bloom(ray.data.from_arrow(self._tables()[0]), "k",
                        n_bits=960, k=2)


class TestAntiJoin:
    """Tiered anti join (extras/bloom.py anti_join)."""

    def test_matches_naive_anti(self):
        from colbert_ray.extras.bloom import anti_join

        left = pa.table({"lk": pa.array([f"k{i}" for i in range(300)]),
                         "v": pa.array(range(300))})
        # right covers k0..k199 (duplicated 3x: join must not fan out)
        right = pa.table({"rk": pa.array([f"k{i}" for i in range(200)] * 3)})
        out = anti_join(ray.data.from_arrow(left).repartition(5),
                        ray.data.from_arrow(right).repartition(3),
                        on="lk", right_on="rk",
                        n_bits=512, k=2)   # tiny bloom -> FPs forced into verify
        df = out.to_pandas().sort_values("v").reset_index(drop=True)
        assert df["lk"].tolist() == [f"k{i}" for i in range(200, 300)]
        assert list(df.columns) == ["lk", "v"]

    def test_all_match_yields_empty(self):
        from colbert_ray.extras.bloom import anti_join

        t = pa.table({"lk": pa.array(["a", "b"]), "v": pa.array([1, 2])})
        r = pa.table({"rk": pa.array(["a", "b", "b"])})
        out = anti_join(ray.data.from_arrow(t), ray.data.from_arrow(r),
                        on="lk", right_on="rk")
        assert out.count() == 0

    def test_same_key_name_rejected(self):
        from colbert_ray.extras.bloom import anti_join

        t = pa.table({"k": pa.array(["a"])})
        with pytest.raises(AssertionError):
            anti_join(ray.data.from_arrow(t), ray.data.from_arrow(t), on="k")


class TestGroupedTopk:
    def _orders(self):
        rng = np.random.default_rng(11)
        n = 400
        return pa.table({
            "g": pa.array(rng.integers(0, 20, n), type=pa.int64()),
            "id": pa.array(np.arange(n), type=pa.int64()),
            "x": pa.array(rng.standard_normal(n)),
        })

    def _naive(self, t, k, descending=True):
        df = t.to_pandas()
        sign = -1 if descending else 1
        df = df.sort_values(["g", "x", "id"],
                            ascending=[True, not descending, True])
        df["rn"] = df.groupby("g").cumcount() + 1
        return df[df["rn"] <= k].reset_index(drop=True)

    def test_matches_window_semantics(self):
        from colbert_ray.extras.relational import grouped_topk

        t = self._orders()
        out = (grouped_topk(ray.data.from_arrow(t).repartition(7),
                            "g", "x", 3, tie_col="id")
               .to_pandas().sort_values(["g", "rn"]).reset_index(drop=True))
        want = self._naive(t, 3)
        pd.testing.assert_frame_equal(
            out[["g", "id", "x", "rn"]], want[["g", "id", "x", "rn"]])

    def test_ascending_and_small_groups(self):
        from colbert_ray.extras.relational import grouped_topk

        # k larger than some group sizes; ascending order
        t = pa.table({"g": pa.array([0, 0, 1], type=pa.int64()),
                      "id": pa.array([0, 1, 2], type=pa.int64()),
                      "x": pa.array([5.0, 3.0, 9.0])})
        out = (grouped_topk(ray.data.from_arrow(t), "g", "x", 10,
                            tie_col="id", descending=False)
               .to_pandas().sort_values(["g", "rn"]).reset_index(drop=True))
        assert out[out.g == 0]["id"].tolist() == [1, 0]   # ascending by x
        assert out[out.g == 0]["rn"].tolist() == [1, 2]
        assert out[out.g == 1]["rn"].tolist() == [1]

    def test_tie_break_deterministic(self):
        from colbert_ray.extras.relational import grouped_topk

        t = pa.table({"g": pa.array([0] * 5, type=pa.int64()),
                      "id": pa.array([4, 2, 0, 3, 1], type=pa.int64()),
                      "x": pa.array([1.0] * 5)})
        out = (grouped_topk(ray.data.from_arrow(t).repartition(3),
                            "g", "x", 3, tie_col="id")
               .to_pandas().sort_values("rn"))
        assert out["id"].tolist() == [0, 1, 2]


class TestPricingRollup:
    def test_levels_consistent(self):
        from colbert_ray.extras.relational import pricing_rollup

        rng = np.random.default_rng(3)
        n = 500
        t = pa.table({
            "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n)),
            "l_linestatus": pa.array(rng.choice(["F", "O"], n)),
            "l_quantity": pa.array(rng.integers(1, 50, n).astype(float)),
            "l_extendedprice": pa.array(rng.uniform(100, 9000, n)),
            "l_discount": pa.array(rng.uniform(0, 0.1, n)),
        })
        out = pricing_rollup(ray.data.from_arrow(t).repartition(4)).to_pandas()
        detail = out[out.lvl == 0]
        sub = out[out.lvl == 1]
        grand = out[out.lvl == 3]
        assert len(grand) == 1
        assert int(grand["count_order"].iloc[0]) == n
        # each subtotal equals the sum of its detail rows (round-2 tolerance)
        for _, r in sub.iterrows():
            d = detail[detail.l_returnflag == r.l_returnflag]
            assert int(d["count_order"].sum()) == int(r["count_order"])
            assert abs(d["sum_revenue"].sum() - r["sum_revenue"]) < 0.02
        assert abs(detail["sum_qty"].sum() - grand["sum_qty"].iloc[0]) < 0.02


class TestPricingCube:
    def test_cube_adds_column_marginals(self):
        from colbert_ray.extras.relational import pricing_cube, pricing_rollup

        rng = np.random.default_rng(3)
        n = 500
        t = pa.table({
            "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n)),
            "l_linestatus": pa.array(rng.choice(["F", "O"], n)),
            "l_quantity": pa.array(rng.integers(1, 50, n).astype(float)),
            "l_extendedprice": pa.array(rng.uniform(100, 9000, n)),
            "l_discount": pa.array(rng.uniform(0, 0.1, n)),
        })
        cube = pricing_cube(ray.data.from_arrow(t).repartition(4)).to_pandas()
        roll = pricing_rollup(ray.data.from_arrow(t).repartition(4)).to_pandas()
        # CUBE = ROLLUP + the lvl-2 (returnflag rolled up) grouping set
        pd.testing.assert_frame_equal(
            cube[cube.lvl != 2].reset_index(drop=True), roll)
        by_status = cube[cube.lvl == 2]
        detail = cube[cube.lvl == 0]
        assert set(by_status.l_linestatus) == set(detail.l_linestatus)
        for _, r in by_status.iterrows():
            d = detail[detail.l_linestatus == r.l_linestatus]
            assert int(d["count_order"].sum()) == int(r["count_order"])
            assert abs(d["sum_revenue"].sum() - r["sum_revenue"]) < 0.02


class TestSkyline:
    def _brute(self, v):
        # v: (n, d) all-maximize matrix
        keep = []
        for i in range(len(v)):
            dom = ((v >= v[i]).all(axis=1) & (v > v[i]).any(axis=1)).any()
            if not dom:
                keep.append(i)
        return set(keep)

    def test_matches_bruteforce_random(self):
        from colbert_ray.extras.relational import skyline

        rng = np.random.default_rng(4)
        n = 400
        price = rng.uniform(10, 1000, n).round(2)
        dateint = rng.integers(0, 365, n)
        t = pa.table({"k": pa.array(range(n), type=pa.int64()),
                      "price": pa.array(price),
                      "day": pa.array(dateint.astype(np.int64))})
        for nblocks in (1, 8):
            out = skyline(ray.data.from_arrow(t).repartition(nblocks),
                          maximize=["price"], minimize=["day"],
                          keep_cols=["k", "price", "day"]).to_pandas()
            want = self._brute(np.column_stack([price, -dateint]))
            assert set(out["k"]) == want
            assert out["k"].is_monotonic_increasing

    def test_ties_keep_both(self):
        from colbert_ray.extras.relational import skyline

        t = pa.table({"k": pa.array([0, 1, 2], type=pa.int64()),
                      "price": pa.array([5.0, 5.0, 4.0]),
                      "day": pa.array([3, 3, 1], type=pa.int64())})
        out = skyline(ray.data.from_arrow(t), maximize=["price"],
                      minimize=["day"],
                      keep_cols=["k", "price", "day"]).to_pandas()
        # rows 0,1 tie on every criterion (both stay); row 2 trades off
        assert out["k"].tolist() == [0, 1, 2]

    def test_three_dim(self):
        from colbert_ray.extras.relational import skyline

        rng = np.random.default_rng(6)
        n = 200
        a = rng.uniform(size=n); b = rng.uniform(size=n); c = rng.uniform(size=n)
        t = pa.table({"k": pa.array(range(n), type=pa.int64()),
                      "a": pa.array(a), "b": pa.array(b), "c": pa.array(c)})
        out = skyline(ray.data.from_arrow(t).repartition(5),
                      maximize=["a", "b"], minimize=["c"],
                      keep_cols=["k", "a", "b", "c"]).to_pandas()
        want = self._brute(np.column_stack([a, b, -c]))
        assert set(out["k"]) == want


class TestInt8Quantization:
    def test_roundtrip_error_bounded(self):
        rng = np.random.default_rng(5)
        m = rng.standard_normal((40, 16))
        t = pa.table({"vec_id": pa.array(range(40), type=pa.int64()),
                      "embedding": pa.array([r.tolist() for r in m])})
        out = (x_sim.quantize_int8(ray.data.from_arrow(t).repartition(4))
               .to_pandas().sort_values("vec_id"))
        q = np.stack([np.asarray(v, dtype=np.float64) for v in out["q"]])
        scale = out["scale"].to_numpy()
        assert np.abs(q).max() <= 127
        # dequantization error is at most half a step per element
        err = np.abs(q * scale[:, None] - m)
        assert (err <= scale[:, None] / 2 + 1e-12).all()

    def test_zero_vector(self):
        t = pa.table({"vec_id": pa.array([0], type=pa.int64()),
                      "embedding": pa.array([[0.0, 0.0, 0.0]])})
        out = x_sim.quantize_int8(ray.data.from_arrow(t)).to_pandas()
        assert out["scale"].iloc[0] == 0.0
        assert list(out["q"].iloc[0]) == [0, 0, 0]

    def test_q8_knn_recall_vs_exact(self):
        rng = np.random.default_rng(9)
        m = rng.standard_normal((80, 32))
        t = pa.table({"vec_id": pa.array(range(80), type=pa.int64()),
                      "embedding": pa.array([r.tolist() for r in m])})
        ds = ray.data.from_arrow(t).repartition(4)
        qv, qi = m[:4], np.arange(4)
        exact = x_sim.knn_cosine(ds, qv, qi, k=5).to_pandas()
        q8 = x_sim.knn_cosine_q8(ds, qv, qi, k=5).to_pandas()
        hit = sum(len(set(exact[exact.qid == i]["vec_id"])
                      & set(q8[q8.qid == i]["vec_id"])) for i in range(4))
        # int8 quantization preserves direction to ~0.4% per element:
        # top-5 overlap with exact must be near-total on random gaussians
        assert hit >= 16   # >= 80% of 20

    def test_q8_zero_norm_docs_excluded(self):
        t = pa.table({"vec_id": pa.array([0, 1, 2], type=pa.int64()),
                      "embedding": pa.array([[1.0, 0.0], [0.0, 0.0],
                                             [0.5, 0.5]])})
        out = x_sim.knn_cosine_q8(ray.data.from_arrow(t),
                                  np.array([[1.0, 0.0]]), np.array([9]),
                                  k=3).to_pandas()
        assert set(out["vec_id"]) == {0, 2}   # the zero vector never ranks


class TestWeightedSample:
    def _tbl(self):
        rng = np.random.default_rng(13)
        return pa.table({
            "k": pa.array(np.arange(1000), type=pa.int64()),
            "w": pa.array(np.where(np.arange(1000) < 100, 50.0, 1.0)),
        })

    def test_weight_bias_and_determinism(self):
        from colbert_ray.extras.sampling import weighted_sample

        ds = ray.data.from_arrow(self._tbl())
        out = weighted_sample(ds, "k", "w", 100, seed=1).to_pandas()
        assert len(out) == 100 and out["k"].is_unique
        # heavy keys (w=50, 10% of rows) must dominate the sample
        heavy = (out["k"] < 100).sum()
        assert heavy > 50
        out2 = weighted_sample(ray.data.from_arrow(self._tbl()).repartition(9),
                               "k", "w", 100, seed=1).to_pandas()
        assert sorted(out["k"]) == sorted(out2["k"])   # parallelism-invariant
        out3 = weighted_sample(ds, "k", "w", 100, seed=2).to_pandas()
        assert sorted(out["k"]) != sorted(out3["k"])   # seed changes draw

    def test_n_larger_than_input(self):
        from colbert_ray.extras.sampling import weighted_sample

        t = pa.table({"k": pa.array([1, 2], type=pa.int64()),
                      "w": pa.array([1.0, 1.0])})
        out = weighted_sample(ray.data.from_arrow(t), "k", "w", 10).to_pandas()
        assert sorted(out["k"]) == [1, 2]


class TestGroupZscore:
    def test_matches_pandas(self):
        from colbert_ray.extras.relational import group_zscore

        rng = np.random.default_rng(21)
        n = 300
        t = pa.table({"g": pa.array(rng.choice(["a", "b", "c"], n)),
                      "id": pa.array(np.arange(n), type=pa.int64()),
                      "x": pa.array(rng.uniform(0, 10, n))})
        out = (group_zscore(ray.data.from_arrow(t).repartition(5), "g", "x")
               .to_pandas().sort_values("id").reset_index(drop=True))
        df = t.to_pandas()
        want = df.groupby("g")["x"].transform(
            lambda s: (s - s.mean()) / s.std(ddof=0))
        np.testing.assert_allclose(out["z"], want, atol=1e-9)
        # standardized: per-group mean ~0, std ~1
        gstats = out.groupby("g")["z"].agg(["mean", "std"])
        np.testing.assert_allclose(gstats["mean"], 0, atol=1e-9)

    def test_zero_variance_group(self):
        from colbert_ray.extras.relational import group_zscore

        t = pa.table({"g": pa.array(["a", "a", "b"]),
                      "x": pa.array([2.0, 2.0, 5.0])})
        out = group_zscore(ray.data.from_arrow(t), "g", "x").to_pandas()
        assert (out["z"] == 0).all()


class TestPivotCounts:
    def test_counts_and_unknown_values(self):
        from colbert_ray.extras.relational import pivot_counts

        t = pa.table({"g": pa.array([1, 1, 1, 2, 2], type=pa.int64()),
                      "e": pa.array(["a", "a", "b", "b", "zz"])})
        out = (pivot_counts(ray.data.from_arrow(t).repartition(3),
                            "g", "e", ["a", "b"])
               .to_pandas().sort_values("g").reset_index(drop=True))
        assert out["n_a"].tolist() == [2, 0]
        assert out["n_b"].tolist() == [1, 1]   # 'zz' ignored

    def test_group_with_only_unlisted_values_gets_zero_row(self):
        from colbert_ray.extras.relational import pivot_counts

        t = pa.table({"g": pa.array([1, 2], type=pa.int64()),
                      "e": pa.array(["a", "zz"])})
        out = (pivot_counts(ray.data.from_arrow(t), "g", "e", ["a"])
               .to_pandas().sort_values("g").reset_index(drop=True))
        # SQL count FILTER semantics: group 2 appears with zero counts
        assert out["g"].tolist() == [1, 2]
        assert out["n_a"].tolist() == [1, 0]

    def test_string_group_schema_stable_when_block_all_unlisted(self):
        from colbert_ray.extras.relational import pivot_counts

        t = pa.table({"g": pa.array(["u1", "u2"]),
                      "e": pa.array(["zz", "a"])})
        out = (pivot_counts(ray.data.from_arrow(t).repartition(2), "g", "e",
                            ["a"]).to_pandas().sort_values("g")
               .reset_index(drop=True))
        assert out["g"].tolist() == ["u1", "u2"]
        assert out["n_a"].tolist() == [0, 1]


class TestReviewRegressions:
    """Targeted regressions for the round-4 review findings."""

    def test_grouped_topk_int64_beyond_2_53(self):
        from colbert_ray.extras.relational import grouped_topk

        base = 2**60
        # consecutive int64 values that collapse under a float64 cast
        t = pa.table({"g": pa.array([0, 0, 0], type=pa.int64()),
                      "id": pa.array([0, 1, 2], type=pa.int64()),
                      "x": pa.array([base, base + 1, base + 2],
                                    type=pa.int64())})
        out = (grouped_topk(ray.data.from_arrow(t), "g", "x", 2,
                            tie_col="id").to_pandas().sort_values("rn"))
        assert out["id"].tolist() == [2, 1]   # true order, not tie-col order

    def test_zscore_large_mean_small_spread(self):
        from colbert_ray.extras.relational import group_zscore

        rng = np.random.default_rng(2)
        x = 1e6 + rng.uniform(-1e-3, 1e-3, 256)
        t = pa.table({"g": pa.array(["a"] * 256),
                      "id": pa.array(np.arange(256), type=pa.int64()),
                      "x": pa.array(x)})
        out = (group_zscore(ray.data.from_arrow(t).repartition(8), "g", "x")
               .to_pandas().sort_values("id"))
        want = (x - x.mean()) / x.std(ddof=0)
        # E[x^2]-E[x]^2 would be pure noise here; Chan-combined M2 is exact
        np.testing.assert_allclose(out["z"].to_numpy(), want, atol=1e-6)

    def test_q8_knn_tie_at_partial_cut(self):
        # four identical vectors (exact cosine ties) split across blocks:
        # the per-batch cut must pick the LOWEST ids, like the SQL twin
        t = pa.table({"vec_id": pa.array([3, 1, 2, 0, 4], type=pa.int64()),
                      "embedding": pa.array([[1.0, 1.0]] * 4 + [[1.0, 0.9]])})
        out = x_sim.knn_cosine_q8(ray.data.from_arrow(t).repartition(3),
                                  np.array([[2.0, 2.0]]), np.array([99]),
                                  k=3).to_pandas().sort_values("rank")
        assert out["vec_id"].tolist() == [0, 1, 2]


class TestRunningTotal:
    def test_prefix_and_tie_determinism(self):
        from colbert_ray.extras.relational import running_total

        base = np.datetime64("2026-01-01T00:00:00", "us")
        t = pa.table({
            "user_id": pa.array([1, 1, 1, 2], type=pa.int64()),
            # two equal timestamps: event_id must break the tie
            "event_id": pa.array([20, 10, 30, 40], type=pa.int64()),
            "ts": pa.array([base, base, base + 60_000_000, base]),
            "value": pa.array([1.0, 2.0, 4.0, 8.0]),
        })
        out = (running_total(ray.data.from_arrow(t).repartition(3))
               .to_pandas().sort_values(["user_id", "event_id"])
               .reset_index(drop=True))
        # ties sort by event_id: 10 (2.0) then 20 (+1.0), then 30 (+4.0);
        # output rows are ordered by event_id -> running 2.0, 3.0, 7.0
        assert out[out.user_id == 1]["running"].tolist() == [2.0, 3.0, 7.0]
        assert out[out.user_id == 2]["running"].tolist() == [8.0]


class TestRedact:
    def test_redact_pii_counts_and_text(self):
        from colbert_ray.extras import redact as x_red

        t = pa.table({
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array([
                "mail a.b-c%d@sub.example.org and x@y.io now",
                "call +1-212-555-0187 from 192.168.0.1 or 8.8.8.8",
                "nothing sensitive here",
            ]),
        })
        out = (x_red.redact_pii(ray.data.from_arrow(t))
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert out["n_email"].tolist() == [2, 0, 0]
        assert out["n_phone"].tolist() == [0, 1, 0]
        assert out["n_ipv4"].tolist() == [0, 2, 0]
        assert out["clean_text"][0] == "mail <EMAIL> and <EMAIL> now"
        assert out["clean_text"][1] == "call <PHONE> from <IP> or <IP>"
        assert out["clean_text"][2] == "nothing sensitive here"

    def test_normalize_text(self):
        from colbert_ray.extras import redact as x_red

        t = pa.table({
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "text": pa.array(["  Hello\t\tWORLD \n", "a  b"]),
        })
        out = (x_red.normalize_text(ray.data.from_arrow(t))
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert out["norm_text"].tolist() == ["hello world", "a b"]
        assert out["n_chars_norm"].tolist() == [11, 3]


class TestFrequentTerms:
    def _expected(self, texts, capacity):
        from collections import Counter

        from colbert_ray.config import EngineConfig
        from colbert_ray.functions.tokenizer import doc_term_frequencies

        dl, terms, tfs = doc_term_frequencies(
            pa.array(texts, type=pa.string()), EngineConfig())
        c = Counter()
        for ts, fs in zip(terms.to_pylist(), tfs.to_pylist()):
            for tm, f in zip(ts, fs):
                c[tm] += f
        n = sum(c.values())
        return {t: k for t, k in sorted(c.items()) if k * capacity > n}

    def test_exact_across_block_layouts(self):
        from colbert_ray.extras import sketches as x_sk

        rng = np.random.default_rng(7)
        vocab = [f"w{i}" for i in range(50)]
        # zipf-ish: low ids much more frequent
        texts = [" ".join(vocab[min(int(rng.zipf(1.3)) - 1, 49)]
                          for _ in range(30)) for _ in range(120)]
        expected = self._expected(texts, capacity=40)
        assert expected, "fixture must produce at least one heavy hitter"
        t = pa.table({"text": pa.array(texts, type=pa.string())})
        for nblocks in (1, 7):
            ds = ray.data.from_arrow(t).repartition(nblocks)
            out = x_sk.frequent_terms(ds, capacity=40).to_pandas()
            got = dict(zip(out["term"], out["cnt"]))
            assert got == expected, f"nblocks={nblocks}"

    def test_no_heavy_hitters_uniform(self):
        from colbert_ray.extras import sketches as x_sk

        texts = [f"u{i} v{i} x{i}" for i in range(200)]
        ds = ray.data.from_arrow(
            pa.table({"text": pa.array(texts, type=pa.string())}))
        out = x_sk.frequent_terms(ds, capacity=100).to_pandas()
        assert len(out) == 0


class TestEventGaps:
    def test_gaps_match_pandas_lag(self):
        from colbert_ray.extras import relational as x_rel

        rng = np.random.default_rng(3)
        n = 400
        base = np.datetime64("2026-01-01T00:00:00", "us")
        df = pd.DataFrame({
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 20, n).astype(np.int64),
            "ts": base + rng.integers(0, 3_600_000_000, n).astype("timedelta64[us]"),
        })
        # force ts ties inside a user to exercise the event_id tie-break
        df.loc[df.index[1], ["user_id", "ts"]] = df.loc[df.index[0], ["user_id", "ts"]]
        out = (x_rel.event_gaps(ray.data.from_pandas(df))
               .to_pandas().sort_values("event_id").reset_index(drop=True))
        exp = df.sort_values(["user_id", "ts", "event_id"]).copy()
        tsi = exp["ts"].astype("int64")
        exp["gap_us"] = tsi - tsi.groupby(exp["user_id"]).shift()
        exp = exp.dropna(subset=["gap_us"])
        exp = (exp[["event_id", "user_id"]]
               .assign(gap_us=exp["gap_us"].astype(np.int64))
               .sort_values("event_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(out, exp)


class TestUnigramNLL:
    def test_matches_naive_lm(self):
        import math
        from collections import Counter

        from colbert_ray.config import EngineConfig
        from colbert_ray.functions.tokenizer import doc_term_frequencies

        texts = ["the quick fox", "the the the", "rare zebra quux", ""]
        t = pa.table({"doc_id": pa.array(range(4), type=pa.int64()),
                      "text": pa.array(texts, type=pa.string())})
        out = (x_text.unigram_nll(ray.data.from_arrow(t))
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        # naive LM
        _, terms, tfs = doc_term_frequencies(
            pa.array(texts, type=pa.string()), EngineConfig())
        cf = Counter()
        docs = []
        for ts, fs in zip(terms.to_pylist(), tfs.to_pylist()):
            d = dict(zip(ts, fs))
            docs.append(d)
            cf.update(d)
        n = sum(cf.values())
        exp = []
        for i, d in enumerate(docs):
            dl = sum(d.values())
            if dl == 0:
                continue
            nll = sum(f * -math.log(cf[tm] / n) for tm, f in sorted(d.items())) / dl
            exp.append((i, dl, round(nll, 6)))
        assert out["doc_id"].tolist() == [e[0] for e in exp]
        assert out["n_tokens"].tolist() == [e[1] for e in exp]
        assert out["nll"].tolist() == pytest.approx([e[2] for e in exp], abs=1e-9)
        # the all-repeated doc is the most "fluent" (lowest nll)
        assert out.loc[out["doc_id"] == 1, "nll"].iloc[0] == out["nll"].min()

    def test_empty_doc_dropped(self):
        t = pa.table({"doc_id": pa.array([7], type=pa.int64()),
                      "text": pa.array([""], type=pa.string())})
        out = x_text.unigram_nll(ray.data.from_arrow(t)).to_pandas()
        assert len(out) == 0


class TestGroupedCorr:
    def test_matches_numpy_corrcoef(self):
        from colbert_ray.extras import relational as x_rel

        rng = np.random.default_rng(11)
        n = 600
        g = rng.choice(["A", "B", "C"], n)
        x = rng.normal(0, 1, n)
        y = 0.6 * x + rng.normal(0, 0.5, n)
        ds = ray.data.from_arrow(pa.table({"g": g, "x": x, "y": y}))
        out = x_rel.grouped_corr(ds, "g", "x", "y").to_pandas()
        assert out["g"].tolist() == ["A", "B", "C"]
        for _, row in out.iterrows():
            m = g == row["g"]
            assert row["n"] == int(m.sum())
            assert row["corr_xy"] == pytest.approx(
                round(float(np.corrcoef(x[m], y[m])[0, 1]), 6), abs=2e-6)

    def test_zero_variance_is_null(self):
        from colbert_ray.extras import relational as x_rel

        ds = ray.data.from_arrow(pa.table({
            "g": ["Z"] * 5, "x": [1.0] * 5, "y": [1.0, 2, 3, 4, 5]}))
        out = x_rel.grouped_corr(ds, "g", "x", "y").to_pandas()
        assert out["corr_xy"].isna().all()


class TestFuzzyTermPairs:
    @staticmethod
    def _lev(a, b):
        la, lb = len(a), len(b)
        d = list(range(lb + 1))
        for i in range(1, la + 1):
            prev, d[0] = d[0], i
            for j in range(1, lb + 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                       prev + (a[i - 1] != b[j - 1]))
        return d[lb]

    def test_matches_naive_levenshtein(self):
        # vocabulary with substitutions, inserts/deletes, a transposition
        # pair ("ab"/"ba" shares deletion keys but is ed-2: must be
        # excluded), and unrelated words
        words = ["cat", "cut", "cart", "ca", "cat", "ab", "ba", "dog",
                 "dogs", "dig", "zebra", "xylophone", "a", "b"]
        text = " ".join(words)
        ds = ray.data.from_arrow(
            pa.table({"text": pa.array([text, "cat dog"])}))
        out = x_dedup.fuzzy_term_pairs(ds).to_pandas()
        got = set(zip(out["term_a"], out["term_b"]))
        vocab = sorted(set(words))
        exp = {(a, b) for i, a in enumerate(vocab) for b in vocab[i + 1:]
               if self._lev(a, b) == 1}
        assert got == exp
        assert ("ab", "ba") not in got          # transposition excluded
        assert ("cat", "cut") in got            # substitution
        assert ("dog", "dogs") in got           # insertion
        assert ("ca", "cat") in got             # deletion

    def test_empty_and_singleton(self):
        ds = ray.data.from_arrow(pa.table({"text": pa.array(["", "solo"])}))
        out = x_dedup.fuzzy_term_pairs(ds).to_pandas()
        assert len(out) == 0


class TestOhlcHourly:
    def test_matches_pandas(self):
        from colbert_ray.extras import relational as x_rel

        rng = np.random.default_rng(5)
        n = 500
        base = np.datetime64("2026-02-01T00:00:00", "us")
        df = pd.DataFrame({
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 8, n).astype(np.int64),
            "ts": base + rng.integers(0, 6 * 3600_000_000, n).astype("timedelta64[us]"),
            "value": rng.normal(100, 10, n),
        })
        out = (x_rel.ohlc_hourly(ray.data.from_pandas(df).repartition(5))
               .to_pandas().sort_values(["user_id", "hour"])
               .reset_index(drop=True))
        d = df.copy()
        d["hour"] = d["ts"].astype("int64") // 3_600_000_000
        d = d.sort_values(["user_id", "hour", "ts", "event_id"])
        exp = d.groupby(["user_id", "hour"]).agg(
            open=("value", "first"), high=("value", "max"),
            low=("value", "min"), close=("value", "last"),
            n_events=("value", "size"),
            volume=("value", lambda v: round(v.sum(), 6)),
        ).reset_index()
        exp["n_events"] = exp["n_events"].astype(np.int64)
        pd.testing.assert_frame_equal(out, exp, check_exact=False, atol=1e-6)

    def test_open_close_tie_on_ts(self):
        from colbert_ray.extras import relational as x_rel

        ts = np.datetime64("2026-02-01T00:00:00", "us")
        df = pd.DataFrame({
            "event_id": np.array([5, 2, 9], dtype=np.int64),
            "user_id": np.zeros(3, dtype=np.int64),
            "ts": [ts, ts, ts],                       # all tied
            "value": [10.0, 20.0, 30.0],
        })
        out = x_rel.ohlc_hourly(ray.data.from_pandas(df)).to_pandas()
        assert out["open"].iloc[0] == 20.0     # event_id 2 first
        assert out["close"].iloc[0] == 30.0    # event_id 9 last


class TestQuantilesCont:
    def test_matches_numpy_linear(self):
        from colbert_ray.extras import relational as x_rel

        rng = np.random.default_rng(9)
        df = pd.DataFrame({
            "user_id": rng.integers(0, 5, 300).astype(np.int64),
            "value": rng.normal(0, 1, 300),
        })
        out = (x_rel.user_value_quantiles_cont(ray.data.from_pandas(df))
               .to_pandas().sort_values("user_id").reset_index(drop=True))
        for _, row in out.iterrows():
            v = df.loc[df["user_id"] == row["user_id"], "value"].to_numpy()
            assert row["n_events"] == len(v)
            for q, col in ((0.25, "p25c"), (0.5, "p50c"), (0.75, "p75c")):
                assert row[col] == pytest.approx(
                    round(float(np.quantile(v, q, method="linear")), 6),
                    abs=1e-9)


class TestCurateCorpus:
    def test_pipeline_stages(self):
        from colbert_ray.extras import curate as x_cur

        base = "the quick brown fox jumps over the lazy dog again and again today"
        texts = [
            base,                          # 0 survivor
            "  THE   quick brown fox jumps over the lazy dog again and again TODAY ",  # 1 normalization dup of 0
            base,                          # 2 exact dup of 0
            "tiny doc",                    # 3 gated: too short
            base + " extra words fill the quota nicely for sure",  # 4 distinct survivor
        ]
        t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                      "text": pa.array(texts, type=pa.string())})
        out = (x_cur.curate_corpus(ray.data.from_arrow(t), min_tokens=5,
                                   max_tokens=100, max_nll=50.0)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert out["doc_id"].tolist() == [0, 4]
        assert out.loc[0, "dup_count"] == 3        # 0 + case/ws variant 1 + 2
        assert out.loc[1, "dup_count"] == 1
        assert (out["n_tokens"] >= 5).all()

    def test_nll_gate_drops_garbled(self):
        from colbert_ray.extras import curate as x_cur

        common = ["the data flows through the fast pipeline every day ok"] * 20
        rare = ["zxqv jkwp mmnb qqrs ttuu vvxx yyzz aabb ccdd eeff gghh"]
        t = pa.table({
            "doc_id": pa.array(range(21), type=pa.int64()),
            "text": pa.array(common + rare, type=pa.string()),
        })
        # threshold between the common docs' nll and the rare doc's nll
        all_rows = (x_cur.curate_corpus(ray.data.from_arrow(t), min_tokens=2,
                                        max_tokens=100, max_nll=100.0)
                    .to_pandas())
        lo = all_rows.loc[all_rows["dup_count"] == 20, "nll"].iloc[0]
        hi = all_rows.loc[all_rows["dup_count"] == 1, "nll"].iloc[0]
        assert lo < hi
        out = (x_cur.curate_corpus(ray.data.from_arrow(t), min_tokens=2,
                                   max_tokens=100, max_nll=(lo + hi) / 2)
               .to_pandas())
        assert out["doc_id"].tolist() == [0]
        assert out["dup_count"].tolist() == [20]


class TestJsonPropsStats:
    def test_regex_path_and_fallback_agree(self):
        import json

        from colbert_ray.extras import relational as x_rel

        rows = [
            ("click", '{"k": 10}'),          # regex fast path
            ("click", '{"k":   -3}'),        # whitespace variant
            ("view", '{"k": "7"}'),          # string-valued -> json fallback
            ("view", '{"j": 99}'),           # no field -> dropped
            ("view", None),                  # null props -> dropped
            ("error", '{ "k" : 5 }'),        # spaced quotes -> fallback
        ]
        t = pa.table({
            "event_type": pa.array([r[0] for r in rows], type=pa.string()),
            "props": pa.array([r[1] for r in rows], type=pa.string()),
        })
        out = x_rel.json_props_stats(ray.data.from_arrow(t)).to_pandas()
        got = {r.event_type: (r.n, r.sum_v, r.max_v)
               for r in out.itertuples()}
        assert got == {"click": (2, 7, 10), "view": (1, 7, 7),
                       "error": (1, 5, 5)}

    def test_partition_invariance(self):
        from colbert_ray.extras import relational as x_rel

        t = pa.table({
            "event_type": pa.array(["a", "b"] * 50, type=pa.string()),
            "props": pa.array([f'{{"k": {i}}}' for i in range(100)],
                              type=pa.string()),
        })
        a = x_rel.json_props_stats(ray.data.from_arrow(t)).to_pandas()
        b = x_rel.json_props_stats(
            ray.data.from_arrow(t).repartition(7)).to_pandas()
        pd.testing.assert_frame_equal(a, b)


class TestLateEvents:
    def _run(self, eids, ts_us, types, **kw):
        t = pa.table({
            "event_id": pa.array(eids, type=pa.int64()),
            "ts": pa.array(np.array(ts_us, dtype="datetime64[us]")),
            "event_type": pa.array(types, type=pa.string()),
        })
        from colbert_ray.extras import relational as x_rel

        return x_rel.late_events(
            ray.data.from_arrow(t), **kw).to_pandas()

    def test_planted_late_and_cross_bucket_hwm(self):
        MIN = 60 * 1_000_000
        # arrival order 0..5; event 3 is >30min behind the HWM set by
        # event 1; event 5 (bucket 1 with width 3) is late vs a HWM that
        # lives entirely in bucket 0 — the cross-bucket seed path
        eids = [0, 1, 2, 3, 4, 5]
        ts = [0, 100 * MIN, 101 * MIN, 50 * MIN, 102 * MIN, 60 * MIN]
        types = ["a", "a", "a", "a", "b", "b"]
        out = self._run(eids, ts, types, bucket_width=3)
        got = {r.event_type: (r.n_late, r.n_events) for r in out.itertuples()}
        assert got == {"a": (1, 4), "b": (1, 2)}

    def test_first_event_never_late_and_parallel_invariance(self):
        rng = np.random.default_rng(11)
        n = 5000
        MIN = 60 * 1_000_000
        ts = np.cumsum(rng.integers(0, 5 * MIN, size=n))
        # inject 100 heavy stragglers
        idx = rng.choice(n, 100, replace=False)
        ts[idx] = np.maximum(0, ts[idx] - 200 * MIN)
        types = np.array(["x", "y"])[rng.integers(0, 2, size=n)]
        t = pa.table({
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts.astype("datetime64[us]")),
            "event_type": pa.array(types, type=pa.string()),
        })
        from colbert_ray.extras import relational as x_rel

        a = x_rel.late_events(ray.data.from_arrow(t),
                              bucket_width=500).to_pandas()
        b = x_rel.late_events(ray.data.from_arrow(t).repartition(13),
                              bucket_width=77).to_pandas()
        pd.testing.assert_frame_equal(a, b)
        # naive oracle
        hwm = np.concatenate([[np.iinfo(np.int64).min],
                              np.maximum.accumulate(ts)[:-1]])
        late = (hwm != np.iinfo(np.int64).min) & (ts < hwm - 30 * MIN)
        assert late.sum() > 0
        want = pd.DataFrame({"event_type": ["x", "y"]})
        for i, et in enumerate(["x", "y"]):
            m = types == et
            assert a[a.event_type == et].n_late.iloc[0] == late[m].sum()
            assert a[a.event_type == et].n_events.iloc[0] == m.sum()


class TestRpLsh:
    def _emb(self, n=300, dim=32, seed=3):
        rng = np.random.default_rng(seed)
        m = rng.normal(size=(n, dim))
        # plant near-dup clusters: 20 pairs at high cosine
        for i in range(20):
            j = n - 1 - i
            m[j] = m[i] + rng.normal(scale=0.05, size=dim)
        return pa.table({
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array([r.astype(np.float32) for r in m],
                                  type=pa.list_(pa.float32())),
        }), m

    def test_recall_on_planted_dups_and_subset_of_exact(self):
        from colbert_ray.extras import simsearch as x_sim

        t, m = self._emb()
        thr = 0.95
        norm = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = norm @ norm.T
        iu = np.triu_indices(len(m), 1)
        exact = {(int(a), int(b)) for a, b in zip(*iu)
                 if sims[a, b] >= thr - 0.02}   # tolerance: verify is q8
        got = x_sim.rp_lsh_dup_pairs(ray.data.from_arrow(t), threshold=thr)
        pairs = {(int(a), int(b)) for a, b in zip(got.id_a, got.id_b)}
        assert pairs <= exact                     # verify stage is exact-ish
        planted = {(i, 299 - i) for i in range(20)
                   if sims[i, 299 - i] >= thr}
        assert planted
        recall = len(pairs & planted) / len(planted)
        assert recall >= 0.8                      # 8x4-bit banding at 0.95

    def test_parallelism_invariance(self):
        from colbert_ray.extras import simsearch as x_sim

        t, _ = self._emb(seed=9)
        a = x_sim.rp_lsh_dup_pairs(ray.data.from_arrow(t), threshold=0.9)
        b = x_sim.rp_lsh_dup_pairs(
            ray.data.from_arrow(t).repartition(7), threshold=0.9)
        pd.testing.assert_frame_equal(a, b)


class TestSessionFunnel:
    def _run(self, rows):
        t = pa.table({
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array(np.array([r[1] for r in rows],
                                    dtype="datetime64[us]")),
            "event_type": pa.array([r[2] for r in rows], type=pa.string()),
            "event_id": pa.array(range(len(rows)), type=pa.int64()),
        })
        from colbert_ray.extras import relational as x_rel

        return x_rel.session_funnel(ray.data.from_arrow(t)).to_pandas()

    def test_full_funnel_and_order_enforcement(self):
        MIN = 60 * 1_000_000
        rows = [
            # user 1 session 1: full ordered funnel
            (1, 0 * MIN, "view"), (1, 1 * MIN, "click"),
            (1, 2 * MIN, "purchase"),
            # user 1 session 2 (2h later): click BEFORE view -> no s12
            (1, 120 * MIN, "click"), (1, 121 * MIN, "view"),
            # user 2: purchase before click -> s12 but no s123
            (2, 0 * MIN, "view"), (2, 1 * MIN, "purchase"),
            (2, 2 * MIN, "click"),
            # user 3: view only
            (3, 0 * MIN, "view"),
            # user 4: no view at all
            (4, 0 * MIN, "click"), (4, 1 * MIN, "purchase"),
        ]
        out = self._run(rows)
        assert out.iloc[0].to_dict() == {
            "n_sessions": 5, "n_s1": 4, "n_s12": 2, "n_s123": 1}

    def test_equal_timestamp_ties_count_inclusive(self):
        # click at the SAME microsecond as the first view qualifies (>=)
        rows = [(7, 1000, "view"), (7, 1000, "click"), (7, 1000, "purchase")]
        out = self._run(rows)
        assert out.iloc[0].to_dict() == {
            "n_sessions": 1, "n_s1": 1, "n_s12": 1, "n_s123": 1}


def test_late_events_and_funnel_empty_input():
    from colbert_ray.extras import relational as x_rel

    empty = pa.table({
        "event_id": pa.array([], type=pa.int64()),
        "ts": pa.array([], type=pa.timestamp("us")),
        "event_type": pa.array([], type=pa.string()),
        "user_id": pa.array([], type=pa.int64()),
    })
    le = x_rel.late_events(ray.data.from_arrow(empty)).to_pandas()
    assert len(le) == 0
    sf = x_rel.session_funnel(ray.data.from_arrow(empty)).to_pandas()
    assert sf.iloc[0].to_dict() == {"n_sessions": 0, "n_s1": 0,
                                    "n_s12": 0, "n_s123": 0}


class TestPmiAndRegex:
    def _corpus(self):
        texts = [
            "hash join hash join hash join",
            "merge sort merge sort",
            "hash join merge sort",
            "data stream data stream data",
            "hash join",
        ]
        return ray.data.from_arrow(pa.table(
            {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
             "text": pa.array(texts)}))

    def test_pmi_matches_naive(self):
        import math
        from collections import Counter

        got = (x_text.pmi_collocations(self._corpus(), min_count=2)
               .to_pandas().sort_values("gram").reset_index(drop=True))
        toks = [t.split() for t in [
            "hash join hash join hash join", "merge sort merge sort",
            "hash join merge sort", "data stream data stream data",
            "hash join"]]
        uni = Counter(w for d in toks for w in d)
        big = Counter(" ".join(p) for d in toks
                      for p in zip(d, d[1:]))
        nu = sum(uni.values())
        nb = sum(big.values())
        want = {}
        for g, n in big.items():
            if n < 2:
                continue
            x, y = g.split()
            want[g] = (n, round(math.log(
                ((float(n) * nu) * nu) / ((float(nb) * uni[x]) * uni[y])), 6))
        assert dict(zip(got["gram"],
                        zip(got["n"], got["pmi_r"]))) == want

    def test_pmi_parallelism_invariant(self):
        a = (x_text.pmi_collocations(self._corpus(), min_count=2)
             .to_pandas().sort_values("gram").reset_index(drop=True))
        b = (x_text.pmi_collocations(self._corpus().repartition(4),
                                     min_count=2)
             .to_pandas().sort_values("gram").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)

    def test_regex_match_stats(self):
        import re

        got = (x_text.regex_match_stats(self._corpus(), r"(hash|merge) \w+")
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        texts = ["hash join hash join hash join", "merge sort merge sort",
                 "hash join merge sort", "data stream data stream data",
                 "hash join"]
        want = {i: len(re.findall(r"(?:hash|merge) \w+", t))
                for i, t in enumerate(texts)
                if re.search(r"(hash|merge) \w+", t)}
        assert dict(zip(got["doc_id"], got["n_matches"])) == want


class TestOuterJoin:
    def test_customer_order_activity_left_outer(self):
        from colbert_ray.extras.relational import customer_order_activity

        cust = ray.data.from_arrow(pa.table({
            "c_custkey": pa.array([1, 2, 3, 4], type=pa.int64()),
            "c_name": pa.array(["a", "b", "c", "d"])}))
        orders = ray.data.from_arrow(pa.table({
            "o_custkey": pa.array([1, 1, 3], type=pa.int64()),
            "o_totalprice": pa.array([10.5, 4.5, 7.25],
                                     type=pa.float64())})).repartition(3)
        got = (customer_order_activity(cust, orders, num_partitions=2)
               .to_pandas().sort_values("c_custkey").reset_index(drop=True))
        assert got["c_custkey"].tolist() == [1, 2, 3, 4]
        assert got["n_orders"].tolist() == [2, 0, 1, 0]
        assert got["total_spent"].tolist() == [15.0, 0.0, 7.25, 0.0]
        assert got["n_orders"].dtype == np.int64

    def test_user_click_purchase_full_outer_semantics(self):
        from colbert_ray.extras.relational import user_click_purchase_matrix

        ev = ray.data.from_arrow(pa.table({
            "user_id": pa.array([1, 1, 2, 3, 3, 3, 4], type=pa.int64()),
            "event_type": pa.array(["click", "purchase", "click",
                                    "purchase", "purchase", "view",
                                    "view"])})).repartition(3)
        got = (user_click_purchase_matrix(ev).to_pandas()
               .sort_values("user_id").reset_index(drop=True))
        # user 2 click-only, user 3 purchase-only, user 4 (view-only) absent
        assert got["user_id"].tolist() == [1, 2, 3]
        assert got["n_clicks"].tolist() == [1, 1, 0]
        assert got["n_purchases"].tolist() == [1, 0, 2]


class TestValidate:
    def _t(self):
        return ray.data.from_arrow(pa.table({
            "k": pa.array([1, 2, 2, 3, None], type=pa.int64()),
            "v": pa.array([5.0, -1.0, 7.5, 100.0, 3.0]),
            "s": pa.array(["a-x", "b-y", "zz", "a-x", None]),
        })).repartition(3)

    def test_rule_suite_counts(self):
        from colbert_ray.extras.validate import expect

        got = expect(self._t(), [
            {"rule": "k_not_null", "kind": "not_null", "col": "k"},
            {"rule": "v_range", "kind": "range", "col": "v",
             "lo": 0.0, "hi": 10.0},
            {"rule": "s_vocab", "kind": "in_set", "col": "s",
             "values": ["a-x", "b-y"]},
            {"rule": "s_format", "kind": "regex", "col": "s",
             "pattern": "^[ab]-"},
            {"rule": "k_unique", "kind": "unique", "col": "k"},
        ])
        want = {
            "k_not_null": (1, 5),
            "v_range": (2, 5),       # -1.0 and 100.0; nulls not counted
            "s_vocab": (1, 5),       # 'zz'; null not a vocab violation
            "s_format": (1, 5),      # 'zz'; null not a format violation
            "k_unique": (2, 5),      # the two k=2 rows
        }
        assert dict(zip(got["rule"],
                        zip(got["n_violations"], got["n_checked"]))) == want

    def test_duplicate_rule_names_rejected(self):
        from colbert_ray.extras.validate import expect

        with pytest.raises(ValueError):
            expect(self._t(), [
                {"rule": "r", "kind": "not_null", "col": "k"},
                {"rule": "r", "kind": "not_null", "col": "v"}])


class TestEventTransitions:
    def test_matches_naive(self):
        from collections import Counter

        from colbert_ray.extras.relational import event_transitions

        base = np.datetime64("2024-01-01T00:00:00", "us")
        m = np.timedelta64(60_000_000, "us")
        rows = [  # (event_id, user, minute, type)
            (1, 1, 0, "view"), (2, 1, 1, "click"), (3, 1, 2, "click"),
            (4, 1, 3, "purchase"),
            (5, 2, 0, "click"), (6, 2, 1, "view"),
            (7, 3, 0, "view"),                     # single event: no pair
            # same-ts tie within user 4: event_id breaks the order
            (9, 4, 0, "a"), (8, 4, 0, "b"), (10, 4, 1, "c"),
        ]
        ev = ray.data.from_arrow(pa.table({
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "ts": pa.array([base + r[2] * m for r in rows],
                           type=pa.timestamp("us")),
            "event_type": pa.array([r[3] for r in rows]),
        })).repartition(3)
        got = event_transitions(ev)
        # ordered streams: u1 view,click,click,purchase; u2 click,view;
        # u4 b(id8),a(id9),c(id10)
        pairs = Counter([("view", "click"), ("click", "click"),
                         ("click", "purchase"), ("click", "view"),
                         ("b", "a"), ("a", "c")])
        froms = Counter(f for f, _ in pairs.elements())
        want = {(f, t): (n, round(n / froms[f], 6))
                for (f, t), n in pairs.items()}
        assert {(r.from_type, r.to_type): (r.n, r.p_r)
                for r in got.itertuples()} == want


class TestHistogramSketch:
    def _ds(self, vals, parts=1):
        d = ray.data.from_arrow(pa.table(
            {"v": pa.array(vals, type=pa.float64())}))
        return d.repartition(parts) if parts > 1 else d

    def test_counts_and_flows(self):
        from colbert_ray.extras.sketches import histogram

        vals = [-5.0, 0.0, 0.5, 9.99, 10.0, 25.0, 99.9, 100.0, 250.0]
        h = histogram(self._ds(vals), "v", 0.0, 100.0, n_bins=10)
        assert h[0] == 1                       # -5 underflow
        assert h[-1] == 2                      # 100.0, 250.0 overflow
        assert h[1] == 3                       # [0,10): 0, 0.5, 9.99
        assert h[2] == 1                       # [10,20): 10.0
        assert int(h.sum()) == len(vals)

    def test_parallelism_invariant(self):
        from colbert_ray.extras.sketches import histogram

        rng = np.random.default_rng(3)
        vals = rng.uniform(-10, 110, size=5000).tolist()
        a = histogram(self._ds(vals), "v", 0.0, 100.0, 32)
        b = histogram(self._ds(vals, parts=13), "v", 0.0, 100.0, 32)
        np.testing.assert_array_equal(a, b)

    def test_quantile_rank_error_bounded_by_bucket(self):
        from colbert_ray.extras.sketches import histogram_quantiles

        rng = np.random.default_rng(4)
        vals = np.sort(rng.uniform(0, 100, size=4000))
        qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
        ests, nu, ni, no = histogram_quantiles(
            self._ds(vals.tolist(), parts=7), "v", 0.0, 100.0, qs,
            n_bins=64)
        assert (nu, ni, no) == (0, 4000, 0)
        w = 100.0 / 64
        for q, est in ests:
            exact = float(np.quantile(vals, q))
            # lower-edge estimate: within one bucket width of the truth
            assert est <= exact + 1e-9
            assert exact - est <= w + 1e-9


class TestModeAndCentroids:
    def test_user_mode_event_tiebreak(self):
        from colbert_ray.extras.relational import user_mode_event

        ev = ray.data.from_arrow(pa.table({
            "user_id": pa.array([1, 1, 1, 2, 2, 3], type=pa.int64()),
            "event_type": pa.array(["b", "b", "a", "b", "a", "z"]),
        })).repartition(3)
        got = (user_mode_event(ev).to_pandas()
               .sort_values("user_id").reset_index(drop=True))
        # user 2: tie a/b at 1 each -> lexicographically smallest wins
        assert list(zip(got["user_id"], got["mode_type"],
                        got["n"])) == [(1, "b", 2), (2, "a", 1),
                                       (3, "z", 1)]

    def test_label_centroids_match_numpy(self):
        from colbert_ray.extras.simsearch import label_centroids

        rng = np.random.default_rng(5)
        m = rng.standard_normal((40, 6))
        lab = rng.integers(0, 3, size=40)
        t = pa.table({
            "label": pa.array(lab, type=pa.int64()),
            "embedding": pa.array([r.tolist() for r in m],
                                  type=pa.list_(pa.float32()))})
        got = label_centroids(ray.data.from_arrow(t).repartition(5))
        m64 = m.astype(np.float32).astype(np.float64)
        for L in range(3):
            sub = m64[lab == L]
            want = np.round(sub.sum(axis=0) / len(sub), 6)
            g = got[got.label == L].sort_values("dim")
            np.testing.assert_allclose(g["mean_r"].to_numpy(), want,
                                       atol=1.1e-6)
            assert (g["n"] == len(sub)).all()


class TestPageRank:
    def _edges(self, pairs):
        src = [a for a, b in pairs] + [b for a, b in pairs]
        dst = [b for a, b in pairs] + [a for a, b in pairs]
        return ray.data.from_arrow(pa.table(
            {"src": pa.array(src, type=pa.int64()),
             "dst": pa.array(dst, type=pa.int64())})).repartition(3)

    def test_pagerank_matches_numpy_oracle(self):
        # undirected: 0-1, 0-2, 0-3, 1-2, 3-4 (node 0 is the hub)
        pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (3, 4)]
        got = x_graph.pagerank(self._edges(pairs), damping=0.85,
                               n_iter=5).to_pandas()
        # naive oracle with the identical round-after-every-iteration policy
        adj = {i: [] for i in range(5)}
        for a, b in pairs:
            adj[a].append(b)
            adj[b].append(a)
        n = 5.0
        r = {i: round(1.0 / n, 6) for i in range(5)}
        for _ in range(5):
            nxt = {}
            for v in range(5):
                mass = sum(r[u] / len(adj[u]) for u in range(5)
                           if v in adj[u])
                nxt[v] = round((1 - 0.85) / n + 0.85 * mass, 6)
            r = nxt
        assert got["node"].tolist() == [0, 1, 2, 3, 4]
        for v in range(5):
            assert float(got.loc[got.node == v, "rank_r"].iloc[0]) == r[v]
        # hub has the highest rank; mass conserved up to rounding
        assert got.loc[got["rank_r"].idxmax(), "node"] == 0
        assert abs(got["rank_r"].sum() - 1.0) < 5e-5

    def test_pagerank_uniform_on_cycle(self):
        # symmetric ring: stationary distribution is uniform from r0 on
        pairs = [(i, (i + 1) % 6) for i in range(6)]
        got = x_graph.pagerank(self._edges(pairs), n_iter=3).to_pandas()
        assert (got["rank_r"].round(6) == round(1 / 6, 6)).all()

    def test_pagerank_batch_size_invariant(self):
        pairs = [(a, b) for a in range(8) for b in range(a + 1, 8)
                 if (a * 7 + b) % 3]
        one = x_graph.pagerank(self._edges(pairs).repartition(1),
                               n_iter=4).to_pandas()
        many = x_graph.pagerank(self._edges(pairs).repartition(7),
                                n_iter=4).to_pandas()
        pd.testing.assert_frame_equal(one, many)


class TestGraphTraversal:
    def _sym(self, pairs, typ=pa.int64()):
        src = [a for a, b in pairs] + [b for a, b in pairs]
        dst = [b for a, b in pairs] + [a for a, b in pairs]
        return ray.data.from_arrow(pa.table(
            {"src": pa.array(src, type=typ),
             "dst": pa.array(dst, type=typ)})).repartition(3)

    def test_bfs_hops_path_graph(self):
        # path 0-1-2-3-4-5 plus a shortcut 0-3
        got = x_graph.bfs_hops(
            self._sym([(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (0, 3)]),
            seed=0, max_hops=4).to_pandas()
        want = {0: 0, 1: 1, 2: 2, 3: 1, 4: 2, 5: 3}
        assert dict(zip(got["node"], got["hops"])) == want

    def test_bfs_hops_cap_and_unreachable(self):
        # two components; cap at 2 hops
        got = x_graph.bfs_hops(
            self._sym([(0, 1), (1, 2), (2, 3), (8, 9)]),
            seed=0, max_hops=2).to_pandas()
        assert dict(zip(got["node"], got["hops"])) == {0: 0, 1: 1, 2: 2}

    def test_triangle_counts_known_graph(self):
        # K4 on 0..3 (each node in C(3,2)=3 triangles) + pendant 4, and a
        # separate triangle 5-6-7
        k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        pairs = k4 + [(3, 4), (5, 6), (6, 7), (5, 7)]
        got = x_graph.triangle_counts(self._sym(pairs)).to_pandas()
        want = {0: 3, 1: 3, 2: 3, 3: 3, 5: 1, 6: 1, 7: 1}
        assert dict(zip(got["node"], got["n_tri"])) == want

    def test_triangle_counts_string_nodes_and_dups(self):
        # duplicate + reversed edges and self-loops must not change counts
        pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
        noisy = pairs + [(b, a) for a, b in pairs] + [("a", "a")]
        ds = ray.data.from_arrow(pa.table({
            "src": pa.array([p[0] for p in noisy], type=pa.string()),
            "dst": pa.array([p[1] for p in noisy], type=pa.string())}))
        got = x_graph.triangle_counts(ds).to_pandas()
        assert dict(zip(got["node"], got["n_tri"])) == \
            {"a": 1, "b": 1, "c": 1}

    def test_triangle_counts_triangle_free(self):
        # bipartite square 0-4, 4-1, 1-5, 5-0: no triangles
        got = x_graph.triangle_counts(
            self._sym([(0, 4), (4, 1), (1, 5), (5, 0)])).to_pandas()
        assert len(got) == 0


class TestSpanWindowDedup:
    """C4-style duplicated-span removal with doc rewrite."""

    def _mk(self, texts, repart=3):
        t = pa.table({
            "doc_id": pa.array(
                np.arange(1, len(texts) + 1, dtype=np.int64)),
            "text": pa.array(texts, type=pa.string()),
        })
        return ray.data.from_arrow(t).repartition(repart)

    @staticmethod
    def _naive(texts, w):
        spans_of = []
        for t in texts:
            words = t.split(" ")
            spans_of.append([" ".join(words[i:i + w])
                             for i in range(0, len(words), w)])
        seen = {}
        for di, spans in enumerate(spans_of):
            for si, s in enumerate(spans):
                seen.setdefault(s, (di, si))
        out = []
        for di, spans in enumerate(spans_of):
            kept = [s for si, s in enumerate(spans)
                    if seen[s] == (di, si)]
            out.append((di + 1, " ".join(kept),
                        len(kept), len(spans) - len(kept)))
        return out

    def test_matches_naive_oracle(self):
        rng = np.random.default_rng(7)
        vocab = [f"w{i}" for i in range(12)]
        texts = [" ".join(rng.choice(vocab, size=int(n)))
                 for n in rng.integers(3, 40, size=60)]
        # force exact duplicate spans across docs
        texts[10] = texts[3]
        texts[11] = texts[3] + " " + texts[5]
        for w in (3, 10):
            got = (x_dedup.span_window_dedup(self._mk(texts), span_w=w)
                   .to_pandas().sort_values("doc_id").reset_index(drop=True))
            want = self._naive(texts, w)
            assert len(got) == len(want)
            for row, (did, txt, nk, nd) in zip(got.itertuples(), want):
                assert (row.doc_id, row.text_dedup,
                        row.n_kept, row.n_dropped) == (did, txt, nk, nd)

    def test_parallelism_invariant_and_lossless_when_unique(self):
        texts = [f"u{i} v{i} w{i} x{i} y{i}" for i in range(30)]
        a = (x_dedup.span_window_dedup(self._mk(texts, 1), span_w=2)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        b = (x_dedup.span_window_dedup(self._mk(texts, 7), span_w=2)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)
        # all spans unique -> every doc survives byte-identical
        assert (a["text_dedup"] == pd.Series(texts)).all()
        assert (a["n_dropped"] == 0).all()

    def test_whole_doc_duplicate_empties_later_doc(self):
        texts = ["a b c d", "a b c d", "a b c d e"]
        got = (x_dedup.span_window_dedup(self._mk(texts), span_w=4)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert got.loc[0, "text_dedup"] == "a b c d"
        assert got.loc[1, "text_dedup"] == ""      # every span was a dup
        assert got.loc[1, "n_kept"] == 0 and got.loc[1, "n_dropped"] == 1
        assert got.loc[2, "text_dedup"] == "e"     # tail span survives


class TestPackSequences:
    def _mk(self, texts, ids=None, repart=3):
        ids = ids if ids is not None else np.arange(
            1, len(texts) + 1, dtype=np.int64)
        t = pa.table({"doc_id": pa.array(np.asarray(ids, dtype=np.int64)),
                      "text": pa.array(texts, type=pa.string())})
        return ray.data.from_arrow(t).repartition(repart)

    def test_matches_naive_prefix_and_parallelism_invariant(self):
        from colbert_ray.extras.packing import pack_sequences

        rng = np.random.default_rng(3)
        texts = [" ".join(f"t{j}" for j in range(int(n)))
                 for n in rng.integers(1, 30, size=50)]
        # non-contiguous, shuffled ids crossing bucket boundaries
        ids = (rng.permutation(50) * 70_001 + 5).astype(np.int64)
        outs = []
        for p in (1, 7):
            out = (pack_sequences(self._mk(texts, ids, p), seq_len=16,
                                  bucket_width=100_000)
                   .to_pandas().sort_values("doc_id")
                   .reset_index(drop=True))
            outs.append(out)
        pd.testing.assert_frame_equal(outs[0], outs[1])
        out = outs[0]
        order = np.argsort(ids)
        n = np.array([len(t.split(" ")) for t in texts])[order]
        starts = np.concatenate([[0], np.cumsum(n)[:-1]])
        assert (out["n_tokens"].to_numpy() == n).all()
        assert (out["tok_start"].to_numpy() == starts).all()
        assert (out["seq_first"].to_numpy() == starts // 16).all()
        assert (out["seq_last"].to_numpy() == (starts + n - 1) // 16).all()

    def test_straddling_and_exact_fit(self):
        from colbert_ray.extras.packing import pack_sequences

        texts = ["a b c d", "e f", "g h i j k"]   # 4 + 2 + 5, L=4
        out = (pack_sequences(self._mk(texts), seq_len=4)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        # doc1 fills seq0 exactly; doc2 sits inside seq1; doc3 straddles 1->2
        assert out["seq_first"].tolist() == [0, 1, 1]
        assert out["seq_last"].tolist() == [0, 1, 2]


class TestBPE:
    def _mk(self, texts, repart=3):
        t = pa.table({
            "doc_id": pa.array(np.arange(1, len(texts) + 1, dtype=np.int64)),
            "text": pa.array(texts, type=pa.string())})
        return ray.data.from_arrow(t).repartition(repart)

    def test_learns_known_merges(self):
        from colbert_ray.extras.bpe import bpe_train

        # 'ab' dominates; then 'abc' (merged-symbol as LEFT side)
        texts = ["abc abc abc abc", "abd abd", "xy"]
        t = bpe_train(self._mk(texts), n_merges=3).to_pandas()
        assert list(zip(t["left"], t["right"]))[:2] == [("a", "b"),
                                                        ("ab", "c")]
        assert t["cnt"].tolist()[0] == 6     # 4 abc + 2 abd
        assert t["cnt"].tolist()[1] == 4

    def test_greedy_nonoverlap_and_tie_break(self):
        from colbert_ray.extras.bpe import bpe_train, segment_word

        # run of a's: 'aaaa' counts (a,a) 3 times but merges to ['aa','aa']
        t = bpe_train(self._mk(["aaaa aaaa"]), n_merges=2).to_pandas()
        assert (t.loc[0, "left"], t.loc[0, "right"]) == ("a", "a")
        assert t.loc[0, "cnt"] == 6
        # second merge: pairs of 'aa aa' -> ('aa','aa')
        assert (t.loc[1, "left"], t.loc[1, "right"]) == ("aa", "aa")
        merges = list(zip(t["left"], t["right"]))
        assert segment_word("aaaa", merges) == ["aaaa"]
        assert segment_word("aaaaa", merges) == ["aaaa", "a"]
        # tie between ('a','b') and ('a','c') at equal count -> lex smallest
        t2 = bpe_train(self._mk(["ab ac"]), n_merges=1).to_pandas()
        assert (t2.loc[0, "left"], t2.loc[0, "right"]) == ("a", "b")

    def test_early_stop_and_apply_counts(self):
        from colbert_ray.extras.bpe import bpe_token_counts, bpe_train

        # single-char words: no pairs -> zero merges learned
        t = bpe_train(self._mk(["a b c", "a b"]), n_merges=5)
        assert t.num_rows == 0
        # apply with empty merges == char counts per doc
        out = (bpe_token_counts(self._mk(["ab cde", "x"]), t)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert out["n_bpe_tokens"].tolist() == [5, 1]

    def test_parallelism_invariant(self):
        from colbert_ray.extras.bpe import bpe_train

        rng = np.random.default_rng(11)
        texts = [" ".join(rng.choice(["foo", "food", "fool", "bar", "barn"],
                                     size=20)) for _ in range(40)]
        a = bpe_train(self._mk(texts, 1), n_merges=6).to_pandas()
        b = bpe_train(self._mk(texts, 9), n_merges=6).to_pandas()
        pd.testing.assert_frame_equal(a, b)


class TestBigramNLL:
    def _mk(self, texts, repart=3):
        t = pa.table({
            "doc_id": pa.array(np.arange(1, len(texts) + 1, dtype=np.int64)),
            "text": pa.array(texts, type=pa.string())})
        return ray.data.from_arrow(t).repartition(repart)

    def test_matches_naive_model_and_drops_short_docs(self):
        from collections import Counter

        from colbert_ray.extras.textstats import bigram_nll

        texts = ["a b a b c", "b c b", "a", "", "c a a b"]
        got = (bigram_nll(self._mk(texts)).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert got["doc_id"].tolist() == [1, 2, 5]     # <2 tokens dropped
        toks = [t.split() for t in texts]
        bc = Counter()
        for ts in toks:
            for a, b in zip(ts, ts[1:]):
                bc[(a, b)] += 1
        ctx = Counter()
        for (a, _), c in bc.items():
            ctx[a] += c
        V = len({w for ts in toks for w in ts})
        for row, ts in zip(got.itertuples(), [toks[0], toks[1], toks[4]]):
            nll = -sum(np.log((bc[(a, b)] + 1.0) / (ctx[a] + V))
                       for a, b in zip(ts, ts[1:])) / (len(ts) - 1)
            assert abs(row.bigram_nll - round(nll, 6)) < 1e-9, (row, nll)
            assert row.n_tokens == len(ts)

    def test_parallelism_invariant_and_ranks_garbled_higher(self):
        from colbert_ray.extras.textstats import bigram_nll

        rng = np.random.default_rng(5)
        fluent = ["the cat sat on the mat " * 4] * 20
        garbled = [" ".join(rng.choice(
            ["qx", "zx", "wq", "jv", "kz"], size=24)) for _ in range(3)]
        texts = fluent + garbled
        a = (bigram_nll(self._mk(texts, 1)).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        b = (bigram_nll(self._mk(texts, 7)).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)
        assert a["bigram_nll"].iloc[:20].max() < \
            a["bigram_nll"].iloc[20:].min()


class TestContainmentPairs:
    def test_subset_doc_detected_directionally(self):
        from colbert_ray.extras.dedup import containment_pairs

        long = "the quick brown fox jumps over the lazy dog repeatedly"
        t = pa.table({
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array([long,
                              "quick brown fox",       # contained in doc 1
                              "entirely different words here"]),
        })
        out = (containment_pairs(ray.data.from_arrow(t).repartition(2),
                                 threshold_num=9, threshold_den=10)
               .to_pandas().sort_values(["id_src", "id_dst"])
               .reset_index(drop=True))
        pairs = set(zip(out["id_src"], out["id_dst"]))
        assert (2, 1) in pairs          # short doc contained in long
        assert (1, 2) not in pairs      # NOT symmetric (long not in short)
        assert not any(s == 3 or d == 3 for s, d in pairs)
        row = out[(out["id_src"] == 2) & (out["id_dst"] == 1)].iloc[0]
        assert row["n_common"] * 10 >= 9 * row["n_src"]


class TestMutualKnn:
    def test_reciprocity_required(self):
        from colbert_ray.extras.simsearch import mutual_knn_pairs

        # 0 and 1 are near-identical (mutual top-1); 2..5 form a cluster
        # whose members all prefer each other over the hub-ish 6; 6 points
        # at the cluster but nothing points back within k=1
        vecs = np.array([
            [1.0, 0.0, 0.0],
            [0.999, 0.01, 0.0],
            [0.0, 1.0, 0.0],
            [0.0, 0.999, 0.02],
            [0.0, 0.7, 0.7],
            [0.0, 0.69, 0.71],
            [0.5, 0.5, 0.5],
        ])
        t = pa.table({
            "vec_id": pa.array(np.arange(7, dtype=np.int64)),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float64())),
        })
        out = (mutual_knn_pairs(ray.data.from_arrow(t).repartition(3), k=1)
               .to_pandas())
        pairs = set(zip(out["id_a"], out["id_b"]))
        assert (0, 1) in pairs
        assert (2, 3) in pairs and (4, 5) in pairs
        assert not any(6 in p for p in pairs)   # hub never reciprocated
        # parallelism invariance
        out2 = (mutual_knn_pairs(ray.data.from_arrow(t).repartition(1), k=1)
                .to_pandas())
        pd.testing.assert_frame_equal(out, out2)

    def test_ivf_scale_path(self):
        """mutual_knn_pairs_ivf: single-bucket == the exact bounded tier;
        realistic IVF settings keep a recall floor on the test embeddings
        (deterministic: seeded centroids); parallelism-invariant."""
        import pyarrow.parquet as pq

        from colbert_ray.extras.simsearch import (
            mutual_knn_pairs,
            mutual_knn_pairs_ivf,
        )

        t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
        ds = ray.data.from_arrow(t)
        want = mutual_knn_pairs(ds, k=3).to_pandas()
        got = mutual_knn_pairs_ivf(
            ray.data.from_arrow(t).repartition(4), k=3,
            n_centroids=1, nprobe=1).to_pandas()
        pd.testing.assert_frame_equal(got, want)
        # approximate at realistic settings, but deterministically so
        ivf = mutual_knn_pairs_ivf(ds, k=3, n_centroids=16,
                                   nprobe=8).to_pandas()
        w = set(zip(want["id_a"], want["id_b"]))
        g = set(zip(ivf["id_a"], ivf["id_b"]))
        assert len(w & g) / len(w) >= 0.7       # measured 0.718, seeded
        ivf2 = mutual_knn_pairs_ivf(ds.repartition(5), k=3,
                                    n_centroids=16, nprobe=8).to_pandas()
        pd.testing.assert_frame_equal(ivf, ivf2)


class TestOOVRate:
    def test_naive_and_edges(self):
        from colbert_ray.extras.textstats import oov_rate

        texts = ["a a a b", "b c", "", "z z q"]
        t = pa.table({
            "doc_id": pa.array(np.arange(1, 5, dtype=np.int64)),
            "text": pa.array(texts, type=pa.string())})
        # corpus cf: a=3, z=2, b=2, c=1, q=1; top-2 vocab (cf desc, term
        # asc) = {a, b}
        out = (oov_rate(ray.data.from_arrow(t).repartition(3), vocab_size=2)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert out["n_tokens"].tolist() == [4, 2, 0, 3]
        assert out["n_oov"].tolist() == [0, 1, 0, 3]
        assert out["oov_frac"].tolist() == [0.0, 0.5, 0.0, 1.0]
        out2 = (oov_rate(ray.data.from_arrow(t).repartition(1), vocab_size=2)
                .to_pandas().sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(out, out2)


class TestContainmentPrefixFilter:
    def test_matches_all_pairs_at_two_thresholds_and_parallelisms(self):
        from colbert_ray.extras.dedup import (
            containment_pairs,
            prefix_filter_containment_pairs,
        )

        base = ["the quick brown fox jumps", "lorem ipsum dolor sit amet",
                "pack my box with five dozen jugs",
                "sphinx of black quartz judge my vow"]
        texts = []
        for i in range(40):
            t = base[i % 4]
            if i % 5 == 0:
                t = t[:len(t) // 2]
            if i % 7 == 0:
                t = t + " extra tail words"
            texts.append(t + ("" if i % 3 else " zz"))
        tbl = pa.table({
            "doc_id": pa.array(np.arange(40, dtype=np.int64)),
            "text": pa.array(texts, type=pa.string())})
        for num, den in ((9, 10), (7, 10)):
            want = (containment_pairs(
                        ray.data.from_arrow(tbl).repartition(3),
                        threshold_num=num, threshold_den=den)
                    .to_pandas().sort_values(["id_src", "id_dst"])
                    .reset_index(drop=True))
            for parts in (1, 5):
                got = (prefix_filter_containment_pairs(
                           ray.data.from_arrow(tbl).repartition(parts),
                           threshold_num=num, threshold_den=den)
                       .to_pandas().sort_values(["id_src", "id_dst"])
                       .reset_index(drop=True))
                pd.testing.assert_frame_equal(got, want)


class TestCharEntropy:
    def test_known_values_and_ordering(self):
        import math

        from colbert_ray.extras.textstats import char_entropy

        texts = ["aaaa",                 # entropy 0
                 "abab",                 # 2 symbols equal -> ln 2
                 "abcd",                 # 4 symbols equal -> ln 4
                 ""]                     # empty -> 0
        t = pa.table({
            "doc_id": pa.array(np.arange(1, 5, dtype=np.int64)),
            "text": pa.array(texts, type=pa.string())})
        out = (char_entropy(ray.data.from_arrow(t).repartition(2))
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert out["n_chars"].tolist() == [4, 4, 4, 0]
        assert out["entropy"].tolist() == [
            0.0, round(math.log(2), 6), round(math.log(4), 6), 0.0]


class TestGroupKL:
    def test_identical_groups_zero_and_skew_positive(self):
        from colbert_ray.extras.textstats import group_kl_divergence

        # two groups with IDENTICAL term distributions -> KL 0 for both;
        # one skewed group -> strictly positive
        texts = (["alpha beta"] * 4 + ["alpha beta"] * 4
                 + ["gamma gamma gamma"] * 4)
        langs = ["a"] * 4 + ["b"] * 4 + ["c"] * 4
        t = pa.table({
            "doc_id": pa.array(np.arange(12, dtype=np.int64)),
            "lang": pa.array(langs, type=pa.string()),
            "text": pa.array(texts, type=pa.string())})
        out = (group_kl_divergence(ray.data.from_arrow(t).repartition(3))
               .to_pandas().sort_values("lang").reset_index(drop=True))
        # a and b share the corpus mixture exactly only if c were absent;
        # compute the naive reference instead
        from collections import Counter
        corpus = Counter()
        per = {}
        for lg, tx in zip(langs, texts):
            cnt = per.setdefault(lg, Counter())
            for w in tx.split():
                cnt[w] += 1
                corpus[w] += 1
        n = sum(corpus.values())
        for row in out.itertuples():
            cnt = per[row.lang]
            nl = sum(cnt.values())
            kl = sum((v / nl) * np.log((v / nl) / (corpus[w] / n))
                     for w, v in cnt.items())
            assert abs(row.kl - round(kl, 6)) < 1e-9
            assert row.n_tokens == nl and row.n_terms == len(cnt)
        # the skewed group diverges most
        assert out.set_index("lang").loc["c", "kl"] == out["kl"].max() > 0


class TestMixtureWeights:
    def test_alpha_half_upsamples_tail(self):
        from colbert_ray.extras.sampling import temperature_mixture_weights

        langs = ["big"] * 90 + ["small"] * 10
        t = pa.table({"lang": pa.array(langs, type=pa.string())})
        out = (temperature_mixture_weights(
                   ray.data.from_arrow(t).repartition(3), "lang", 1, 2)
               .to_pandas().set_index("lang"))
        pw = {"big": 90 ** 0.5, "small": 10 ** 0.5}
        tot = sum(pw.values())
        for lg in ("big", "small"):
            assert out.loc[lg, "weight"] == round(pw[lg] / tot, 6)
        assert out.loc["small", "boost"] > 1.0 > out.loc["big", "boost"]
        # alpha=1 reproduces the natural mixture exactly
        nat = (temperature_mixture_weights(
                   ray.data.from_arrow(t), "lang", 1, 1)
               .to_pandas().set_index("lang"))
        assert nat.loc["big", "weight"] == 0.9
        assert (nat["boost"] == 1.0).all()


class TestQualityPercentileRank:
    def test_rank_dense_and_parallelism_invariant(self):
        from colbert_ray.extras.textstats import quality_percentile_rank

        rng = np.random.default_rng(2)
        texts = [" ".join(rng.choice(["common", "word", "here", "rare%d" % i],
                                     size=12)) for i in range(30)]
        t = pa.table({
            "doc_id": pa.array(np.arange(1, 31, dtype=np.int64)),
            "text": pa.array(texts, type=pa.string())})
        a = (quality_percentile_rank(ray.data.from_arrow(t).repartition(1))
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        b = (quality_percentile_rank(ray.data.from_arrow(t).repartition(7))
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)
        assert sorted(a["rank"]) == list(range(30))    # dense 0..n-1
        assert a["pct"].min() == 0.0 and a["pct"].max() == 1.0
        # rank order agrees with (nll, doc_id) order
        s = a.sort_values(["nll", "doc_id"]).reset_index(drop=True)
        assert s["rank"].tolist() == list(range(30))


class TestMaterializeSequences:
    def test_exact_layout_and_straddling(self):
        from colbert_ray.extras.packing import materialize_sequences

        texts = ["a b c d", "e f", "g h i j k", "l"]
        t = pa.table({"doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                      "text": pa.array(texts, type=pa.string())})
        out = (materialize_sequences(
                   ray.data.from_arrow(t).repartition(3), seq_len=4)
               .to_pandas().sort_values("seq_id").reset_index(drop=True))
        assert out["text"].tolist() == ["a b c d", "e f g h", "i j k l"]
        assert out["n_tokens"].tolist() == [4, 4, 4]
        assert out["n_docs"].tolist() == [1, 2, 2]
        out2 = (materialize_sequences(
                    ray.data.from_arrow(t).repartition(1), seq_len=4)
                .to_pandas().sort_values("seq_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(out, out2)

    def test_roundtrip_concatenation_is_lossless(self):
        from colbert_ray.extras.packing import materialize_sequences

        rng = np.random.default_rng(4)
        texts = [" ".join(f"w{i}_{j}" for j in range(int(k)))
                 for i, k in enumerate(rng.integers(1, 25, size=25))]
        t = pa.table({
            "doc_id": pa.array(np.arange(25, dtype=np.int64)),
            "text": pa.array(texts, type=pa.string())})
        out = (materialize_sequences(
                   ray.data.from_arrow(t).repartition(4), seq_len=16)
               .to_pandas().sort_values("seq_id"))
        assert " ".join(out["text"]) == " ".join(texts)
        assert (out["n_tokens"].iloc[:-1] == 16).all()


class TestAHash:
    def test_known_bits_and_near_dup(self):
        from colbert_ray.extras.multimodal import (
            ahash_dup_pairs,
            image_ahash,
            make_payload_table,
        )

        # payload of 192 identical bytes -> all pixel sums equal -> all 64
        # bits set -> hash == -1 (signed wrap of 2^64 - 1)
        flat = bytes([7] * 192)
        # one hot pixel: byte 0..2 large, rest zero -> only bit 0 set
        hot = bytes([255, 255, 255] + [0] * 189)
        near = bytes([255, 255, 255] + [0] * 186 + [255, 255, 255])
        ds = make_payload_table(
            np.array([1, 2, 3, 4], dtype=np.int64),
            [flat, hot, near, flat])
        import ray as _ray

        payloads = _ray.data.from_arrow(ds)
        hs = (image_ahash(payloads).to_pandas()
              .sort_values("item_id").reset_index(drop=True))
        assert hs.loc[0, "ahash"] == -1            # all bits
        assert hs.loc[1, "ahash"] == 1             # bit 0 only
        assert hs.loc[3, "ahash"] == -1
        # near has bits 0 and 63 -> hamming(hot, near) == 1
        pairs = ahash_dup_pairs(payloads, max_hamming=1).to_pandas()
        got = set(zip(pairs["id_a"], pairs["id_b"]))
        assert (2, 3) in got and (1, 4) in got     # exact dup at hamming 0
        assert (1, 2) not in got

    def test_banded_equals_allpairs(self):
        """Pigeonhole completeness of the Hamming-LSH scale path: the
        banded pair set equals the all-pairs result exactly, including
        pairs whose differing bits straddle every band boundary, at two
        thresholds and two parallelism levels."""
        import pandas as pd
        import ray as _ray

        from colbert_ray.extras.multimodal import (
            ahash_dup_pairs,
            banded_ahash_dup_pairs,
            make_payload_table,
        )

        rng = np.random.default_rng(17)
        blobs = [("img" + "x" * int(rng.integers(0, 60)) + str(i // 3))
                 .encode() for i in range(70)]
        # adversarial extremes: all-ones hashes (hot all-zero xor bands)
        blobs += [bytes([9] * 192)] * 4
        t = make_payload_table(np.arange(len(blobs), dtype=np.int64), blobs)
        for mh in (8, 3):
            for nblocks in (1, 6):
                ds = _ray.data.from_arrow(t).repartition(nblocks)
                want = (ahash_dup_pairs(ds, max_hamming=mh).to_pandas()
                        .sort_values(["id_a", "id_b"])
                        .reset_index(drop=True))
                got = banded_ahash_dup_pairs(ds, max_hamming=mh).to_pandas()
                pd.testing.assert_frame_equal(got, want)
        # pigeonhole edge on the generic engine, crafted hashes: a pair
        # differing in EXACTLY max_hamming bits spread ONE PER BAND (the
        # worst case — d flips touch d of the d+1 bands) must be found at
        # threshold d and dropped at d-1; and max_hamming=0 (ONE 64-bit
        # band, the former shift-by-64 UB) must bucket exact dups only
        from colbert_ray.extras.dedup import banded_hamming_pairs

        B = 4                                    # max_hamming=3 -> 4 bands
        flipped = 0
        for i in range(3):
            flipped |= 1 << (i * (64 // B))      # bits 0, 16, 32
        tbl = pa.table({"item_id": pa.array([0, 1, 2], type=pa.int64()),
                        "h": pa.array([0, flipped, 0], type=pa.int64())})
        ds3 = _ray.data.from_arrow(tbl)
        got3 = banded_hamming_pairs(ds3, "h", "item_id",
                                    max_hamming=3).to_pandas()
        assert set(zip(got3["id_a"], got3["id_b"], got3["hamming"])) == {
            (0, 1, 3), (0, 2, 0), (1, 2, 3)}
        got2b = banded_hamming_pairs(ds3, "h", "item_id",
                                     max_hamming=2).to_pandas()
        assert set(zip(got2b["id_a"], got2b["id_b"])) == {(0, 2)}
        got0 = banded_hamming_pairs(ds3, "h", "item_id",
                                    max_hamming=0).to_pandas()
        assert set(zip(got0["id_a"], got0["id_b"])) == {(0, 2)}


class TestVideoDupPairs:
    def test_identical_and_disjoint_payloads(self):
        from colbert_ray.extras.multimodal import (
            make_payload_table,
            video_dup_pairs,
        )

        dup = bytes(range(64, 255)) * 2       # long, non-repetitive
        other = bytes(reversed(range(10, 200))) * 2
        t = make_payload_table(
            np.array([1, 2, 3], dtype=np.int64),
            [dup, dup, other], media_type="video")
        out = (video_dup_pairs(ray.data.from_arrow(t).repartition(2),
                               min_shared=4)
               .to_pandas())
        assert list(zip(out["id_a"], out["id_b"])) == [(1, 2)]
        assert int(out["n_shared"].iloc[0]) >= 4   # identical frames
        # empty result keeps working (no crash on no-pairs corpora)
        t2 = make_payload_table(np.array([1, 2], dtype=np.int64),
                                [dup, other], media_type="video")
        out2 = video_dup_pairs(ray.data.from_arrow(t2),
                               min_shared=4).to_pandas()
        assert len(out2) == 0


class TestAudioFingerprint:
    def test_trend_bits_and_dup_groups(self):
        from colbert_ray.extras.multimodal import (
            audio_dup_groups,
            audio_fingerprints,
            make_payload_table,
        )

        # ramp up: every window louder than the last -> all 31 bits set
        up = np.linspace(0, 3000, 32 * 4).astype("<i2").tobytes()
        down = np.linspace(3000, 0, 32 * 4).astype("<i2").tobytes()
        t = make_payload_table(np.array([1, 2, 3], dtype=np.int64),
                               [up, down, up], media_type="audio")
        ds = ray.data.from_arrow(t)
        fp = (audio_fingerprints(ds).to_pandas()
              .sort_values("item_id").reset_index(drop=True))
        assert fp.loc[0, "afp"] == (1 << 31) - 1
        assert fp.loc[1, "afp"] == 0
        assert fp.loc[2, "afp"] == fp.loc[0, "afp"]
        g = audio_dup_groups(ds).to_pandas()
        assert len(g) == 1
        assert (int(g["rep_id"].iloc[0]), int(g["n_items"].iloc[0])) == (1, 2)


class TestWinnowing:
    def test_matches_naive_reference(self):
        """Engine winnowing == the straightforward per-doc loop (same
        k-gram Horner hash, leftmost-min window selection, clipped single
        window for short docs) across parameter corners."""
        import warnings

        from colbert_ray.config import EngineConfig
        from colbert_ray.extras.dedup import winnow_fingerprints
        from colbert_ray.functions.hashing import FNV_PRIME, fnv1a64_strings
        from colbert_ray.functions.tokenizer import tokenize_column

        def ref(texts, k, w):
            cfg = EngineConfig()
            out = set()
            for did, t in enumerate(texts):
                toks = tokenize_column(pa.array([t]), cfg) \
                    .flatten().to_pylist()
                if len(toks) < k:
                    continue
                th = fnv1a64_strings(pa.array(toks))
                grams = []
                with warnings.catch_warnings():
                    warnings.simplefilter("ignore")
                    for i in range(len(toks) - k + 1):
                        gh = np.uint64(0)
                        for j in range(k):
                            gh = gh * FNV_PRIME + th[i + j]
                        grams.append(gh)
                n = len(grams)
                sel = ({int(np.argmin(grams))} if n < w else
                       {t0 + int(np.argmin(grams[t0:t0 + w]))
                        for t0 in range(n - w + 1)})
                out |= {(did, int(grams[s].astype(np.int64))) for s in sel}
            return out

        rng = np.random.default_rng(5)
        vocab = [f"tok{i}" for i in range(40)]
        texts = [" ".join(rng.choice(vocab, size=int(rng.integers(0, 30))))
                 for _ in range(40)] + ["a b", "", "x x x"]
        t = pa.table({"doc_id": pa.array(np.arange(len(texts)),
                                         type=pa.int64()),
                      "text": pa.array(texts)})
        for k, w in ((4, 3), (1, 1), (2, 6)):
            got = x_dedup.winnow_fingerprints(
                ray.data.from_arrow(t).repartition(4), k=k, w=w).to_pandas()
            gset = set(zip(got["doc_id"].astype(int), got["fp"].astype(int)))
            assert gset == ref(texts, k, w), (k, w)

    def test_coverage_guarantee_and_clone_pairs(self):
        """The winnowing theorem: a shared token run of length >= k+w-1
        forces >= 1 COMMON selected fingerprint — an embedded clone is
        found even when the surrounding docs differ completely."""
        from colbert_ray.extras.dedup import code_clone_pairs

        k, w = 4, 3
        clone = "alpha beta gamma delta epsilon zeta eta theta"  # 8 >= k+w-1
        texts = [
            f"unrelated preamble {clone} unrelated tail one two three",
            f"totally different start {clone} and another ending here",
            "no shared content in this document at all whatsoever",
        ]
        t = pa.table({"doc_id": pa.array([10, 20, 30], type=pa.int64()),
                      "text": pa.array(texts)})
        out = code_clone_pairs(ray.data.from_arrow(t), k=k, w=w,
                               min_shared=1).to_pandas()
        pairs = set(zip(out["id_a"], out["id_b"]))
        assert (10, 20) in pairs
        assert not any(30 in p for p in pairs)
        # parallelism invariance
        out2 = code_clone_pairs(ray.data.from_arrow(t).repartition(3),
                                k=k, w=w, min_shared=1).to_pandas()
        pd.testing.assert_frame_equal(out, out2)
        # max_df boilerplate filter: a fingerprint in all 3 docs is dropped
        t3 = pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                       "text": pa.array([clone, clone, clone])})
        full = code_clone_pairs(ray.data.from_arrow(t3), k=k, w=w,
                                min_shared=1).to_pandas()
        capped = code_clone_pairs(ray.data.from_arrow(t3), k=k, w=w,
                                  min_shared=1, max_df=2).to_pandas()
        assert len(full) == 3 and len(capped) == 0
