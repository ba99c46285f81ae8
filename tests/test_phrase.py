"""Phrase search (pipelines/phrase.py): positional verify semantics, index
candidate generation, and index-path == scan-path equivalence."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from colbert_ray.config import EngineConfig
from colbert_ray.pipelines.build import build_index
from colbert_ray.pipelines.phrase import (
    conjunctive_candidates,
    count_phrase_occurrences,
    phrase_scan,
    phrase_search,
    phrase_tokens,
)
from colbert_ray.state.decoded import DecodedIndex

CFG = EngineConfig()


# ---------------------------------------------------------------------------
# pure-function semantics
# ---------------------------------------------------------------------------

def _occ(texts, phrase, cfg=CFG):
    return count_phrase_occurrences(
        pa.array(texts), phrase_tokens(phrase, cfg), cfg).tolist()


def test_overlapping_occurrences_counted():
    # starts at 0,1,2 — overlaps included, like the SQL twin's offset scan
    assert _occ(["a a a a"], "a a") == [3]


def test_phrase_never_crosses_doc_boundary():
    assert _occ(["hash", "join hash", "join"], "hash join") == [0, 0, 0]
    assert _occ(["x hash join y"], "hash join") == [1]


def test_tokenization_matches_indexing():
    # camelCase split + punctuation separators + lowercase
    assert phrase_tokens("HashJoin", CFG) == ["hash", "join"]
    assert _occ(["use hashJoin(now)"], "HASH JOIN") == [1]


def test_single_word_phrase_is_tf():
    assert _occ(["b a b b", "a"], "b") == [3, 0]


def test_empty_and_separator_only_phrase():
    assert phrase_tokens("  ... ", CFG) == []
    assert _occ(["a b"], "...") == [0]


def test_length_filter_applied_to_both_sides():
    cfg = EngineConfig(min_token_len=2)
    # 'a' drops out of BOTH the doc tokens and the phrase: "bb a cc"
    # tokenizes to [bb, cc], so the phrase "bb cc" is adjacent
    assert count_phrase_occurrences(
        pa.array(["bb a cc"]), phrase_tokens("bb cc", cfg), cfg).tolist() == [1]


def _naive_occ(text: str, words: list[str], cfg=CFG) -> int:
    toks = phrase_tokens(text, cfg)  # same tokenizer, one doc
    m = len(words)
    return sum(1 for i in range(len(toks) - m + 1) if toks[i:i + m] == words)


def test_randomized_counts_vs_naive():
    rng = np.random.default_rng(7)
    vocab = ["a", "b", "c", "ab"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 30)))
             for _ in range(200)]
    for phrase in ("a b", "b b", "a b c", "ab a"):
        words = phrase_tokens(phrase, CFG)
        got = count_phrase_occurrences(pa.array(texts), words, CFG)
        want = [_naive_occ(t, words) for t in texts]
        np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# index-backed paths
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def docs_index(tmp_path_factory):
    """A tiny documents-shaped corpus (doc_id, text) + its index."""
    rng = np.random.default_rng(11)
    vocab = ["hash", "join", "merge", "sort", "scan", "a"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 40)))
             for _ in range(120)]
    root = tmp_path_factory.mktemp("phrase")
    path = os.path.join(str(root), "documents.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(range(120), type=pa.int64()),
                             "text": pa.array(texts)}), path)
    index_dir = os.path.join(str(root), "idx")
    build_index(path, index_dir, CFG, content_col="text", key_cols=(),
                meta_cols=(), docid_col="doc_id")
    return path, index_dir, texts


def test_conjunctive_candidates_vs_bruteforce(docs_index):
    path, index_dir, texts = docs_index
    idx = DecodedIndex.load_cached(index_dir, load_sha=False)
    for words in (["hash"], ["hash", "join"], ["hash", "join", "merge"],
                  ["hash", "zzznotaterm"]):
        got = conjunctive_candidates(idx, words)
        want = [i for i, t in enumerate(texts)
                if all(w in phrase_tokens(t, CFG) for w in words)]
        np.testing.assert_array_equal(got, want)


def test_phrase_search_equals_scan_topk(docs_index):
    path, index_dir, texts = docs_index
    corpus = ray.data.read_parquet(path)
    for phrase, k in (("hash join", 10), ("a a", 5), ("merge sort scan", 7)):
        res = phrase_search(index_dir, corpus, phrase, k=k, cfg=CFG).to_pandas()
        scan = pd.DataFrame(phrase_scan(corpus, phrase, CFG).take_all())
        if len(scan):
            scan = (scan.sort_values(["n_occ", "doc_id"],
                                     ascending=[False, True])
                    .head(k).reset_index(drop=True))
            pd.testing.assert_frame_equal(res, scan[["doc_id", "n_occ"]])
        else:
            assert len(res) == 0
        # and both agree with the naive per-doc count
        words = phrase_tokens(phrase, CFG)
        for row in res.itertuples():
            assert _naive_occ(texts[row.doc_id], words) == row.n_occ


def test_phrase_search_oov_empty(docs_index):
    path, index_dir, _ = docs_index
    corpus = ray.data.read_parquet(path)
    res = phrase_search(index_dir, corpus, "hash zzznotaterm", k=10, cfg=CFG)
    assert res.num_rows == 0
    assert res.schema.names == ["doc_id", "n_occ"]


class TestProximity:
    def test_min_token_span_cases(self):
        from colbert_ray.pipelines.phrase import min_token_span

        # adjacent
        assert min_token_span([np.array([0]), np.array([1])]) == 2
        # pick the tight combo, not the first
        assert min_token_span([np.array([0, 50]),
                               np.array([52]),
                               np.array([10, 51])]) == 3
        # single word
        assert min_token_span([np.array([7])]) == 1
        # repeated positions interleaved
        assert min_token_span([np.array([0, 4, 8]),
                               np.array([2, 6])]) == 3

    def test_proximity_matches_naive(self, docs_index):
        path, index_dir, texts = docs_index
        from colbert_ray.pipelines.phrase import (_filtered_flat_tokens,
                                                  min_token_span,
                                                  phrase_tokens,
                                                  proximity_search)

        q = "join merge sort"
        words = sorted(set(phrase_tokens(q, CFG)))
        tbl = pq.read_table(path)
        parents, flat = _filtered_flat_tokens(tbl.column("text"), CFG)
        toks = flat.to_numpy(zero_copy_only=False)
        want = []
        for row in range(tbl.num_rows):
            tk = toks[parents == row]
            pos = [np.flatnonzero(tk == w) for w in words]
            if all(len(p) for p in pos):
                want.append((row, min_token_span(pos)))
        want.sort(key=lambda x: (x[1], x[0]))
        assert len(want) > 3          # fixture vocab guarantees co-occurrence
        got = proximity_search(index_dir, ray.data.read_parquet(path),
                               q, k=10, cfg=CFG)
        got_rows = list(zip(got.column("doc_id").to_pylist(),
                            got.column("span").to_pylist()))
        assert got_rows == want[:10]


def test_prefix_search_vs_bruteforce(docs_index):
    from collections import Counter

    from colbert_ray.pipelines.phrase import prefix_search

    path, index_dir, texts = docs_index
    got = prefix_search(index_dir, "s").to_pandas()
    want = {}
    for did, t in enumerate(texts):
        c = Counter(w for w in phrase_tokens(t, CFG) if w.startswith("s"))
        if c:
            want[did] = (len(c), sum(c.values()))
    assert dict(zip(got["doc_id"],
                    zip(got["n_terms"], got["sum_tf"]))) == want
    assert got["doc_id"].is_monotonic_increasing


def test_prefix_search_no_match_and_empty(docs_index):
    from colbert_ray.pipelines.phrase import prefix_search

    _, index_dir, _ = docs_index
    assert prefix_search(index_dir, "zzz").num_rows == 0
    assert prefix_search(index_dir, "").num_rows == 0


def test_infix_search_vs_bruteforce(docs_index):
    from collections import Counter

    from colbert_ray.pipelines.phrase import infix_search

    path, index_dir, texts = docs_index
    got = infix_search(index_dir, "a").to_pandas()   # hash, scan, a
    want = {}
    for did, t in enumerate(texts):
        c = Counter(w for w in phrase_tokens(t, CFG) if "a" in w)
        if c:
            want[did] = (len(c), sum(c.values()))
    assert dict(zip(got["doc_id"],
                    zip(got["n_terms"], got["sum_tf"]))) == want
    assert infix_search(index_dir, "zzz").num_rows == 0
    assert infix_search(index_dir, "").num_rows == 0


def test_suffix_search_vs_bruteforce(docs_index):
    from collections import Counter

    from colbert_ray.pipelines.phrase import suffix_search

    path, index_dir, texts = docs_index
    for suf in ("n", "h", "e"):       # {join, scan}, {hash}, {merge}
        got = suffix_search(index_dir, suf).to_pandas()
        want = {}
        for did, t in enumerate(texts):
            c = Counter(w for w in phrase_tokens(t, CFG) if w.endswith(suf))
            if c:
                want[did] = (len(c), sum(c.values()))
        assert dict(zip(got["doc_id"],
                        zip(got["n_terms"], got["sum_tf"]))) == want
        assert got["doc_id"].is_monotonic_increasing
    assert suffix_search(index_dir, "zzz").num_rows == 0
    assert suffix_search(index_dir, "").num_rows == 0


def test_wildcard_search_like_semantics(docs_index):
    from collections import Counter

    from colbert_ray.pipelines.phrase import wildcard_search

    path, index_dir, texts = docs_index

    def brute(pre, suf):
        want = {}
        for did, t in enumerate(texts):
            c = Counter(
                w for w in phrase_tokens(t, CFG)
                if w.startswith(pre) and w.endswith(suf)
                and len(w) >= len(pre) + len(suf))   # LIKE 'pre%suf'
            if c:
                want[did] = (len(c), sum(c.values()))
        return want

    for pre, suf in (("s", "n"), ("s", "t"), ("ha", "sh"), ("j", "n")):
        got = wildcard_search(index_dir, pre, suf).to_pandas()
        assert dict(zip(got["doc_id"],
                        zip(got["n_terms"], got["sum_tf"]))) == brute(pre, suf)
    # overlap edge: 'has%sh' must NOT match 'hash' (len 4 < 3+2) even though
    # it starts with 'has' and ends with 'sh'
    assert wildcard_search(index_dir, "has", "sh").num_rows == 0
    assert wildcard_search(index_dir, "", "n").num_rows == 0
    assert wildcard_search(index_dir, "s", "").num_rows == 0


def test_disjunctive_docs_vs_bruteforce(docs_index):
    from colbert_ray.pipelines.phrase import disjunctive_docs

    path, index_dir, texts = docs_index
    toks = [set(phrase_tokens(t, CFG)) for t in texts]
    for or_t, not_t, m in ((["hash", "join"], [], 1),
                           (["hash", "join"], [], 2),
                           (["hash", "join", "merge"], ["sort"], 2),
                           (["hash", "zzz"], ["join"], 1)):
        got = disjunctive_docs(index_dir, or_t, not_t,
                               min_should_match=m).to_pandas()
        want = {did: len(tk & set(or_t)) for did, tk in enumerate(toks)
                if len(tk & set(or_t)) >= m and not (tk & set(not_t))}
        assert dict(zip(got["doc_id"], got["n_match"])) == want
        assert got["doc_id"].is_monotonic_increasing
    assert disjunctive_docs(index_dir, [], ["hash"]).num_rows == 0
    # all-excluded edge: every doc with 'a' also counted, then NOT out
    full = disjunctive_docs(index_dir, ["a"], ["a"]).to_pandas()
    assert len(full) == 0


def test_reversed_dict_cache_rebuilds_on_vocab_growth():
    """The reversed-dictionary cache must rebuild when the dictionary grows
    in place (IndexUpdater folds new terms into dict_terms), and must be
    reused — same object — while the vocabulary is unchanged."""
    from colbert_ray.pipelines.phrase import _reversed_dict

    class FakeIdx:
        pass

    idx = FakeIdx()
    idx.dict_terms = np.array(["hash", "join", "scan"], dtype=object)
    rev1, perm1 = _reversed_dict(idx)
    assert list(rev1) == sorted(t[::-1] for t in idx.dict_terms)
    assert rev1 is _reversed_dict(idx)[0]          # cached, not rebuilt
    idx.dict_terms = np.array(["hash", "join", "scan", "xyzzyglorp"],
                              dtype=object)        # updater growth
    rev2, perm2 = _reversed_dict(idx)
    assert rev2 is not rev1
    assert list(rev2) == sorted(t[::-1] for t in idx.dict_terms)
    np.testing.assert_array_equal(idx.dict_terms[perm2], [
        t[::-1] for t in rev2])


def test_suggest_terms_live_df_and_order(tmp_path):
    """Autocomplete ranks by live df (tombstones excluded) with term
    tie-break; empty prefix and no-match prefixes return empty."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from colbert_ray.pipelines.build import build_index
    from colbert_ray.pipelines.phrase import suggest_terms
    from colbert_ray.state.updates import IndexUpdater

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array(["apple apricot", "apple banana", "apple apex"]),
    })
    src = str(tmp_path / "d.parquet")
    pq.write_table(t, src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, EngineConfig(num_term_partitions=2),
                content_col="text", key_cols=(), meta_cols=(),
                docid_col="doc_id")
    out = suggest_terms(idx, "ap", k=10).to_pandas()
    assert out["term"].tolist() == ["apple", "apex", "apricot"]
    assert out["df"].tolist() == [3, 1, 1]
    assert suggest_terms(idx, "", 5).num_rows == 0
    assert suggest_terms(idx, "zzz", 5).num_rows == 0
    # uppercase prefix is lowered (the dictionary is lowercase) and
    # non-positive k returns empty instead of a negative-slice dump
    assert suggest_terms(idx, "AP", k=10).equals(suggest_terms(idx, "ap",
                                                               k=10))
    assert suggest_terms(idx, "ap", k=0).num_rows == 0
    assert suggest_terms(idx, "ap", k=-1).num_rows == 0
    # tombstone doc 1: apricot's live df drops to 0 and it disappears
    IndexUpdater(idx).remove_docids([1])
    import os

    os.utime(os.path.join(idx, "metadata.json"))
    out2 = suggest_terms(idx, "ap", k=10).to_pandas()
    assert out2["term"].tolist() == ["apple", "apex"]
    assert out2["df"].tolist() == [2, 1]
