"""Unit tests for leaf functions: tokenizer golden vectors (reference pattern:
``colbert/tests/tokenizers_test.py:78-137`` frozen-vector equality),
codec roundtrip, BM25 scalar math vs hand-computed values."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from colbert_ray.config import EngineConfig
from colbert_ray.functions import bm25
from colbert_ray.functions.codec import (
    decode_tfs,
    delta_decode_docids,
    delta_encode_docids,
    encode_tfs,
    varint_decode,
    varint_encode,
)
from colbert_ray.functions.tokenizer import (
    doc_term_frequencies,
    tokenize_column,
    tokenize_query,
)

CFG = EngineConfig()


class TestTokenizer:
    def test_golden_vectors(self):
        # frozen expected outputs (tokenizers_test.py pattern)
        cases = {
            "getHTTPServer foo_bar": ["get", "http", "server", "foo", "bar"],
            "parseJSON2XML": ["parse", "json2", "xml"],
            "snake_case camelCase UPPER lower123": [
                "snake", "case", "camel", "case", "upper", "lower123"],
            "": [],
            "  !!  ": [],
            "a-b.c;d": ["a", "b", "c", "d"],
        }
        toks = tokenize_column(pa.array(list(cases.keys())), CFG)
        for got, want in zip(toks.to_pylist(), cases.values()):
            assert [t for t in got if t] == want

    def test_doc_term_frequencies_sorted_and_counted(self):
        dl, terms, tfs = doc_term_frequencies(pa.array(["b a b c a b"]), CFG)
        assert dl.tolist() == [6]
        assert terms.to_pylist() == [["a", "b", "c"]]   # sorted per doc
        assert tfs.to_pylist() == [[2, 3, 1]]

    def test_query_tokenize(self):
        terms, tfs = tokenize_query("mergeSort merge zz", CFG)
        assert terms == ["merge", "sort", "zz"]
        assert tfs == [2, 1, 1]

    def test_empty_and_null_free(self):
        dl, terms, tfs = doc_term_frequencies(pa.array(["", "x"]), CFG)
        assert dl.tolist() == [0, 1]
        assert terms.to_pylist() == [[], ["x"]]


class TestByteTokenizerEquivalence:
    """The byte-level tokenizer must produce IDENTICAL output to the RE2
    path for any input (golden-vector + randomized differential)."""

    # U+0130 ('İ') and U+212A (Kelvin sign) lowercase INTO ASCII via
    # utf8_lower — the one documented divergence of the byte path (which
    # treats all non-ASCII bytes as separators); excluded here.
    @given(st.lists(st.text(
        alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FFF,
                               exclude_characters="İK"),
        max_size=80), max_size=20))
    @settings(max_examples=60, deadline=None)
    def test_differential_random(self, docs):
        import dataclasses

        import pyarrow as pa

        from colbert_ray.functions.tokenizer import doc_term_frequencies

        cfg_r = dataclasses.replace(CFG, tokenizer_impl="regex")
        cfg_b = dataclasses.replace(CFG, tokenizer_impl="bytes")
        t = pa.array(docs, type=pa.string())
        dr = doc_term_frequencies(t, cfg_r)
        db = doc_term_frequencies(t, cfg_b)
        assert dr[0].tolist() == db[0].tolist()
        assert dr[1].to_pylist() == db[1].to_pylist()
        assert dr[2].to_pylist() == db[2].to_pylist()


class TestLutSplitEquivalence:
    """The ASCII LUT+whitespace-split fast path must be BYTE-IDENTICAL to
    the RE2 lower+class-split it replaces — including edge/run empty
    tokens — and non-ASCII batches must fall back to RE2."""

    def _regex_reference(self, docs, cfg):
        import pyarrow.compute as pc

        from colbert_ray.functions import tokenizer as tk
        s = pa.array(docs, type=pa.string())
        if s.null_count:
            s = pc.fill_null(s, "")
        if cfg.split_camel_case:
            s = pc.replace_substring_regex(s, pattern=tk._CAMEL_1, replacement=r"\1 \2")
            s = pc.replace_substring_regex(s, pattern=tk._CAMEL_2, replacement=r"\1 \2")
        if cfg.lowercase:
            return pc.split_pattern_regex(pc.utf8_lower(s), pattern=tk._SPLIT_LOWER)
        return pc.split_pattern_regex(s, pattern=tk._SPLIT)

    @given(st.lists(st.text(
        alphabet=st.characters(min_codepoint=1, max_codepoint=127),
        max_size=60), max_size=20),
        st.booleans(), st.booleans())
    @settings(max_examples=120, deadline=None)
    def test_ascii_differential(self, docs, lowercase, camel):
        import dataclasses
        cfg = dataclasses.replace(CFG, lowercase=lowercase, split_camel_case=camel)
        got = tokenize_column(pa.array(docs, type=pa.string()), cfg)
        want = self._regex_reference(docs, cfg)
        assert got.to_pylist() == want.to_pylist()

    @given(st.lists(st.text(
        alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FF,
                               exclude_characters="İK"),
        max_size=60), max_size=20))
    @settings(max_examples=60, deadline=None)
    def test_mixed_unicode_differential(self, docs):
        # non-ASCII batches take the RE2 fallback; output must still match
        got = tokenize_column(pa.array(docs, type=pa.string()), CFG)
        want = self._regex_reference(docs, CFG)
        assert got.to_pylist() == want.to_pylist()

    def test_golden_edges(self):
        docs = ["", " ", ";;a;;b;;", "fooBar", "HTTPServer2x",
                "a\tb\nc", "_x_", "9X", "  ", "\x00ab\x7f"]
        got = tokenize_column(pa.array(docs), CFG)
        want = self._regex_reference(docs, CFG)
        assert got.to_pylist() == want.to_pylist()


class TestAggregateTfBincount:
    """bincount and np.unique key-counting branches must agree exactly."""

    @given(st.lists(st.lists(st.sampled_from(
        ["a", "b", "cc", "dd", "e1", "ff2"]), max_size=30), max_size=12))
    @settings(max_examples=60, deadline=None)
    def test_branches_agree(self, docs):
        from colbert_ray.functions import tokenizer as tk
        texts = pa.array([" ".join(d) for d in docs], type=pa.string())
        dl1, t1, f1 = doc_term_frequencies(texts, CFG)   # bincount branch
        saved = tk._BINCOUNT_MAX_SLOTS
        try:
            tk._BINCOUNT_MAX_SLOTS = 0                   # force np.unique
            dl2, t2, f2 = doc_term_frequencies(texts, CFG)
        finally:
            tk._BINCOUNT_MAX_SLOTS = saved
        assert dl1.tolist() == dl2.tolist()
        assert t1.to_pylist() == t2.to_pylist()
        assert f1.to_pylist() == f2.to_pylist()


class TestCodec:
    @given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
    @settings(max_examples=50, deadline=None)
    def test_varint_roundtrip(self, vals):
        v = np.array(vals, dtype=np.uint64)
        assert (varint_decode(varint_encode(v), len(v)) == v).all()

    @given(st.sets(st.integers(min_value=0, max_value=10**12), max_size=300))
    @settings(max_examples=50, deadline=None)
    def test_delta_roundtrip(self, s):
        d = np.array(sorted(s), dtype=np.int64)
        assert (delta_decode_docids(delta_encode_docids(d), len(d)) == d).all()

    def test_tfs_roundtrip(self):
        t = np.array([1, 1, 200, 3, 10**6], dtype=np.int64)
        assert (decode_tfs(encode_tfs(t), len(t)) == t).all()

    def test_nonincreasing_rejected(self):
        with pytest.raises(ValueError):
            delta_encode_docids(np.array([3, 3], dtype=np.int64))

    def test_corrupt_stream_rejected(self):
        with pytest.raises(ValueError):
            varint_decode(b"\x80", 1)   # dangling continuation

    def test_empty_buffer_with_count_rejected(self):
        with pytest.raises(ValueError, match="corrupt varint"):
            varint_decode(b"", 3)

    def test_truncated_pfor_rejected(self):
        from colbert_ray.functions.codec import pfor_decode, pfor_encode

        buf = pfor_encode(np.arange(300, dtype=np.uint64))
        with pytest.raises(ValueError, match="pfor"):
            pfor_decode(buf[:2], 300)


class TestPforCodec:
    """PForDelta bit-plane block codec (segment_codec='pfor')."""

    @given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=400))
    @settings(max_examples=50, deadline=None)
    def test_roundtrip(self, vals):
        from colbert_ray.functions.codec import pfor_decode, pfor_encode

        v = np.array(vals, dtype=np.uint64)
        assert (pfor_decode(pfor_encode(v), len(v)) == v).all()

    def test_engineered_distributions(self):
        from colbert_ray.functions.codec import pfor_decode, pfor_encode

        rng = np.random.default_rng(3)
        for v in (
            np.empty(0, dtype=np.uint64),
            np.zeros(129, dtype=np.uint64),
            np.ones(1000, dtype=np.uint64),
            np.full(128, 2**62, dtype=np.uint64),
            np.concatenate([np.zeros(120, np.uint64),
                            np.full(8, 2**50, np.uint64)]),
            np.maximum(1, rng.poisson(7, 100_000)).astype(np.uint64),
            rng.zipf(1.5, 50_000).astype(np.uint64) % (2**62),
        ):
            assert (pfor_decode(pfor_encode(v), len(v)) == v).all()

    def test_segmented_matches_scalar_and_concat_decode(self):
        from colbert_ray.functions.codec import (
            pfor_decode_concat,
            pfor_encode,
            pfor_encode_segmented,
        )

        rng = np.random.default_rng(11)
        vals = rng.zipf(1.4, 30_000).astype(np.uint64) % (2**62)
        starts = np.sort(rng.choice(len(vals), 200, replace=False))
        starts[0] = 0
        counts = np.diff(np.append(starts, len(vals)))
        bufs = pfor_encode_segmented(vals, starts)
        for r in rng.integers(0, 200, 30):
            s, c = starts[r], counts[r]
            assert bufs[r] == pfor_encode(vals[s:s + c])
        cat = np.frombuffer(b"".join(bufs), dtype=np.uint8)
        cell_starts = np.zeros(200, np.int64)
        np.cumsum([len(b) for b in bufs[:-1]], out=cell_starts[1:])
        out = pfor_decode_concat(cat, cell_starts, counts)
        assert (out == vals).all()

    def test_run_dispatch_helpers(self):
        from colbert_ray.functions.codec import (
            decode_docids_run,
            decode_tfs_run,
            encode_docids_run,
            encode_tfs_run,
        )

        d = np.array([3, 9, 10, 5000, 70000], dtype=np.int64)
        t = np.array([1, 1, 60, 2, 7], dtype=np.int64)
        for codec in ("varint", "pfor"):
            assert (decode_docids_run(
                encode_docids_run(d, codec), len(d), codec) == d).all()
            assert (decode_tfs_run(
                encode_tfs_run(t, codec), len(t), codec) == t).all()

    def test_compresses_dense_gaps_vs_varint(self):
        from colbert_ray.functions.codec import pfor_encode, varint_encode

        rng = np.random.default_rng(5)
        gaps = np.maximum(1, rng.poisson(7, 200_000)).astype(np.uint64)
        assert len(pfor_encode(gaps)) < 0.7 * len(varint_encode(gaps))


class TestLangOverrides:
    """Per-language tokenizer plugins (SURVEY §7.1 M9)."""

    def _batch(self):
        import pyarrow as pa

        return pa.table({
            "repo": pa.array(["r"] * 4),
            "path": pa.array([f"{i}.x" for i in range(4)]),
            "commit": pa.array(["c"] * 4),
            "lang": pa.array(["go", "python", "go", "java"]),
            "content": pa.array(["parseURL fooBar", "parseURL fooBar",
                                 "parseURL bazQux", "parseURL fooBar"]),
        })

    def test_override_applies_only_to_its_lang(self):
        from colbert_ray.config import EngineConfig
        from colbert_ray.stages.tokenize import make_tokenize_fn

        cfg = EngineConfig(
            lang_overrides={"go": {"split_camel_case": False}})
        out = make_tokenize_fn(cfg)(self._batch())
        terms = out.column("terms").to_pylist()
        # go rows keep camelCase intact (lowercased only)
        assert "parseurl" in terms[0] and "foobar" in terms[0]
        assert "parse" not in terms[0]
        # python/java rows split as usual
        assert "parse" in terms[1] and "url" in terms[1]
        assert "parse" in terms[3]
        # row order preserved
        assert "bazqux" in terms[2]

    def test_empty_overrides_identical_to_base(self):
        from colbert_ray.config import EngineConfig
        from colbert_ray.stages.tokenize import make_tokenize_fn

        base = make_tokenize_fn(EngineConfig())(self._batch())
        noop = make_tokenize_fn(EngineConfig(lang_overrides={}))(self._batch())
        assert base.column("terms").to_pylist() == noop.column("terms").to_pylist()
        assert base.column("tfs").to_pylist() == noop.column("tfs").to_pylist()
        assert base.column("doclen").to_pylist() == noop.column("doclen").to_pylist()

    def test_unknown_knob_rejected(self):
        import pytest as _pytest

        from colbert_ray.config import EngineConfig
        from colbert_ray.stages.tokenize import make_tokenize_fn

        cfg = EngineConfig(lang_overrides={"go": {"k1": 2.0}})
        with _pytest.raises(ValueError, match="lang_overrides"):
            make_tokenize_fn(cfg)(self._batch())

    def test_overrides_change_pretokenize_hash(self):
        from colbert_ray.config import EngineConfig

        a = EngineConfig()
        b = EngineConfig(lang_overrides={"go": {"split_camel_case": False}})
        assert a.semantic_hash_pretokenize() != b.semantic_hash_pretokenize()
        assert a.semantic_hash() != b.semantic_hash()


class TestBM25Math:
    def test_idf_hand_computed(self):
        # N=100, df=10 -> ln((100-10+.5)/(10+.5)+1) = ln(9.61904761...)
        assert bm25.idf(10.0, 100) == pytest.approx(np.log((90.5 / 10.5) + 1.0))

    def test_tf_saturation_hand_computed(self):
        # tf=2, dl=100, avgdl=100, k1=1.2, b=0.75 -> 2*2.2/(2+1.2) = 1.375
        got = bm25.tf_saturation(np.array([2.0]), np.array([100.0]), 100.0, 1.2, 0.75)
        assert got[0] == pytest.approx(2 * 2.2 / 3.2)

    def test_topk_tie_break_by_docid(self):
        scores = np.array([1.0, 2.0, 2.0, 0.5])
        docids = np.array([9, 7, 3, 1], dtype=np.int64)
        d, s, r = bm25.topk_with_ties(scores, docids, 3)
        assert d.tolist() == [3, 7, 9]          # tie at 2.0 -> lower docid first
        assert s.tolist() == [2.0, 2.0, 1.0]
        assert r.tolist() == [1, 2, 3]

    def test_topk_boundary_ties_not_dropped(self):
        # kth boundary has equal scores: canonical (-score, docid) must win
        scores = np.ones(10)
        docids = np.arange(10, 0, -1, dtype=np.int64)
        d, _, _ = bm25.topk_with_ties(scores, docids, 3)
        assert d.tolist() == [1, 2, 3]


class TestFnvHashing:
    def test_frozen_vectors(self):
        """Frozen FNV-1a 64 values (reference pattern tokenizers_test.py:
        pinned outputs guard against silent hash drift — fingerprints and
        simhash both derive from this function)."""
        import pyarrow as pa

        from colbert_ray.functions.hashing import fnv1a64_strings

        got = [int(x) for x in fnv1a64_strings(
            pa.array(["", "a", "hello", "the", "Zebra42"]))]
        assert got == [
            14695981039346656037,
            12638187200555641996,
            11831194018420276491,
            6266135566914540924,
            18424615568875470953,
        ]

    def test_matches_byte_loop_and_sql(self):
        import duckdb
        import pyarrow as pa

        from colbert_ray.functions.hashing import fnv1a64_strings, sql_fnv1a64_expr

        words = ["mixedCase", "x" * 64, "a1b2c3", "zz", "hello"]

        def ref(s):
            h = 14695981039346656037
            for b in s.encode():
                h = ((h ^ b) * 1099511628211) % (1 << 64)
            return h

        got = [int(x) for x in fnv1a64_strings(pa.array(words))]
        assert got == [ref(w) for w in words]
        con = duckdb.connect()
        sql = (f"SELECT {sql_fnv1a64_expr('t')} AS h "
               f"FROM (SELECT unnest(?::VARCHAR[]) AS t)")
        via_sql = [int(r[0]) for r in con.execute(sql, [words]).fetchall()]
        assert via_sql == got


def test_broadcast_semi_join_filters_and_is_partition_invariant():
    import ray

    from colbert_ray.functions.util import broadcast_semi_join

    t = pa.table({"id": pa.array(range(100), type=pa.int64()),
                  "v": pa.array([f"x{i}" for i in range(100)])})
    want = [3, 7, 97, 98]
    a = broadcast_semi_join(ray.data.from_arrow(t), want, "id").to_pandas()
    b = broadcast_semi_join(ray.data.from_arrow(t).repartition(9),
                            np.array(want + want), "id").to_pandas()
    assert sorted(a["id"]) == want
    assert sorted(b["id"]) == want
    # empty id set -> empty result, not an error
    e = broadcast_semi_join(ray.data.from_arrow(t), [], "id").to_pandas()
    assert len(e) == 0


def test_correct_terms_rules():
    from colbert_ray.functions.spelling import correct_terms

    vocab = np.array(sorted(["join", "joint", "merge", "sort", "son"]),
                     dtype=object)
    dfs = np.array([10, 50, 3, 7, 7], dtype=np.int64)  # aligned to sorted
    vmap = dict(zip(vocab, dfs))
    # in-vocab stays
    assert correct_terms(vocab, dfs, ["merge"]) == ["merge"]
    # OOV with one ED1 neighbor
    assert correct_terms(vocab, dfs, ["mergee"]) == ["merge"]
    # OOV with several neighbors -> highest df, tie lowest term
    got = correct_terms(vocab, dfs, ["joinn"])   # join & joint are ED1
    best_df = max(vmap["join"], vmap["joint"])
    want = sorted(t for t in ("join", "joint") if vmap[t] == best_df)[0]
    assert got == [want]
    # no neighbor -> dropped
    assert correct_terms(vocab, dfs, ["zzzzz", "sort"]) == ["sort"]


class TestEliasFanoCodec:
    """Elias-Fano quasi-succinct codec (segment_codec='ef'). Interface
    payloads are the varint/pfor ones (gaps / tfs); per-run value SUM must
    stay < 2^64 (engine payloads always do)."""

    @given(st.lists(st.integers(min_value=0, max_value=2**50), max_size=400))
    @settings(max_examples=50, deadline=None)
    def test_roundtrip(self, vals):
        from colbert_ray.functions.codec import ef_decode, ef_encode

        v = np.array(vals, dtype=np.uint64)
        assert (ef_decode(ef_encode(v), len(v)) == v).all()

    def test_engineered_distributions(self):
        from colbert_ray.functions.codec import ef_decode, ef_encode

        rng = np.random.default_rng(3)
        for v in (
            np.empty(0, dtype=np.uint64),
            np.zeros(129, dtype=np.uint64),          # flat prefix sums
            np.ones(1000, dtype=np.uint64),
            np.array([2**62, 1, 1], dtype=np.uint64),
            np.maximum(1, rng.poisson(7, 100_000)).astype(np.uint64),
            rng.zipf(1.5, 50_000).astype(np.uint64) % (2**40),
        ):
            assert (ef_decode(ef_encode(v), len(v)) == v).all()

    def test_segmented_matches_scalar_and_concat_decode(self):
        from colbert_ray.functions.codec import (
            ef_decode_concat,
            ef_encode,
            ef_encode_segmented,
        )

        rng = np.random.default_rng(11)
        vals = rng.zipf(1.4, 30_000).astype(np.uint64) % (2**40)
        starts = np.sort(rng.choice(len(vals), 200, replace=False))
        starts[0] = 0
        counts = np.diff(np.append(starts, len(vals)))
        bufs = ef_encode_segmented(vals, starts)
        for r in rng.integers(0, 200, 30):
            s, c = starts[r], counts[r]
            assert bufs[r] == ef_encode(vals[s:s + c])
        cat = np.frombuffer(b"".join(bufs), dtype=np.uint8)
        cell_starts = np.zeros(200, np.int64)
        np.cumsum([len(b) for b in bufs[:-1]], out=cell_starts[1:])
        out = ef_decode_concat(cat, cell_starts, counts)
        assert (out == vals).all()

    def test_run_dispatch_and_empty_runs(self):
        from colbert_ray.functions.codec import (
            decode_docids_run,
            decode_tfs_run,
            ef_encode_segmented,
            encode_docids_run,
            encode_tfs_run,
        )

        d = np.array([0, 9, 10, 5000, 70000], dtype=np.int64)  # docid 0 edge
        t = np.array([1, 1, 60, 2, 7], dtype=np.int64)
        assert (decode_docids_run(
            encode_docids_run(d, "ef"), len(d), "ef") == d).all()
        assert (decode_tfs_run(
            encode_tfs_run(t, "ef"), len(t), "ef") == t).all()
        # empty runs interleave as b""
        vals = np.array([5, 3, 7], dtype=np.uint64)
        bufs = ef_encode_segmented(vals, np.array([0, 2, 2], dtype=np.int64))
        assert bufs[1] == b""
        assert len(bufs) == 3

    def test_corruption_rejected(self):
        from colbert_ray.functions.codec import ef_decode, ef_encode

        buf = ef_encode(np.arange(1, 300, dtype=np.uint64))
        with pytest.raises(ValueError, match="ef"):
            ef_decode(buf[:3], 299)
        with pytest.raises(ValueError, match="ef"):
            ef_decode(bytes([99]) + buf[1:], 299)   # absurd l header

    def test_wrap_guard(self):
        from colbert_ray.functions.codec import ef_encode

        with pytest.raises(ValueError, match="overflow|< 2\\^63"):
            ef_encode(np.array([2**62] * 5, dtype=np.uint64))

    def test_beats_varint_on_dense_gaps(self):
        from colbert_ray.functions.codec import ef_encode, varint_encode

        rng = np.random.default_rng(5)
        gaps = np.maximum(1, rng.poisson(7, 200_000)).astype(np.uint64)
        assert len(ef_encode(gaps)) < 0.75 * len(varint_encode(gaps))


class TestRound6HalfAway:
    def test_matches_duckdb_round(self):
        """_round6_half_away must agree with DuckDB round(x,6) bit-for-bit
        — including dyadic midpoints where Python/numpy half-even differs
        (the avg_doclen divergence class)."""
        import duckdb

        from colbert_ray.pipelines.search import _round6_half_away

        vals = [2.0078125, 257 / 128, 1.0000005, 0.1234565, 3.0000015,
                7 / 3, 22 / 7, 0.0, 1.0, 12345.6789012345]
        vals += [n / 128 for n in range(1, 50)]
        rng = np.random.default_rng(0)
        vals += [float(v) for v in rng.uniform(0.0, 10_000.0, 200)]
        con = duckdb.connect()
        for v in vals:
            want = con.execute(
                "SELECT round(?::DOUBLE, 6)", [v]).fetchone()[0]
            assert _round6_half_away(v) == want, v
        # the motivating case: half-even would give 2.007812
        assert _round6_half_away(257 / 128) == 2.007813
