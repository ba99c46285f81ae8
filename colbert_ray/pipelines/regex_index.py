"""Index-accelerated regex search (Google Code Search technique).

``regex_match_stats`` (extras/textstats.py) answers grep-style queries with
a full-corpus streaming scan. This module adds the classic literal-pruned
plan (R. Cox, "Regular Expression Matching with a Trigram Index", 2012;
the original Google Code Search design): statically analyze the pattern
for REQUIRED LITERALS — strings such that every possible match must
contain at least one of them — probe the inverted index's dictionary for
terms containing those literals (vocab-bounded substring scan, the same
budget as ``infix_search``), take the union of their posting lists as the
candidate docid set, and run the exact RE2 scan over ONLY candidate rows
(broadcast sorted-docid filter at the batch boundary, pruned before the
regex ever runs). Patterns with no useful required literal (e.g. ``\\d+``,
case-insensitive patterns) fall back to the full scan — same results,
no pruning.

Soundness of the literal -> token bridge: the corpus tokenizer lowercases
and splits on ``[^a-z0-9]+`` (+ optional camelCase boundaries). A required
literal is processed by the SAME tokenizer; every resulting piece of it
appears in the text char-exact inside some maximal alnum run, so each
piece is a substring of a corpus token — interior split decisions depend
only on the literal's own characters, and edge tokens can only EXTEND
around a piece, never split inside it (differential-tested against the
scan path on camelCase corpora). We probe with the LONGEST piece of each
alternative, which maximizes dictionary selectivity.

Caveats (shared with every index-backed query in this engine): tokens
outside the indexing length filter are not in the index, so the index
path requires ``min_token_len == 1`` (checked at runtime — otherwise it
falls back to scanning) and assumes corpus tokens fit ``max_token_len``
(a >64-char identifier is unsearchable by ANY index query; the build
filter, not this plan, decides that).

Reference capability: grep/filtering utilities
(``utility/preprocess/docs2passages.py``-era text filters analog); the
index side reuses S11 readers and the ``infix_search`` dictionary probe.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from colbert_ray.config import EngineConfig
from colbert_ray.functions.tokenizer import tokenize_column

try:                                    # py3.11+: public alias went away
    import re._constants as _sre_c
    import re._parser as _sre
except ImportError:                     # pragma: no cover - older pythons
    import sre_constants as _sre_c
    import sre_parse as _sre


def _seq_literals(seq, min_len: int) -> set[str] | None:
    """Required-literal alternatives for a CONCATENATION of nodes: every
    match must contain each element's requirement, so pick the single
    best element (longest shortest-alternative). Runs of LITERAL nodes
    merge into strings first. Returns a set of alternatives, or None when
    no element guarantees a literal."""
    best: set[str] | None = None

    def consider(cand: set[str] | None):
        nonlocal best
        if not cand:
            return
        if any(len(c) < min_len for c in cand):
            return                       # unselective alternative poisons the set
        if best is None or min(map(len, cand)) > min(map(len, best)):
            best = cand

    run: list[str] = []
    for op, av in seq:
        if op is _sre_c.LITERAL:
            run.append(chr(av))
            continue
        if run:
            consider({"".join(run)})
            run = []
        consider(_node_literals(op, av, min_len))
    if run:
        consider({"".join(run)})
    return best


def _node_literals(op, av, min_len: int) -> set[str] | None:
    """Required-literal alternatives for one non-LITERAL parse node."""
    if op is _sre_c.BRANCH:
        out: set[str] = set()
        for branch in av[1]:
            lits = _seq_literals(branch, min_len)
            if not lits:
                return None              # one branch may match literal-free
            out |= lits
        return out
    if op is _sre_c.SUBPATTERN:
        # av = (group, add_flags, del_flags, seq); inline (?i) kills the
        # char-exactness the token bridge relies on
        if av[1] & _sre_c.SRE_FLAG_IGNORECASE:
            return None
        return _seq_literals(av[3], min_len)
    if op in (_sre_c.MAX_REPEAT, _sre_c.MIN_REPEAT):
        lo, _hi, item = av
        if lo >= 1:                      # at least one occurrence guaranteed
            return _seq_literals(item, min_len)
        return None
    if op is _sre_c.ATOMIC_GROUP:
        return _seq_literals(av, min_len)
    # ASSERT (lookahead) literals are genuinely required, but matches have
    # zero width and overlap the main expression — skipping them is sound
    # (we only ever UNDER-claim requirements). ASSERT_NOT must be skipped.
    return None


def required_literals(pattern: str, min_len: int = 3) -> list[str] | None:
    """Literal alternatives such that EVERY match of ``pattern`` contains
    at least one of them (char-exact, case-sensitive), each ``>= min_len``
    chars; None when the pattern gives no such guarantee (or is not
    case-sensitive / not parseable), meaning: don't prune, full scan."""
    try:
        tree = _sre.parse(pattern)
    except Exception:
        return None
    if tree.state.flags & _sre_c.SRE_FLAG_IGNORECASE:
        return None
    lits = _seq_literals(tree, min_len)
    return sorted(lits) if lits else None


def _probe_pieces(literals: list[str], cfg: EngineConfig,
                  min_len: int) -> list[str] | None:
    """Map each raw literal to its most selective token-substring probe:
    run the corpus tokenizer over the literal and keep the LONGEST piece.
    None when any alternative degrades below ``min_len`` (unselective)."""
    out = []
    for lit in literals:
        toks = tokenize_column(pa.array([lit]), cfg).flatten().to_pylist()
        if not toks:
            return None
        piece = max(toks, key=len)
        if len(piece) < min_len:
            return None
        out.append(piece)
    return sorted(set(out))


def candidate_docids(idx, pieces: list[str]) -> np.ndarray:
    """Union of posting docids over dictionary terms containing ANY piece
    (one vectorized substring scan per piece over the vocab-bounded
    dictionary — the ``infix_search`` probe budget), tombstone-excluded,
    sorted unique."""
    if not len(idx.dict_terms):
        return np.empty(0, dtype=np.int64)
    terms_arr = pa.array(idx.dict_terms, type=pa.string())
    hit = np.zeros(len(idx.dict_terms), dtype=bool)
    for p in pieces:
        hit |= pc.match_substring(terms_arr, p).to_numpy(zero_copy_only=False)
    tids = idx.dict_term_ids[np.flatnonzero(hit)]
    parts = [np.asarray(idx.posting_docids[
        idx.posting_offsets[t]:idx.posting_offsets[t + 1]]) for t in tids]
    if not parts:
        return np.empty(0, dtype=np.int64)
    docs = np.unique(np.concatenate(parts))
    if len(idx.tombstones):
        pos = np.searchsorted(idx.tombstones, docs)
        pos_c = np.clip(pos, 0, len(idx.tombstones) - 1)
        docs = docs[idx.tombstones[pos_c] != docs]
    return docs


def regex_plan(index_dir: str, pattern: str,
               cfg: EngineConfig | None = None,
               min_literal_len: int = 3) -> dict:
    """Explain-style plan: path ('index' | 'scan'), the required literal
    alternatives, the dictionary probe pieces, and the candidate count
    (index path only)."""
    from colbert_ray.state.decoded import DecodedIndex

    cfg = cfg or EngineConfig()
    plan = {"path": "scan", "literals": None, "pieces": None,
            "n_candidates": None}
    if cfg.min_token_len != 1:
        return plan                      # sub-min_len tokens are unindexed
    lits = required_literals(pattern, min_literal_len)
    if lits is None:
        return plan
    pieces = _probe_pieces(lits, cfg, min_literal_len)
    if pieces is None:
        return plan
    idx = DecodedIndex.load_cached(index_dir, load_sha=False)
    cand = candidate_docids(idx, pieces)
    plan.update(path="index", literals=lits, pieces=pieces,
                n_candidates=int(len(cand)))
    return plan


def regex_search(index_dir: str, corpus: "ray.data.Dataset", pattern: str,
                 cfg: EngineConfig | None = None, *,
                 text_col: str = "text", id_col: str = "doc_id",
                 min_literal_len: int = 3) -> "ray.data.Dataset":
    """Grep over the corpus, index-pruned when the pattern allows:
    (doc_id, n_matches) for docs with >= 1 non-overlapping RE2 match —
    EXACTLY ``regex_match_stats``'s contract, with the scan restricted to
    index candidates whenever ``required_literals`` finds a pruning set.
    The candidate docid array is broadcast ONCE (``ray.put``); each batch
    filters by sorted membership BEFORE running the regex kernel."""
    import ray

    from colbert_ray.extras.textstats import regex_match_stats
    from colbert_ray.state.decoded import DecodedIndex

    cfg = cfg or EngineConfig()
    lits = (required_literals(pattern, min_literal_len)
            if cfg.min_token_len == 1 else None)
    pieces = _probe_pieces(lits, cfg, min_literal_len) if lits else None
    if pieces is None:
        return regex_match_stats(corpus, pattern,
                                 text_col=text_col, id_col=id_col)
    idx = DecodedIndex.load_cached(index_dir, load_sha=False)
    cand = candidate_docids(idx, pieces)
    empty = pa.table({id_col: pa.array([], type=pa.int64()),
                      "n_matches": pa.array([], type=pa.int64())})
    if not len(cand):
        return ray.data.from_arrow(empty)
    cand_ref = ray.put(cand)

    def scan(batch: pa.Table) -> pa.Table:
        allowed = ray.get(cand_ref)
        ids = batch.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        pos = np.clip(np.searchsorted(allowed, ids), 0, len(allowed) - 1)
        keep = allowed[pos] == ids
        if not keep.any():
            return empty
        sub = batch.filter(pa.array(keep))
        n = pc.count_substring_regex(
            pc.cast(sub.column(text_col), pa.string()), pattern)
        n = pc.fill_null(n, 0)
        hit = pc.greater(n, 0)
        return pa.table({
            id_col: pc.cast(pc.filter(sub.column(id_col), hit), pa.int64()),
            "n_matches": pc.cast(pc.filter(n, hit), pa.int64())})

    return corpus.select_columns([id_col, text_col]).map_batches(
        scan, batch_format="pyarrow", zero_copy_batch=True)
