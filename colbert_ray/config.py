"""Engine configuration with layered merge semantics.

Analog of the reference's layered config stack
(``colbert/infra/config/settings.py:11-219``, merge semantics
``colbert/infra/config/core_config.py:24-52`` / ``base_config.py:19-99``):
a single typed dataclass whose "assigned wins" merge is expressed as
``replace(defaults, **overrides)``; the effective config is persisted into the
build manifest (``plan.json``) and re-loaded (and re-merged, index-metadata <
explicit overrides) when an index is opened — mirroring
``ColBERTConfig.from_existing`` (base_config.py:19-33).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from dataclasses import dataclass, field


@dataclass(frozen=True)
class EngineConfig:
    """All knobs of the BM25 build + query engine.

    Defaults are chosen for the single-node test environment but every
    scale-sensitive knob (``num_term_partitions``, ``salt_max_run``,
    ``posting_block_size``) is independent of the cluster size so that an
    index built at N and 4N CPUs is byte-identical (north_rule).
    """

    # --- BM25 scoring (exact, float64) ---
    k1: float = 1.2
    b: float = 0.75

    # --- tokenizer (code-aware; see functions/tokenizer.py) ---
    split_camel_case: bool = True
    lowercase: bool = True
    min_token_len: int = 1
    max_token_len: int = 64
    #: per-language tokenizer plugin table (SURVEY §7.1 M9): maps a ``lang``
    #: column value to overrides of the four tokenizer knobs above, applied
    #: to CORPUS rows of that language (e.g. ``{"go": {"split_camel_case":
    #: False}}``). Queries carry no lang and always use the base knobs, so
    #: overrides trade cross-lang term matching for per-lang fidelity —
    #: a corpus-side normalization choice, off by default. Part of the
    #: pre-tokenize semantic hash: changing the table re-tokenizes.
    lang_overrides: dict = field(default_factory=dict)

    # --- index layout (MUST NOT depend on parallelism) ---
    num_term_partitions: int = 32        # MINIMUM hash partitions of term_id space
    #: A2 partition heuristic (collection_indexer.py:106 analog): the
    #: effective partition count grows with the corpus —
    #: P_eff = max(num_term_partitions, ceil(total_tokens / postings_per_partition))
    #: — so encode parallelism and per-partition size stay bounded at any
    #: scale while remaining a pure function of the DATA (never of the
    #: cluster size; deterministic resume across parallelism levels).
    postings_per_partition: int = 30_000_000
    salt_max_run: int = 100_000          # postings per salted sub-run of a head term
    posting_block_size: int = 128        # docids per block-max block (K4 analog)
    #: segment posting-payload codec: "varint" (LEB128 delta-gaps; default)
    #: or "pfor" (PForDelta: 128-value bit-plane blocks + patched
    #: exceptions — smaller on disk for dense lists). Affects segment FILE
    #: BYTES only, never decoded content; part of the semantic hash so a
    #: resume never mixes codecs within one index. Update deltas use the
    #: index's codec; mini-runs (the shuffle wire format) stay varint.
    segment_codec: str = "varint"

    # --- physical execution (free to vary; never affects results) ---
    tokenizer_impl: str = "regex"           # "regex" (RE2 kernels, default) |
    #                                         "bytes"; outputs identical (diff-tested)
    docid_map_strategy: str = "broadcast"   # "broadcast" | "join" (scale path)
    tokenize_batch_size: int = 2048
    score_batch_size: int = 256
    #: decoded-postings budget of one E2 encode chunk: a term partition
    #: whose postings exceed this is encoded in several (term_id, salt)-
    #: aligned chunk files (part_XXXXX.cNN.parquet) so task memory stays
    #: bounded as the corpus grows (A2 heuristic analog). Physical knob:
    #: changes file layout, never logical content.
    max_encode_postings: int = 32_000_000
    scorer_concurrency: int = 4
    read_concurrency: int | None = None

    # --- query defaults by k (searcher.py:127-148 analog) ---
    default_k: int = 10
    prune: bool = True                   # exact pruning on; False = brute force
    #: pruning algorithm — "maxscore" (block-max MaxScore: lists merged in
    #: descending-UB order, per-list block skips vs global tail sums) or
    #: "bmw" (block-max WAND: all terms' block boundaries swept into
    #: disjoint docid REGIONS, each region's UB = sum of covering block
    #: maxima — the WAND pivot test at region granularity). Physical knob:
    #: both are provably lossless, results are bit-identical.
    prune_strategy: str = "maxscore"

    def merged(self, **overrides) -> "EngineConfig":
        """Layered merge: assigned (non-None) overrides win (base_config.py:19-33)."""
        kept = {k: v for k, v in overrides.items() if v is not None}
        return dataclasses.replace(self, **kept)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "EngineConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})

    #: bumped whenever the on-disk index layout changes incompatibly; part of
    #: the semantic hash so resume NEVER accepts an old-layout index
    LAYOUT_VERSION = 2

    #: fields the tokenize/docids/stats/dictionary phases depend on — the
    #: partitioning knobs are deliberately EXCLUDED so changing them (or
    #: the data-driven effective partition count) never invalidates the
    #: expensive tokenize artifact
    _PRETOKENIZE_FIELDS = (
        "split_camel_case", "lowercase", "min_token_len", "max_token_len",
        "lang_overrides",
        # the byte tokenizer has a documented divergence from the regex
        # path on two non-ASCII codepoints (U+0130/U+212A), so switching
        # impls must NOT silently resume a cached tokenize
        "tokenizer_impl",
    )
    _SEMANTIC_FIELDS = _PRETOKENIZE_FIELDS + (
        "k1", "b", "num_term_partitions", "postings_per_partition",
        "salt_max_run", "posting_block_size", "segment_codec",
    )

    def _hash_fields(self, fields) -> str:
        semantic = {k: v for k, v in self.to_dict().items() if k in fields}
        semantic["__layout__"] = self.LAYOUT_VERSION
        blob = json.dumps(semantic, sort_keys=True).encode()
        return hashlib.sha256(blob).hexdigest()[:16]

    def semantic_hash(self) -> str:
        """Hash of the knobs that affect index CONTENT/layout (not physical
        knobs). Used in manifests: a resume is only valid if the semantic
        hash matches (collection_indexer.py:87-95 analog)."""
        return self._hash_fields(self._SEMANTIC_FIELDS)

    def semantic_hash_pretokenize(self) -> str:
        """Hash for the phases UPSTREAM of partitioning (tokenize → docids
        → stats → dictionary): their outputs depend only on the tokenizer
        knobs, so partition-count changes resume from the cached tokenize."""
        return self._hash_fields(self._PRETOKENIZE_FIELDS)

    def effective_partitions(self, total_tokens: int) -> int:
        """A2 heuristic: data-proportional partition count (see field doc)."""
        return max(self.num_term_partitions,
                   -(-int(total_tokens) // self.postings_per_partition))


DEFAULT_CONFIG = EngineConfig()
