"""Deterministic synthetic code-corpus + query fixtures (FIXTURES.md).

Input-hint shape: Parquet ``(repo, path, commit, lang, content)``. Generation
is fully seeded and byte-stable (fixed row order, fixed writer options);
mirrors the reference's fixture conventions (``collection.tsv`` pid-by-line,
``colbert/evaluation/loaders.py:155-174``; queries ``loaders.py:15-30``).

Guaranteed properties (FIXTURES.md §5):
- Zipfian vocabulary: head terms hold a large posting share (salting path
  is exercised at every scale).
- (repo, path) unique; at least one near-empty doc; one duplicated content
  pair (sha256 collision by design); every lang present.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["python", "java", "go", "js", "rust", "c"]
_EXT = {"python": "py", "java": "java", "go": "go", "js": "js", "rust": "rs", "c": "c"}

_KEYWORDS = {
    "python": ["def", "return", "import", "class", "self", "None", "lambda"],
    "java": ["public", "static", "void", "class", "return", "new", "final"],
    "go": ["func", "return", "package", "import", "struct", "defer", "chan"],
    "js": ["function", "return", "const", "let", "var", "async", "await"],
    "rust": ["fn", "return", "let", "mut", "impl", "match", "pub"],
    "c": ["int", "return", "void", "struct", "static", "char", "sizeof"],
}

# seeded identifier vocabulary: camelCase + snake_case + plain
_ROOTS = [
    "get", "set", "parse", "build", "index", "query", "token", "stream",
    "batch", "merge", "sort", "hash", "shard", "block", "score", "rank",
    "read", "write", "flush", "cache", "buffer", "node", "list", "tree",
    "map", "filter", "join", "group", "count", "sum", "delta", "varint",
]
_NL_WORDS = [
    "the", "a", "of", "to", "and", "in", "for", "this", "that", "with",
    "computes", "returns", "given", "over", "each", "value", "result",
]


def _vocab(rng: np.random.Generator) -> list[str]:
    vocab: list[str] = []
    for i, r1 in enumerate(_ROOTS):
        for r2 in _ROOTS:
            if r1 == r2:
                continue
            if (i + len(r2)) % 3 == 0:
                vocab.append(r1 + r2.capitalize())        # camelCase
            elif (i + len(r2)) % 3 == 1:
                vocab.append(f"{r1}_{r2}")                # snake_case
            else:
                vocab.append(r1 + r2)
    return vocab


def generate_corpus(n_files: int, seed: int = 42, token_scale: int = 1,
                    index_offset: int = 0) -> pa.Table:
    """Vectorized deterministic corpus generator. ``token_scale`` multiplies
    per-document length (used by the benchmark to make builds compute-bound
    without changing the corpus's statistical shape). ``index_offset`` shifts
    the global file index used in repo/path names (chunked generation at
    scale); 0 reproduces the historical content byte-for-byte."""
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab(rng), dtype=object)
    v = len(vocab)
    # Zipfian weights over vocab (head-heavy)
    ranks = np.arange(1, v + 1, dtype=np.float64)
    weights = 1.0 / ranks
    weights /= weights.sum()

    n_repos = max(1, int(np.sqrt(n_files)))
    idx = np.arange(index_offset, index_offset + n_files)
    lang_pick = rng.integers(0, len(LANGS), size=n_files)
    lang_pick[: min(n_files, len(LANGS))] = np.arange(min(n_files, len(LANGS)))
    langs = np.array(LANGS, dtype=object)[lang_pick]
    repos = np.array([f"org{i % 7}/repo{i % n_repos}" for i in idx], dtype=object)
    paths = np.array(
        [f"src/module_{i % 13}/file_{i // n_repos}_{i}.{_EXT[langs[j]]}"
         for j, i in enumerate(idx)],
        dtype=object,
    )
    commits = [hashlib.sha1(f"{r}/{p}".encode()).hexdigest()
               for r, p in zip(repos, paths)]

    # one draw for ALL tokens of all docs, then per-doc joins
    n_tokens = rng.integers(30 * token_scale, 400 * token_scale, size=n_files)
    total = int(n_tokens.sum())
    words = vocab[rng.choice(v, size=total, p=weights)]
    # sprinkle language keywords + natural-language words deterministically
    kw_slots = np.flatnonzero(rng.random(total) < 0.12)
    nl_slots = np.flatnonzero(rng.random(total) < 0.10)
    doc_of = np.repeat(np.arange(n_files), n_tokens)  # chunk-local positions
    kw_tables = {lang: np.array(ws, dtype=object) for lang, ws in _KEYWORDS.items()}
    for lang in LANGS:
        sel = kw_slots[np.asarray(langs[doc_of[kw_slots]] == lang)]
        if len(sel):
            words[sel] = kw_tables[lang][rng.integers(0, len(kw_tables[lang]), len(sel))]
    nl_arr = np.array(_NL_WORDS, dtype=object)
    words[nl_slots] = nl_arr[rng.integers(0, len(nl_arr), len(nl_slots))]
    # punctuation decoration on ~8% of tokens (exercises non-alnum split)
    punct = np.flatnonzero(rng.random(total) < 0.08)
    words[punct] = np.char.add(words[punct].astype(str), "();").astype(object)

    offsets = np.concatenate([[0], np.cumsum(n_tokens)])
    contents = [
        " ".join(words[offsets[i]:offsets[i + 1]]) for i in range(n_files)
    ]
    if n_files > 1:
        contents[1] = "x"          # near-empty doc (<5 terms)
    if n_files >= 4:
        contents[3] = contents[2]  # duplicated content pair, distinct (repo,path)
    return pa.table(
        {
            "repo": pa.array(repos, type=pa.string()),
            "path": pa.array(paths, type=pa.string()),
            "commit": pa.array(commits, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
            "content": pa.array(contents, type=pa.string()),
        }
    )


def generate_queries(n_queries: int, seed: int = 777) -> pa.Table:
    """MS MARCO-style dev query analog: seeded bags of 2-6 corpus terms,
    with a few out-of-vocabulary terms (zero-df handling)."""
    rng = np.random.default_rng(seed)
    vocab = _vocab(rng)
    v = len(vocab)
    ranks = np.arange(1, v + 1, dtype=np.float64)
    weights = (1.0 / ranks) / (1.0 / ranks).sum()
    qids, texts = [], []
    for qid in range(n_queries):
        n_terms = int(rng.integers(2, 7))
        terms = [vocab[int(t)] for t in rng.choice(v, size=n_terms, p=weights)]
        if qid % 17 == 0:
            terms.append(f"zzqoov{qid}")  # OOV term
        if qid % 5 == 0:
            terms.append(rng.choice(_NL_WORDS))
        qids.append(qid)
        texts.append(" ".join(terms))
    return pa.table({"qid": pa.array(qids, type=pa.int64()), "query": pa.array(texts, type=pa.string())})


# above this size, generate in independent seeded chunks so driver memory
# stays bounded (~4 GB per chunk instead of ~40 GB for a one-shot 2M-file
# table). Strictly larger than every test/bench fixture, so all existing
# corpora (and the bench rankings sha) are byte-identical to before.
_GEN_CHUNK_FILES = 250_000


def _write_chunk(out_dir: str, k: int, lo: int, n: int, seed: int,
                 files_per_part: int, token_scale: int, part_base: int) -> None:
    """Generate one independent chunk and write its part files. Chunk seeds
    are derived deterministically; ``index_offset`` keeps (repo, path)
    globally unique across chunks. Chunks are resumable: a completed chunk
    leaves a ``_chunk_NNN.done`` marker and is skipped on rerun (generation
    is deterministic, so a partial chunk is simply rewritten) — an
    interrupted multi-hour sf1 generation keeps its finished chunks."""
    marker = os.path.join(out_dir, f"_chunk_{k:03d}.done")
    if os.path.exists(marker):
        return
    t = generate_corpus(n, seed if k == 0 else seed + 7919 * k,
                        token_scale=token_scale, index_offset=lo)
    for j, lo2 in enumerate(range(0, t.num_rows, files_per_part)):
        pq.write_table(
            t.slice(lo2, files_per_part),
            os.path.join(out_dir, f"part-{part_base + j:05d}.parquet"),
            compression="zstd",
        )
    with open(marker, "w") as f:
        f.write("ok")


def write_corpus(out_dir: str, n_files: int, seed: int = 42,
                 files_per_part: int = 2000, token_scale: int = 1) -> str:
    """Write the corpus as MULTIPLE parquet files (scale-shaped input layout).

    Chunks are independent, so above the threshold they generate in parallel
    worker processes — possible only when chunk part counts align with the
    global ``part-NNNNN`` numbering (docid assignment follows sorted file
    order, so numbering must stay contiguous)."""
    os.makedirs(out_dir, exist_ok=True)
    chunks = [(k, lo, min(_GEN_CHUNK_FILES, n_files - lo))
              for k, lo in enumerate(range(0, n_files, _GEN_CHUNK_FILES))]
    aligned = _GEN_CHUNK_FILES % files_per_part == 0
    parts_per_chunk = _GEN_CHUNK_FILES // files_per_part if aligned else 0
    if len(chunks) > 1 and aligned:
        import concurrent.futures as cf
        # each worker peaks ~8-10 GB for a full token_scale=4 chunk: cap
        # workers so aggregate stays well inside the 125 GB box
        with cf.ProcessPoolExecutor(max_workers=min(6, len(chunks))) as ex:
            futs = [
                ex.submit(_write_chunk, out_dir, k, lo, n, seed,
                          files_per_part, token_scale, k * parts_per_chunk)
                for k, lo, n in chunks
            ]
            for f in futs:
                f.result()
    else:
        p = 0
        for k, lo, n in chunks:
            _write_chunk(out_dir, k, lo, n, seed, files_per_part,
                         token_scale, p)
            p += -(-n // files_per_part)
    return out_dir


def ensure_fixture(root: str, n_files: int, n_queries: int, seed: int = 42,
                   token_scale: int = 1) -> tuple[str, str]:
    """Idempotently materialize (corpus_dir, queries_path) under ``root``."""
    suffix = f"_t{token_scale}" if token_scale != 1 else ""
    corpus_dir = os.path.join(root, f"corpus_n{n_files}_s{seed}{suffix}")
    queries_path = os.path.join(root, f"queries_n{n_queries}.parquet")
    done = os.path.join(corpus_dir, "_DONE")
    if not os.path.exists(done):
        write_corpus(corpus_dir, n_files, seed, token_scale=token_scale)
        with open(done, "w") as f:
            f.write("ok")
    if not os.path.exists(queries_path):
        os.makedirs(root, exist_ok=True)
        pq.write_table(generate_queries(n_queries), queries_path, compression="zstd")
    return corpus_dir, queries_path
