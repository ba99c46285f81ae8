"""PII redaction and text normalization for training-data pipelines.

Both operators are pure streaming ``map_batches`` stages over Arrow string
kernels — no shuffle, no state, no Python-level row loop — so they pipeline
at full read bandwidth regardless of corpus size (the 100-TB shape is the
same as the sf0.01 shape: one pass, block in / block out).

Pattern sharing with the oracle: pyarrow's regex kernels and DuckDB's
``regexp_*`` functions are BOTH backed by RE2, so the module-level patterns
below are embedded verbatim in the SQL twins (``__ray_entry__.oracle_sql``)
and the two sides apply literally the same automaton.

Reference analog: the cleaning/filter hooks of the reference preprocessing
chain (``colbert/modeling/tokenization/doc_tokenization.py:60`` applies a
fixed normalization before encoding); redaction itself is a standard
training-data-curation stage the reference leaves to upstream tooling.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# RE2 patterns (shared verbatim with the DuckDB oracle — keep in sync with
# _redact_sql in __ray_entry__.py). Order matters: emails are redacted
# before phones so the digits of a user id inside an address can never be
# re-matched by the phone pattern.
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{1,3}-\d{3}-\d{3}-\d{4}"

REDACTIONS: list[tuple[str, str, str]] = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("phone", PHONE_RE, "<PHONE>"),
    ("ipv4", IPV4_RE, "<IP>"),
]


def redact_pii(ds: "ray.data.Dataset", text_col: str = "text",
               id_col: str = "doc_id") -> "ray.data.Dataset":
    """Scrub emails / phone numbers / IPv4 literals from ``text_col``.

    Emits ``(id_col, n_email, n_phone, n_ipv4, clean_text)`` — the match
    counts (non-overlapping, RE2) plus the text with every match replaced
    by its placeholder, applied in the fixed REDACTIONS order.
    """

    def fn(batch: pa.Table) -> pa.Table:
        s = pc.cast(batch.column(text_col), pa.string())
        if s.null_count:
            s = pc.fill_null(s, "")
        cols: dict = {id_col: batch.column(id_col)}
        for name, pattern, repl in REDACTIONS:
            cols[f"n_{name}"] = pc.cast(
                pc.count_substring_regex(s, pattern), pa.int64())
            s = pc.replace_substring_regex(s, pattern=pattern,
                                           replacement=repl)
        cols["clean_text"] = s
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def normalize_text(ds: "ray.data.Dataset", text_col: str = "text",
                   id_col: str = "doc_id") -> "ray.data.Dataset":
    """Canonical text normalization: lowercase, collapse every whitespace
    run to a single space, strip leading/trailing whitespace.

    Emits ``(id_col, norm_text, n_chars_norm)``.
    """

    def fn(batch: pa.Table) -> pa.Table:
        s = pc.cast(batch.column(text_col), pa.string())
        if s.null_count:
            s = pc.fill_null(s, "")
        s = pc.utf8_lower(s)
        s = pc.replace_substring_regex(s, pattern=r"\s+", replacement=" ")
        # after the \s+ collapse any remaining edge whitespace is a single
        # ASCII space — trim exactly that (mirrors SQL trim(), which strips
        # spaces only, unlike utf8_trim_whitespace's Unicode class)
        s = pc.utf8_trim(s, " ")
        return pa.table({
            id_col: batch.column(id_col),
            "norm_text": s,
            "n_chars_norm": pc.cast(pc.utf8_length(s), pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
