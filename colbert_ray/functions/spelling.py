"""Query spelling correction ("did you mean") against the index vocabulary.

The query-side complement of ``extras/dedup.fuzzy_term_pairs``: an
out-of-vocabulary query term is replaced by its best Levenshtein-1
neighbor in the dictionary — best = highest document frequency, ties by
term ascending; terms with no neighbor drop (they could never match).
Runs on the driver over the already-loaded dictionary arrays (vocabulary
is ≪ corpus — the engine's standing dictionary-broadcast assumption);
the ED check reuses the vectorized padded-uint8 verifier, with the
candidate set pre-cut to |len-1| <= 1 (a Levenshtein-1 neighbor can't
differ in length by more).
"""

from __future__ import annotations

import numpy as np


def correct_terms(vocab_terms: np.ndarray, vocab_dfs: np.ndarray,
                  terms: list[str]) -> list[str]:
    """``vocab_terms`` sorted ascending with aligned ``vocab_dfs`` (the
    DecodedIndex dictionary layout). Returns the corrected term list in
    the original order (in-vocab terms kept verbatim, OOV replaced or
    dropped)."""
    from colbert_ray.extras.dedup import _ed1_pair_mask

    if not terms:
        return []
    vlens = np.asarray([len(t) for t in vocab_terms], dtype=np.int64)
    out: list[str] = []
    for t in terms:
        pos = np.searchsorted(vocab_terms, t)
        if pos < len(vocab_terms) and vocab_terms[pos] == t:
            out.append(t)
            continue
        cand_idx = np.flatnonzero(np.abs(vlens - len(t)) <= 1)
        if len(cand_idx) == 0:
            continue
        cands = vocab_terms[cand_idx]
        ok = _ed1_pair_mask([t] * len(cands), list(cands))
        if not ok.any():
            continue
        hit = cand_idx[ok]
        dfs = vocab_dfs[hit]
        # best = (df DESC, term ASC); vocab_terms is term-sorted, so the
        # FIRST index among argmax-df candidates is the tie winner
        best = hit[np.flatnonzero(dfs == dfs.max())[0]]
        out.append(str(vocab_terms[best]))
    return out
