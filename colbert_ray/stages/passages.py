"""docs2passages: split long documents into overlapping passages.

Analog of ``utility/preprocess/docs2passages.py:19-53`` (M12): each document
becomes ceil(n_words / stride) passages of ``max_words`` words with
``overlap`` carried from the previous window (the reference's wrap-around on
the final passage is reproduced). Vectorized row-expander for
``map_batches``; passage ids are ``(docid, passage_idx)`` so the result is
deterministic and join-able back to the parent document.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def make_passage_splitter(max_words: int = 180, overlap: int = 30,
                          text_col: str = "content", id_col: str = "docid"):
    assert 0 <= overlap < max_words
    stride = max_words - overlap

    def split_batch(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        out_ids, out_idx, out_text = [], [], []
        for docid, t in zip(ids, texts):
            words = t.split()
            if len(words) <= max_words:
                out_ids.append(int(docid)); out_idx.append(0); out_text.append(t)
                continue
            p = 0
            for start in range(0, len(words), stride):
                chunk = words[start:start + max_words]
                if len(chunk) < max_words and start > 0:
                    # reference wrap-around: final short window is padded by
                    # pulling back to exactly max_words (docs2passages.py:44-49)
                    chunk = words[max(0, len(words) - max_words):]
                    out_ids.append(int(docid)); out_idx.append(p)
                    out_text.append(" ".join(chunk))
                    break
                out_ids.append(int(docid)); out_idx.append(p)
                out_text.append(" ".join(chunk))
                p += 1
        return pa.table(
            {
                id_col: pa.array(np.array(out_ids, dtype=np.int64)),
                "passage_idx": pa.array(np.array(out_idx, dtype=np.int32)),
                text_col: pa.array(out_text, type=pa.string()),
            }
        )

    return split_batch


def split_documents(ds: "ray.data.Dataset", **kw) -> "ray.data.Dataset":
    return ds.map_batches(make_passage_splitter(**kw), batch_format="pyarrow",
                          zero_copy_batch=True)
