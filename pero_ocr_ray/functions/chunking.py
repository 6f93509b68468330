"""Training-prep chunking: split documents into overlapping token windows.

Tokenizer-side pipelines consume fixed-size sequences; the curation engine
must emit (doc, chunk) rows with deterministic boundaries. Definition
(mirrored exactly by the SQL oracle):

* tokens are the ASCII-whitespace convention (``TOKEN_RE`` / RE2 ``\\S+``);
* ``stride = chunk_tokens - overlap``; chunk ``c`` covers tokens
  ``[c*stride, min(n, c*stride + chunk_tokens))``;
* the last chunk index is ``ceil((n - chunk_tokens) / stride)`` (0 when
  the doc fits one chunk), so every token is covered, consecutive chunks
  share ``overlap`` tokens, and the tail chunk is always longer than the
  overlap (never a pure-duplicate stub);
* chunk text is the tokens joined by single spaces (canonical whitespace,
  like the rest of the text suite); token-less docs emit nothing.

Pure streaming map — no shuffle; a 100 TB corpus chunks at read bandwidth.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data as rd

from pero_ocr_ray.kernels.textstats import TOKEN_RE


def chunk_for_training(docs: rd.Dataset, chunk_tokens: int = 64,
                       overlap: int = 8) -> rd.Dataset:
    """-> (doc_id, chunk_id, n_tokens, text): overlapping token windows."""
    if not (0 <= overlap < chunk_tokens):
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap

    def chunks(df: pd.DataFrame) -> pa.Table:
        ids, cids, lens, texts = [], [], [], []
        for did, text in zip(df["doc_id"].astype("int64"), df["text"]):
            toks = TOKEN_RE.findall(text or "")
            n = len(toks)
            if n == 0:
                continue
            c_max = 0 if n <= chunk_tokens else \
                (n - chunk_tokens + stride - 1) // stride
            for c in range(c_max + 1):
                a = c * stride
                b = min(n, a + chunk_tokens)
                ids.append(int(did))
                cids.append(c)
                lens.append(b - a)
                texts.append(" ".join(toks[a:b]))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "chunk_id": pa.array(cids, pa.int64()),
            "n_tokens": pa.array(lens, pa.int64()),
            "text": pa.array(texts, pa.string()),
        })

    return docs.map_batches(chunks, batch_format="pandas")
