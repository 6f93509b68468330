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

import numpy as np
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


_PACK_SCHEMA = pa.schema([
    ("bucket", pa.int64()), ("seq_id", pa.int64()), ("doc_id", pa.int64()),
    ("chunk_id", pa.int64()), ("n_tokens", pa.int64()),
    ("seq_fill", pa.int64()),
])


def pack_sequences(chunks: rd.Dataset, capacity: int = 256,
                   num_buckets: int = 8) -> rd.Dataset:
    """Greedy first-fit packing of training chunks into fixed-capacity
    sequences -> (bucket, seq_id, doc_id, chunk_id, n_tokens, seq_fill).

    Packing is inherently sequential (each decision depends on the running
    fill), so parallelism comes from BUCKETS: chunks are partitioned by
    ``doc_id % num_buckets`` and each bucket packs independently in
    (doc_id, chunk_id) order — greedy: a chunk joins the open sequence if
    it fits, else opens the next one (``seq_id`` counts per bucket;
    ``seq_fill`` is the running fill after placement). Deterministic and
    partition-invariant because the order is total; the DuckDB oracle
    replays the same recurrence with a recursive CTE. Size ``num_buckets``
    to the cluster — each bucket's state is one integer, the rows stream.

    A chunk larger than ``capacity`` gets a sequence of its own (the
    recurrence handles it: it never fits an open sequence).
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")

    def add_bucket(t: pa.Table) -> pa.Table:
        # no pc.mod kernel in this pyarrow; numpy view is zero-copy
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.append_column("bucket",
                               pa.array(did % num_buckets, pa.int64()))

    def pack(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["doc_id", "chunk_id"], kind="mergesort")
        n = g["n_tokens"].to_numpy("int64")
        seq = np.empty(len(g), dtype=np.int64)
        fill = np.empty(len(g), dtype=np.int64)
        cur_seq, cur_fill = 0, 0
        for i in range(len(g)):
            if cur_fill > 0 and cur_fill + n[i] > capacity:
                cur_seq += 1
                cur_fill = 0
            cur_fill += n[i]
            seq[i] = cur_seq
            fill[i] = cur_fill
        return pa.table({
            "bucket": pa.array(g["bucket"].to_numpy("int64"), pa.int64()),
            "seq_id": pa.array(seq, pa.int64()),
            "doc_id": pa.array(g["doc_id"].to_numpy("int64"), pa.int64()),
            "chunk_id": pa.array(g["chunk_id"].to_numpy("int64"),
                                 pa.int64()),
            "n_tokens": pa.array(n, pa.int64()),
            "seq_fill": pa.array(fill, pa.int64()),
        })

    return (chunks.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(pack, batch_format="pandas"))
