"""Bitext mining: mutual-best cross-lingual pair extraction over
integer-quantized embeddings (the CCMatrix / LASER margin-mining shape,
reduced to its exact-arithmetic core).

Web-scale parallel-corpus construction embeds every document and, for a
language pair (A, B), keeps pairs that are each other's nearest
neighbor (the "intersection" criterion of Artetxe & Schwenk 2019).
Floating-point cosine ties/rounding are engine-dependent, so this
operator quantizes first: ``q = floor(x * 2**12)`` per component —
multiplication by a power of two and ``floor`` are BIT-EXACT in binary
floating point, so numpy and the DuckDB oracle derive identical int64
vectors, and every similarity is an exact int64 dot product (|x| < 0.5
and dim 64 keep scores < 2**31, far inside both int64 and the double
mantissa the SQL path sums in).

Scale shape — no broadcast, no ``take_all``, three bucketed exchanges:

1. **Pair-grid sweep**: src rows replicate onto ``grid`` column shards,
   tgt rows onto ``grid`` row shards (``id % grid`` — internal keys),
   ONE ``groupby(pair)`` co-locates each src-bucket x tgt-bucket block,
   and a vectorized int64 matmul emits each shard's per-src best tgt
   and per-tgt best src. Replication factor ``grid`` is the chunked
   sweep every brute-force miner pays in bandwidth; size ``grid`` so
   (|A| + |B|) / grid quantized vectors fit a worker heap.
2. **Direction reduction**: shard-bests co-locate by (direction,
   id % 256) buckets; one vectorized sort+head picks the global best
   per src and per tgt (tie-break: smaller partner id — matches the
   SQL ``row_number() ... ORDER BY dot DESC, id``).
3. **Mutual check**: both directions co-locate by a pair-derived
   bucket; an inner merge keeps pairs that are best in BOTH.

Quantized vectors travel as fixed-width int32 binary blobs, not
``list<>`` columns (Acero-join-safe, and half the bytes of int64).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

SCALE_POW = 12  # q = floor(x * 2**SCALE_POW): exact in numpy AND SQL

_CAND_SCHEMA = pa.schema([
    ("kind", pa.int64()), ("key", pa.int64()),
    ("partner", pa.int64()), ("score", pa.int64()),
])
_PAIR_SCHEMA = pa.schema([
    ("src_id", pa.int64()), ("tgt_id", pa.int64()), ("dot_q", pa.int64()),
])
_NB = 256  # reduction bucket count (vectorized-rebuild pattern)


def quantize_pack(emb: rd.Dataset, id_col: str = "vec_id",
                  vec_col: str = "embedding",
                  scale_pow: int = SCALE_POW) -> rd.Dataset:
    """(id, list<float>) -> (id, qv binary): ``floor(x * 2**scale_pow)``
    per component, packed as a little-endian int32 blob (fixed width =
    4 * dim). Zero shuffle; the flatten/reshape path never loops rows."""
    scale = float(1 << scale_pow)

    def pack(t: pa.Table) -> pa.Table:
        col = t.column(vec_col).combine_chunks()
        vals = np.asarray(col.flatten(), dtype=np.float64)
        offs = np.asarray(col.offsets)
        widths = np.diff(offs)
        if len(widths) and (widths != widths[0]).any():
            raise ValueError("ragged embedding column")
        q = np.floor(vals * scale).astype(np.int32)
        d = int(widths[0]) if len(widths) else 0
        blobs = [q[o:o + d].tobytes() for o in offs[:-1]]
        return pa.table({
            id_col: t.column(id_col).cast(pa.int64()),
            "qv": pa.array(blobs, pa.binary()),
        })

    return emb.map_batches(pack, batch_format="pyarrow")


def mine_bitext(ds: rd.Dataset, src_lang: str, tgt_lang: str,
                id_col: str = "vec_id", lang_col: str = "lang",
                grid: int = 4, margin_k: int | None = None,
                margin_thr_milli: int = 1000) -> rd.Dataset:
    """(id, lang, qv) -> (src_id, tgt_id, dot_q): pairs that are mutual
    nearest neighbors (exact int64 dot product) between the two language
    sides. Rows in other languages are dropped in the expansion map.

    ``margin_k`` adds the Artetxe & Schwenk (2019) ratio-margin filter on
    top of the intersection criterion, float-free: keep a mutual pair iff
    ``dot * 2 * k * 1000 >= margin_thr_milli * (sum_topk_fwd +
    sum_topk_bwd)`` — the cross-multiplied form of ``dot / ((fwd_avg +
    bwd_avg) / 2) >= thr``. The top-k dot SUMS are exact int64 and
    boundary-tie-proof (a tie at the k-th rank contributes the same value
    whichever partner wins it), so any threshold is engine-safe. Each
    shard contributes its local top-k per id; the global top-k is reduced
    from those (top-k of a union of per-shard top-ks is exact). The
    candidate stream is materialized once — it is ids+scores only, never
    payloads — because three consumers branch from it."""

    def expand(df: pd.DataFrame) -> pa.Table:
        ids_l, qv_l, pair_l, side_l = [], [], [], []
        for side, lang in ((0, src_lang), (1, tgt_lang)):
            part = df[df[lang_col] == lang]
            if len(part) == 0:
                continue
            ids = part[id_col].to_numpy("int64")
            own = (ids % grid).astype(np.int64)
            # src bucket i meets every tgt bucket j (and vice versa)
            rep_ids = np.repeat(ids, grid)
            rep_own = np.repeat(own, grid)
            other = np.tile(np.arange(grid, dtype=np.int64), len(ids))
            pair = (rep_own * grid + other if side == 0
                    else other * grid + rep_own)
            ids_l.append(rep_ids)
            qv_l.extend(np.repeat(part["qv"].to_numpy(object), grid))
            pair_l.append(pair)
            side_l.append(np.full(len(rep_ids), side, np.int64))
        if not ids_l:
            return pa.schema([("id", pa.int64()), ("qv", pa.binary()),
                              ("__pair", pa.int64()),
                              ("__side", pa.int64())]).empty_table()
        return pa.table({
            "id": pa.array(np.concatenate(ids_l), pa.int64()),
            "qv": pa.array(qv_l, pa.binary()),
            "__pair": pa.array(np.concatenate(pair_l), pa.int64()),
            "__side": pa.array(np.concatenate(side_l), pa.int64()),
        })

    def shard_best(g: pd.DataFrame) -> pa.Table:
        a = g[g["__side"] == 0].sort_values("id")
        b = g[g["__side"] == 1].sort_values("id")
        if len(a) == 0 or len(b) == 0:
            return _CAND_SCHEMA.empty_table()
        A = np.frombuffer(b"".join(a["qv"]), np.int32) \
            .reshape(len(a), -1).astype(np.int64)
        B = np.frombuffer(b"".join(b["qv"]), np.int32) \
            .reshape(len(b), -1).astype(np.int64)
        S = A @ B.T
        aid = a["id"].to_numpy("int64")
        bid = b["id"].to_numpy("int64")
        # ids sorted ascending -> argmax's first-max IS the smallest tie id
        jf = S.argmax(axis=1)
        ib = S.argmax(axis=0)
        kinds = [np.zeros(len(aid), np.int64), np.ones(len(bid), np.int64)]
        keys = [aid, bid]
        partners = [bid[jf], aid[ib]]
        scores = [S[np.arange(len(aid)), jf], S[ib, np.arange(len(bid))]]
        if margin_k:
            # local top-k dot VALUES per id (kinds 2/3): the global
            # top-k reduces from each shard's k best
            kf = min(margin_k, len(bid))
            kb = min(margin_k, len(aid))
            tf = np.partition(S, len(bid) - kf, axis=1)[:, len(bid) - kf:]
            tb = np.partition(S, len(aid) - kb, axis=0)[len(aid) - kb:, :]
            kinds += [np.full(len(aid) * kf, 2, np.int64),
                      np.full(len(bid) * kb, 3, np.int64)]
            keys += [np.repeat(aid, kf), np.repeat(bid, kb)]
            partners += [np.full(len(aid) * kf, -1, np.int64),
                         np.full(len(bid) * kb, -1, np.int64)]
            scores += [tf.ravel(), tb.T.ravel()]
        return pa.table({
            "kind": pa.array(np.concatenate(kinds), pa.int64()),
            "key": pa.array(np.concatenate(keys), pa.int64()),
            "partner": pa.array(np.concatenate(partners), pa.int64()),
            "score": pa.array(np.concatenate(scores), pa.int64()),
        })

    def global_best(g: pd.DataFrame) -> pa.Table:
        if g["kind"].iat[0] >= 2:  # buckets are single-kind by key design
            # global top-k VALUES per id (from per-shard top-ks), summed
            topk = (g.sort_values(["key", "score"],
                                  ascending=[True, False])
                    .groupby("key", as_index=False).head(margin_k))
            summed = topk.groupby(["kind", "key"], as_index=False) \
                .agg(score=("score", "sum"))
            best = summed.assign(partner=np.int64(-1))
        else:
            best = (g.sort_values(["key", "score", "partner"],
                                  ascending=[True, False, True])
                    .groupby("key", as_index=False).head(1))
        return pa.table({
            "kind": pa.array(best["kind"].to_numpy("int64"), pa.int64()),
            "key": pa.array(best["key"].to_numpy("int64"), pa.int64()),
            "partner": pa.array(best["partner"].to_numpy("int64"),
                                pa.int64()),
            "score": pa.array(best["score"].to_numpy("int64"), pa.int64()),
        })

    def pair_bucket(t: pa.Table) -> pa.Table:
        kind = t.column("kind").to_numpy()
        key = t.column("key").to_numpy()
        partner = t.column("partner").to_numpy()
        src = np.where(kind == 0, key, partner)
        tgt = np.where(kind == 0, partner, key)
        # ids < 2**31 keep src*1000003+tgt inside int64 (docstring bound)
        return t.append_column(
            "__pb", pa.array((src * 1000003 + tgt) % _NB, pa.int64()))

    def mutual(g: pd.DataFrame) -> pa.Table:
        f = g[g["kind"] == 0]
        bwd = g[g["kind"] == 1]
        m = f.merge(bwd, left_on=["key", "partner"],
                    right_on=["partner", "key"], suffixes=("", "_b"))
        return pa.table({
            "src_id": pa.array(m["key"].to_numpy("int64"), pa.int64()),
            "tgt_id": pa.array(m["partner"].to_numpy("int64"), pa.int64()),
            "dot_q": pa.array(m["score"].to_numpy("int64"), pa.int64()),
        })

    def margin_join(pairs: rd.Dataset, sums: rd.Dataset, on: str,
                    carry: list, out: str) -> rd.Dataset:
        """Attach one id-keyed int64 sum to pair rows: tag/union/bucket/
        vectorized-merge (the grouped-join pattern; all rows are ids +
        scores, never payloads)."""
        def tp(t: pa.Table) -> pa.Table:
            n = t.num_rows
            d = {"__j": t.column(on).cast(pa.int64())}
            for c in carry:
                d[c] = t.column(c)
            d["__sumv"] = pa.array(np.zeros(n, np.int64), pa.int64())
            d["__tag"] = pa.array(np.zeros(n, np.int64), pa.int64())
            return pa.table(d)

        def ts(t: pa.Table) -> pa.Table:
            n = t.num_rows
            d = {"__j": t.column("key").cast(pa.int64())}
            for c in carry:
                d[c] = pa.array(np.zeros(n, np.int64), pa.int64())
            d["__sumv"] = t.column("score").cast(pa.int64())
            d["__tag"] = pa.array(np.ones(n, np.int64), pa.int64())
            return pa.table(d)

        u = pairs.map_batches(tp, batch_format="pyarrow").union(
            sums.map_batches(ts, batch_format="pyarrow"))
        u = u.map_batches(
            lambda t: t.append_column(
                "__mb", pa.array(t.column("__j").to_numpy() % _NB,
                                 pa.int64())),
            batch_format="pyarrow")

        def m(g: pd.DataFrame) -> pa.Table:
            p = g[g["__tag"] == 0]
            s = g[g["__tag"] == 1][["__j", "__sumv"]] \
                .rename(columns={"__sumv": out})
            r = p.drop(columns=["__sumv", "__tag", "__mb"]) \
                .merge(s, on="__j")
            return pa.table({c: pa.array(r[c].to_numpy("int64"),
                                         pa.int64())
                             for c in carry + [out]})

        return u.groupby("__mb").map_groups(m, batch_format="pandas")

    cands = (ds.map_batches(expand, batch_format="pandas")
             .groupby("__pair").map_groups(shard_best,
                                           batch_format="pandas"))
    reduced = (cands.map_batches(
        lambda t: t.append_column(
            "__rb", pa.array(t.column("kind").to_numpy() * _NB
                             + t.column("key").to_numpy() % _NB,
                             pa.int64())),
        batch_format="pyarrow")
        .groupby("__rb").map_groups(global_best, batch_format="pandas"))
    if margin_k:
        reduced = reduced.materialize()  # ids+scores only; 3 consumers
    best = reduced if not margin_k else reduced.filter(expr="kind < 2")
    pairs = (best.map_batches(pair_bucket, batch_format="pyarrow")
             .groupby("__pb").map_groups(mutual, batch_format="pandas"))
    if not margin_k:
        return pairs

    joined = margin_join(
        margin_join(pairs, reduced.filter(expr="kind == 2"), "src_id",
                    ["src_id", "tgt_id", "dot_q"], "sum_fwd"),
        reduced.filter(expr="kind == 3"), "tgt_id",
        ["src_id", "tgt_id", "dot_q", "sum_fwd"], "sum_bwd")

    def keep(t: pa.Table) -> pa.Table:
        dot = t.column("dot_q").to_numpy()
        tot = t.column("sum_fwd").to_numpy() + t.column("sum_bwd").to_numpy()
        mask = dot * (2 * margin_k * 1000) >= margin_thr_milli * tot
        return t.filter(pa.array(mask)).select(["src_id", "tgt_id",
                                                "dot_q"])

    return joined.map_batches(keep, batch_format="pyarrow")
