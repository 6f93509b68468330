"""Tests for the training-data operators (dedup, similarity, text stats,
windows, relational) and the alignment kernels."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from pero_ocr_ray.kernels.align import (
    error_stats, levenshtein_alignment, levenshtein_distance, merge_error_stats,
)
from pero_ocr_ray.kernels import textstats as K
from pero_ocr_ray.util import dataset_to_table


# ---- alignment kernels ----------------------------------------------------

@pytest.mark.parametrize("a,b,d", [
    ("", "", 0), ("abc", "", 3), ("", "abc", 3), ("abc", "abc", 0),
    ("kitten", "sitting", 3), ("flaw", "lawn", 2), ("abc", "axc", 1),
    ("sunday", "saturday", 3),
])
def test_levenshtein_distance(a, b, d):
    assert levenshtein_distance(a, b) == d
    assert levenshtein_distance(b, a) == d


def test_levenshtein_alignment_path():
    path = levenshtein_alignment("abc", "axc")
    assert path == [("a", "a"), ("b", "x"), ("c", "c")]
    errors = sum(1 for x, y in path if x != y)
    assert errors == levenshtein_distance("abc", "axc")


def test_error_stats_merge():
    parts = [error_stats("abc", "abc"), error_stats("abd", "abc")]
    tot = merge_error_stats(parts)
    assert tot["char_errors"] == 1 and tot["ref_chars"] == 6
    assert tot["cer"] == pytest.approx(1 / 6)
    assert tot["n_docs"] == 2


# ---- textstats kernels ----------------------------------------------------

def test_minhash_similar_docs_agree():
    base = "the quick brown fox jumps over the lazy dog " * 20
    near = base + "extra tail words here"
    far = "completely different content about other things " * 20
    s1 = K.minhash_signature(base)
    s2 = K.minhash_signature(near)
    s3 = K.minhash_signature(far)
    assert K.estimate_jaccard(s1, s2) > 0.6
    assert K.estimate_jaccard(s1, s3) < 0.2
    # LSH: near docs share at least one band, far docs share none
    assert set(K.lsh_band_keys(s1)) & set(K.lsh_band_keys(s2))
    assert not (set(K.lsh_band_keys(s1)) & set(K.lsh_band_keys(s3)))


def test_simhash_hamming():
    a = "the quick brown fox jumps over the lazy dog " * 10
    b = a + " one extra"
    c = "entirely other words in this document " * 10
    assert K.hamming64(K.simhash64(a), K.simhash64(b)) <= 6
    assert K.hamming64(K.simhash64(a), K.simhash64(c)) > 10


def test_shingle_jaccard_exact():
    assert K.shingle_jaccard("a b c d", "a b c d") == 1.0
    assert K.shingle_jaccard("a b c d e", "x y z w v") == 0.0


def test_fingerprint_deterministic():
    t = "some document text " * 50
    assert K.rolling_fingerprint(t) == K.rolling_fingerprint(t)
    # min-of-windows is intentionally robust to small appends; a different
    # document must fingerprint differently
    assert K.rolling_fingerprint(t) != K.rolling_fingerprint("other words " * 50)
    assert K.rolling_fingerprint("short") == K.rolling_fingerprint("short")


def test_lang_id():
    assert K.lang_id("the cat is in the house and it is warm") == "en"
    assert K.lang_id("der hund ist nicht in das haus und die katze") == "de"
    assert K.lang_id("xyzzy qwerty") == "und"


# ---- dedup ops ------------------------------------------------------------

def _docs_with_dups() -> rd.Dataset:
    import random
    pool = [f"w{j}" for j in range(500)]
    rows = []
    for i in range(20):
        rng = random.Random(1000 + i)
        words = " ".join(rng.choice(pool) for _ in range(60))
        rows.append({"doc_id": i, "text": f"doc {i} " + words})
    # exact dups: 100/101 copy doc 0's text
    rows.append({"doc_id": 100, "text": rows[0]["text"]})
    rows.append({"doc_id": 101, "text": rows[0]["text"]})
    # near dup: doc 200 = doc 1 text + tiny tail
    rows.append({"doc_id": 200, "text": rows[1]["text"] + " tiny tail"})
    return rd.from_items(rows)


def test_exact_dedup_groups():
    from pero_ocr_ray.functions.dedup import exact_dedup_groups
    out = dataset_to_table(exact_dedup_groups(_docs_with_dups())).to_pandas()
    assert len(out) == 21  # 23 rows, 3 share one text
    grp = out[out["n_copies"] == 3]
    assert len(grp) == 1 and grp["doc_id"].iloc[0] == 0


def test_exact_dedup_survivors():
    from pero_ocr_ray.functions.dedup import exact_dedup
    out = dataset_to_table(exact_dedup(_docs_with_dups())).to_pandas()
    assert sorted(out["doc_id"]) == sorted(set(range(20)) | {200})


def test_exact_dedup_hot_group_combiner():
    """A million-copy hot text (parked-domain shape) must flow through the
    combiner as per-block partials, never materialize as one group. Runs at
    bounded memory because exact_dedup_groups aggregates (hash, min, count)
    partials; the old map_groups form would pull 10^6 rows into one pandas
    frame."""
    from pero_ocr_ray.functions.dedup import exact_dedup, exact_dedup_groups

    n = 1_000_000

    def mk(t: "pa.Table") -> "pa.Table":
        ids = t.column("id")
        texts = [f"unique {i}" if i < 5 else "hot parked-domain page"
                 for i in ids.to_pylist()]
        return pa.table({"doc_id": pa.compute.cast(ids, pa.int64()),
                         "text": pa.array(texts, pa.string())})

    docs = rd.range(n).map_batches(mk, batch_format="pyarrow")
    out = dataset_to_table(exact_dedup_groups(docs)).to_pandas()
    assert len(out) == 6
    hot = out[out["n_copies"] == n - 5]
    assert len(hot) == 1 and hot["doc_id"].iloc[0] == 5
    assert set(out[out["n_copies"] == 1]["doc_id"]) == set(range(5))

    surv = dataset_to_table(
        exact_dedup(docs).select_columns(["doc_id"])).to_pandas()
    assert sorted(surv["doc_id"]) == [0, 1, 2, 3, 4, 5]


def test_minhash_near_dup():
    from pero_ocr_ray.functions.dedup import (
        minhash_dedup_drop_ids, minhash_near_dup_pairs,
    )
    pairs = dataset_to_table(minhash_near_dup_pairs(_docs_with_dups(), 0.7)
                             ).to_pandas()
    pairset = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert (0, 100) in pairset and (0, 101) in pairset and (100, 101) in pairset
    assert (1, 200) in pairset  # near-dup found
    drops = dataset_to_table(minhash_dedup_drop_ids(_docs_with_dups(), 0.7)
                             ).to_pandas()
    assert {100, 101, 200} <= set(drops["doc_id"])
    assert 0 not in set(drops["doc_id"]) and 1 not in set(drops["doc_id"])


def test_simhash_near_dup_pairs():
    from pero_ocr_ray.functions.dedup import simhash_near_dup_pairs
    out = dataset_to_table(simhash_near_dup_pairs(_docs_with_dups(), 3)
                           ).to_pandas()
    pairset = set(zip(out["doc_a"], out["doc_b"]))
    assert (0, 100) in pairset and (0, 101) in pairset  # exact dups: hamming 0


def test_jaccard_near_dup_exact_values():
    """jaccard_near_dup_pairs returns EXACT shingle Jaccard (verified
    against the brute-force kernel) for every LSH-surfaced pair."""
    from pero_ocr_ray.functions.dedup import jaccard_near_dup_pairs
    docs = _docs_with_dups()
    out = dataset_to_table(jaccard_near_dup_pairs(docs, threshold=0.5)
                           ).to_pandas()
    texts = {r["doc_id"]: r["text"] for r in docs.take_all()}
    assert len(out) >= 4  # (0,100) (0,101) (100,101) (1,200)
    for _, row in out.iterrows():
        expect = K.shingle_jaccard(texts[row["doc_a"]], texts[row["doc_b"]])
        assert row["jaccard"] == pytest.approx(expect, abs=1e-12)
        assert row["jaccard"] >= 0.5 and row["doc_a"] < row["doc_b"]
    pairset = set(zip(out["doc_a"], out["doc_b"]))
    assert {(0, 100), (0, 101), (100, 101), (1, 200)} <= pairset


def test_simhash_degenerate_bucket_bounded():
    """2000 near-empty docs share every 16-bit block (simhash 0) — the
    MAX_BUCKET cap must keep the pair loop bounded (quadratic-in-512, not
    quadratic-in-corpus) and still return the capped pair set."""
    from pero_ocr_ray.functions.dedup import MAX_BUCKET, simhash_near_dup_pairs
    docs = rd.from_items([{"doc_id": i, "text": ""} for i in range(2000)])
    out = dataset_to_table(simhash_near_dup_pairs(docs, 3)).to_pandas()
    # all capped docs are pairwise hamming-0: exactly C(MAX_BUCKET, 2) pairs
    assert len(out) == MAX_BUCKET * (MAX_BUCKET - 1) // 2
    assert out["doc_a"].max() < MAX_BUCKET  # deterministic smallest-id cap


def test_simhash_matches_duckdb_oracle():
    """The simhash kernel is bit-for-bit reproducible in SQL (md5 token
    hash, little-endian bit index) — the property the correctness oracle
    relies on."""
    import duckdb
    texts = ["the quick brown fox jumps over the lazy fox", "", "aaa bbb aaa",
             "one two three four five six seven eight nine ten"]
    con = duckdb.connect()
    con.execute("CREATE TABLE d AS SELECT * FROM (VALUES "
                + ", ".join(f"({i}, ?)" for i in range(len(texts)))
                + ") t(doc_id, text)", texts)
    sql = r"""
        WITH toks AS (
            SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
            FROM d),
        wc AS (SELECT doc_id, w, count(*) AS c FROM toks GROUP BY doc_id, w),
        h AS (SELECT doc_id, c, ('0x' || substr(md5(w), 1, 16))::UBIGINT AS hv FROM wc),
        b AS (SELECT doc_id, bit,
                     SUM(CASE WHEN (hv >> bit) & 1 = 1 THEN c ELSE -c END) AS acc
              FROM h CROSS JOIN (SELECT unnest(range(64)) AS bit) bits
              GROUP BY doc_id, bit),
        s AS (SELECT doc_id,
                     SUM(CASE WHEN acc > 0 THEN
                           CASE WHEN bit = 63 THEN -9223372036854775807 - 1
                                ELSE (1::BIGINT << bit) END
                         ELSE 0 END) AS simhash
              FROM b GROUP BY doc_id)
        SELECT d.doc_id, COALESCE(CAST(s.simhash AS BIGINT), 0) AS simhash
        FROM d LEFT JOIN s ON d.doc_id = s.doc_id ORDER BY d.doc_id"""
    got = dict(con.execute(sql).fetchall())
    for i, t in enumerate(texts):
        expect = np.uint64(K.simhash64(t)).astype(np.int64).item()
        assert got[i] == expect, (i, t)


# ---- similarity -----------------------------------------------------------

def test_knn_matches_numpy_bruteforce():
    from pero_ocr_ray.functions.similarity import knn_cosine
    rng = np.random.RandomState(3)
    m = rng.randn(200, 16)
    ds = rd.from_items([{"vec_id": i, "embedding": m[i].tolist()}
                        for i in range(200)])
    queries = m[:3]
    out = dataset_to_table(knn_cosine(ds, queries, [0, 1, 2], top_k=5)
                           ).to_pandas()
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    for q in range(3):
        sims = mn @ mn[q]
        sims[q] = -np.inf
        expect = np.argsort(-sims, kind="stable")[:5].tolist()
        got = (out[out["query_id"] == q].sort_values("rank")["neighbor_id"]
               .tolist())
        assert got == expect, f"query {q}"


def test_embedding_near_dup_finds_planted():
    from pero_ocr_ray.functions.similarity import embedding_near_dup_pairs
    rng = np.random.RandomState(4)
    m = rng.randn(100, 16)
    rows = [{"vec_id": i, "embedding": m[i].tolist()} for i in range(100)]
    rows.append({"vec_id": 500, "embedding": (m[7] * 1.001).tolist()})  # planted
    out = dataset_to_table(embedding_near_dup_pairs(rd.from_items(rows), 0.98)
                           ).to_pandas()
    assert (7, 500) in set(zip(out["vec_a"], out["vec_b"]))


def test_embedding_near_dup_hot_bucket_capped():
    """A pathological corpus of identical vectors lands in ONE LSH bucket;
    the MAX_BUCKET cap must bound the quadratic verify deterministically
    (smallest vec_ids survive) instead of doing a 5000x5000 matmul."""
    from pero_ocr_ray.functions import similarity as S

    rows = [{"vec_id": i, "embedding": [1.0, 2.0, 3.0, 4.0]}
            for i in range(5000)]
    out = dataset_to_table(
        S.embedding_near_dup_pairs(rd.from_items(rows), 0.99)).to_pandas()
    cap = S.MAX_BUCKET
    assert len(out) == cap * (cap - 1) // 2
    assert int(out["vec_b"].max()) == cap - 1  # smallest ids kept


# ---- windows --------------------------------------------------------------

def test_tumbling_window_counts():
    from pero_ocr_ray.functions.windows import tumbling_window_counts
    ts = pd.to_datetime(["2024-01-01 00:10", "2024-01-01 00:50",
                         "2024-01-01 01:10", "2024-01-01 00:20"])
    ds = rd.from_pandas(pd.DataFrame({
        "ts": ts, "event_type": ["a", "a", "a", "b"],
    }))
    out = dataset_to_table(tumbling_window_counts(ds, "h")).to_pandas()
    out = out.sort_values(["event_type", "window_start"], ignore_index=True)
    assert out["n_events"].tolist() == [2, 1, 1]
    assert out["event_type"].tolist() == ["a", "a", "b"]


# ---- relational (vs duckdb inline) ----------------------------------------

def test_pricing_summary_vs_duckdb():
    import duckdb
    from pero_ocr_ray.functions.relational import pricing_summary
    li = rd.read_parquet("/root/testdata/sf0.001/lineitem.parquet")
    got = (dataset_to_table(pricing_summary(li, "2000-01-01")).to_pandas()
           .sort_values(["l_returnflag", "l_linestatus"], ignore_index=True))
    con = duckdb.connect()
    want = con.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(ROUND(SUM(l_quantity)) AS BIGINT) AS sum_qty,
               CAST(ROUND(SUM(l_extendedprice) * 100) AS BIGINT) AS sum_base_cents,
               CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)
                   AS sum_disc_cents,
               CAST(count(*) AS BIGINT) AS count_order
        FROM read_parquet('/root/testdata/sf0.001/lineitem.parquet')
        WHERE l_shipdate <= TIMESTAMP '2000-01-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """).df()
    pd.testing.assert_frame_equal(got, want)


def test_sessionize():
    from pero_ocr_ray.functions.windows import sessionize
    ts = pd.to_datetime(["2024-01-01 00:00", "2024-01-01 00:10",
                         "2024-01-01 01:00", "2024-01-02 09:00",
                         "2024-01-01 00:05"])
    ds = rd.from_pandas(pd.DataFrame({
        "user_id": [1, 1, 1, 1, 2], "ts": ts,
    }))
    out = dataset_to_table(sessionize(ds, 30)).to_pandas()
    out = out.sort_values("user_id", ignore_index=True)
    # user 1: 00:00+00:10 | 01:00 | next day  -> 3 sessions; user 2 -> 1
    assert out["n_sessions"].tolist() == [3, 1]


def test_sessionize_bucketed_matches_plain():
    """The hot-key-safe two-phase sessionize is exactly equal to the plain
    operator, including sessions spanning day boundaries."""
    import random
    from pero_ocr_ray.functions.windows import sessionize, sessionize_bucketed
    rng = random.Random(11)
    rows = []
    # a hot user with 400 events over 6 days, incl. runs crossing midnight
    t = pd.Timestamp("2024-01-01 23:40")
    for _ in range(400):
        t += pd.Timedelta(minutes=rng.choice([1, 5, 29, 31, 200]))
        rows.append({"user_id": 7, "ts": t})
    # events exactly at / around the boundary-merge threshold
    rows += [{"user_id": 8, "ts": pd.Timestamp("2024-01-01 23:45")},
             {"user_id": 8, "ts": pd.Timestamp("2024-01-02 00:15")},  # ==gap
             {"user_id": 8, "ts": pd.Timestamp("2024-01-02 00:46")},  # >gap
             {"user_id": 9, "ts": pd.Timestamp("2024-01-03 00:00")}]
    df = pd.DataFrame(rows)
    df["ts"] = df["ts"].astype("datetime64[us]")
    ds = rd.from_pandas(df)
    plain = (dataset_to_table(sessionize(ds, 30)).to_pandas()
             .sort_values("user_id", ignore_index=True))
    bucketed = (dataset_to_table(sessionize_bucketed(ds, 30, "D")).to_pandas()
                .sort_values("user_id", ignore_index=True))
    pd.testing.assert_frame_equal(plain, bucketed)
    assert bucketed.loc[bucketed["user_id"] == 8, "n_sessions"].iloc[0] == 2


def test_levenshtein_substring():
    from pero_ocr_ray.kernels.align import levenshtein_substring
    d, end = levenshtein_substring("world", "hello world again")
    assert d == 0 and end == 11
    d, _ = levenshtein_substring("wxrld", "hello world again")
    assert d == 1
    assert levenshtein_substring("", "abc") == (0, 0)
    d, _ = levenshtein_substring("abc", "")
    assert d == 3


def test_chunk_overlap_merge():
    from pero_ocr_ray.kernels.align import find_best_overlap, merge_chunks
    full = "the quick brown fox jumps over the lazy dog and runs far away"
    a, b = full[:40], full[25:]  # 15-char overlap
    assert find_best_overlap(a, b) == 15
    assert merge_chunks([a, b]) == full
    # disjoint chunks: no overlap detected, plain concat
    assert merge_chunks(["abcdef", "uvwxyz"]) == "abcdefuvwxyz"
    # three-way with noisy overlap (one edit inside the shared region)
    c1, c2 = full[:40], ("X" + full[26:])
    merged = merge_chunks([c1, c2])
    assert merged.endswith("far away") and merged.startswith("the quick")


def test_sliding_window_counts():
    from pero_ocr_ray.functions.windows import sliding_window_counts
    ts = pd.to_datetime(["2024-01-01 00:30", "2024-01-01 01:30"])
    ds = rd.from_pandas(pd.DataFrame({"ts": ts, "event_type": ["a", "a"]}))
    out = dataset_to_table(sliding_window_counts(ds, 2, 1)).to_pandas()
    out = out.sort_values("window_start", ignore_index=True)
    # event@00:30 -> windows 23:00,00:00 ; event@01:30 -> 00:00,01:00
    got = {(str(r["window_start"]), r["n_events"]) for _, r in out.iterrows()}
    assert got == {("2023-12-31 23:00:00", 1),
                   ("2024-01-01 00:00:00", 2),
                   ("2024-01-01 01:00:00", 1)}


def test_hll_accuracy_and_merge():
    from pero_ocr_ray.kernels import hll
    sk = hll.empty_sketch()
    n = 50_000
    hll.add_many(sk, (f"item-{i}" for i in range(n)))
    est = hll.estimate(sk)
    assert abs(est - n) / n < 0.03, est
    # merge == union
    a, b = hll.empty_sketch(), hll.empty_sketch()
    hll.add_many(a, (f"x{i}" for i in range(10_000)))
    hll.add_many(b, (f"x{i}" for i in range(5_000, 15_000)))  # 5k overlap
    est_union = hll.estimate(hll.merge(a, b))
    assert abs(est_union - 15_000) / 15_000 < 0.05
    # serialize round trip
    assert hll.estimate(hll.deserialize(hll.serialize(sk))) == est
    # small-range exactness (linear counting)
    small = hll.empty_sketch()
    hll.add_many(small, (f"s{i}" for i in range(50)))
    assert abs(hll.estimate(small) - 50) <= 2


def test_approx_distinct_op():
    from pero_ocr_ray.functions.textstats import approx_distinct
    ds = rd.from_items([{"doc_id": i, "text": f"tok{i} tok{i%100} shared"}
                        for i in range(2000)])
    out = approx_distinct(ds, "doc_id")
    assert abs(out["estimate"] - 2000) / 2000 < 0.05
    toks = approx_distinct(ds, "text", tokenize=True)
    # distinct tokens: 2000 tok{i} (100 of which repeat as tok{i%100}) + 'shared'
    assert abs(toks["estimate"] - 2001) / 2001 < 0.05


def test_asof_join_semantics():
    from pero_ocr_ray.functions.join import asof_join
    left = rd.from_pandas(pd.DataFrame({
        "event_id": [1, 2, 3],
        "user_id": [7, 7, 8],
        "ts": pd.to_datetime(["2024-01-01 10:00", "2024-01-01 12:00",
                              "2024-01-01 09:00"]),
    }))
    right = rd.from_pandas(pd.DataFrame({
        "user_id": [7, 7, 8],
        "ts": pd.to_datetime(["2024-01-01 09:30", "2024-01-01 11:00",
                              "2024-01-01 09:30"]),
        "value": [1.0, 2.0, 3.0],
    }))
    out = dataset_to_table(asof_join(left, right, "user_id", "ts",
                                     right_cols=["value"])).to_pandas()
    out = out.sort_values("event_id", ignore_index=True)
    # event 1 -> 09:30 view (1.0); event 2 -> 11:00 (2.0);
    # event 3 at 09:00 has no prior right row -> dropped (inner)
    assert out["event_id"].tolist() == [1, 2]
    assert [float(v) for v in out["value_right"]] == [1.0, 2.0]


# ---- near-dup connected components ----------------------------------------

def _union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def test_label_propagation_matches_union_find():
    """Chain edges (transitive clusters) resolve to min-id components,
    identical to a sequential union-find oracle."""
    import pyarrow as pa
    from pero_ocr_ray.functions.dedup import label_propagation_components
    edges = [(0, 1), (1, 2), (2, 3), (3, 4),        # 5-chain
             (10, 11), (11, 12),                    # 3-chain
             (20, 21), (21, 22), (20, 22),          # triangle
             (30, 31)]                              # pair
    pairs = rd.from_arrow(pa.table({
        "doc_a": pa.array([a for a, _ in edges], pa.int64()),
        "doc_b": pa.array([b for _, b in edges], pa.int64()),
    }))
    got = dataset_to_table(label_propagation_components(pairs)).to_pandas()
    got_map = dict(zip(got["doc_id"], got["cluster_id"]))
    nodes = sorted({n for e in edges for n in e})
    want = _union_find(edges, nodes)
    assert got_map == want
    assert set(got_map.values()) == {0, 10, 20, 30}


def test_near_dup_clusters_transitive_chain():
    """A sliding-window chain corpus (A~B~C but A!~C): cluster labels equal
    a union-find over the SAME LSH pair set, and the cluster-based drop set
    removes chain middles that pairwise drop logic would also remove, while
    agreeing with union-find minima exactly."""
    import pyarrow as pa
    from pero_ocr_ray.functions.dedup import (
        minhash_dedup_cluster_drop_ids, minhash_near_dup_pairs,
        near_dup_clusters,
    )
    base = [f"tok{j:03d}" for j in range(80)]
    other = [f"zzz{j:03d}" for j in range(80)]
    texts = [" ".join(base[i * 3:i * 3 + 30]) for i in range(8)]
    texts += [" ".join(other[i * 3:i * 3 + 30]) for i in range(4)]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    pairs_tbl = dataset_to_table(minhash_near_dup_pairs(docs, 0.7)).to_pandas()
    edges = list(zip(pairs_tbl["doc_a"], pairs_tbl["doc_b"]))
    assert edges, "chain corpus must surface near-dup pairs"
    nodes = sorted({n for e in edges for n in e})
    want = _union_find(edges, nodes)
    got = dataset_to_table(near_dup_clusters(docs, 0.7)).to_pandas()
    got_map = dict(zip(got["doc_id"], got["cluster_id"]))
    assert got_map == want
    drops = dataset_to_table(
        minhash_dedup_cluster_drop_ids(docs, 0.7)).to_pandas()
    assert set(drops["doc_id"]) == {n for n, c in want.items() if n != c}


# ---- hot-key-safe join variants -------------------------------------------

def test_grouped_join_salted_equals_plain():
    """Salted grouped join must produce exactly the plain join's result set
    on a corpus with one pathological hot key."""
    import pyarrow as pa
    from pero_ocr_ray.functions.join import grouped_join, grouped_join_salted
    # hot key 7: 1200 left rows; keys 0..9 small; right has 0-3 rows per key
    lk = [7] * 1200 + [i % 10 for i in range(300)]
    left = rd.from_arrow(pa.table({
        "k": pa.array(lk, pa.int64()),
        "lv": pa.array(list(range(len(lk))), pa.int64()),
    })).repartition(8)
    rk, rv = [], []
    for key in range(10):
        for j in range(key % 4):
            rk.append(key); rv.append(key * 100 + j)
    right = rd.from_arrow(pa.table({
        "k": pa.array(rk, pa.int64()),
        "rv": pa.array(rv, pa.int64()),
    })).repartition(4)

    def norm(df):
        df = df.astype({"k": "int64", "lv": "int64", "rv": "int64"})
        return sorted(map(tuple, df[["k", "lv", "rv"]].to_numpy()))

    plain = norm(dataset_to_table(grouped_join(left, right, "k")).to_pandas())
    salted = norm(dataset_to_table(
        grouped_join_salted(left, right, "k", salts=5)).to_pandas())
    assert plain == salted
    # key 7: (1200 hot + 30 cycled) left rows x 3 right rows; other keys:
    # 30 left rows x (k % 4) right rows
    assert len(plain) == 1230 * 3 + sum((k % 4) * 30
                                        for k in range(10) if k != 7)


def test_asof_join_bucketed_equals_plain():
    """Bucketed as-of join must equal the plain one exactly: hot user with
    dense history, sparse users, left rows before any right row (dropped),
    and matches that must reach back across bucket boundaries."""
    import pyarrow as pa
    from pero_ocr_ray.functions.join import asof_join, asof_join_bucketed
    base = pd.Timestamp("2026-01-01")
    lu, lts, lid = [], [], []
    ru, rts, rv = [], [], []
    # hot user 1: a purchase every 40 min over ~5 days, views every 3 h
    for j in range(180):
        lu.append(1); lts.append(base + pd.Timedelta(minutes=40 * j))
        lid.append(j)
    for j in range(40):
        ru.append(1); rts.append(base + pd.Timedelta(hours=3 * j))
        rv.append(1000 + j)
    # user 2: purchases on day 3 only; views only on day 1 (cross-bucket)
    for j in range(5):
        lu.append(2)
        lts.append(base + pd.Timedelta(days=3, minutes=j))
        lid.append(200 + j)
    ru.append(2); rts.append(base + pd.Timedelta(hours=5)); rv.append(2000)
    # user 3: purchase BEFORE any view -> dropped by inner semantics
    lu.append(3); lts.append(base); lid.append(300)
    ru.append(3); rts.append(base + pd.Timedelta(days=1)); rv.append(3000)
    left = rd.from_arrow(pa.table({
        "user_id": pa.array(lu, pa.int64()),
        "ts": pa.array(lts, pa.timestamp("us")),
        "event_id": pa.array(lid, pa.int64()),
    })).repartition(6)
    right = rd.from_arrow(pa.table({
        "user_id": pa.array(ru, pa.int64()),
        "ts": pa.array(rts, pa.timestamp("us")),
        "value": pa.array(rv, pa.int64()),
    })).repartition(3)

    def norm(df):
        return sorted(
            (int(r.event_id), pd.Timestamp(r.ts_right).isoformat(),
             int(r.value_right))
            for r in df.itertuples())

    plain = norm(dataset_to_table(
        asof_join(left, right, key="user_id", ts="ts",
                  right_cols=["value"])).to_pandas())
    bucketed = norm(dataset_to_table(
        asof_join_bucketed(left, right, key="user_id", ts="ts",
                           right_cols=["value"],
                           bucket_freq="D")).to_pandas())
    assert plain == bucketed
    assert len(plain) == 180 + 5  # user 3's orphan purchase dropped


def test_label_propagation_long_chain_pointer_jumping():
    """A diameter-40 chain must converge within the default round budget
    (pointer jumping: O(log diameter) rounds, not O(diameter))."""
    import pyarrow as pa
    from pero_ocr_ray.functions.dedup import label_propagation_components
    edges = [(i, i + 1) for i in range(40)]
    pairs = rd.from_arrow(pa.table({
        "doc_a": pa.array([a for a, _ in edges], pa.int64()),
        "doc_b": pa.array([b for _, b in edges], pa.int64()),
    }))
    got = dataset_to_table(label_propagation_components(pairs, max_iters=12)
                           ).to_pandas()
    assert set(got["cluster_id"]) == {0}
    assert len(got) == 41


def test_tumbling_window_multi_unit_freq():
    """pandas-style multi-unit aliases ('2h', '30min') keep working after
    the Arrow conversion."""
    from pero_ocr_ray.functions.windows import tumbling_window_counts
    ts = pd.to_datetime(["2024-01-01 00:10", "2024-01-01 01:50",
                         "2024-01-01 02:10", "2024-01-01 00:20"])
    ds = rd.from_pandas(pd.DataFrame({
        "ts": ts, "event_type": ["a", "a", "a", "b"],
    }))
    out = dataset_to_table(tumbling_window_counts(ds, "2h")).to_pandas()
    out = out.sort_values(["event_type", "window_start"], ignore_index=True)
    # 2h windows: [00:00,02:00) has a@00:10,a@01:50 and b@00:20; [02:00,..) a
    assert out["n_events"].tolist() == [2, 1, 1]
    with pytest.raises(ValueError, match="unsupported window freq"):
        dataset_to_table(tumbling_window_counts(ds, "fortnight"))


def test_subword_pretokenizer():
    """BPE-ish pretokens: contractions split, letter/digit/punct runs keep
    their leading space, whitespace itself is not a token; the pattern is
    RE2-compatible so DuckDB evaluates it identically (oracle-checked)."""
    assert K.SUBWORD_RE.findall("it's 2026!") == ["it", "'s", " 2026", "!"]
    assert K.SUBWORD_RE.findall("Hello world, don't") == \
        ["Hello", " world", ",", " don", "'t"]
    assert K.subword_count("") == 0
    # count >= whitespace tokens (pretokenization only splits further)
    for t in ("a b c", "x,y.z", "don't stop-me now... 3.14"):
        assert K.subword_count(t) >= K.token_count(t)


def test_top_tokens_distributed():
    import pyarrow as pa
    from pero_ocr_ray.functions.textstats import top_tokens
    texts = ["aa bb aa", "bb cc aa", "dd"] * 10
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(30)), pa.int64()),
        "text": pa.array(texts * 1, pa.string()),
    })).repartition(5)
    out = dataset_to_table(top_tokens(ds, k=3)).to_pandas()
    assert list(out["token"]) == ["aa", "bb", "cc"]
    assert list(out["n"]) == [30, 20, 10]


def test_stratified_sample_deterministic_and_nested():
    import pyarrow as pa
    from pero_ocr_ray.functions.sampling import hash_permille, stratified_sample
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(2000)), pa.int64()),
        "lang": pa.array((["en", "de", "cs", "ar"] * 500), pa.string()),
    }))
    out = dataset_to_table(stratified_sample(
        docs, {"en": 100, "de": 500}, default_permille=250)).to_pandas()
    # exact membership: the hash predicate, independently evaluated
    for r in out.itertuples():
        lim = {"en": 100, "de": 500}.get(r.lang, 250)
        assert hash_permille(r.doc_id) < lim
    # determinism across partitioning
    out2 = dataset_to_table(stratified_sample(
        docs.repartition(13), {"en": 100, "de": 500}, 250)).to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])
    # nested: raising a rate strictly grows the sample
    bigger = dataset_to_table(stratified_sample(
        docs, {"en": 300, "de": 500}, 250)).to_pandas()
    assert set(out["doc_id"]) <= set(bigger["doc_id"])
    # roughly calibrated (hash uniformity)
    n_en = (out["lang"] == "en").sum()
    assert 25 <= n_en <= 80  # 500 en docs at 10% -> ~50
    with pytest.raises(ValueError):
        dataset_to_table(stratified_sample(docs, {"en": 2000}))


def test_curate_full_drops_near_dup_cluster_members():
    """The full curation chain removes exact dups AND transitive near-dup
    cluster members via the native anti-join, keeps budgets columns."""
    import pyarrow as pa
    from pero_ocr_ray.pipelines.training_data import curate_full
    base = [f"tok{j:03d}" for j in range(60)]
    texts = {
        0: " ".join(base[0:30]),
        1: " ".join(base[3:33]),    # near-dup of 0 (chain)
        2: " ".join(base[6:36]),    # near-dup of 1 (A~B~C)
        3: " ".join(f"zz{j}" for j in range(30)),   # unrelated
        4: " ".join(base[0:30]),    # exact dup of 0
    }
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "text": pa.array([texts[i] for i in sorted(texts)], pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
    }))
    out = dataset_to_table(curate_full(
        docs, min_tokens=5, near_dup_threshold=0.7,
        default_permille=1000)).to_pandas()
    # exact dup 4 gone; near-dup chain 1,2 gone (cluster min 0 survives)
    assert sorted(out["doc_id"]) == [0, 3]
    assert {"n_tokens", "n_subwords", "lang"} <= set(out.columns)
    assert (out["n_tokens"] == 30).all()


def test_domain_counts_and_cap():
    import pyarrow as pa
    from pero_ocr_ray.functions.domains import (
        cap_per_domain, domain_counts, host_of,
    )
    assert host_of("https://a.example/x/y?q=1") == "a.example"
    assert host_of("not a url") == ""
    urls = [f"https://site{i % 3}.example/d/{i}" for i in range(30)]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(30)), pa.int64()),
        "url": pa.array(urls, pa.string()),
    })).repartition(4)
    counts = dataset_to_table(domain_counts(ds)).to_pandas()
    assert sorted(counts["n_pages"]) == [10, 10, 10]
    capped = dataset_to_table(cap_per_domain(ds, cap=2)).to_pandas()
    assert len(capped) == 6
    # smallest doc_ids per host win
    assert sorted(capped["doc_id"]) == [0, 1, 2, 3, 4, 5]
    with pytest.raises(ValueError):
        cap_per_domain(ds, cap=0)


def test_redact_pii_and_repetition():
    import pyarrow as pa
    from pero_ocr_ray.functions.pii import (
        redact_pii, redact_text, repetition_signals, repetition_stats,
    )
    red, counts = redact_text(
        "mail bob.smith+x@ex.co.uk or call +1 (555) 123-4567 ip 10.0.0.1")
    assert red == "mail <email> or call <phone> ip <ip>"
    assert counts == {"email": 1, "phone": 1, "ip": 1}
    # email consumed before the phone pass can half-match its digits
    red2, c2 = redact_text("a1234567@b.co")
    assert red2 == "<email>" and c2["phone"] == 0
    assert repetition_signals("") == (0, 0)
    assert repetition_signals("a b c d") == (0, 333333)  # 1 of 3 bigrams
    d, b = repetition_signals("spam spam spam spam")
    assert d == 750000 and b == 1000000  # 1 distinct of 4; one bigram
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["x@y.zz and x@y.zz", "clean words only here"],
                         pa.string()),
    }))
    out = dataset_to_table(redact_pii(ds)).to_pandas().sort_values("doc_id")
    assert out["n_emails"].tolist() == [2, 0]
    assert out["text"].iloc[0] == "<email> and <email>"
    rep = dataset_to_table(repetition_stats(ds)).to_pandas()
    assert set(rep.columns) == {"doc_id", "dup_word_frac_e6",
                                "top_bigram_frac_e6"}
