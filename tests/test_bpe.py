"""BPE kernel: trainer determinism, the trained-merges rank invariant, and
the canonical == rank-sequential equivalence the SQL oracle relies on."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from pero_ocr_ray.kernels.bpe import (
    FIXTURE_WORD_COUNTS, bpe_encode, bpe_encode_sequential, bpe_token_count,
    fixture_merges, ranks_of, train_bpe,
)


def test_trainer_deterministic():
    m1 = train_bpe(FIXTURE_WORD_COUNTS, 20)
    m2 = train_bpe(dict(reversed(list(FIXTURE_WORD_COUNTS.items()))), 20)
    assert m1 == m2 == list(fixture_merges())


def test_merges_rank_invariant():
    """Every merge's parts are either single chars or the product of a
    strictly lower-ranked merge — the property that makes rank-sequential
    application equal to canonical encoding (SQL-replayability)."""
    created = set()
    for a, b in fixture_merges():
        for part in (a, b):
            assert len(part) == 1 or part in created, (a, b, part)
        created.add(a + b)


def test_encode_round_trips_and_counts():
    ranks = ranks_of(list(fixture_merges()))
    for w in list(FIXTURE_WORD_COUNTS) + ["tablevalue", "zzz", "q"]:
        toks = bpe_encode(w, ranks)
        assert "".join(toks) == w           # lossless segmentation
        assert bpe_token_count(w) == len(toks)
    # trained words compress below characters
    assert len(bpe_encode("table", ranks)) == 1
    assert len(bpe_encode("value", ranks)) == 1


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=string.ascii_lowercase + "0123456789",
               min_size=1, max_size=40))
def test_canonical_equals_sequential(word):
    merges = list(fixture_merges())
    assert bpe_encode(word, ranks_of(merges)) == \
        bpe_encode_sequential(word, merges)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(alphabet="abcd", min_size=1, max_size=12),
                min_size=1, max_size=30))
def test_equivalence_holds_for_any_trained_table(words):
    """Train on random corpora too — the equivalence must hold for every
    TRAINED merges table, not just the fixture."""
    wc = {w: 1 + i % 5 for i, w in enumerate(words)}
    merges = train_bpe(wc, 12)
    ranks = ranks_of(merges)
    for w in words:
        assert bpe_encode(w, ranks) == bpe_encode_sequential(w, merges)


def test_sql_replay_matches_kernel():
    """Drive the actual DuckDB replace-chain replay (the oracle's encoding
    shape) against the canonical kernel on adversarial repeats."""
    import duckdb

    from __ray_entry__ import _bpe_sql
    words = ["thethethethe", "tabletable", "aaaaaaaaaaaaaaaa",
             "erererererer", "valuevaluevalue", "x"]
    sql = _bpe_sql().replace(
        "FROM documents",
        "FROM (SELECT * FROM docs) AS documents")
    con = duckdb.connect()
    con.execute("CREATE TABLE docs AS SELECT row_number() OVER () - 1 AS "
                "doc_id, w AS text FROM (SELECT unnest(?) AS w)", [words])
    got = {int(r[0]): int(r[2]) for r in con.sql(sql).fetchall()}
    for i, w in enumerate(words):
        assert got[i] == bpe_token_count(w), (w, got[i], bpe_token_count(w))


def test_train_bpe_corpus_matches_sequential():
    """Distributed training (combiner counts + top-k vocab cut + bounded
    driver merge loop) == sequential trainer over the same corpus,
    partitioning-invariant."""
    import ray.data as rd

    from pero_ocr_ray.functions.textstats import train_bpe_corpus
    from pero_ocr_ray.kernels.textstats import SHINGLE_RE

    texts = [
        "the table holds the value and the index filters the table",
        "merge the query stream and shuffle the column batch",
        "the value of the table index is the merge key",
        "shuffle shuffle shuffle the stream batch stream",
    ] * 5
    docs = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    ).repartition(7)

    wc: dict[str, int] = {}
    for t in texts:
        for w in SHINGLE_RE.findall(t.lower()):
            wc[w] = wc.get(w, 0) + 1
    from pero_ocr_ray.kernels.bpe import train_bpe
    expect = train_bpe(wc, 16)
    got = train_bpe_corpus(docs, n_merges=16, vocab_cap=1000)
    assert got == expect
    # a vocab cap below the vocabulary still trains (on the frequent cut)
    capped = train_bpe_corpus(docs, n_merges=8, vocab_cap=5)
    assert len(capped) <= 8 and all(len(p) == 2 for p in capped)
