"""TF-IDF keyword extraction + bounded unigram-LM document scoring."""

import math

import ray.data as rd

from pero_ocr_ray.functions.tfidf import (doc_lm_score, doc_tfidf_topk,
                                          train_unigram_lm)
from pero_ocr_ray.util import dataset_to_table


def _docs(rows):
    return rd.from_items(rows)


def test_tfidf_topk_semantics():
    rows = [
        {"doc_id": 0, "text": "apple apple banana the the the"},
        {"doc_id": 1, "text": "banana cherry the"},
        {"doc_id": 2, "text": "cherry cherry cherry the"},
        {"doc_id": 3, "text": ""},
    ]
    out = (dataset_to_table(doc_tfidf_topk(_docs(rows), k=2))
           .to_pandas().sort_values(["doc_id", "tfidf_e6", "token"],
                                    ascending=[True, False, True]))
    # 'the' appears in all 3 token-bearing docs -> idf = ln(4/3) > 0 but
    # small; doc 3 (no tokens) emits nothing.
    assert set(out["doc_id"]) == {0, 1, 2}
    assert out.groupby("doc_id").size().max() <= 2
    d0 = out[out["doc_id"] == 0]
    # apple: tf=2, df=1 -> 2*ln(4) is the top keyword of doc 0
    assert d0.iloc[0]["token"] == "apple"
    assert d0.iloc[0]["tfidf_e6"] == math.floor(2 * math.log(4.0) * 1e6)
    d2 = out[out["doc_id"] == 2]
    assert d2.iloc[0]["token"] == "cherry"
    assert d2.iloc[0]["tfidf_e6"] == math.floor(
        3 * math.log(4.0 / 2.0) * 1e6)


def test_tfidf_tie_break_on_token():
    # two tokens with identical (tf, df) in one doc tie on score ->
    # ascending token decides which survives the k=1 cut.
    rows = [{"doc_id": 0, "text": "zeta alpha"},
            {"doc_id": 1, "text": "filler"}]
    out = dataset_to_table(doc_tfidf_topk(_docs(rows), k=1)).to_pandas()
    assert out[out["doc_id"] == 0]["token"].item() == "alpha"


def test_unigram_lm_training_and_scores():
    rows = [{"doc_id": 0, "text": "a a a b"},
            {"doc_id": 1, "text": "b c"}]
    table, oov = train_unigram_lm(_docs(rows), vocab_size=2)
    # T=6 tokens, V=2 -> denominator 9; vocab cut (count desc, token):
    # a(3), b(2); c falls out.
    assert set(table) == {"a", "b"}
    assert table["a"] == math.floor(math.log(4 / 9) * 1e6)
    assert table["b"] == math.floor(math.log(3 / 9) * 1e6)
    assert oov == math.floor(math.log(1 / 9) * 1e6)

    out = (dataset_to_table(doc_lm_score(_docs(rows), vocab_size=2))
           .to_pandas().set_index("doc_id"))
    # doc 1 = b + OOV c
    exp1 = math.floor((table["b"] + oov) / 2)
    assert out.loc[1, "lm_score_e6"] == exp1
    assert out.loc[1, "n_tokens"] == 2
    exp0 = math.floor((3 * table["a"] + table["b"]) / 4)
    assert out.loc[0, "lm_score_e6"] == exp0


def test_lm_score_partitioning_invariant():
    rows = [{"doc_id": i, "text": f"tok{i % 5} tok{i % 3} common"}
            for i in range(40)]
    a = (dataset_to_table(doc_lm_score(_docs(rows), vocab_size=4))
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (dataset_to_table(doc_lm_score(_docs(rows).repartition(7),
                                       vocab_size=4))
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert a.equals(b)


def test_normalize_text_rules():
    import ray.data as rd
    from pero_ocr_ray.functions.textstats import normalize_text

    rows = [
        {"doc_id": 0, "text": "  a\x00b ’c“d” – e  \t f\n\n\n\ng "},
        {"doc_id": 1, "text": "plain"},
        {"doc_id": 2, "text": ""},
    ]
    out = (dataset_to_table(normalize_text(rd.from_items(rows)))
           .to_pandas().set_index("doc_id"))
    assert out.loc[0, "norm_text"] == "ab 'c\"d\" - e f\n\ng"
    assert out.loc[0, "n_chars_removed"] == (
        len(rows[0]["text"]) - len(out.loc[0, "norm_text"]))
    assert out.loc[1, "norm_text"] == "plain"
    assert out.loc[1, "n_chars_removed"] == 0
    assert out.loc[2, "norm_text"] == ""
