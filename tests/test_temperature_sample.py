"""Temperature-0.5 sampling: quota math, rank determinism, invariance."""

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from pero_ocr_ray.functions.sampling import (temperature_quotas,
                                             temperature_sample)


def _docs(n_en=100, n_cs=9, n_de=1):
    rows = []
    i = 0
    for lang, n in (("en", n_en), ("cs", n_cs), ("de", n_de)):
        for _ in range(n):
            rows.append({"doc_id": i, "text": "t", "lang": lang})
            i += 1
    return pd.DataFrame(rows)


def _run(df, **kw):
    out = temperature_sample(rd.from_pandas(df), **kw)
    return pa.table(out.take_batch(10_000, batch_format="pyarrow")) \
        .to_pandas().sort_values(["lang", "rk"]).reset_index(drop=True)


def test_quotas_isqrt():
    assert temperature_quotas({"en": 100, "cs": 9, "de": 1, "xx": 0}) == \
        {"en": 10, "cs": 3, "de": 1, "xx": 0}
    # rare strata keep a far larger SHARE (the point of temperature 0.5)
    assert 10 / 100 < 3 / 9 < 1 / 1


def test_selection_is_md5_rank_head():
    df = _docs()
    out = _run(df)
    assert out.groupby("lang")["doc_id"].count().to_dict() == \
        {"en": 10, "cs": 3, "de": 1}
    # brute-force oracle per lang
    for lang, grp in df.groupby("lang"):
        q = math.isqrt(len(grp))
        h = grp["doc_id"].map(lambda v: int(
            hashlib.md5(str(v).encode()).hexdigest()[:16], 16))
        want = grp.assign(h=h).sort_values(["h", "doc_id"])["doc_id"] \
            .head(q).tolist()
        got = out[out["lang"] == lang].sort_values("rk")["doc_id"].tolist()
        assert got == want, lang


def test_partitioning_invariance():
    df = _docs(50, 16, 4)
    a = _run(df)
    b = pa.table(
        temperature_sample(rd.from_pandas(df).repartition(7))
        .take_batch(10_000, batch_format="pyarrow")).to_pandas() \
        .sort_values(["lang", "rk"]).reset_index(drop=True)
    assert a[["doc_id", "lang", "rk"]].equals(b[["doc_id", "lang", "rk"]])
