"""Duplicated-window dedup: sequential replay, hot window, short docs."""

from __future__ import annotations

import collections
import hashlib

import pyarrow as pa

import ray.data as rd

from pero_ocr_ray.functions.spandedup import dup_window_stats
from pero_ocr_ray.kernels.textstats import SHINGLE_RE


def _seq(texts: dict[int, str], w: int) -> dict[int, tuple[int, int]]:
    wins: dict[int, list[str]] = {}
    counts: collections.Counter = collections.Counter()
    for did, text in texts.items():
        toks = SHINGLE_RE.findall(text.lower())
        ws = [hashlib.md5(" ".join(toks[i:i + w]).encode()
                          ).hexdigest()[:16]
              for i in range(len(toks) - w + 1)]
        wins[did] = ws
        counts.update(ws)
    return {did: (len(ws), sum(1 for h in ws if counts[h] >= 2))
            for did, ws in wins.items() if ws}


def _run(texts: dict[int, str], w: int = 3) -> dict[int, tuple[int, int]]:
    t = pa.table({
        "doc_id": pa.array(list(texts), pa.int64()),
        "text": pa.array(list(texts.values()), pa.string()),
    })
    ds = rd.from_arrow(t).repartition(3)
    return {r["doc_id"]: (r["n_windows"], r["n_dup_windows"])
            for r in dup_window_stats(ds, w=w, num_buckets=8).take_all()}


def test_matches_sequential_replay():
    texts = {
        0: "the quick brown fox jumps over the lazy dog",
        1: "a quick brown fox sat still",          # shares 'quick brown fox'
        2: "completely unrelated words here now",
        3: "the quick brown fox jumps over the lazy dog",  # full dup of 0
        4: "short",                                 # < w tokens: no windows
        5: "x y x y x y x y",                       # internal repetition
    }
    got = _run(texts, w=3)
    want = _seq(texts, 3)
    assert got == want
    assert 4 not in got
    assert got[0] == got[3]
    assert got[0][1] == got[0][0]          # every window of 0 recurs in 3
    assert got[2][1] == 0
    assert got[5][1] == got[5][0]          # self-repeats count as dups


def test_hot_window_stays_bounded_partials():
    # one window text repeated across many docs: the count crosses the
    # shuffle as partials; result still exact
    texts = {i: "same exact window text here" for i in range(50)}
    texts[99] = "another thing entirely different okay"
    got = _run(texts, w=5)
    assert got[0] == (1, 1) and got[99] == (1, 0)
    assert sum(v[1] for v in got.values()) == 50
