"""Sequential replay of the ``confusion_top`` query -> inline SQL oracle.

The confusion tally itself is pure algorithm (levenshtein_alignment path
choices), not SQL-expressible, so the oracle for ``confusion_top`` is a
precomputed-pairs fixture: this script replays the ENTIRE query in one
process using the same shared kernels the Ray stages use (oracle.py
extraction, _collapse_pair semantics, levenshtein_alignment) and prints a
``VALUES``-inlined SQL statement to paste into ``oracle_sql()``. The
distributed machinery under test — two extraction runs, tagged union,
url-keyed groupby, partial-tally aggregate, distributed top-k — is what the
gate then compares against this sequential ground truth.

Usage: python tools/make_confusion_fixture.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.compute as pc
import pyarrow.parquet as pq


def sequential_confusion_top(sf_dir: str, top_k: int = 20) -> list[tuple]:
    from pero_ocr_ray.functions.quality import _normalize_ws
    from pero_ocr_ray.kernels.align import levenshtein_alignment
    from pero_ocr_ray.oracle import extract_table
    from pero_ocr_ray.sources.pages import pages_from_documents

    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    stripped = docs.set_column(
        docs.column_names.index("text"), "text",
        pc.replace_substring_regex(docs.column("text"), "[aeiou]", ""))
    run_a = extract_table(pages_from_documents(docs, "simple"))
    run_b = extract_table(pages_from_documents(stripped, "simple"))

    def by_url(tab):
        side: dict[str, list[str]] = {}
        for url, text in zip(tab.column("url").to_pylist(),
                             tab.column("extracted_text").to_pylist()):
            side.setdefault(url, []).append(text)
        # duplicate urls collapse to the lexicographically largest text
        # (the _collapse_pair rule)
        return {u: max(ts) for u, ts in side.items()}

    hyps, refs = by_url(run_a), by_url(run_b)
    counts: dict[tuple[str, str], int] = {}
    for url in hyps.keys() & refs.keys():  # inner-join semantics
        hyp, ref = _normalize_ws(hyps[url]), _normalize_ws(refs[url])
        if hyp == ref:
            continue
        for h_ch, r_ch in levenshtein_alignment(hyp, ref):
            if h_ch != r_ch:
                key = (h_ch or "", r_ch or "")
                counts[key] = counts.get(key, 0) + 1
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
    return [(h, r, n, i + 1) for i, ((h, r), n) in enumerate(ordered)]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    rows = sequential_confusion_top(sf_dir)

    def lit(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    values = ",\n                ".join(
        f"({lit(h)}, {lit(r)}, {n}, {k})" for h, r, n, k in rows)
    print(f"""        "confusion_top": \"\"\"
            SELECT hyp_char, ref_char, CAST(n AS BIGINT) AS n,
                   CAST(rank AS BIGINT) AS rank
            FROM (VALUES
                {values}
            ) AS t(hyp_char, ref_char, n, rank)\"\"\",""")


if __name__ == "__main__":
    main()
