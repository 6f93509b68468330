"""Domain-level operators for web-corpus curation.

Real curation pipelines cap and count per registrable host (domain
diversity caps a la CCNet/Gopher: no single site may dominate the
training mix). Host extraction is a shared regex evaluated identically by
Python and the DuckDB oracle (no urllib — its parsing nuances aren't
SQL-reproducible).

Shapes:
* :func:`domain_counts` — per-batch partial counts + one tiny groupby
  (the combiner pattern; the shuffle moves per-host partials).
* :func:`cap_per_domain` — ONE host-keyed shuffle; each group keeps its
  ``cap`` smallest doc_ids (deterministic; SQL row_number mirror). A
  pathologically hot host is bounded by the cap itself: the group
  function sorts at most the group's rows and emits at most ``cap``.
"""

from __future__ import annotations

import re

import pandas as pd

import ray.data as rd
from ray.data.aggregate import Sum

# shared verbatim with the SQL oracle (RE2/Python-compatible: no lookahead)
HOST_RE_STR = r"^[a-z][a-z0-9+.-]*://([^/?#]+)"
_HOST_RE = re.compile(HOST_RE_STR)


def host_of(url: str) -> str:
    """Host part of a url ('' when not parseable)."""
    m = _HOST_RE.match(url or "")
    return m.group(1) if m else ""


def domain_counts(ds: rd.Dataset, url_col: str = "url") -> rd.Dataset:
    """-> (host, n_pages) pages per host."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hosts = df[url_col].str.extract(HOST_RE_STR, expand=False).fillna("")
        g = (pd.DataFrame({"host": hosts})
             .groupby("host", as_index=False).size()
             .rename(columns={"size": "n_partial"}))
        return g

    agg = (ds.map_batches(partial, batch_format="pandas")
           .groupby("host").aggregate(Sum("n_partial", alias_name="n_pages")))
    return agg.map_batches(
        lambda df: df.assign(n_pages=df["n_pages"].astype("int64")),
        batch_format="pandas")


def canonicalize_urls(ds: rd.Dataset, url_col: str = "url",
                      out_col: str = "canon_url") -> rd.Dataset:
    """Append the canonical form of ``url_col`` (kernels/urlnorm.py chain,
    vectorized: one pandas str.replace pass per rule). Pure streaming map;
    the SQL oracle nests the SAME prefix rule + rule list."""
    import numpy as np

    from pero_ocr_ray.kernels.urlnorm import (
        URL_PREFIX_RE, URL_PREFIX_STR, URL_RULES,
    )
    compiled = [(re.compile(p), r) for p, r in URL_RULES]

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        u = df[url_col].fillna("")
        pref = u.str.extract(URL_PREFIX_STR, expand=False)
        rest = u.str.replace(URL_PREFIX_RE, "", regex=True)
        canon = pd.Series(
            np.where(pref.notna(), pref.str.lower().fillna("") + rest, u),
            index=df.index)
        for pat, rep in compiled:
            canon = canon.str.replace(pat, rep, regex=True)
        out = df.copy()
        out[out_col] = canon
        return out

    return ds.map_batches(fn, batch_format="pandas")


def canonical_dedup_groups(ds: rd.Dataset, url_col: str = "url",
                           id_col: str = "doc_id") -> rd.Dataset:
    """-> (canon_url, n_urls, min_id): how many raw urls collapse onto
    each canonical form, and the smallest id that carries it. Combiner
    partials (per-batch groupby) + one tiny canonical-key groupby — the
    exact-dedup shape that stays safe on a hot canonical target."""
    from ray.data.aggregate import Min, Sum

    canon = canonicalize_urls(ds, url_col=url_col)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("canon_url", as_index=False)
             .agg(n_partial=(id_col, "size"), min_partial=(id_col, "min")))
        return g

    agg = (canon.map_batches(partial, batch_format="pandas")
           .groupby("canon_url")
           .aggregate(Sum("n_partial", alias_name="n_urls"),
                      Min("min_partial", alias_name="min_id")))
    from pero_ocr_ray.util import shuffle_partitions
    return agg.repartition(shuffle_partitions()).map_batches(
        lambda df: df.assign(n_urls=df["n_urls"].astype("int64"),
                             min_id=df["min_id"].astype("int64")),
        batch_format="pandas")


def filter_blocked_urls(ds: rd.Dataset, blocked_hosts,
                        path_re: str | None = None,
                        url_col: str = "url") -> rd.Dataset:
    """Drop rows whose host is in ``blocked_hosts`` or whose url matches
    ``path_re`` — the UT1-blocklist / robots-exclusion curation step.

    The host set is broadcast ONCE via ``ray.put`` (a real blocklist is
    millions of hosts — never re-ship per batch, never shuffle-join for a
    membership test); the path rule is one compiled vectorized regex
    (ASCII classes, RE2-compatible so the SQL oracle evaluates the same
    pattern). Pure streaming filter, zero shuffles."""
    import ray

    ref = ray.put(frozenset(blocked_hosts))
    pat = re.compile(path_re) if path_re else None

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        blocked = ray.get(ref)
        hosts = df[url_col].str.extract(HOST_RE_STR, expand=False).fillna("")
        bad = hosts.isin(blocked)
        if pat is not None:
            bad |= df[url_col].str.contains(pat, regex=True, na=False)
        return df[~bad]

    return ds.map_batches(fn, batch_format="pandas")


def cap_per_domain(ds: rd.Dataset, cap: int, url_col: str = "url",
                   id_col: str = "doc_id") -> rd.Dataset:
    """Keep at most ``cap`` rows per host — the smallest ``id_col`` values
    win (deterministic; the SQL mirror is row_number() over
    (partition by host order by id) <= cap)."""
    if cap < 1:
        raise ValueError("cap must be >= 1")

    def add_host(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__host"] = (df[url_col].str.extract(HOST_RE_STR, expand=False)
                        .fillna(""))
        return df

    def keep(group: pd.DataFrame) -> pd.DataFrame:
        return (group.sort_values(id_col).head(cap)
                .drop(columns=["__host"]))

    return (ds.map_batches(add_host, batch_format="pandas")
              .groupby("__host").map_groups(keep, batch_format="pandas"))


def host_quality(scored: rd.Dataset, thr_micro: int = 0,
                 url_col: str = "url",
                 score_col: str = "clf_score") -> rd.Dataset:
    """Domain-level trust list from doc-level quality scores:
    (``url_col``, ``score_col``) rows -> (host, n_docs, sum_score,
    keep_host) with ``keep_host = 1`` iff ``sum_score >= thr_micro *
    n_docs`` (mean micro-units per doc, integer cross-multiplication —
    no float averages to drift between engines).

    The standard follow-on to a quality classifier: hosts whose average
    page quality is poor get blocklisted wholesale (cheaper and more
    robust than per-page decisions for spam farms). Scale shape is the
    ``domain_counts`` combiner: per-batch partial (host, n, sum) rows,
    then one tiny ``groupby(host)`` — the exchange moves per-host
    partials, never pages. Urls are canonicalized first so host case /
    default ports collapse (kernels/urlnorm.py chain).
    """
    canon = canonicalize_urls(scored, url_col=url_col, out_col="__cu")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hosts = df["__cu"].str.extract(HOST_RE_STR, expand=False).fillna("")
        return (pd.DataFrame({"host": hosts,
                              "s": df[score_col].astype("int64")})
                .groupby("host", as_index=False)
                .agg(n_partial=("s", "size"), s_partial=("s", "sum")))

    agg = (canon.map_batches(partial, batch_format="pandas")
           .groupby("host").aggregate(
               Sum("n_partial", alias_name="n_docs"),
               Sum("s_partial", alias_name="sum_score")))

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_docs"].astype("int64")
        s = df["sum_score"].astype("int64")
        return pd.DataFrame({
            "host": df["host"].astype(str),
            "n_docs": n,
            "sum_score": s,
            "keep_host": (s >= thr_micro * n).astype("int64"),
        })

    return agg.map_batches(finalize, batch_format="pandas")
