"""WARC source: read Common-Crawl-style WARC files into the pages schema.

The engine's parquet `pages` table is the canonical input (BASELINE.json
input_hint), but crawl data is born as WARC; this source closes the loop:

    ds = read_warc(["crawl-*.warc.gz"])   # -> url, warc_ts, html, lang, row_id

Pure-stdlib WARC/1.0 parser (headers + Content-Length framing, HTTP response
payload split, gzip multi-member transparently via ``gzip``), shaped as
``read_binary_files`` + a ``flat_map``-style ``map_batches`` — one task per
WARC file, the natural shard unit (S1 analog: the reference's folder reader,
/root/reference/user_scripts/parse_folder.py:297-303).

Limitation (documented): a WARC file is materialized per task; standard
crawl shards (~1 GB) fit worker heaps comfortably. Malformed records are
skipped, never fatal.
"""

from __future__ import annotations

import datetime
import gzip
import io
import os

import pyarrow as pa

import ray.data as rd

_CRLF = b"\r\n"


def _split_headers(block: bytes) -> dict[bytes, bytes]:
    headers: dict[bytes, bytes] = {}
    for line in block.split(_CRLF):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower()] = v.strip()
    return headers


def parse_warc_bytes(data: bytes) -> list[dict]:
    """Parse (possibly gzipped, possibly multi-member) WARC bytes ->
    list of {url, warc_ts, html} dicts for ``response`` records."""
    if data[:2] == b"\x1f\x8b":
        with gzip.GzipFile(fileobj=io.BytesIO(data)) as fh:
            data = fh.read()
    records: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/1.", pos)
        if start < 0:
            break
        head_end = data.find(_CRLF + _CRLF, start)
        if head_end < 0:
            break
        headers = _split_headers(data[start:head_end])
        try:
            length = int(headers.get(b"content-length", b"-1"))
        except ValueError:
            length = -1
        body_start = head_end + 4
        if length < 0 or body_start + length > n:
            pos = body_start
            continue
        body = data[body_start:body_start + length]
        pos = body_start + length
        if headers.get(b"warc-type") != b"response":
            continue
        url = headers.get(b"warc-target-uri", b"").decode("utf-8", "replace")
        ts_raw = headers.get(b"warc-date", b"").decode("ascii", "replace")
        try:
            ts = datetime.datetime.fromisoformat(ts_raw.replace("Z", "+00:00"))
            ts = ts.replace(tzinfo=None)
        except ValueError:
            ts = None
        # the body is an HTTP response: strip its status line + headers
        http_end = body.find(_CRLF + _CRLF)
        payload = body[http_end + 4:] if http_end >= 0 else body
        records.append({"url": url, "warc_ts": ts, "html": payload})
    return records


def read_warc(paths: list[str] | str, lang: str = "") -> rd.Dataset:
    """WARC file(s) -> pages Dataset (url, warc_ts, html, lang, row_id).

    ``row_id`` is ``file_index * 10**9 + record_index`` — stable lineage per
    (shard, record) like the reference's file-id scheme."""
    if isinstance(paths, str):
        paths = [paths]

    def _norm(p: str) -> str:
        # Ray may hand back scheme-stripped / normalized paths; normalize
        # both sides so the shard-order lookup can't silently miss (a miss
        # defaulting to 0 would collide row_id across WARC shards).
        if "://" in p:
            p = p.split("://", 1)[1]
        return os.path.normpath(os.path.abspath(p))

    files = rd.read_binary_files(sorted(paths), include_paths=True)
    order = {_norm(p): i for i, p in enumerate(sorted(paths))}

    def explode(batch: pa.Table) -> pa.Table:
        urls, tss, htmls, langs, rids = [], [], [], [], []
        for path, data in zip(batch.column("path").to_pylist(),
                              batch.column("bytes").to_pylist()):
            idx = order.get(_norm(path))
            if idx is None:
                raise ValueError(
                    f"WARC shard path {path!r} not in the input list — "
                    "row_id lineage would be ambiguous")
            base = idx * 1_000_000_000
            for j, rec in enumerate(parse_warc_bytes(data)):
                urls.append(rec["url"])
                tss.append(rec["warc_ts"])
                htmls.append(rec["html"])
                langs.append(lang)
                rids.append(base + j)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "lang": pa.array(langs, pa.string()),
            "row_id": pa.array(rids, pa.int64()),
        })

    return files.map_batches(explode, batch_format="pyarrow", batch_size=1)


def make_warc(records: list[tuple[str, str, bytes]], compress: bool = False) -> bytes:
    """Build a WARC file from (url, iso_ts, html_bytes) triples (tests)."""
    out = io.BytesIO()
    for url, ts, html in records:
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html)
        head = (f"WARC/1.0\r\nWARC-Type: response\r\n"
                f"WARC-Target-URI: {url}\r\nWARC-Date: {ts}\r\n"
                f"Content-Length: {len(http)}\r\n\r\n").encode()
        out.write(head + http + _CRLF + _CRLF)
    data = out.getvalue()
    return gzip.compress(data) if compress else data
