"""Crawl snapshot diff: all four status classes, sequential replay."""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from pero_ocr_ray.functions.crawldiff import diff_counts, snapshot_diff


def _ds(rows: list[tuple[str, str]]) -> rd.Dataset:
    t = pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    return rd.from_arrow(t).repartition(3)


def test_snapshot_diff_all_classes():
    old = _ds([("u/keep", "same"), ("u/edit", "v1"), ("u/gone", "bye"),
               ("u/empty", "")])
    new = _ds([("u/keep", "same"), ("u/edit", "v2"), ("u/new", "hi"),
               ("u/empty", "")])
    got = {r["url"]: r["status"]
           for r in snapshot_diff(old, new, num_buckets=4).take_all()}
    assert got == {
        "u/keep": "unchanged", "u/empty": "unchanged",
        "u/edit": "changed", "u/gone": "removed", "u/new": "added",
    }


def test_diff_counts_rollup():
    old = _ds([(f"u/{i}", f"t{i}") for i in range(30)])
    new = _ds([(f"u/{i}", f"t{i}" if i % 3 else "bumped")
               for i in range(10, 40)])
    diff = snapshot_diff(old, new, num_buckets=8)
    got = {r["status"]: r["n_urls"]
           for r in diff_counts(diff).take_all()}
    # urls 0-9 removed; 30-39 added; of 10-29 those %3==0 changed
    n_changed = sum(1 for i in range(10, 30) if i % 3 == 0)
    assert got == {"removed": 10, "added": 10, "changed": n_changed,
                   "unchanged": 20 - n_changed}


def test_empty_new_snapshot_marks_all_removed():
    old = _ds([("u/a", "x"), ("u/b", "y")])
    new = _ds([("u/a", "x")]).filter(lambda r: False)
    got = {r["url"]: r["status"]
           for r in snapshot_diff(old, new, num_buckets=4).take_all()}
    assert got == {"u/a": "removed", "u/b": "removed"}
