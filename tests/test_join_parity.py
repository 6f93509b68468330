"""32-CPU join-partitioning parity gate.

Round-4 lesson: the driver gate runs at 32 CPUs while the local gate ran at
8, and native-join partition count scales with CPUs — ``doc_tfidf_topk``
passed at 8 and aborted at 32 (hash-shuffle schema-broadcast bug, see
pero_ocr_ray/rayfix.py). This test runs every query whose lineage contains a
native ``Dataset.join`` through the real correctness gate in a FRESH
32-CPU Ray session (subprocess — the in-process pytest session is 4 CPUs and
must stay that way), exactly replicating the driver's configuration.

Runs at sf0.001: the smallest input is the sparsest — more empty blocks per
side, the regime where the round-4 failure class lives.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# every queries() entry whose lineage includes hash_join / Dataset.join
NATIVE_JOIN_QUERIES = [
    "doc_tfidf_topk",          # tf x df join on an aggregate output
    "q3_top_orders",           # two chained joins, sparse filtered sides
    "orders_per_segment",
    "training_corpus_v2",      # left_anti drop join
    "training_corpus_v3",      # dedup + lang joins on join/agg outputs
    "training_corpus_v4",      # semi-join on sentinel keep set
    "near_dup_clusters",       # iterated label-propagation joins
    "jaccard_near_dup_pairs",  # join output fed into a second join
    "inverted_index",
    "index_search",
    "paragraph_dedup_docs",    # left_outer join on aggregate output
    "duplicate_paragraphs",
]


def test_native_join_queries_match_at_32_cpus():
    env = dict(os.environ, CHECK_CPUS="32", PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_queries.py"),
         "/root/testdata/sf0.001", *NATIVE_JOIN_QUERIES],
        capture_output=True, text=True, timeout=1200, env=env, cwd=REPO,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, f"32-CPU parity gate failed:\n{out[-4000:]}"
    # belt-and-braces: every query must have been individually verified
    for q in NATIVE_JOIN_QUERIES:
        assert f"ok   {q}: " in proc.stdout, f"{q} missing from gate output:\n{out[-4000:]}"
