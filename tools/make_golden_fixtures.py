"""Sequential replays of the algorithm-defined queries -> golden fixtures.

``beam_decode_docs``, ``searchable_pdf`` and ``ivf_knn`` are deterministic
but not SQL-derivable (prefix-beam search, PDF byte layout, IVF probe
pruning). Their oracle is therefore the reference's golden-output strategy
(/root/reference/test/processing_test.sh:83-124 analog): replay each query
in ONE plain-Python process — no Ray — through the exact kernels the
distributed stages import, and write the per-row results to
``tests/golden/*.parquet``. The driver's gate then compares the
DISTRIBUTED run against this sequential ground truth via ``read_parquet``
in ``oracle_sql()``: scheduling, batching and shuffle assembly are what's
under test; kernel drift is impossible because the kernels are shared.

All fixtures are keyed by ``corpus_len = sum(length(text))`` of the sf
dir's documents table (row counts collide across sf0.001/sf0.01).

Usage: python tools/make_golden_fixtures.py [sf_dir ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

DEFAULT_SF_DIRS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                   "/root/testdata/sf0.1")
GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden")


def _corpus_len(sf_dir: str) -> int:
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["text"])
    return int(pc.sum(pc.utf8_length(docs.column("text"))).as_py())


def _with_key(tab: pa.Table, corpus_len: int) -> pa.Table:
    key = pa.array([corpus_len] * tab.num_rows, pa.int64())
    return tab.add_column(0, "corpus_len", key)


def sequential_beam(sf_dir: str) -> pa.Table:
    """One BeamDecodeStage call over the whole documents table — the same
    per-row kernel the actor pool runs, minus Ray."""
    from pero_ocr_ray.stages.beamdecode import BeamDecodeStage

    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    out = BeamDecodeStage()(docs)
    conf = out.column("confidence").to_numpy(zero_copy_only=False)
    return pa.table({
        "doc_id": out.column("doc_id"),
        "decoded_md5": pa.array(
            [hashlib.md5(x.encode("utf-8")).hexdigest()
             for x in out.column("decoded_text").to_pylist()], pa.string()),
        "conf_e6": pa.array(np.floor(conf * 1e6).astype("int64")),
        "n_lines": out.column("n_lines"),
    })


def sequential_pdf(sf_dir: str) -> pa.Table:
    """Oracle extraction -> the query's own attach/render/verify helpers
    (module-level in __ray_entry__), one process."""
    import __ray_entry__ as entrymod
    from pero_ocr_ray.oracle import extract_table
    from pero_ocr_ray.sources.pages import pages_from_documents
    from pero_ocr_ray.sources.searchable_pdf import text_to_pdf
    from pero_ocr_ray.stages.multimodal import IMG_MAGIC

    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    tab = extract_table(pages_from_documents(docs, "simple"))
    tab = entrymod._pdf_attach_image(
        tab.select(["url", "extracted_text"]))
    pdfs = [text_to_pdf(x or "", page_image=img,
                        invisible=img is not None and img[:7] == IMG_MAGIC)
            for x, img in zip(tab.column("extracted_text").to_pylist(),
                              tab.column("page_image").to_pylist())]
    rendered = pa.table({"url": tab.column("url"),
                         "pdf": pa.array(pdfs, pa.binary())})
    return entrymod._pdf_verify(rendered)


def sequential_ivf(sf_dir: str) -> pa.Table:
    """Single-pass IVF scan with the shared quantizer/normalize helpers:
    equals the distributed per-batch-top-k + merge because the candidate
    cut uses the total order (sim desc, neighbor_id asc) on both paths."""
    from pero_ocr_ray.functions.similarity import (
        _as_matrix, _kmeans, _normalize,
    )

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    vec_ids = emb.column("vec_id").to_numpy(zero_copy_only=False).astype(
        np.int64)
    x = _normalize(_as_matrix(emb.column("embedding").to_pylist()))
    order = np.argsort(vec_ids)
    q_pos = order[np.isin(vec_ids[order], np.arange(5))]
    q_pos = q_pos[np.argsort(vec_ids[q_pos])]
    qn, qids = x[q_pos], vec_ids[q_pos]

    # the query trains on ds.limit(2048) = file order, same as here
    sample = _as_matrix(emb.column("embedding").to_pylist()[:2048])
    centroids = _normalize(_kmeans(sample, 8))
    probe = np.argsort(-(qn @ centroids.T), axis=1)[:, :4]
    lists = np.argmax(x @ centroids.T, axis=1)

    out = {"query_id": [], "neighbor_id": [], "rank": []}
    for qi in range(qn.shape[0]):
        mask = np.isin(lists, probe[qi]) & (vec_ids != qids[qi])
        idx = np.nonzero(mask)[0]
        if len(idx) == 0:
            continue
        col = x[idx] @ qn[qi]
        part = np.lexsort((vec_ids[idx], -col))[:10]
        out["query_id"].extend([int(qids[qi])] * len(part))
        out["neighbor_id"].extend(vec_ids[idx[part]].tolist())
        out["rank"].extend(range(1, len(part) + 1))
    return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})


def _load_embeddings(sf_dir: str):
    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = emb.column("vec_id").to_numpy(zero_copy_only=False).astype(
        np.int64)
    x = np.stack([np.asarray(e, dtype=np.float64)
                  for e in emb.column("embedding").to_pylist()])
    return ids, x


def sequential_kmeans(sf_dir: str) -> pa.Table:
    """Exact int64 k-means (kernels/kmeans.py), one process: identical to
    the distributed run because every quantity is integer arithmetic."""
    from pero_ocr_ray.kernels import kmeans as K

    ids, x = _load_embeddings(sf_dir)
    xq = K.quantize(x)
    cq = K.kmeans_fit_q(xq, ids, k=8, iters=4)
    labels, dist2 = K.assign_q(xq, cq)
    return pa.table({"vec_id": pa.array(ids, pa.int64()),
                     "cluster_id": pa.array(labels, pa.int64()),
                     "dist2_q": pa.array(dist2, pa.int64())})


def sequential_semdedup(sf_dir: str, max_cluster: int = 4096,
                        threshold_e6: int = 950_000) -> pa.Table:
    """SemDeDup replay: same centroids, same greedy per-cluster kernel,
    same smallest-ids cap (mirrors functions/clustering.py)."""
    from pero_ocr_ray.kernels import kmeans as K

    ids, x = _load_embeddings(sf_dir)
    xq = K.quantize(x)
    cq = K.kmeans_fit_q(xq, ids, k=8, iters=4)
    labels, _ = K.assign_q(xq, cq)

    cols = {"vec_id": [], "cluster_id": [], "kept": [],
            "dropped_by": [], "capped": []}
    for j in sorted(set(labels.tolist())):
        pos = np.nonzero(labels == j)[0]
        pos = pos[np.argsort(ids[pos], kind="stable")]
        head, tail = pos[:max_cluster], pos[max_cluster:]
        kept, dropped_by = K.semdedup_group(ids[head], xq[head],
                                            threshold_e6)
        cols["vec_id"].extend(ids[head].tolist() + ids[tail].tolist())
        cols["cluster_id"].extend([j] * len(pos))
        cols["kept"].extend(kept.tolist() + [True] * len(tail))
        cols["dropped_by"].extend(dropped_by.tolist() + [-1] * len(tail))
        cols["capped"].extend([False] * len(head) + [True] * len(tail))
    return pa.table({
        "vec_id": pa.array(cols["vec_id"], pa.int64()),
        "cluster_id": pa.array(cols["cluster_id"], pa.int64()),
        "kept": pa.array(cols["kept"], pa.bool_()),
        "dropped_by": pa.array(cols["dropped_by"], pa.int64()),
        "capped": pa.array(cols["capped"], pa.bool_()),
    })


FIXTURES = {
    "beam_oracle.parquet": sequential_beam,
    "pdf_oracle.parquet": sequential_pdf,
    "ivf_oracle.parquet": sequential_ivf,
    "kmeans_oracle.parquet": sequential_kmeans,
    "semdedup_oracle.parquet": sequential_semdedup,
}


def main() -> None:
    global FIXTURES
    args = sys.argv[1:]
    if args and args[0] == "--only":          # --only kmeans,semdedup
        wanted = set(args[1].split(","))
        FIXTURES = {f: fn for f, fn in FIXTURES.items()
                    if f.split("_oracle")[0] in wanted}
        args = args[2:]
    sf_dirs = args or list(DEFAULT_SF_DIRS)
    keys = [_corpus_len(d) for d in sf_dirs]
    if len(set(keys)) != len(keys):
        raise SystemExit(f"corpus_len collision across sf dirs: {keys}")
    for fname, fn in FIXTURES.items():
        parts = [_with_key(fn(d), k) for d, k in zip(sf_dirs, keys)]
        tab = pa.concat_tables(parts)
        out = os.path.join(GOLDEN_DIR, fname)
        pq.write_table(tab, out)
        print(f"wrote {tab.num_rows} rows -> {out}")


if __name__ == "__main__":
    main()
