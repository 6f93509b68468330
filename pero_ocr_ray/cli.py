"""Command-line entry point (parse-folder analog, ray-job-submit target).

Mirrors the reference's primary CLI
(/root/reference/user_scripts/parse_folder.py): point it at input parquet,
get a resumable extraction job with per-partition manifests.

    python -m pero_ocr_ray.cli extract --input DIR --output DIR \
        [--num-cpus N] [--mode fused|staged] [--dedup] [--batch-size B]
    python -m pero_ocr_ray.cli merge  --inputs A B C --output DIR
    python -m pero_ocr_ray.cli compare --hyp DIR --ref DIR
    python -m pero_ocr_ray.cli export --input DIR --output DIR \
        --format pagexml|alto|pdf [--aligned-confidences]
    python -m pero_ocr_ray.cli select-config --input PAGES.parquet \
        [--candidates sweep.json]

(the reference's four console scripts — parse-folder, merge-ocr-results,
compare-page-xml-texts, select-embed-id — map to extract / merge /
compare / select-config; export covers its XML/ALTO/PDF output writers)

On a real cluster the same file is the job entrypoint:
    ray job submit --working-dir . -- python -m pero_ocr_ray.cli extract ...
(then ``ray.init(address="auto")`` picks up the cluster; here we run local.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys


_OWNS_RAY = False


def _ray_up(num_cpus: int | None):
    """Start Ray if no session exists; remember ownership so ``main`` only
    shuts down sessions it started (an embedding caller — tests, a driver —
    keeps its session)."""
    global _OWNS_RAY
    import ray
    if ray.is_initialized():
        return
    kwargs = {"address": "local", "include_dashboard": False,
              "logging_level": "ERROR"}
    if num_cpus:
        kwargs["num_cpus"] = num_cpus
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.environ["PYTHONPATH"] = repo + os.pathsep + os.environ.get("PYTHONPATH", "")
    ray.init(**kwargs)
    _OWNS_RAY = True
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False


def cmd_extract(args) -> int:
    _ray_up(args.num_cpus)
    from pero_ocr_ray.kernels.config import ExtractConfig
    from pero_ocr_ray.pipelines.extract import run_job
    cfg = ExtractConfig(parse_batch_size=args.batch_size,
                        dedup_urls=args.dedup)
    stats = run_job(args.input, args.output, cfg, mode=args.mode,
                    concurrency=args.concurrency)
    print(json.dumps(stats))
    return 0


def cmd_merge(args) -> int:
    _ray_up(args.num_cpus)
    import ray.data as rd
    from pero_ocr_ray.pipelines.extract import read_job_output
    from pero_ocr_ray.pipelines.merge import merge_results
    runs = [read_job_output(p) if os.path.isdir(os.path.join(p, "_manifest"))
            else rd.read_parquet(p) for p in args.inputs]
    merged = merge_results([r.select_columns(["url", "extracted_text"])
                            for r in runs])
    merged.write_parquet(args.output)
    # count from the written files — re-consuming the lazy Dataset would
    # re-execute the whole union+groupby merge a second time
    import pyarrow.parquet as pq
    n = sum(pq.read_metadata(os.path.join(args.output, f)).num_rows
            for f in os.listdir(args.output) if f.endswith(".parquet"))
    print(json.dumps({"rows": n}))
    return 0


def cmd_compare(args) -> int:
    _ray_up(args.num_cpus)
    import ray.data as rd
    from pero_ocr_ray.functions.quality import compare_extractions
    from pero_ocr_ray.pipelines.extract import read_job_output

    def load(p):
        if os.path.isdir(os.path.join(p, "_manifest")):
            return read_job_output(p)
        return rd.read_parquet(p)

    stats = compare_extractions(load(args.hyp), load(args.ref))
    if args.confusions:
        from pero_ocr_ray.functions.quality import confusion_counts
        from pero_ocr_ray.util import dataset_to_table
        top = dataset_to_table(confusion_counts(load(args.hyp), load(args.ref),
                                                top_k=args.confusions))
        stats["top_confusions"] = top.to_pylist()
    print(json.dumps(stats))
    return 0


def cmd_export(args) -> int:
    """Export a pages corpus to PAGE-XML / ALTO / searchable-PDF files
    (the parse_folder output-writer surface: --output-xml-path /
    --output-alto-path / searchable PDF, recast as Ray sinks)."""
    _ray_up(args.num_cpus)
    import ray.data as rd
    from pero_ocr_ray.kernels.config import DEFAULT_CONFIG
    from pero_ocr_ray.pipelines.registry import build_from_spec
    from pero_ocr_ray.util import dataset_to_table

    ds = rd.read_parquet(args.input)
    stats = {}
    if args.format in ("pagexml", "alto"):
        if args.format == "pagexml":
            stage = "to_pagexml"
        else:
            stage = ("to_alto_aligned" if getattr(args, "aligned_confidences",
                                                  False) else "to_alto")
        spec = [{"stage": "decode"}, {"stage": "parse"}, {"stage": "segment"},
                {"stage": "classify", "concurrency": args.concurrency or 2},
                {"stage": "order"}, {"stage": stage}]
        with_xml = build_from_spec(ds, spec, DEFAULT_CONFIG)
        from pero_ocr_ray.sources.pagexml import write_xml_files
        column = "pagexml" if args.format == "pagexml" else "alto"
        manifest = write_xml_files(with_xml, args.output, column=column)
        stats["files"] = dataset_to_table(manifest).num_rows
    else:  # pdf
        from pero_ocr_ray.pipelines.extract import extract_pipeline
        from pero_ocr_ray.sources.searchable_pdf import (
            searchable_pdf, write_pdf_files,
        )
        out = extract_pipeline(ds, DEFAULT_CONFIG,
                               concurrency=args.concurrency)
        manifest = write_pdf_files(
            searchable_pdf(out, invisible=args.invisible), args.output)
        stats["files"] = dataset_to_table(manifest).num_rows
    print(json.dumps(stats))
    return 0


def cmd_select_config(args) -> int:
    """select-embed-id analog: sweep candidate extraction configs against a
    ground-truth sample and report per-candidate CER + the argmin. The
    pages parquet's ``text`` column is the ground truth (canonicalized)."""
    _ray_up(args.num_cpus)
    import pyarrow.parquet as pq
    import ray.data as rd
    from pero_ocr_ray.functions.select_config import select_best_config
    from pero_ocr_ray.kernels.config import ExtractConfig

    if args.candidates:
        with open(args.candidates) as fh:
            cand = [ExtractConfig(**d) for d in json.load(fh)]
    else:  # default sweep around the shipped config
        cand = [ExtractConfig(),
                ExtractConfig(score_threshold=-5.0),
                ExtractConfig(link_weight=2.0),
                ExtractConfig(boiler_penalty=1.0),
                ExtractConfig(page_min_chars=10_000)]
    paths = args.input
    if os.path.isdir(paths):
        paths = sorted(os.path.join(paths, f) for f in os.listdir(paths)
                       if f.endswith(".parquet"))
    # ground truth: only the url/text columns of the FIRST --sample rows
    # ever reach the driver (select_best_config samples via limit(N) in
    # the same read order); the pages dataset itself stays lazy so html
    # payloads are never materialized driver-side
    head = pq.read_table(paths, columns=["url", "text"]).slice(0, args.sample)
    gt = {u: " ".join((t or "").split())
          for u, t in zip(head.column("url").to_pylist(),
                          head.column("text").to_pylist())}
    out = select_best_config(rd.read_parquet(paths), gt, cand,
                             n_clusters=args.clusters,
                             sample_n=args.sample,
                             concurrency=args.concurrency or 2)
    print(json.dumps(out))
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="pero_ocr_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    ex = sub.add_parser("extract", help="resumable extraction job")
    ex.add_argument("--input", required=True, help="parquet file or dir")
    ex.add_argument("--output", required=True)
    ex.add_argument("--mode", default="fused", choices=["fused", "staged"])
    ex.add_argument("--batch-size", type=int, default=64)
    ex.add_argument("--concurrency", type=int, default=None)
    ex.add_argument("--num-cpus", type=int, default=None)
    ex.add_argument("--dedup", action="store_true",
                    help="dedup urls (keep latest warc_ts) before extraction")
    ex.set_defaults(fn=cmd_extract)

    mg = sub.add_parser("merge", help="N-way merge of extraction runs")
    mg.add_argument("--inputs", nargs="+", required=True)
    mg.add_argument("--output", required=True)
    mg.add_argument("--num-cpus", type=int, default=None)
    mg.set_defaults(fn=cmd_merge)

    cp = sub.add_parser("compare", help="corpus CER/WER between two runs")
    cp.add_argument("--hyp", required=True)
    cp.add_argument("--ref", required=True)
    cp.add_argument("--num-cpus", type=int, default=None)
    cp.add_argument("--confusions", type=int, default=0,
                    help="also report the top-N character confusions")
    cp.set_defaults(fn=cmd_compare)

    xp = sub.add_parser("export", help="export PAGE-XML / ALTO / PDF files")
    xp.add_argument("--input", required=True, help="pages parquet file/dir")
    xp.add_argument("--output", required=True, help="output file directory")
    xp.add_argument("--format", default="pagexml",
                    choices=["pagexml", "alto", "pdf"])
    xp.add_argument("--invisible", action="store_true",
                    help="pdf: invisible text layer (searchable overlay)")
    xp.add_argument("--concurrency", type=int, default=None)
    xp.add_argument("--num-cpus", type=int, default=None)
    xp.add_argument("--aligned-confidences", action="store_true",
                    help="alto: WC word confidences from CTC Viterbi "
                         "forced alignment instead of block scores")
    xp.set_defaults(fn=cmd_export)

    sc = sub.add_parser("select-config",
                        help="sweep extraction configs vs ground truth "
                             "(select-embed-id analog)")
    sc.add_argument("--input", required=True,
                    help="pages parquet with a text ground-truth column")
    sc.add_argument("--candidates", default=None,
                    help="JSON file: list of ExtractConfig override dicts "
                         "(default: built-in sweep)")
    sc.add_argument("--clusters", type=int, default=3)
    sc.add_argument("--sample", type=int, default=100)
    sc.add_argument("--concurrency", type=int, default=None)
    sc.add_argument("--num-cpus", type=int, default=None)
    sc.set_defaults(fn=cmd_select_config)

    args = ap.parse_args(argv)
    try:
        return args.fn(args)
    finally:
        import ray
        if _OWNS_RAY and ray.is_initialized():
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
