"""The flagship pipeline: pages → extracted (url, text, spans, lang).

Distributed form of ``read-image-fn``
(/root/reference/src/clj/ocr_lib/core.clj:1772-1806), Ray-Data-first:

    read_parquet (column-pruned)
      → map_batches(synthesize_pages)          # fixture source stage
      → map_batches(add_partition_meta)        # url-hash partition id + size
      → [skew route on html_len]               # band-split analog
      → map_batches(ExtractDocuments, actor pool)  # the kernel
      → union → write/groupby-manifest sink

No stage materializes the dataset; the only all-to-all exchange is the
optional per-partition manifest groupby in :func:`run_extract_job`
(SURVEY.md §7.3).  See :func:`extract_pipeline` for the measured
compute-strategy decisions (tasks vs actor pool, opt-in skew routing).
"""

from __future__ import annotations

import os

import ray.data as rd

from ..config import DEFAULT_CONFIG, ExtractConfig
from ..sources.pages import synthesize_pages_batch
from ..stages.extract_stage import (
    ExtractDocuments,
    RoutedExtractDocuments,
    extract_batch,
    routed_extract_batch,
)
from ..stages.manifest import (
    completed_partitions,
    make_partition_writer,
    make_resume_filter,
)
from ..stages.partition import add_partition_meta, drop_columns


def build_pages_dataset(sf_dir: str, repeat: int = 1) -> rd.Dataset:
    """documents.parquet → pages Dataset (columns pruned at the read)."""
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    )
    return docs.map_batches(
        lambda b: synthesize_pages_batch(b, repeat),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _pool_size(cfg: ExtractConfig) -> tuple:
    """Actor pool bounds: explicit from config, else (1, cluster CPUs) —
    the extraction stage is the dominant compute (the reference's 46%+36%
    phase split, core.clj:153-164) and should be able to own the node."""
    if cfg.concurrency is not None:
        return cfg.concurrency
    from ..pool import autoscale_pool

    return autoscale_pool()


def extract_pipeline(
    pages: rd.Dataset,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    skew_route: bool = False,
    bundle_ref=None,
) -> rd.Dataset:
    """pages Dataset → extracted Dataset (lazy, streaming).

    Compute strategy (measured on the sf0.1 bench, 100k pages, 32 CPUs):

    * default — STATELESS TASKS (47k docs/s).  The stage's state is a
      frozen config + module-level compiled regexes; per the Ray Data
      rule "plain function → stateless tasks", tasks fuse with the read
      and scale elastically.  An actor pool for the same stage measured
      ~15k docs/s (dispatch + ramp-up overhead) — actors are reserved
      for the case that actually has heavy state:
    * ``bundle_ref`` set — ACTOR POOL: the classifier bundle (the
      ``signs`` template-store analog) is fetched once per actor in
      ``__init__`` and shared across batches.
    * ``skew_route=True`` — SINGLE-PASS in-task routing on
      ``len(html)``: each batch splits into bulk rows (vectorized
      extract) and giant rows (sequential, one kernel call per row, so
      per-task peak memory is bounded by ONE giant parse).  The source
      is read exactly once (round 4; the old dual-filter path paid a
      second pruned read).  Independent of routing, the kernel parses
      any page above ``giant_threshold`` in bounded chunk passes, and
      ``batch_size`` bounds co-resident rows — routing only narrows
      tail latency.
    """
    import functools

    ds = pages.map_batches(
        lambda b: add_partition_meta(b, cfg.num_partitions),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if bundle_ref is not None:
        extract_kw: dict = dict(
            fn=ExtractDocuments,
            fn_constructor_args=(cfg, bundle_ref),
            concurrency=_pool_size(cfg),
        )
    else:
        extract_kw = dict(fn=functools.partial(extract_batch, cfg=cfg))
    if skew_route:
        # SINGLE-PASS routing (round 4): one stage splits each batch
        # in-task on html_len — bulk rows extract vectorized, giant
        # rows parse sequentially (memory bounded by ONE giant parse
        # per task).  The old dual path paid a second full pass over
        # the (pruned) source for the giant filter; a bundle reaches
        # both routes by construction here (one instance).
        if bundle_ref is not None:
            return ds.map_batches(
                RoutedExtractDocuments,
                fn_constructor_args=(cfg, bundle_ref),
                concurrency=_pool_size(cfg),
                batch_format="pyarrow",
                batch_size=cfg.bulk_batch_size,
            )
        return ds.map_batches(
            functools.partial(routed_extract_batch, cfg=cfg),
            batch_format="pyarrow",
            batch_size=cfg.bulk_batch_size,
        )
    return ds.map_batches(
        batch_format="pyarrow",
        batch_size=cfg.bulk_batch_size,
        **extract_kw,
    )


def write_with_manifest(extracted: rd.Dataset, out_dir: str, resume: bool = True) -> dict:
    """Sink: per-partition atomic parquet + lineage manifest rows; with
    ``resume`` the already-completed partitions are filtered out BEFORE
    extraction work is scheduled (anti-join against the manifest).

    Returns ``{"partitions_written": n, "partitions_skipped": k}``.
    """
    skipped = 0
    if resume:
        done = completed_partitions(out_dir)
        skipped = len(done)
        if done:
            extracted = extracted.map_batches(
                make_resume_filter(done), batch_format="pyarrow"
            )
    manifest = extracted.groupby("partition_id").map_groups(
        make_partition_writer(out_dir), batch_format="pyarrow"
    )
    rows = manifest.count()  # consume → executes the streaming pipeline
    return {"partitions_written": rows, "partitions_skipped": skipped}


def write_partitioned(extracted: rd.Dataset, out_dir: str, resume: bool = True) -> dict:
    """Zero-shuffle streaming sink: ``write_parquet(partition_cols=
    ["partition_id"])`` — every task appends its rows straight into the
    hive-style partition dirs, NO all-to-all on the data.  Manifests are
    built post-hoc from the parquet footers (row counts from metadata —
    no data re-read; checksums via :func:`...manifest.validate_job` when
    an audit is wanted).

    Tradeoff vs :func:`write_with_manifest` (the groupby sink): that one
    gives per-partition ATOMIC completion (resume granularity =
    partition) but materializes each partition in one task — size
    ``num_partitions`` so a partition fits a worker (~total_bytes /
    512 MB).  This one streams with bounded memory at any scale but a
    mid-job crash leaves partially-written partition dirs and no
    manifests — resume granularity is the whole job.  It also writes
    one file per (task, partition) — many smaller files (measured 4096
    files for 1M rows at 256 tasks × 16 partitions vs the groupby
    sink's 16) — compact with a follow-up per-partition rewrite if the
    consumer needs few files.  Pick per job shape; both are tested.
    """
    import pyarrow.parquet as pqt

    from ..stages.manifest import MANIFEST_SCHEMA

    import shutil

    data_dir = os.path.join(out_dir, "data")
    if resume:
        done = completed_partitions(out_dir)
        if done:
            extracted = extracted.map_batches(
                make_resume_filter(done), batch_format="pyarrow"
            )
        if os.path.isdir(data_dir):
            # restart semantics: any partition dir WITHOUT a manifest row
            # is a partial write from a crashed run — re-running would
            # APPEND duplicate files into it, so wipe those dirs first.
            for d in os.listdir(data_dir):
                if d.startswith("partition_id="):
                    pid = int(d.split("=")[1])
                    if pid not in done:
                        shutil.rmtree(os.path.join(data_dir, d), ignore_errors=True)
    else:
        # full rewrite: every partition is re-emitted, so EVERY existing
        # dir (and the stale manifests) must go — write_parquet appends,
        # and keeping old files would silently double completed
        # partitions' rows.
        shutil.rmtree(data_dir, ignore_errors=True)
        shutil.rmtree(os.path.join(out_dir, "manifest"), ignore_errors=True)
    extracted.write_parquet(data_dir, partition_cols=["partition_id"])
    # post-hoc manifests from footers
    man_dir = os.path.join(out_dir, "manifest")
    os.makedirs(man_dir, exist_ok=True)
    written = 0
    for d in sorted(os.listdir(data_dir)):
        if not d.startswith("partition_id="):
            continue
        pid = int(d.split("=")[1])
        n_docs = 0
        n_bytes = 0
        for f in os.listdir(os.path.join(data_dir, d)):
            if not f.endswith(".parquet"):
                continue
            fp = os.path.join(data_dir, d, f)
            meta = pqt.ParquetFile(fp).metadata
            n_docs += meta.num_rows
            n_bytes += os.path.getsize(fp)
        import pyarrow as pa

        row = pa.Table.from_arrays(
            [
                pa.array([pid], pa.int32()),
                pa.array([n_docs], pa.int64()),
                pa.array([n_bytes], pa.int64()),
                pa.array([0], pa.uint64()),  # checksum deferred to validate_job
                pa.array(["ok"], pa.string()),
                pa.array([os.path.join(data_dir, d)], pa.string()),
                pa.array([0.0], pa.float64()),
            ],
            schema=MANIFEST_SCHEMA,
        )
        mtmp = os.path.join(man_dir, f"part-{pid}.parquet.tmp")
        pqt.write_table(row, mtmp)
        os.replace(mtmp, os.path.join(man_dir, f"part-{pid}.parquet"))
        written += 1
    return {"partitions_written": written, "partitions_skipped": 0}


def run_extract_job(
    sf_dir: str,
    out_dir: str,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    repeat: int = 1,
    resume: bool = True,
) -> dict:
    """Fixture-input convenience wrapper over :func:`write_with_manifest`."""
    pages = build_pages_dataset(sf_dir, repeat)
    return write_with_manifest(extract_pipeline(pages, cfg), out_dir, resume=resume)
