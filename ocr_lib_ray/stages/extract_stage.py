"""Ray Data stages wrapping the per-document kernel (Arrow in / Arrow out).

The distributed form of the reference's thread fan-out
(``read-unknown-signs-tasks-fn`` + ``pcalls``,
/root/reference/src/clj/ocr_lib/core.clj:1460-1514): Ray Data schedules
batches across the cluster instead of bands across threads, and because
the kernel is a pure per-document function, output is byte-identical at
any parallelism — the property the reference needs its band-merge algebra
for.

``ExtractDocuments`` is a callable CLASS → actor pool: configuration and
compiled state are built ONCE per actor in ``__init__`` (fixing the
reference's per-call template reload, core.clj:1792-1796), batches flow
through ``__call__``.
"""

from __future__ import annotations

import pyarrow as pa

from ..config import DEFAULT_CONFIG, ExtractConfig
from ..kernel.extract import extract_document

SPAN_TYPE = pa.list_(
    pa.struct(
        [
            ("start", pa.int64()),
            ("end", pa.int64()),
            ("block_id", pa.int32()),
            ("kind", pa.string()),
        ]
    )
)

EXTRACT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("text", pa.string()),
        ("title", pa.string()),
        ("spans", SPAN_TYPE),
        ("lang", pa.string()),
        ("doc_kind", pa.string()),
        ("residuals", pa.list_(pa.int32())),
        ("residual_texts", pa.list_(pa.string())),  # empty unless cfg.keep_residual_texts
        ("partition_id", pa.int32()),
    ]
)


class ExtractDocuments:
    """Actor-pool stage: pages batch → extraction batch.

    State (config + the classifier bundle analog of the ``signs``
    template store, core.clj:1782) is bound once per actor.  An optional
    ``bundle_ref`` (a ``ray.put`` object ref) is resolved here so big
    classifier resources ship once per actor, not once per batch.
    """

    def __init__(self, cfg: ExtractConfig = DEFAULT_CONFIG, bundle_ref=None):
        from ..kernel.tokenizer import DEFAULT_TAGS, TagConfig

        self.cfg = cfg
        self.tags = DEFAULT_TAGS
        if bundle_ref is not None:
            import ray

            self.bundle = ray.get(bundle_ref)
            # the bundle's tag-class tables re-teach the tokenizer/classifier
            # (the signs-map extension surface), built once per actor
            if getattr(self.bundle, "boilerplate_tags", None) is not None:
                extra = getattr(self.bundle, "extra_entities", None)
                entities = None
                if extra:
                    from ..kernel.tokenizer import _NAMED_ENTITIES

                    entities = {**_NAMED_ENTITIES, **extra}
                self.tags = TagConfig(
                    block=getattr(self.bundle, "block_tags", None),
                    boiler=self.bundle.boilerplate_tags,
                    heading=getattr(self.bundle, "heading_tags", None),
                    entities=entities,
                )
            # threshold overrides (the caller-threaded matching-value
            # analog): the bundle can re-teach min_words / link-density /
            # residual_cap pipeline-wide, once per actor
            if hasattr(self.bundle, "apply_to"):
                self.cfg = self.bundle.apply_to(cfg)
        else:
            self.bundle = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        return extract_batch(batch, self.cfg, self.tags)


class RoutedExtractDocuments(ExtractDocuments):
    """Single-pass skew routing (round 4, replacing the dual-read
    two-filter path): each batch is split IN-TASK on ``html_len`` —
    bulk rows extract vectorized in one kernel call, giant rows
    (``html_len >= cfg.giant_threshold``) parse SEQUENTIALLY one row
    per call, so per-task peak memory is bounded by ONE giant parse
    plus the bulk sub-batch.  The source is read exactly once; a
    re-taught bundle reaches both routes by construction (one
    instance).  Concurrent giant parses are bounded by the stage
    concurrency — same memory envelope the old (1, 2)-actor giant pool
    enforced, without the second pass."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        giant = pc.greater_equal(
            batch.column("html_len"), self.cfg.giant_threshold
        )
        giants = batch.filter(giant)
        bulk = batch.filter(pc.invert(giant))
        parts = [extract_batch(bulk, self.cfg, self.tags)]
        for i in range(giants.num_rows):
            parts.append(extract_batch(giants.slice(i, 1), self.cfg, self.tags))
        return pa.concat_tables(parts)


def routed_extract_batch(batch: pa.Table, cfg=None) -> pa.Table:
    """Stateless-task form of :class:`RoutedExtractDocuments` (no
    bundle): same in-task size routing, usable as a plain function so
    the default path keeps the measured stateless-task win."""
    import pyarrow.compute as pc

    from ..config import DEFAULT_CONFIG

    cfg = cfg or DEFAULT_CONFIG
    giant = pc.greater_equal(batch.column("html_len"), cfg.giant_threshold)
    giants = batch.filter(giant)
    bulk = batch.filter(pc.invert(giant))
    parts = [extract_batch(bulk, cfg)]
    for i in range(giants.num_rows):
        parts.append(extract_batch(giants.slice(i, 1), cfg))
    return pa.concat_tables(parts)


def _band_task_fn():
    """Lazily-decorated remote band parser (module import stays Ray-free
    until the parallel path is actually used)."""
    global _BAND_TASK
    if _BAND_TASK is None:
        import ray

        from ..kernel.tokenizer import tokenize_band

        @ray.remote(num_cpus=1)
        def band_task(html, start, limit, state, tags):
            return tokenize_band(html, start, limit, state, tags)

        _BAND_TASK = band_task
    return _BAND_TASK


_BAND_TASK = None


def tokenize_giant_parallel(data: str, cfg: ExtractConfig, tags):
    """Intra-document parallel parse of ONE giant page — the ``pcalls``
    analog (core.clj:1460-1514 band fan-out + core.clj:1392-1458 seam
    merge, run up front as a state-only skeleton scan instead of a
    post-merge): the scan records each ``cfg.band_size`` band's exact
    entry TagState sequentially (cheap — no output is collected), the
    bands then parse as INDEPENDENT Ray tasks against one ``ray.put``
    copy of the page, and outputs concatenate in band order.

    Output-equivalent to the sequential chunked parse (tested).
    Scheduler-safe by construction (round 5, default-ON): the parent
    parses the FIRST band inline while the remaining bands run as
    tasks, and a Ray TASK blocked in ``ray.get`` releases its CPU
    resource back to the scheduler — so concurrent giant parents
    cannot deadlock the cluster even at num_cpus=4 (pinned by
    test_giant_band_parallel_concurrent_parents_no_deadlock; brief
    oversubscription when a blocked parent resumes is the documented
    cost).  Falls back to the in-process banded parse when Ray is not
    initialized or the page fits one band.
    """
    import ray

    from ..kernel.tokenizer import merge_docs, scan_band_states, tokenize_band

    bands = scan_band_states(data, cfg.band_size, tags)
    if len(bands) <= 1 or not ray.is_initialized():
        return merge_docs([tokenize_band(data, s, e, st, tags) for s, e, st in bands])
    href = ray.put(data)
    task = _band_task_fn()
    refs = [task.remote(href, s, e, st, tags) for s, e, st in bands[1:]]
    s0, e0, st0 = bands[0]
    first = tokenize_band(data, s0, e0, st0, tags)  # parent works, not waits
    return merge_docs([first] + ray.get(refs))


def extract_batch(
    batch: pa.Table, cfg: ExtractConfig = DEFAULT_CONFIG, tags=None
) -> pa.Table:
    """Pure batch transform (usable as a stateless task too).

    With ``cfg.giant_band_parallel`` set, rows larger than
    ``cfg.band_size`` parse via the intra-document parallel band path
    (one Ray task per band) instead of the sequential chunked loop.
    """
    from ..kernel.tokenizer import DEFAULT_TAGS

    if tags is None:
        tags = DEFAULT_TAGS
    if cfg.giant_band_parallel:
        def tokenizer_for(data_len: int):
            if data_len <= cfg.band_size:
                return None
            return lambda d: tokenize_giant_parallel(d, cfg, tags)
    else:
        def tokenizer_for(data_len: int):
            return None
    urls = batch.column("url")
    htmls = batch.column("html")
    langs = (
        batch.column("lang")
        if "lang" in batch.column_names
        else pa.nulls(batch.num_rows, pa.string())
    )
    pids = (
        batch.column("partition_id")
        if "partition_id" in batch.column_names
        else pa.nulls(batch.num_rows, pa.int32())
    )
    texts, titles, spans, kinds, residuals, res_texts = [], [], [], [], [], []
    raw = htmls.to_pylist()
    for i in range(batch.num_rows):
        res = extract_document(
            raw[i], cfg, tags=tags, tokenizer=tokenizer_for(len(raw[i] or b""))
        )
        texts.append(res.text)
        titles.append(res.title)
        spans.append(res.spans)
        kinds.append(res.doc_kind)
        residuals.append(res.residuals)
        res_texts.append(res.residual_texts)
    return pa.Table.from_arrays(
        [
            urls.combine_chunks() if isinstance(urls, pa.ChunkedArray) else urls,
            pa.array(texts, pa.string()),
            pa.array(titles, pa.string()),
            pa.array(spans, SPAN_TYPE),
            langs.combine_chunks() if isinstance(langs, pa.ChunkedArray) else langs,
            pa.array(kinds, pa.string()),
            pa.array(residuals, pa.list_(pa.int32())),
            pa.array(res_texts, pa.list_(pa.string())),
            pids.combine_chunks() if isinstance(pids, pa.ChunkedArray) else pids,
        ],
        schema=EXTRACT_SCHEMA,
    )
