"""Composed training-corpus pipeline: extraction → dedup → quality gate.

The end-to-end shape a 100 TB training-data job actually runs — every
stage is one of this repo's operators, chained on a single streaming
Dataset:

    pages → extract (kernel)                  [per-batch map]
          → fingerprint extracted text        [vectorized map]
          → exact dedup (min url per content) [one groupby on the hash]
          → quality gate (min content length) [vectorized filter]

The exact-dedup groupby keys on the md5 fingerprint, not the text
itself, so the shuffle moves 32-byte keys + urls — never the documents.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Min

from ..config import DEFAULT_CONFIG, ExtractConfig
from .extract import extract_pipeline


def _md5_hex(texts: list) -> list:
    """Dedup key: md5 over the RAW extracted text (already canonical —
    the kernel emits collapse_ws'd text), deliberately NOT
    text_stats.fingerprint_batch's re-normalizing form; one helper so
    the keyed pass and the winner filter can never diverge."""
    return [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]


def fingerprint_extracted(batch: pa.Table) -> pa.Table:
    fps = _md5_hex(batch.column("text").to_pylist())
    return pa.Table.from_arrays(
        [
            batch.column("url"),
            pa.array(fps, pa.string()),
            pc.utf8_length(batch.column("text")).cast(pa.int64()),
        ],
        names=["url", "fingerprint", "text_chars"],
    )


def _exact_losers(keyed: rd.Dataset, num_buckets: int) -> rd.Dataset:
    """(doc_id, fp) rows → Dataset of exact-dedup losers (column ``d2``).

    A loser is any non-min doc_id of a duplicated fp (the Min-winner
    policy of the broadcast path).  Grouping is on ``crc32(fp) %
    num_buckets`` — fp groups are near-singleton and per-group Python
    dispatch over them is the dominant cost otherwise (the
    sessionize_salted lesson) — with the fine key resolved vectorized
    inside the bucket.  Never collects; feeds dedup_by_pairs_join.
    """
    import zlib

    import numpy as np
    import pandas as pd

    def tag(b: pa.Table) -> pa.Table:
        fps = b.column("fp").to_pylist()
        buckets = [zlib.crc32(f.encode()) % num_buckets for f in fps]
        return b.append_column("bucket", pa.array(buckets, pa.int32()))

    def find_losers(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["fp", "doc_id"], kind="mergesort").reset_index(drop=True)
        fp = g["fp"].to_numpy()
        first = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            first[1:] = fp[1:] != fp[:-1]
        losers = g.loc[~first, "doc_id"]
        # explicit string dtype: an EMPTY object column would reach
        # Arrow as null-typed and poison the downstream groupby schema
        return pd.DataFrame({"d2": pd.array(losers.tolist(), dtype="string")})

    return (
        keyed.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(find_losers, batch_format="pandas")
    )


def build_training_data(
    pages: rd.Dataset,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    min_quality: float = 0.5,
    chunk_size: int = 32,
    chunk_overlap: int = 8,
    pack_budget: int = 128,
    checkpoint_dir: str | None = None,
    dedup: str = "broadcast",
    line_max_df: int = 1,
    overwrite: bool = False,
    mixture_rates: dict | None = None,
    mixture_key=None,
    mixture_default_rate: float = 1.0,
    eval_docs: rd.Dataset | None = None,
    decontam_n: int = 5,
    max_eval_grams: int = 20_000_000,
) -> rd.Dataset:
    """The full web-corpus → training-data pipeline, every stage one of
    this repo's operators on a single streaming Dataset:

        pages → extract (kernel)                 [map, tasks]
              → PII redact                       [vectorized map]
              → cross-doc repeated-line removal  [2 shuffle-light passes]
              → exact dedup (md5 groupby)        [32-byte-key shuffle]
              → model quality gate               [actor pool, broadcast w]
              → token-window chunking            [map]
              → sequence packing                 [hash-partition groupby]

    Returns packed-sequence rows (partition_id, seq_id, n_chunks,
    total_tokens).  Near-dup (minhash) dedup plugs in between exact
    dedup and scoring when the corpus calls for it (same Dataset shape).

    ``dedup`` picks the exact-dedup filter strategy:

    * ``"broadcast"`` (default): the {fp → winner} map of DUPLICATED
      contents is collected and broadcast — right while duplicates ≪
      corpus (typical crawls);
    * ``"join"``: nothing is collected — losers stay a Dataset and the
      filter is the bucketed hash-join anti-filter
      (:func:`ocr_lib_ray.functions.dedup.dedup_by_pairs_join`), the
      scale path for dup-heavy corpora (30-50% dup rates) where the
      dup map itself is corpus-sized.  Output-equivalent (tested on a
      dup-heavy fixture).

    Opt-in curation stages (defaults leave the pipeline byte-identical):

    * ``mixture_rates``: per-stratum deterministic downsampling
      (:func:`ocr_lib_ray.functions.sampling.stratified_sample`) applied
      right after extraction+redaction — the corpus-mixture-control
      step of a training-data build.  Strata come from
      ``mixture_key(url)`` (default: the url netloc, the natural
      per-site key for a web crawl); unknown strata keep
      ``mixture_default_rate``.  Runs BEFORE the checkpoint/dedup
      passes so downsampled docs never cost another stage.
    * ``eval_docs``: benchmark decontamination — any doc sharing a
      ``decontam_n``-gram with the eval set's ``text`` column is
      dropped after exact dedup, before the quality gate (the
      :func:`ocr_lib_ray.functions.ngramdup.decontaminate` membership
      rule, filtered inline so text rides along).

    Multi-pass note: line-dedup and exact-dedup each drive a small
    keys-only pass over ``docs`` before the streaming rewrite, and Ray
    re-executes upstream lineage per pass — extraction would run 3×.
    ``checkpoint_dir`` (recommended beyond toy scale, and what a 100 TB
    job MUST do) writes the extracted+redacted docs to parquet ONCE and
    feeds every pass from the checkpoint, so re-passes re-read parquet
    instead of re-parsing HTML.  Disk-streaming, resumable-friendly, and
    measured ~1.5× faster end-to-end at bench scale.
    """
    from ray.data.aggregate import Min

    from ..functions.chunking import chunk_documents_batch, pack_sequences
    from ..functions.linedup import remove_common_lines

    extracted = extract_pipeline(pages, cfg)

    # redact over extracted text; keep url as the doc key
    def redact_extracted(batch: pa.Table) -> pa.Table:
        from ..functions.redact import redact_text

        texts = [redact_text(t) for t in batch.column("text").to_pylist()]
        return pa.Table.from_arrays(
            [batch.column("url"), pa.array(texts, pa.string())],
            names=["doc_id", "text"],  # downstream ops key on doc_id
        )

    docs = extracted.map_batches(redact_extracted, batch_format="pyarrow")

    if mixture_rates is not None:
        from urllib.parse import urlsplit

        from ..functions.sampling import stratified_sample

        key_fn = mixture_key or (lambda u: urlsplit(u).netloc)

        def add_mix_group(b: pa.Table) -> pa.Table:
            groups = [key_fn(u) for u in b.column("doc_id").to_pylist()]
            return b.append_column("mix_group", pa.array(groups, pa.string()))

        docs = stratified_sample(
            docs.map_batches(add_mix_group, batch_format="pyarrow"),
            key_col="doc_id",
            group_col="mix_group",
            rates=mixture_rates,
            default_rate=mixture_default_rate,
        ).drop_columns(["mix_group"])

    if checkpoint_dir is not None:
        # write_parquet APPENDS into an existing dir: a reused
        # checkpoint path would silently double the corpus, so the dir
        # is wiped first (the checkpoint is an artifact of THIS run).
        # Guarded wipe: refuses a non-empty dir that isn't a prior
        # checkpoint of ours (mistyped path protection); ``overwrite``
        # (the CLI --overwrite) force-wipes — and is honored HERE, not
        # only on --output, so the refusal can't fire after the output
        # dir was already emptied.
        from ..stages.manifest import safe_wipe_output

        safe_wipe_output(checkpoint_dir, overwrite=overwrite)
        docs.write_parquet(checkpoint_dir)
        docs = rd.read_parquet(checkpoint_dir)
    # line_max_df: C4-style hot-line threshold.  NOTE the ordering
    # subtlety: line-dedup runs BEFORE exact dedup, so on a corpus with
    # exact-duplicate documents every shared line has df ≥ dup_count —
    # max_df must exceed the expected dup multiplicity or duplicated
    # docs are stripped to empty text before the dedup stage sees them.
    docs = remove_common_lines(docs, max_df=line_max_df)

    # exact dedup — winner-broadcast filter: the shuffle moves ONLY
    # (fp, doc_id) rows (32-byte keys + urls), never the text.  The
    # vectorized aggregate finds each content's winner; contents seen
    # more than once (a tiny set relative to the corpus) are broadcast
    # as an fp→winner map into a streaming filter over the doc Dataset
    # (the dedup_by_pairs broadcast-loser pattern).
    import ray
    from ray.data.aggregate import Count

    def _fp_batch(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                b.column("doc_id"),
                pa.array(_md5_hex(b.column("text").to_pylist()), pa.string()),
            ],
            names=["doc_id", "fp"],
        )

    keyed = docs.map_batches(_fp_batch, batch_format="pyarrow")
    if dedup == "join":
        # nothing collected: losers stay a Dataset (non-min doc_id per
        # duplicated fp, found vectorized inside fp-hash buckets — near-
        # singleton fp groups would melt a plain groupby(fp) dispatch),
        # then the bucketed hash-join anti-filter drops them.
        from ..functions.dedup import dedup_by_pairs_join

        losers = _exact_losers(keyed, num_buckets=max(16, cfg.num_partitions))
        deduped = dedup_by_pairs_join(
            docs, losers, id_col="doc_id", num_partitions=max(16, cfg.num_partitions)
        )
    elif dedup == "broadcast":
        agg = keyed.groupby("fp").aggregate(
            Min("doc_id", alias_name="winner"), Count(alias_name="n")
        )
        dup_batches = list(
            agg.map_batches(
                lambda b: b.filter(pc.greater(b.column("n"), 1)).select(["fp", "winner"]),
                batch_format="pyarrow",
            ).iter_batches(batch_format="pyarrow")
        )
        dup_map = {}
        for t in dup_batches:
            dup_map.update(zip(t.column("fp").to_pylist(), t.column("winner").to_pylist()))
        dup_ref = ray.put(dup_map)

        def _keep_winners(b: pa.Table) -> pa.Table:
            dups = ray.get(dup_ref)
            if not dups or b.num_rows == 0:
                return b
            with_fp = _fp_batch(b)
            ids = with_fp.column("doc_id").to_pylist()
            fps_ = with_fp.column("fp").to_pylist()
            keep = [dups.get(f, i) == i for i, f in zip(ids, fps_)]
            return b.filter(pa.array(keep, pa.bool_()))

        deduped = docs.map_batches(_keep_winners, batch_format="pyarrow")
    else:
        raise ValueError(f"dedup must be 'broadcast' or 'join', got {dedup!r}")

    if eval_docs is not None:
        # benchmark decontamination: drop any doc sharing a decontam_n-
        # gram with the eval set (filtered inline — same membership rule
        # as functions.ngramdup.decontaminate)
        from ..functions.ngramdup import (
            _collect_gram_digests,
            _gram_digest,
            _norm_tokens,
        )

        ev_ref = ray.put(
            _collect_gram_digests(
                eval_docs, "text", decontam_n, 1, max_eval_grams, "max_eval_grams"
            )
        )

        def drop_contaminated(b: pa.Table) -> pa.Table:
            ev = ray.get(ev_ref)
            n = decontam_n
            keep = []
            for toks in _norm_tokens(b, "text"):
                # any-hit with early exit: only membership is consumed
                # here, not the coverage mask _covered builds
                keep.append(
                    not any(
                        _gram_digest(toks, i, n) in ev
                        for i in range(len(toks) - n + 1)
                    )
                )
            return b.filter(pa.array(keep, pa.bool_()))

        deduped = deduped.map_batches(drop_contaminated, batch_format="pyarrow")

    # model quality gate: score and filter INLINE so text rides along —
    # no corpus-sized keep-set broadcast, no join
    import numpy as np

    from ..functions.scoring import _DEFAULT_WEIGHTS, featurize

    def score_filter(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select(["doc_id", "text"])
        z = featurize(batch) @ _DEFAULT_WEIGHTS
        prob = 1.0 / (1.0 + np.exp(-z))
        return batch.filter(pa.array(prob >= min_quality)).select(["doc_id", "text"])

    survivors = deduped.map_batches(score_filter, batch_format="pyarrow")
    chunks = survivors.map_batches(
        lambda b: chunk_documents_batch(b, chunk_size, chunk_overlap),
        batch_format="pyarrow",
    )
    # thread the job's corpus-scaled partition knob (callers size
    # cfg.num_partitions to the corpus) instead of paying pack_sequences'
    # derive-by-count pass over this long lineage
    return pack_sequences(
        chunks, budget=pack_budget, num_partitions=max(16, cfg.num_partitions)
    )


def clean_corpus(
    pages: rd.Dataset,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    min_chars: int = 40,
) -> rd.Dataset:
    """pages → surviving (url, text_chars) after dedup + quality gate."""
    extracted = extract_pipeline(pages, cfg)
    fps = extracted.map_batches(
        fingerprint_extracted, batch_format="pyarrow", zero_copy_batch=True
    )
    survivors = fps.groupby("fingerprint").aggregate(
        Min("url", alias_name="url"), Min("text_chars", alias_name="text_chars")
    )
    return survivors.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("text_chars"), min_chars)).select(
            ["url", "text_chars"]
        ),
        batch_format="pyarrow",
    )
