"""Composed corpus-curation pipeline over an already-extracted corpus:

    blocklist filter → keep-best normalized dedup → token-budget
    mixture sampling → deterministic shard shuffle

Operates on the documents schema (doc_id, text, source, lang,
n_chars) — curation of a corpus a prior extract job (or any upstream
producer) already landed as parquet.  Every stage is individually
SQL-oracled (filter_blocklist / dedup_keep_best / budget_sample /
shuffle_shards), and the composition is oracled end-to-end as the
``curate`` driver query.

Scale notes:
* ``budget_sample``'s rate depends on a global aggregate, so it scans
  its input twice; with ``checkpoint_dir`` the deduped survivors are
  parqueted once and both passes re-read parquet instead of
  re-running the filter+dedup lineage (the corpus.py checkpoint
  discipline — recommended beyond toy scale, and what a 100 TB run
  would do anyway for resumability).
* The dedup stage carries text through one pruned shuffle
  (keep_latest full-row carry); on dup-dominated corpora route
  through pipelines/corpus.py's winner-broadcast dedup instead.
"""

from __future__ import annotations

__all__ = ["curate_corpus"]


#: the structural Gopher rules — the language-neutral default for
#: ``quality_rules`` (r_stops is the English stop-word rule; enable it
#: only on English corpora)
GOPHER_STRUCTURAL = (
    "r_words", "r_wordlen", "r_symbol", "r_bullet", "r_ellip", "r_alpha",
)


def curate_corpus(
    docs_ds,
    blocklist_terms,
    budgets: dict,
    num_shards: int = 16,
    checkpoint_dir: str | None = None,
    overwrite: bool = False,
    quality_rules=None,
):
    """Returns the curated corpus as (doc_id, source, shard, pos) —
    the deterministic training-shard assignment of every surviving
    document.  ``blocklist_terms``/``budgets`` as in
    :func:`functions.curation.filter_blocklist` /
    :func:`functions.sampling.budget_sample`.

    ``quality_rules``: opt-in Gopher quality gate — an iterable of
    rule-bit names from :func:`functions.text_stats.gopher_filter_batch`
    that must ALL hold (e.g. ``GOPHER_STRUCTURAL``); None (default)
    skips the gate, keeping the original 4-stage pipeline bit-stable.
    The gate is a map-only filter (zero extra shuffle) placed before
    the dedup so junk never pays for a shuffle.
    """
    from ..functions.curation import (
        dedup_keep_best,
        filter_blocklist,
        shuffle_shards,
    )
    from ..functions.sampling import budget_sample

    survivors = filter_blocklist(
        docs_ds,
        blocklist_terms,
        keep_cols=("doc_id", "text", "source", "n_chars"),
    )
    if quality_rules is not None:
        import pyarrow.compute as pc

        from ..functions.text_stats import gopher_filter_batch

        rules = tuple(quality_rules)

        def gate(b):
            verdict = gopher_filter_batch(b)
            keep = verdict.column(rules[0])
            for r in rules[1:]:
                keep = pc.and_(keep, verdict.column(r))
            return b.filter(keep)

        survivors = survivors.map_batches(
            gate, batch_format="pyarrow", zero_copy_batch=True
        )
    deduped = dedup_keep_best(survivors, carry_cols=("text", "source"))

    if checkpoint_dir is not None:
        import ray.data as rd

        from ..stages.manifest import safe_wipe_output

        safe_wipe_output(checkpoint_dir, overwrite=overwrite)
        deduped.write_parquet(checkpoint_dir)
        deduped = rd.read_parquet(checkpoint_dir)

    sampled = budget_sample(deduped, budgets, keep_cols=("doc_id", "source"))
    return shuffle_shards(sampled, num_shards=num_shards)
