"""Hand-rolled bucket exchange over raw Ray tasks — the iterative-state
escape hatch.

Ray Data's ``groupby(bucket).map_groups`` pays a full sort-shuffle
barrier (~seconds of fixed latency at any data size) EVERY time it
runs, even when the data is already partitioned by exactly the key the
next exchange needs.  Iterative algorithms (PageRank, connected
components) re-exchange state that never changes partition: both of
PageRank's per-iteration exchanges key by ``bucket(node)``, so the
state blocks coming out of iteration *i* are already partitioned the
way iteration *i+1* consumes them — the sort shuffle re-ships and
re-sorts them anyway because the Dataset API has no way to declare
that invariant.

This module drops to raw Ray tasks for precisely that case (the
documented last-resort rule): a dataset is exchanged ONCE into
``num_partitions`` per-bucket ``ObjectRef``s via two task waves
(per-block split → per-bucket merge), and iteration then runs as task
waves over those refs with NO further shuffles.  Partitioning
assumption (documented per the custom-operator rule): one bucket's
rows must fit one task — callers size ``num_partitions`` with
``derive_num_partitions``, same as the Dataset exchanges.

Driver cost: the driver holds O(num_partitions) refs and each
iteration wave passes O(P^2) tiny partial refs — fine for P up to a
few hundred; past that the Dataset sort-shuffle path amortizes better
(callers keep it as ``impl="dataset"``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def dataset_block_refs(ds) -> list:
    """Materialized dataset → list of ObjectRef[pa.Table] (zero-copy
    handles to the blocks already in the object store)."""
    return ds.to_arrow_refs()


def split_table_by_bucket(tbl: pa.Table, buckets: np.ndarray, num_partitions: int):
    """One block → ``num_partitions`` sub-tables by precomputed bucket
    ids (a stable counting split: rows keep their in-block order inside
    each bucket, so downstream merges are deterministic)."""
    order = np.argsort(buckets, kind="stable")
    sorted_tbl = tbl.take(pa.array(order))
    counts = np.bincount(buckets, minlength=num_partitions)
    offs = np.concatenate([[0], np.cumsum(counts)])
    return [
        sorted_tbl.slice(int(offs[i]), int(counts[i])) for i in range(num_partitions)
    ]


def exchange_to_bucket_refs(
    block_refs: list,
    bucket_fn,
    num_partitions: int,
    merge_fn=None,
    pre_fn=None,
):
    """The hand-rolled exchange: two task waves turn dataset blocks
    into one ObjectRef per bucket.

    * wave 1 — one task per input block: ``bucket_fn(table) ->
      np.ndarray[int32]`` assigns each row a bucket; the block splits
      into ``num_partitions`` sub-tables (``num_returns=P`` so each
      sub-table is an independently fetchable ref — bucket *b*'s merge
      task pulls ONLY its own slices, never whole blocks).
    * wave 2 — one task per bucket: concat the per-block slices and
      apply ``merge_fn`` (e.g. sort + precompute lookup structures).
      Returns whatever ``merge_fn`` returns (default: the concat
      table).

    Nothing lands on the driver; the result is a list of P refs.
    """
    import ray

    if not block_refs:
        raise ValueError("exchange_to_bucket_refs: no input blocks")

    if num_partitions == 1:
        # degenerate exchange: one merge task over the raw blocks
        @ray.remote
        def merge_all(*tbls):
            if pre_fn is not None:
                tbls = [pre_fn(x) if x.num_rows > 0 else x for x in tbls]
            live = [x for x in tbls if x.num_rows > 0]
            t = pa.concat_tables(live, promote_options="default") if live else tbls[0]
            return merge_fn(t) if merge_fn is not None else t

        return [merge_all.remote(*block_refs)]

    @ray.remote
    def split(tbl: pa.Table):
        if pre_fn is not None and tbl.num_rows > 0:
            tbl = pre_fn(tbl)
        if tbl.num_rows == 0:
            # map_groups upstream can emit SCHEMA-LESS empty blocks
            # (the known Ray quirk) — never hand those to bucket_fn
            return tuple([tbl] * num_partitions)
        bk = np.asarray(bucket_fn(tbl), dtype=np.int64)
        return tuple(split_table_by_bucket(tbl, bk, num_partitions))

    @ray.remote
    def merge(*parts):
        live = [p for p in parts if p.num_rows > 0]
        # wave 1 always emits P slices, so parts[0] is a typed empty
        t = pa.concat_tables(live, promote_options="default") if live else parts[0]
        return merge_fn(t) if merge_fn is not None else t

    waves = [
        split.options(num_returns=num_partitions).remote(ref) for ref in block_refs
    ]
    return [
        merge.remote(*[waves[i][b] for i in range(len(waves))])
        for b in range(num_partitions)
    ]


#: past this exchange width the driver-side O(blocks x P) ref fan of
#: the raw exchange outgrows the sort shuffle's fixed latency
TASK_EXCHANGE_MAX_PARTITIONS = 256


def exchange_map_groups(ds, bucket_fn, num_partitions, group_fn, pre_fn=None):
    """Drop-in ``groupby(bucket).map_groups(group_fn)`` replacement over
    a MATERIALIZED dataset: the two-wave raw exchange instead of the
    sort-shuffle barrier.  ``pre_fn`` (optional) runs inside the split
    task (e.g. a tag filter + column prune, so only the exchanged rows
    ship); ``group_fn(pa.Table) -> pa.Table`` runs once per bucket —
    exactly the map_groups contract, including the possibly-EMPTY
    (typed) input table.  Returns a Dataset with one block per bucket.

    Same caller contract as the Dataset exchange it replaces: one
    bucket must fit one task, and callers should gate on
    ``num_partitions <= TASK_EXCHANGE_MAX_PARTITIONS`` and keep the
    Dataset path beyond (the driver fans O(blocks x P) tiny refs).
    """
    import ray.data as rd

    refs = exchange_to_bucket_refs(
        ds.to_arrow_refs(), bucket_fn, num_partitions, merge_fn=group_fn, pre_fn=pre_fn
    )
    return rd.from_arrow_refs(refs)
