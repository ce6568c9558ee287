"""Deterministic sampling / dataset splits (training-data ops).

Train/validation/test splits for a 10^12-doc corpus must be
deterministic, resumable and key-stable: the same url lands in the same
split on every run, machine and cluster size.  So splits key on
``crc32(key) % denom`` — never on RNG, row order or partition layout.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SPLIT_DENOM = 10_000


def _md5_hex(salt: str, key) -> str:
    return hashlib.md5((salt + str(key)).encode("utf-8")).hexdigest()


def _hex_threshold(frac: float) -> str:
    """First-8-hex-chars threshold for ``md5 < t`` keep-with-prob-frac.

    Valid only for frac < 1 (frac >= 1 must keep unconditionally: the
    9-char hex of 2**32 compares LOWER than most 8-char hashes)."""
    return format(int(frac * (1 << 32)), "08x")


def add_split_column(
    batch: pa.Table,
    key_col: str,
    test_frac: float = 0.1,
    val_frac: float = 0.0,
    salt: str = "split",
) -> pa.Table:
    """Append ``split`` ∈ {train, val, test} keyed on crc32(salt+key).

    The salt decorrelates this hash from the partition hash (same key,
    different hash stream).
    """
    keys = batch.column(key_col).to_pylist()
    buckets = np.fromiter(
        (zlib.crc32((salt + str(k)).encode("utf-8")) % SPLIT_DENOM for k in keys),
        dtype=np.int64,
        count=len(keys),
    )
    test_lim = int(test_frac * SPLIT_DENOM)
    val_lim = test_lim + int(val_frac * SPLIT_DENOM)
    split = np.where(
        buckets < test_lim, "test", np.where(buckets < val_lim, "val", "train")
    )
    return batch.append_column("split", pa.array(split, pa.string()))


def add_split_column_md5(
    batch: pa.Table,
    key_col: str,
    test_frac: float = 0.1,
    val_frac: float = 0.0,
    salt: str = "split",
) -> pa.Table:
    """md5-keyed variant: split decided by lexicographic comparison of
    the first 8 hex chars of ``md5(salt || key)`` against fraction
    thresholds — bit-identical to the SQL
    ``substr(md5('salt' || key), 1, 8) < '<hex>'`` (DuckDB-oracleable,
    unlike crc32 which DuckDB lacks)."""
    t_test = _hex_threshold(test_frac)
    t_val = _hex_threshold(test_frac + val_frac)
    keys = batch.column(key_col).to_pylist()
    split = []
    for k in keys:
        h = _md5_hex(salt, k)[:8]
        split.append("test" if h < t_test else ("val" if h < t_val else "train"))
    return batch.append_column("split", pa.array(split, pa.string()))


def stratified_sample(
    ds,
    key_col: str,
    group_col: str,
    rates: dict,
    default_rate: float = 1.0,
    salt: str = "strat",
):
    """Per-stratum deterministic downsampling (corpus mixture control).

    Keeps a row iff ``md5(salt || key)[:8] < hex(rate[group] * 2^32)`` —
    the same md5-threshold discipline as :func:`add_split_column_md5`,
    so the decision is key-stable (same doc kept on every run / cluster
    size / partition layout) and bit-reproducible in DuckDB SQL.  This
    is the "mixture weights" op of a training-data pipeline: e.g.
    ``rates={"web": 0.1, "wiki": 1.0}`` rebalances sources without RNG.

    Map-only (no shuffle): scale-safe at any corpus size.  Rates >= 1
    keep every row of the stratum; unknown strata use ``default_rate``.
    """
    import pyarrow as pa

    # one threshold per distinct rate, computed once (not per row);
    # None marks the rate>=1 keep-all / rate<=0 drop-all short circuits
    thr_cache: dict = {}

    def threshold(g):
        if g not in thr_cache:
            rate = rates.get(g, default_rate)
            thr_cache[g] = (
                True if rate >= 1.0 else (False if rate <= 0.0 else _hex_threshold(rate))
            )
        return thr_cache[g]

    def keep_mask(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_pylist()
        groups = batch.column(group_col).to_pylist()
        mask = []
        for k, g in zip(keys, groups):
            t = threshold(g)
            mask.append(t if isinstance(t, bool) else _md5_hex(salt, k)[:8] < t)
        return batch.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(keep_mask, batch_format="pyarrow", zero_copy_batch=True)


def cap_per_group(ds, group_col: str, key_col: str, k: int, salt: str = "cap"):
    """Keep at most ``k`` rows per group — the per-domain document cap
    of a crawl-curation pipeline (no domain may dominate the corpus).

    The choice WITHIN a group is a deterministic uniform sample, not
    "first k seen": rows with the k smallest ``md5(salt || key)[:16]``
    win (key-stable across runs / cluster size / block layout, same
    discipline as :func:`sample_fixed_k`), ties broken by key.  Built
    on ranking.topk_per_group's per-block prune + grouped finish, so
    the shuffle carries at most k rows per group per block — never a
    global sort, never a corpus-sized group task.

    Output: (group_col, key_col) of the survivors.
    """
    import pyarrow as pa

    from .ranking import topk_per_group

    def add_h(batch: pa.Table) -> pa.Table:
        h = [_md5_hex(salt, x)[:16] for x in batch.column(key_col).to_pylist()]
        return batch.append_column("cap_h", pa.array(h, pa.string()))

    keyed = ds.map_batches(add_h, batch_format="pyarrow")
    top = topk_per_group(
        keyed, group_col, "cap_h", k, id_col=key_col, descending=False
    )
    return top.select_columns([group_col, key_col])


def sample_fixed_k(ds, key_col: str, k: int, salt: str = "fixk"):
    """Deterministic uniform sample of EXACTLY k rows (hash bottom-k).

    The k rows with the smallest ``md5(salt || key)[:16]`` — a
    key-stable analog of reservoir sampling (same k rows on every run
    and cluster size, unlike reservoir which is order-dependent).

    Scale path: each block first prunes itself to its own k smallest
    (map-only), so the final ``sort().limit(k)`` runs over at most
    k x n_blocks pruned rows — never the corpus.  Ties broken by key.
    Output: input columns + ``sample_h``.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def prune(batch: pa.Table) -> pa.Table:
        h = pa.array(
            [_md5_hex(salt, x)[:16] for x in batch.column(key_col).to_pylist()],
            pa.string(),
        )
        t = batch.append_column("sample_h", h)
        idx = pc.sort_indices(
            t, sort_keys=[("sample_h", "ascending"), (key_col, "ascending")]
        )
        return t.take(idx[: min(k, len(idx))])

    pruned = ds.map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)
    return pruned.sort(["sample_h", key_col]).limit(k)


def split_dataset(ds, key_col: str, test_frac: float = 0.1, val_frac: float = 0.0):
    """Dataset → Dataset with a deterministic ``split`` column."""
    return ds.map_batches(
        lambda b: add_split_column(b, key_col, test_frac, val_frac),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def take_split(ds, key_col: str, which: str, test_frac: float = 0.1, val_frac: float = 0.0):
    """Filter to one split — a vectorized anti/semi filter, no shuffle."""
    splits = split_dataset(ds, key_col, test_frac, val_frac)
    return splits.map_batches(
        lambda b: b.filter(pc.equal(b.column("split"), which)),
        batch_format="pyarrow",
    )


def weighted_sample(ds, key_col: str, weight_col: str, scale: float = 1.0, salt: str = "wsamp"):
    """Keep each row with probability ``clip(weight * scale, 0, 1)``,
    decided by the KEY hash — deterministic quality-proportional
    sampling ("keep documents in proportion to their model quality
    score"), the continuous-weight generalization of
    :func:`stratified_sample`.

    Same md5-threshold discipline (key-stable across runs / cluster
    size / partition layout, map-only, no shuffle) with a PER-ROW
    threshold: ``md5(salt || key)[:8] < printf('%08x',
    floor(p * 2^32))`` — bit-reproducible in DuckDB SQL (identical
    IEEE product, floor and hex-string compare).  Null/NaN weights
    drop the row (SQL NULL-comparison semantics).
    """
    def keep_mask(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_pylist()
        w = batch.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64)
        p = np.clip(np.nan_to_num(w * scale, nan=0.0), 0.0, 1.0)
        mask = []
        for k, pi in zip(keys, p):
            if pi >= 1.0:
                mask.append(True)
            elif pi <= 0.0:
                mask.append(False)
            else:
                mask.append(_md5_hex(salt, k)[:8] < format(int(pi * (1 << 32)), "08x"))
        return batch.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(keep_mask, batch_format="pyarrow", zero_copy_batch=True)


def budget_sample(
    docs_ds,
    budgets: dict,
    salt: str = "budget",
    keep_cols: tuple = ("doc_id", "source"),
    totals: dict | None = None,
):
    """Token-budget mixture sampling: downsample each source so its
    EXPECTED surviving token count ≈ ``budgets[source]`` — the "mix
    sources to a token recipe" stage of training-data assembly.
    Sources absent from ``budgets`` are kept whole; a 0 budget drops
    the source.  Returns the surviving rows projected to ``keep_cols``.

    Two passes, both cheap: (1) per-source token totals — a per-batch
    partial sum rides a |sources|-row groupby, collected to the driver
    (documented-small, like heavy_hitters); (2) a MAP-ONLY filter with
    keep-rate ``r_s = budget_s / total_tokens_s`` decided by the
    :func:`weighted_sample` md5-threshold discipline (key-stable
    across runs / cluster size / layout; bit-reproducible in SQL via
    printf-hex compare).  The corpus is scanned twice by construction
    — the rate depends on a global aggregate; pass pre-computed
    ``totals`` ({source: token_count}, e.g. from a checkpointed
    aggregate) to skip pass 1 when re-executing the lineage matters.
    """
    if totals is None:
        from ray.data.aggregate import Sum

        from .text_stats import normalize_expr, token_count

        def partial_tokens(batch: pa.Table) -> pa.Table:
            nt = token_count(normalize_expr(batch.column("text"))).cast(pa.int64())
            t = pa.Table.from_arrays(
                [batch.column("source"), nt], names=["source", "nt"]
            )
            g = t.group_by("source").aggregate([("nt", "sum")])
            return g.rename_columns(["source", "nt"])

        agg = (
            docs_ds.map_batches(
                partial_tokens, batch_format="pyarrow", zero_copy_batch=True
            )
            .groupby("source")
            .aggregate(Sum("nt", alias_name="nt"))
            .to_pandas()
        )
        # a fully-filtered upstream yields a 0-column empty frame
        total_by_source = (
            dict(zip(agg["source"], agg["nt"])) if len(agg) else {}
        )
    else:
        total_by_source = dict(totals)

    # rate per budgeted source; None = keep whole
    thresholds: dict = {}
    for src, b in budgets.items():
        t = total_by_source.get(src, 0)
        if t == 0 or float(b) / float(t) >= 1.0:
            thresholds[src] = None  # keep all (budget >= corpus)
        else:
            rate = float(b) / float(t)
            thresholds[src] = format(int(rate * (1 << 32)), "08x")

    def keep_mask(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        srcs = batch.column("source").to_pylist()
        mask = []
        for i, s in zip(ids, srcs):
            if s not in budgets or thresholds.get(s) is None:
                mask.append(True)
            else:
                mask.append(_md5_hex(salt, i)[:8] < thresholds[s])
        return batch.filter(pa.array(mask, pa.bool_())).select(list(keep_cols))

    return docs_ds.map_batches(
        keep_mask, batch_format="pyarrow", zero_copy_batch=True
    )


def weighted_sample_k(
    ds,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "aes",
):
    """EXACT-k weighted sample without replacement — the
    Efraimidis-Spirakis (2006) A-ES reservoir scheme made deterministic:
    each row gets key = ln(u)/w with u a (0,1] uniform derived from the
    md5 of (salt, id), and the k largest keys win.  Inclusion odds are
    weight-proportional like :func:`weighted_sample`'s rate filter, but
    the output size is exactly min(k, rows) — what a fixed training-
    budget draw needs.  Rows with weight <= 0 are excluded.

    Exactness bridge: u = ((md5_lower64 >> 11) + 1) / 2^53 — the top 53
    bits, so the int→double conversion is EXACT on both sides (a full
    64-bit value would round and could diverge); key_nano =
    floor(ln(u) / w * 1e9 + 0.5), one IEEE chain shared with the SQL
    oracle; ties break on id.

    Scale shape: key stamping is map-only; selection reuses
    :func:`ranking.topk_per_group`'s per-block prune under a constant
    group, so at most k rows per block reach the final task.
    """
    import math

    import pyarrow.compute as pc

    from .ranking import topk_per_group

    def stamp(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater(b.column(weight_col), 0))
        ids = t.column(id_col).to_pylist()
        ws = t.column(weight_col).to_pylist()
        keys = []
        for i, w in zip(ids, ws):
            h = int.from_bytes(
                hashlib.md5(f"{salt}{i}".encode()).digest()[8:], "little"
            )
            u = ((h >> 11) + 1) / 9007199254740992.0
            keys.append(math.floor(math.log(u) / w * 1e9 + 0.5))
        return pa.Table.from_arrays(
            [
                pa.array([""] * len(ids), pa.string()),
                t.column(id_col),
                pa.array(keys, pa.int64()),
            ],
            names=["_g", id_col, "key_nano"],
        )

    stamped = ds.map_batches(stamp, batch_format="pyarrow", zero_copy_batch=True)
    top = topk_per_group(stamped, "_g", "key_nano", k, id_col)
    return top.map_batches(
        lambda b: b.select([id_col, "key_nano"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def temperature_mix(
    docs_ds,
    alpha: float = 0.3,
    salt: str = "temp",
    keep_cols: tuple = ("doc_id", "source"),
    totals: dict | None = None,
):
    """Temperature-scaled source mixing (the multilingual-pretraining
    recipe of Lample & Conneau 2019 / XLM-R, Conneau et al. 2020:
    sample source i with probability ∝ p_i^alpha where p_i is its
    token share): realize the temperature mixture by DOWNSAMPLING —
    the smallest source is kept whole and every larger source keeps
    rate_i = (t_min / t_i)^(1 - alpha), which is exactly the largest
    per-source scaling that matches the p^alpha mixture without
    replicating rows.  ``alpha = 1`` keeps everything (natural
    mixture); ``alpha = 0`` equalizes token counts across sources.

    Determinism bridge: rate = exp((alpha-1)·(ln t − ln t_min)) — one
    libm ln/exp chain, bit-identical in DuckDB (the SQL oracle embeds
    repr(alpha-1.0), which parses to the same double) — and the
    keep/drop decision is the md5-vs-printf-hex compare shared with
    :func:`budget_sample`.  Zero-token sources are kept whole (they
    cost nothing).

    Scale shape: same as :func:`budget_sample` — pass 1 is a
    |sources|-row token-total aggregate (combined per batch), pass 2
    a map-only threshold filter; pass ``totals`` to skip pass 1.
    """
    import math

    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")

    if totals is None:
        from ray.data.aggregate import Sum

        from .text_stats import normalize_expr, token_count

        def partial_tokens(batch: pa.Table) -> pa.Table:
            nt = token_count(normalize_expr(batch.column("text"))).cast(pa.int64())
            t = pa.Table.from_arrays(
                [batch.column("source"), nt], names=["source", "nt"]
            )
            g = t.group_by("source").aggregate([("nt", "sum")])
            return g.rename_columns(["source", "nt"])

        agg = (
            docs_ds.map_batches(
                partial_tokens, batch_format="pyarrow", zero_copy_batch=True
            )
            .groupby("source")
            .aggregate(Sum("nt", alias_name="nt"))
            .to_pandas()
        )
        total_by_source = dict(zip(agg["source"], agg["nt"])) if len(agg) else {}
    else:
        total_by_source = dict(totals)

    pos = [t for t in total_by_source.values() if t > 0]
    tmin = float(min(pos)) if pos else 0.0
    am1 = alpha - 1.0
    thresholds: dict = {}
    for src, t in total_by_source.items():
        if t == 0:
            thresholds[src] = None  # zero-token source: keep whole
            continue
        rate = math.exp(am1 * (math.log(float(t)) - math.log(tmin)))
        # the min source computes exp(am1 * 0.0) == 1.0 exactly
        thresholds[src] = None if rate >= 1.0 else format(int(rate * (1 << 32)), "08x")

    def keep_mask(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        srcs = batch.column("source").to_pylist()
        mask = [
            thresholds.get(s) is None or _md5_hex(salt, i)[:8] < thresholds[s]
            for i, s in zip(ids, srcs)
        ]
        return batch.filter(pa.array(mask, pa.bool_())).select(list(keep_cols))

    return docs_ds.map_batches(
        keep_mask, batch_format="pyarrow", zero_copy_batch=True
    )


def sample_k_per_group(
    ds,
    group_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "gk",
):
    """Deterministic uniform sample of EXACTLY min(k, |group|) rows
    PER GROUP (hash bottom-k within each group) — the balanced-draw
    shape (per-language eval slices, per-source audit samples).
    Key-stable like :func:`sample_fixed_k`: same rows at any batch
    size, run, or cluster layout; ties break on id.

    Scale shape: md5-key stamping is map-only, then
    :func:`ranking.topk_per_group` prunes each block to its own
    per-group bottom-k before the one groupby — at most k rows per
    group per block reach the final task, never the corpus.  Output:
    (group_col, id_col, sample_h).
    """
    import pyarrow as pa

    from .ranking import topk_per_group

    def stamp(b: pa.Table) -> pa.Table:
        h = pa.array(
            [_md5_hex(salt, x)[:16] for x in b.column(id_col).to_pylist()],
            pa.string(),
        )
        return b.select([group_col, id_col]).append_column("sample_h", h)

    stamped = ds.map_batches(stamp, batch_format="pyarrow", zero_copy_batch=True)
    return topk_per_group(
        stamped, group_col, "sample_h", k, id_col, descending=False
    )
