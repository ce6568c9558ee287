"""Deterministic sampling / dataset splits (training-data ops).

Train/validation/test splits for a 10^12-doc corpus must be
deterministic, resumable and key-stable: the same url lands in the same
split on every run, machine and cluster size.  So splits key on
``crc32(key) % denom`` — never on RNG, row order or partition layout.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SPLIT_DENOM = 10_000


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
    import hashlib

    def hex_threshold(frac: float) -> str:
        return format(int(frac * (1 << 32)), "08x")

    t_test = hex_threshold(test_frac)
    t_val = hex_threshold(test_frac + val_frac)
    keys = batch.column(key_col).to_pylist()
    split = []
    for k in keys:
        h = hashlib.md5((salt + str(k)).encode("utf-8")).hexdigest()[:8]
        split.append("test" if h < t_test else ("val" if h < t_val else "train"))
    return batch.append_column("split", pa.array(split, pa.string()))


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
