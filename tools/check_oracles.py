"""Local replica of the driver's correctness gate: run every queries()
entry and its oracle_sql() side by side at a given sf, compare row
count, column names, and an order-insensitive value hash.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(result, rd.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        rows.append("|".join(repr(v) for v in tup))
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def norm_df(df: pd.DataFrame) -> pd.DataFrame:
    # canonicalize dtypes: ints → int64, floats → float64 (uints too);
    # an int column carrying NULLs floats on one side (DuckDB .df()) and
    # may be nullable Int64 on the other — normalize both to float64 so
    # the repr-hash cannot spuriously diverge
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("float64") if s.isna().any() else s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        else:
            out[c] = s
    return pd.DataFrame(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"UNKNOWN QUERY NAMES: {sorted(unknown)}")
        return 2
    failed = []
    import time

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = norm_df(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"{name}: RAY ERROR {type(e).__name__}: {e}")
            failed.append(name)
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"{name}: rows-only ({len(got)} rows, cols {list(got.columns)}) [{dt:.1f}s]")
            if len(got) == 0:
                print(f"  WARNING: empty result")
            continue
        want = norm_df(con.execute(oracles[name]).df())
        ok_rows = len(got) == len(want)
        ok_cols = sorted(got.columns) == sorted(want.columns)
        ok_hash = ok_cols and value_hash(got) == value_hash(want)
        status = "OK" if (ok_rows and ok_cols and ok_hash) else "FAIL"
        print(
            f"{name}: {status} rows {len(got)}/{len(want)} cols_ok={ok_cols} "
            f"hash_ok={ok_hash} [{dt:.1f}s]"
        )
        if status == "FAIL":
            failed.append(name)
            if ok_cols and len(got) and len(want):
                g = got.sort_values(sorted(got.columns)).reset_index(drop=True)
                w = want.sort_values(sorted(want.columns)).reset_index(drop=True)
                for i in range(min(len(g), len(w))):
                    if not g.iloc[i].equals(w.iloc[i]):
                        print("  first diff row", i)
                        print("  got :", dict(g.iloc[i]))
                        print("  want:", dict(w.iloc[i]))
                        break
    print("FAILED:" if failed else "ALL OK", failed if failed else "")
    return 1 if failed else 0


if __name__ == "__main__":
    import ray

    code = main()
    ray.shutdown()
    sys.exit(code)
