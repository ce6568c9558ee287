"""Format-pluggable documents ingestion: jsonl/csv reads normalize to
the canonical schema and are row-identical to the parquet read; the
curate CLI consumes a jsonl input end-to-end."""

import subprocess
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


@pytest.fixture(scope="module")
def exports(tmp_path_factory):
    """sf0.001 documents exported to jsonl and csv (via DuckDB COPY —
    an independent writer, so reader quirks can't cancel out)."""
    d = tmp_path_factory.mktemp("fmt")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    con.execute(f"COPY documents TO '{d}/docs.jsonl' (FORMAT JSON)")
    con.execute(f"COPY documents TO '{d}/docs.csv' (FORMAT CSV, HEADER)")
    # a jsonl WITHOUT the derived n_chars column (common export shape)
    con.execute(
        f"COPY (SELECT doc_id, text, lang, source FROM documents) "
        f"TO '{d}/docs_nochars.jsonl' (FORMAT JSON)"
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("fmt,fname", [("jsonl", "docs.jsonl"), ("csv", "docs.csv")])
def test_read_documents_matches_parquet(exports, fmt, fname):
    from ocr_lib_ray.sources.text_files import read_documents

    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    want = _canon(read_documents(f"{SF}/documents.parquet", columns=cols).to_pandas())
    got = _canon(read_documents(f"{exports}/{fname}", format=fmt, columns=cols).to_pandas())
    assert [str(t) for t in got.dtypes] == [str(t) for t in want.dtypes]
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
def test_read_documents_derives_n_chars_and_guards(exports):
    from ocr_lib_ray.sources.text_files import read_documents

    cols = ["doc_id", "text", "n_chars"]
    want = _canon(read_documents(f"{SF}/documents.parquet", columns=cols).to_pandas())
    got = _canon(
        read_documents(
            f"{exports}/docs_nochars.jsonl", format="jsonl", columns=cols
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(got, want)

    with pytest.raises(ValueError, match="unknown format"):
        read_documents(f"{exports}/docs.jsonl", format="orc")
    with pytest.raises(Exception, match="absent"):
        read_documents(
            f"{exports}/docs_nochars.jsonl", format="jsonl", columns=["nope"]
        ).take_all()


def test_cli_curate_jsonl_input(exports, tmp_path):
    """The curate CLI over a jsonl input produces output byte-equal to
    the same run over the parquet fixture."""
    out_a = tmp_path / "from_jsonl"
    out_b = tmp_path / "from_parquet"
    base = [
        sys.executable, "-m", "ocr_lib_ray.cli", "curate",
        "--budgets", "src0=700,src1=100,src2=0", "--shards", "4",
    ]
    r1 = subprocess.run(
        base + ["--input", f"{exports}/docs.jsonl", "--input-format", "jsonl",
                "--output", str(out_a)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r1.returncode == 0, r1.stderr[-2000:]
    r2 = subprocess.run(
        base + ["--sf-dir", SF, "--output", str(out_b)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    con = duckdb.connect()
    a = con.execute(
        f"SELECT * FROM read_parquet('{out_a}/**/*.parquet', hive_partitioning=1)"
    ).df()
    b = con.execute(
        f"SELECT * FROM read_parquet('{out_b}/**/*.parquet', hive_partitioning=1)"
    ).df()
    pd.testing.assert_frame_equal(_canon(a), _canon(b))
