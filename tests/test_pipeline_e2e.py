"""End-to-end golden conformance (analog of the read-image-fn golden
string test, core_test.clj:3225-3238): the distributed pipeline must be
byte-identical to the single-threaded kernel at every parallelism."""

import shutil

import pyarrow.parquet as pq
import pytest

from ocr_lib_ray.config import ExtractConfig
from ocr_lib_ray.sources.pages import golden_text, page_url


def partition_rows(out: str) -> int:
    """Sum footer row counts across every partition dir of a job."""
    import os

    import pyarrow.parquet as pq2

    data = os.path.join(out, "data")
    return sum(
        pq2.ParquetFile(os.path.join(data, d, f)).metadata.num_rows
        for d in os.listdir(data)
        for f in os.listdir(os.path.join(data, d))
        if f.endswith(".parquet")
    )


def golden_map(sf_dir):
    docs = pq.read_table(f"{sf_dir}/documents.parquet")
    return {
        page_url(d, s): golden_text(d, t)
        for d, t, s in zip(
            docs.column("doc_id").to_pylist(),
            docs.column("text").to_pylist(),
            docs.column("source").to_pylist(),
        )
    }


@pytest.mark.usefixtures("ray_session")
def test_pipeline_matches_frozen_golden(sf_small):
    """The conformance anchor: distributed pipeline output must equal
    the COMMITTED golden parquet (generated once by the single-threaded
    kernel via tools/make_golden.py and frozen — the reference's
    golden-fixture discipline, core_test.clj:3225-3238).  Catches any
    silent semantic drift of kernel or pipeline."""
    import os

    import pyarrow.parquet as pq2

    from ocr_lib_ray.pipelines.extract import build_pages_dataset, extract_pipeline

    golden = pq2.read_table(
        os.path.join(os.path.dirname(__file__), "golden_sf0001.parquet")
    )
    out = (
        extract_pipeline(
            build_pages_dataset(sf_small), ExtractConfig(keep_residual_texts=True)
        )
        .to_pandas()
        .set_index("url")
    )
    g = golden.to_pandas().set_index("url")
    assert set(out.index) == set(g.index)
    out = out.loc[g.index]
    # the FULL extraction surface is frozen: text, title, kind, spans,
    # residual ids AND residual texts
    assert (out["text"] == g["text"]).all()
    assert (out["title"] == g["title"]).all()
    assert (out["doc_kind"] == g["doc_kind"]).all()
    assert out["spans"].map(repr).equals(g["spans"].map(repr))
    assert out["residuals"].map(list).equals(g["residuals"].map(list))
    assert out["residual_texts"].map(list).equals(g["residual_texts"].map(list))


@pytest.mark.usefixtures("ray_session")
def test_pipeline_matches_golden(sf_small):
    from ocr_lib_ray.pipelines.extract import build_pages_dataset, extract_pipeline

    out = extract_pipeline(build_pages_dataset(sf_small)).to_pandas()
    gold = golden_map(sf_small)
    assert len(out) == len(gold)
    for url, text in zip(out["url"], out["text"]):
        assert text == gold[url], url


@pytest.mark.usefixtures("ray_session")
def test_pipeline_batchsize_invariance(sf_small):
    """Output must not depend on batch composition (the reference's
    per-thread residual cap violates this; ours must not)."""
    from ocr_lib_ray.pipelines.extract import build_pages_dataset, extract_pipeline

    a = (
        extract_pipeline(build_pages_dataset(sf_small), ExtractConfig(bulk_batch_size=7))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    b = (
        extract_pipeline(build_pages_dataset(sf_small), ExtractConfig(bulk_batch_size=256))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert (a["url"] == b["url"]).all()
    assert (a["text"] == b["text"]).all()
    assert a["spans"].map(repr).equals(b["spans"].map(repr))


@pytest.mark.usefixtures("ray_session")
def test_skew_route_equivalent(sf_small):
    """Dual-path routing (band-split analog) must not change output:
    force a low giant_threshold so real rows take the giant path."""
    from ocr_lib_ray.pipelines.extract import build_pages_dataset, extract_pipeline

    cfg = ExtractConfig(giant_threshold=900)  # below median page size
    a = (
        extract_pipeline(build_pages_dataset(sf_small), cfg, skew_route=True)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    b = (
        extract_pipeline(build_pages_dataset(sf_small), skew_route=False)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert len(a) == len(b)
    assert (a["url"] == b["url"]).all()
    assert (a["text"] == b["text"]).all()


@pytest.mark.usefixtures("ray_session")
def test_actor_pool_with_bundle_equivalent(sf_small):
    """bundle_ref path (actor pool, state fetched once per actor) must
    produce identical output to the stateless-task path."""
    from ocr_lib_ray.pipelines.extract import build_pages_dataset, extract_pipeline

    from ocr_lib_ray.state.bundle import broadcast_bundle, build_bundle

    ref = broadcast_bundle(build_bundle())
    # a re-taught bundle actually changes classification: marking
    # <article> as boilerplate kills all fixture main content
    ref2 = broadcast_bundle(build_bundle(extra_boilerplate=["article"]))
    taught = extract_pipeline(build_pages_dataset(sf_small), bundle_ref=ref2).to_pandas()
    html_rows = taught[taught["doc_kind"] == "html"]
    assert (html_rows["text"] == "").all()  # article subtree rejected everywhere
    a = (
        extract_pipeline(build_pages_dataset(sf_small), bundle_ref=ref)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    b = (
        extract_pipeline(build_pages_dataset(sf_small))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert (a["url"] == b["url"]).all()
    assert (a["text"] == b["text"]).all()


@pytest.mark.usefixtures("ray_session")
def test_bundle_threshold_overrides(sf_small):
    """The bundle can re-teach classification THRESHOLDS (the reference's
    caller-threaded matching-value, core.clj:1772-1806), not just tag
    classes: a min_words override must change accept decisions
    pipeline-wide through the actor path, and a default bundle must
    leave output identical to the no-bundle path."""
    from ocr_lib_ray.pipelines.extract import build_pages_dataset, extract_pipeline
    from ocr_lib_ray.state.bundle import broadcast_bundle, build_bundle

    base = (
        extract_pipeline(build_pages_dataset(sf_small))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    strict_ref = broadcast_bundle(build_bundle(min_words=10_000))
    strict = (
        extract_pipeline(build_pages_dataset(sf_small), bundle_ref=strict_ref)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert (base["url"] == strict["url"]).all()
    changed = (base["text"] != strict["text"]).sum()
    assert changed > 0  # the override reached classify through the pool
    # strict text is always a (possibly equal) reduction of base text
    assert (
        strict["text"].str.len() <= base["text"].str.len()
    ).all()
    # residual_cap override flows too: cap 0 → no residuals anywhere
    nocap_ref = broadcast_bundle(build_bundle(min_words=10_000, residual_cap=0))
    nocap = extract_pipeline(build_pages_dataset(sf_small), bundle_ref=nocap_ref).to_pandas()
    assert nocap["residuals"].map(len).max() == 0
    assert strict["residuals"].map(len).max() > 0


@pytest.mark.usefixtures("ray_session")
def test_skew_route_with_bundle_equivalent(sf_small):
    """skew_route x bundle_ref: the re-taught TagConfig must reach BOTH
    routes.  With <article> re-taught as boilerplate and a giant_threshold
    below the median page size, rows on the giant path must be classified
    with the bundle's tags too (empty text), not DEFAULT_TAGS."""
    from ocr_lib_ray.pipelines.extract import build_pages_dataset, extract_pipeline
    from ocr_lib_ray.state.bundle import broadcast_bundle, build_bundle

    ref2 = broadcast_bundle(build_bundle(extra_boilerplate=["article"]))
    cfg = ExtractConfig(giant_threshold=900)  # real rows take the giant path
    routed = extract_pipeline(
        build_pages_dataset(sf_small), cfg, skew_route=True, bundle_ref=ref2
    ).to_pandas()
    html_rows = routed[routed["doc_kind"] == "html"]
    assert len(html_rows) > 0
    assert (html_rows["text"] == "").all()
    # and full equivalence: routed+bundle == unrouted+bundle
    a = routed.sort_values("url").reset_index(drop=True)
    b = (
        extract_pipeline(build_pages_dataset(sf_small), bundle_ref=ref2)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert (a["url"] == b["url"]).all()
    assert (a["text"] == b["text"]).all()


@pytest.mark.usefixtures("ray_session")
def test_giant_page_through_pipeline():
    """A page above giant_threshold flows through the pipeline via the
    kernel's bounded chunked parse and matches the one-shot kernel."""
    import pyarrow as pa
    import ray.data as rd

    from ocr_lib_ray.kernel import extract_document
    from ocr_lib_ray.pipelines.extract import extract_pipeline

    body = "<p>" + "lorem ipsum dolor sit amet " * 60000 + "</p>"  # ~1.6 MB
    html = ("<main>" + body + "</main>").encode()
    pages = rd.from_arrow(
        pa.Table.from_arrays(
            [
                pa.array(["https://x.test/giant"], pa.string()),
                pa.array([0], pa.timestamp("us")),
                pa.array([html], pa.binary()),
                pa.array([""], pa.string()),
                pa.array(["en"], pa.string()),
            ],
            names=["url", "warc_ts", "html", "text", "lang"],
        )
    )
    out = extract_pipeline(pages, skew_route=True).to_pandas()
    want = extract_document(html)
    assert len(out) == 1
    assert out["text"][0] == want.text
    assert want.text.startswith("lorem ipsum")


@pytest.mark.usefixtures("ray_session")
def test_manifest_job_and_resume(sf_small, tmp_path):
    from ocr_lib_ray.pipelines.extract import run_extract_job
    from ocr_lib_ray.stages.manifest import completed_partitions

    out = str(tmp_path / "job")
    r1 = run_extract_job(sf_small, out, resume=True)
    assert r1["partitions_written"] > 0 and r1["partitions_skipped"] == 0
    done = completed_partitions(out)
    assert len(done) == r1["partitions_written"]
    # resume: everything already done → nothing rewritten
    r2 = run_extract_job(sf_small, out, resume=True)
    assert r2["partitions_written"] == 0
    assert r2["partitions_skipped"] == r1["partitions_written"]
    # partial resume: delete one manifest row → exactly one partition redone
    import os

    man = sorted(os.listdir(os.path.join(out, "manifest")))
    os.remove(os.path.join(out, "manifest", man[0]))
    r3 = run_extract_job(sf_small, out, resume=True)
    assert r3["partitions_written"] == 1


@pytest.mark.usefixtures("ray_session")
def test_write_partitioned_zero_shuffle_sink(sf_small, tmp_path):
    """The streaming sink (write_parquet partition_cols, no groupby)
    writes the same rows as the groupby sink and yields footers-based
    manifests; resume then skips everything."""
    import os

    import pyarrow.parquet as pq2

    from ocr_lib_ray.pipelines.extract import (
        build_pages_dataset,
        extract_pipeline,
        write_partitioned,
    )

    out = str(tmp_path / "streamed")
    r = write_partitioned(
        extract_pipeline(build_pages_dataset(sf_small)), out, resume=True
    )
    assert r["partitions_written"] > 0
    # total rows across partition dirs == corpus size
    assert partition_rows(out) == 500
    # resume: all partitions have manifests → extraction is filtered to 0
    r2 = write_partitioned(
        extract_pipeline(build_pages_dataset(sf_small)), out, resume=True
    )
    assert partition_rows(out) == 500  # nothing appended on resume
    # full rewrite (resume=False) wipes before writing — never doubles
    r3 = write_partitioned(
        extract_pipeline(build_pages_dataset(sf_small)), out, resume=False
    )
    assert r3["partitions_written"] > 0
    assert partition_rows(out) == 500
    # the documented audit works on this sink's deferred-checksum
    # manifests: row counts verified, no false corruption
    from ocr_lib_ray.stages.manifest import validate_job

    audit = validate_job(out)
    assert audit["partitions"] > 0 and audit["invalid"] == []


@pytest.mark.usefixtures("ray_session")
def test_streamed_sink_crash_restart_no_duplicates(sf_small, tmp_path):
    """A crashed streamed-sink run (data files present, no manifests)
    must not duplicate rows on rerun — partial partition dirs are wiped."""
    import os

    import pyarrow.parquet as pq2

    from ocr_lib_ray.pipelines.extract import (
        build_pages_dataset,
        extract_pipeline,
        write_partitioned,
    )

    out = str(tmp_path / "crashy")
    write_partitioned(extract_pipeline(build_pages_dataset(sf_small)), out)
    # simulate a crash on HALF the partitions: delete their manifests
    man = os.path.join(out, "manifest")
    for f in sorted(os.listdir(man))[:8]:
        os.remove(os.path.join(man, f))
    write_partitioned(extract_pipeline(build_pages_dataset(sf_small)), out)
    total = sum(
        pq2.ParquetFile(os.path.join(out, "data", d, f)).metadata.num_rows
        for d in os.listdir(os.path.join(out, "data"))
        for f in os.listdir(os.path.join(out, "data", d))
        if f.endswith(".parquet")
    )
    assert total == 500  # no duplicates, nothing lost


@pytest.mark.usefixtures("ray_session")
def test_partition_layout_deterministic(sf_small, tmp_path):
    """Same input → same partition files and checksums across runs
    (url-hash partitioning is stable)."""
    from ocr_lib_ray.pipelines.extract import run_extract_job
    from ocr_lib_ray.stages import manifest as m

    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    run_extract_job(sf_small, out1, resume=False)
    run_extract_job(sf_small, out2, resume=False)

    import os
    import pyarrow.parquet as pq2

    def checks(out):
        rows = {}
        for f in sorted(os.listdir(os.path.join(out, "manifest"))):
            t = pq2.read_table(os.path.join(out, "manifest", f))
            for pid, cs, nd in zip(
                t.column("partition_id").to_pylist(),
                t.column("checksum").to_pylist(),
                t.column("n_docs").to_pylist(),
            ):
                rows[pid] = (cs, nd)
        return rows

    assert checks(out1) == checks(out2)


@pytest.mark.usefixtures("ray_session")
def test_build_training_data_end_to_end(sf_small):
    """The 8-operator composition: extract → redact → line-dedup →
    exact-dedup → quality gate → chunk → pack, on one streaming
    Dataset; budget + coverage + determinism asserted."""
    from ocr_lib_ray.pipelines.corpus import build_training_data
    from ocr_lib_ray.pipelines.extract import build_pages_dataset

    a = (
        build_training_data(build_pages_dataset(sf_small))
        .to_pandas()
        .sort_values(["partition_id", "seq_id"])
        .reset_index(drop=True)
    )
    assert len(a) > 0
    assert (a["total_tokens"] <= 128).all()
    assert (a["n_chunks"] >= 1).all()
    b = (
        build_training_data(build_pages_dataset(sf_small))
        .to_pandas()
        .sort_values(["partition_id", "seq_id"])
        .reset_index(drop=True)
    )
    assert a.equals(b)  # deterministic end to end


@pytest.mark.usefixtures("ray_session")
def test_build_training_data_checkpoint_equivalent(sf_small, tmp_path):
    """checkpoint_dir (the multi-pass 100TB pattern — extract once to
    parquet, key passes re-read it) must not change the output."""
    from ocr_lib_ray.pipelines.corpus import build_training_data
    from ocr_lib_ray.pipelines.extract import build_pages_dataset

    key = ["partition_id", "seq_id"]
    a = (
        build_training_data(build_pages_dataset(sf_small))
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    b = (
        build_training_data(
            build_pages_dataset(sf_small), checkpoint_dir=str(tmp_path / "ckpt")
        )
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert a.equals(b)


@pytest.mark.usefixtures("ray_session")
def test_entry_contract(sf_small):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as em

    ds = em.entry()
    df = ds.to_pandas() if hasattr(ds, "to_pandas") else ds
    assert len(df) == 500  # sf0.001 corpus size — a 0-row entry is a bug
    assert set(["url", "text", "lang", "doc_kind"]) <= set(df.columns)
    assert set(em.oracle_sql()) <= set(em.queries())


@pytest.mark.usefixtures("ray_session")
def test_cli_clean_and_training_data(sf_small, tmp_path):
    """The composed-pipeline CLI subcommands run end-to-end and report
    footer-counted rows (reuses the session's Ray)."""
    import json

    from ocr_lib_ray.cli import main

    out_clean = str(tmp_path / "clean")
    rc = main(["clean", "--sf-dir", sf_small, "--output", out_clean])
    assert rc in (0, None)
    import glob

    import pyarrow.parquet as pq

    rows = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(f"{out_clean}/**/*.parquet", recursive=True)
    )
    assert rows == 500
    out_td = str(tmp_path / "td")
    rc = main(
        [
            "training-data",
            "--sf-dir",
            sf_small,
            "--output",
            out_td,
            "--checkpoint-dir",
            str(tmp_path / "ckpt"),
        ]
    )
    assert rc in (0, None)
    assert glob.glob(f"{out_td}/**/*.parquet", recursive=True)


@pytest.mark.usefixtures("ray_session")
def test_bundle_extra_entities_reteach():
    """The bundle's extra_entities overlay must reach entity decoding
    through the actor pool (previously a documented no-op)."""
    import pyarrow as pa
    import ray.data as rd

    from ocr_lib_ray.pipelines.extract import extract_pipeline
    from ocr_lib_ray.state.bundle import ClassifierBundle, broadcast_bundle

    html = b"<main><p>price is &currency;42 total today</p></main>"
    pages = rd.from_arrow(
        pa.Table.from_arrays(
            [
                pa.array(["https://x.test/e"], pa.string()),
                pa.array([0], pa.timestamp("us")),
                pa.array([html], pa.binary()),
                pa.array([""], pa.string()),
                pa.array(["en"], pa.string()),
            ],
            names=["url", "warc_ts", "html", "text", "lang"],
        )
    )
    base = extract_pipeline(pages).to_pandas()
    assert "&currency;" in base["text"][0]  # unknown entity passes through
    ref = broadcast_bundle(ClassifierBundle(extra_entities={"currency": "¤"}))
    taught = extract_pipeline(pages, bundle_ref=ref).to_pandas()
    assert taught["text"][0] == "price is ¤42 total today"


@pytest.mark.usefixtures("ray_session")
def test_build_training_data_join_dedup_equivalent(sf_small):
    """dedup='join' (bucketed hash-join anti-filter — nothing collected,
    the dup-heavy-corpus scale path) must equal the default broadcast
    dup-map on a dup-heavy fixture (repeat=3: every doc duplicated under
    3 distinct urls)."""
    from ocr_lib_ray.pipelines.corpus import build_training_data
    from ocr_lib_ray.pipelines.extract import build_pages_dataset

    key = ["partition_id", "seq_id"]
    # line_max_df=10 keeps the shared lines alive (repeat=3 gives every
    # line df=3; the default max_df=1 would strip duplicated docs to
    # empty text BEFORE exact dedup and trivialize the comparison)
    a = (
        build_training_data(build_pages_dataset(sf_small, repeat=3), line_max_df=10)
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    b = (
        build_training_data(
            build_pages_dataset(sf_small, repeat=3), dedup="join", line_max_df=10
        )
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert len(a) > 0
    assert a.equals(b)
    # the dedup actually bit: the dup-heavy corpus packs exactly the
    # tokens of the singleton corpus (one winner per content survives)
    c = build_training_data(build_pages_dataset(sf_small), line_max_df=10).to_pandas()
    assert a["total_tokens"].sum() == c["total_tokens"].sum()


@pytest.mark.usefixtures("ray_session")
def test_giant_band_parallel_extraction_equivalent():
    """cfg.giant_band_parallel: a multi-MB page parsed via one Ray task
    per band (skeleton-scan entry states) must extract identically to
    the sequential chunked kernel path."""
    import pyarrow as pa

    from ocr_lib_ray.stages.extract_stage import extract_batch

    html = (
        "<main>"
        + "".join(
            f"<article><h1>Doc section {i}</h1><p>content words for section {i} "
            + "more filler text " * 60
            + "</p></article>"
            for i in range(2500)
        )
        + "</main>"
    ).encode()
    assert len(html) > 2_000_000
    batch = pa.Table.from_arrays(
        [
            pa.array(["https://x/giant"], pa.string()),
            pa.array([html], pa.binary()),
        ],
        names=["url", "html"],
    )
    seq = extract_batch(batch, ExtractConfig())
    par = extract_batch(
        batch, ExtractConfig(giant_band_parallel=True, band_size=256 * 1024)
    )
    assert seq.equals(par)
    assert len(seq.column("text")[0].as_py()) > 100_000


@pytest.mark.usefixtures("ray_session")
def test_build_training_data_mixture_and_decontam_defaults_are_noops(sf_small):
    """mixture at rate 1.0 and an eval set overlapping nothing must both
    leave the packed output byte-identical to the default pipeline."""
    import pyarrow as pa
    import ray.data as rd

    from ocr_lib_ray.pipelines.corpus import build_training_data
    from ocr_lib_ray.pipelines.extract import build_pages_dataset

    key = ["partition_id", "seq_id"]
    base = (
        build_training_data(build_pages_dataset(sf_small))
        .to_pandas().sort_values(key).reset_index(drop=True)
    )
    no_overlap_eval = rd.from_arrow(
        pa.Table.from_arrays(
            [pa.array(["zz qq xx ww vv uu tt ss rr"], pa.string())], names=["text"]
        )
    )
    same = (
        build_training_data(
            build_pages_dataset(sf_small),
            mixture_rates={},  # every stratum takes the default rate 1.0
            eval_docs=no_overlap_eval,
        )
        .to_pandas().sort_values(key).reset_index(drop=True)
    )
    assert base.equals(same)


@pytest.mark.usefixtures("ray_session")
def test_build_training_data_mixture_downsamples_by_source(sf_small):
    """Zero-rating one source stratum removes its docs (fewer packed
    tokens), deterministically across runs."""
    from ocr_lib_ray.pipelines.corpus import build_training_data
    from ocr_lib_ray.pipelines.extract import build_pages_dataset

    def src_of(url: str) -> str:
        return url.split("/")[3]  # https://corpus.test/<source>/<doc_id>

    kw = dict(
        mixture_rates={"src0": 0.0, "src1": 0.0},
        mixture_key=src_of,
        mixture_default_rate=1.0,
    )
    a = build_training_data(build_pages_dataset(sf_small), **kw).to_pandas()
    base = build_training_data(build_pages_dataset(sf_small)).to_pandas()
    assert a["total_tokens"].sum() < base["total_tokens"].sum()
    b = build_training_data(build_pages_dataset(sf_small), **kw).to_pandas()
    key = ["partition_id", "seq_id"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )


@pytest.mark.usefixtures("ray_session")
def test_build_training_data_decontam_drops_planted_eval_doc(sf_small):
    """An eval set copied from a real document's text removes that
    document's tokens from the packed output."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ocr_lib_ray.pipelines.corpus import build_training_data
    from ocr_lib_ray.pipelines.extract import build_pages_dataset

    docs = pd.read_parquet(f"{sf_small}/documents.parquet", columns=["doc_id", "text"])
    rich = docs[docs["text"].str.split().str.len() >= 8].iloc[0]
    eval_ds = rd.from_arrow(
        pa.Table.from_arrays([pa.array([rich["text"]], pa.string())], names=["text"])
    )
    base = build_training_data(build_pages_dataset(sf_small)).to_pandas()
    decon = build_training_data(
        build_pages_dataset(sf_small), eval_docs=eval_ds, decontam_n=5
    ).to_pandas()
    assert decon["total_tokens"].sum() < base["total_tokens"].sum()


@pytest.mark.usefixtures("ray_session")
def test_cli_report(sf_small, capsys):
    """The report subcommand prints one JSON line of per-group corpus
    stats over the extracted docs (reuses the session's Ray)."""
    import json

    from ocr_lib_ray.cli import main

    rc = main(["report", "--sf-dir", sf_small])
    assert rc in (0, None)
    line = [l for l in capsys.readouterr().out.strip().splitlines() if l][-1]
    out = json.loads(line)
    langs = {g["lang"] for g in out["groups"]}
    assert "en" in langs and len(out["groups"]) >= 3
    assert sum(g["n_docs"] for g in out["groups"]) == 500
    for g in out["groups"]:
        assert g["n_tokens_sum"] > 0 and g["avg_tokens"] > 0


@pytest.mark.usefixtures("ray_session")
def test_cli_tokenize_matches_oracle(sf_small, tmp_path, capsys):
    """cli tokenize writes vocab.parquet + shard-partitioned encoded
    rows byte-equal to the vocab_encode oracle."""
    import glob
    import json

    import duckdb
    import pandas as pd

    import __ray_entry__ as em
    from ocr_lib_ray.cli import main

    out = str(tmp_path / "tok")
    rc = main(
        [
            "tokenize",
            "--sf-dir",
            sf_small,
            "--output",
            out,
            "--max-vocab",
            "32",
            "--shards",
            "4",
        ]
    )
    assert rc in (0, None)
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["vocab_size"] >= 1 and line["rows"] > 0

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_small}/documents.parquet')"
    )
    want = (
        con.execute(em.oracle_sql()["vocab_encode"])
        .df()
        .sort_values(["doc_id", "pos"])
        .reset_index(drop=True)
        .astype({"doc_id": "int64", "pos": "int64", "token_id": "int64"})
    )
    files = glob.glob(f"{out}/encoded/**/*.parquet", recursive=True)
    got = con.execute(
        f"SELECT doc_id, pos, token_id FROM read_parquet({files!r}) "
        "ORDER BY doc_id, pos"
    ).df()
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
def test_cli_compact_preserves_content(sf_small, tmp_path, capsys):
    """compact rewrites many small files into few, content-preserving
    (hive partition column folded into the data, full row multiset
    equal via DuckDB sorted compare)."""
    import glob
    import json

    import duckdb

    from ocr_lib_ray.cli import main

    tok = str(tmp_path / "tok")
    rc = main(
        ["tokenize", "--sf-dir", sf_small, "--output", tok, "--max-vocab", "8",
         "--shards", "4"]
    )
    assert rc in (0, None)
    out = str(tmp_path / "compact")
    rc = main(
        ["compact", "--input", f"{tok}/encoded", "--output", out,
         "--target-files", "2"]
    )
    assert rc in (0, None)
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["row_counts_match"] is True
    assert line["files_out"] < line["files_in"]

    con = duckdb.connect()
    a = glob.glob(f"{tok}/encoded/**/*.parquet", recursive=True)
    b = glob.glob(f"{out}/**/*.parquet", recursive=True)
    diff = con.execute(
        f"""
        SELECT count(*) FROM (
            (SELECT doc_id, pos, token_id, shard
             FROM read_parquet({a!r}, hive_partitioning=1)
             EXCEPT
             SELECT doc_id, pos, token_id, shard FROM read_parquet({b!r}))
            UNION ALL
            (SELECT doc_id, pos, token_id, shard FROM read_parquet({b!r})
             EXCEPT
             SELECT doc_id, pos, token_id, shard
             FROM read_parquet({a!r}, hive_partitioning=1))
        )
        """
    ).fetchone()[0]
    assert diff == 0


@pytest.mark.usefixtures("ray_session")
def test_infer_glyph_widths_ds_distributed():
    """Distributed width inference (round 5, the corpus-side
    nauci-slova completion): a pages Dataset of pdf_prop fixtures plus
    non-PDF noise yields the fixture font table with NO taught bundle,
    and the inferred table splits proportional lines exactly like the
    taught PROP_WIDTHS."""
    import pyarrow as pa
    import ray.data as rd

    from ocr_lib_ray.config import ExtractConfig
    from ocr_lib_ray.kernel.extract import extract_document
    from ocr_lib_ray.sources.pages import PROP_GAP, PROP_WIDTHS, make_pdf_prop
    from ocr_lib_ray.state.bundle import infer_glyph_widths_ds

    pool = (
        "some sensible words make each generated line split across runs "
        "narrow fill till rift mass stone loom rates moon tiles quick "
        "brown vixens jump over lazy dogs while zebras graze Words Like "
        "These Should Also Split Very Often"
    ).split(" ")
    texts = {
        d: " ".join(pool[(7 * i + 3 * d) % len(pool)] for i in range(37))
        for d in range(20)
    }
    payloads = [make_pdf_prop(d, t) for d, t in texts.items()]
    payloads += [b"<html><body><p>not a pdf</p></body></html>", None]
    pages = rd.from_arrow(pa.table({"html": pa.array(payloads, pa.binary())}))
    widths, gap = infer_glyph_widths_ds(pages, min_count=3)
    assert abs(gap - PROP_GAP / 12.0) < 1e-3
    assert widths, "must learn something"
    for c, w in widths.items():
        assert abs(w - PROP_WIDTHS[c]) < 1e-3, (c, w)
    payload = make_pdf_prop(0, texts[0])
    inferred = extract_document(payload, ExtractConfig(pdf_glyph_widths=widths))
    taught = extract_document(
        payload, ExtractConfig(pdf_glyph_widths=dict(PROP_WIDTHS))
    )
    assert inferred.text == taught.text
    assert len(inferred.spans) == len(taught.spans)


@pytest.mark.usefixtures("ray_session")
def test_giant_band_parallel_concurrent_parents_no_deadlock():
    """Round-5 default-ON pin: at the session's num_cpus=4, EIGHT
    concurrent giant parents each fanning out band tasks must complete
    (a blocked parent task releases its CPU — no nested-task deadlock)
    and extract identically to the sequential chunked path."""
    import pyarrow as pa
    import ray.data as rd

    from ocr_lib_ray.stages.extract_stage import extract_batch

    def page(i: int) -> bytes:
        return (
            "<main>"
            + "".join(
                f"<article><h1>G{i} s{j}</h1><p>words for {i}/{j} "
                + "filler " * 40
                + "</p></article>"
                for j in range(400)
            )
            + "</main>"
        ).encode()

    rows = pa.table(
        {
            "url": pa.array([f"https://x/g{i}" for i in range(8)], pa.string()),
            "html": pa.array([page(i) for i in range(8)], pa.binary()),
        }
    )
    cfg = ExtractConfig(band_size=16 * 1024)  # default giant_band_parallel=True
    assert cfg.giant_band_parallel  # the round-5 default
    assert all(len(h.as_py()) > 5 * cfg.band_size for h in rows.column("html"))
    par = (
        rd.from_arrow(rows)
        .repartition(8)
        .map_batches(lambda b, _c=cfg: extract_batch(b, _c), batch_format="pyarrow")
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    seq = (
        extract_batch(rows, ExtractConfig(giant_band_parallel=False))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert (par["url"] == seq["url"]).all()
    assert (par["text"] == seq["text"]).all()
    assert (par["text"].str.len() > 10_000).all()
