"""curation.py — normalized dedup, blocklist filter, shard shuffle,
GROUPING SETS rollup: DuckDB equivalence plus the semantic corner
cases the sf fixtures never exercise (unicode punctuation, phrase
word-boundaries, shard-count contracts, single-group rollups)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ocr_lib_ray.functions.curation import (
    blocklist_pattern,
    dedup_normalized,
    filter_blocklist,
    normalize_aggressive,
    rollup_stats,
    shuffle_shards,
)


def _docs_table(rows):
    """rows: (doc_id, text, lang, source)"""
    ids, texts, langs, sources = zip(*rows)
    return pa.Table.from_arrays(
        [
            pa.array(ids, pa.int64()),
            pa.array(texts, pa.string()),
            pa.array(langs, pa.string()),
            pa.array(sources, pa.string()),
            pa.array([len(t) for t in texts], pa.int64()),
        ],
        names=["doc_id", "text", "lang", "source", "n_chars"],
    )


def _duck(sql, tbl):
    con = duckdb.connect()
    con.register("documents", tbl)
    return con.execute(sql).df()


# --- normalize_aggressive ---------------------------------------------------


def test_normalize_aggressive_matches_duckdb_on_messy_text():
    texts = [
        "Hello,   World!!",
        "a-b_c.d",
        "  MiXeD   CaSe  ",
        "",
        "123  abc\t\ndef",
        "naïve café",  # non-ascii letters are separators on both sides
    ]
    got = normalize_aggressive(pa.chunked_array([pa.array(texts)])).to_pylist()
    con = duckdb.connect()
    want = [
        con.execute(
            "SELECT trim(regexp_replace(lower(?), '[^a-z0-9]+', ' ', 'g'))", [t]
        ).fetchone()[0]
        for t in texts
    ]
    assert got == want
    assert got[0] == "hello world"
    assert got[1] == "a b c d"


# --- dedup_normalized -------------------------------------------------------


@pytest.mark.usefixtures("ray_session")
def test_dedup_normalized_collapses_reformatted_copies():
    tbl = _docs_table(
        [
            (10, "Hello, World!", "en", "s"),
            (3, "hello   world", "en", "s"),  # same normal form, min id wins
            (7, "HELLO WORLD.", "en", "s"),
            (2, "different text", "en", "s"),
            (5, "", "en", "s"),
            (6, "!!!", "en", "s"),  # normalizes to "" too
        ]
    )
    got = (
        dedup_normalized(rd.from_arrow(tbl))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {"doc_id": [2, 3, 5], "n_copies": [1, 3, 2]}, dtype="int64"
    )
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
def test_dedup_keep_best_longest_variant_wins():
    from ocr_lib_ray.functions.curation import dedup_keep_best

    tbl = _docs_table(
        [
            (10, "Hello, World!", "en", "s"),   # 13 chars — winner
            (3, "hello   world", "en", "s"),    # 13 chars, larger id loses tie? no: tie -> min id = 3
            (7, "HELLO WORLD", "en", "s"),      # 11 chars
            (2, "other", "en", "s"),
        ]
    )
    got = (
        dedup_keep_best(rd.from_arrow(tbl).repartition(3))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype("int64")
    )
    # ids 10 and 3 both have n_chars=13; tie broken on MIN doc_id -> 3
    want = pd.DataFrame({"doc_id": [2, 3], "n_chars": [5, 13]}, dtype="int64")
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
def test_dedup_keep_best_prefers_length_over_id():
    from ocr_lib_ray.functions.curation import dedup_keep_best

    tbl = _docs_table(
        [
            (1, "doc body", "en", "s"),          # 8 chars, min id
            (9, "doc... body!!!", "en", "s"),    # 14 chars, same normal form
        ]
    )
    got = dedup_keep_best(rd.from_arrow(tbl)).to_pandas()
    assert got["doc_id"].tolist() == [9]
    assert got["n_chars"].tolist() == [14]


# --- filter_blocklist -------------------------------------------------------


def test_blocklist_pattern_escapes_meta_not_space():
    # \b anchors only at word-char edges: a trailing \b after '+' would
    # silently disable the 'c++' term (review finding, round 3)
    p = blocklist_pattern(["a.b", "slow query", "c++"])
    assert p == r"(?:\ba\.b\b|\bslow query\b|\bc\+\+)"
    with pytest.raises(ValueError, match="empty term list"):
        blocklist_pattern([])
    with pytest.raises(ValueError, match="empty term"):
        blocklist_pattern(["ok", ""])


@pytest.mark.usefixtures("ray_session")
def test_filter_blocklist_nonword_edge_terms_actually_filter():
    tbl = _docs_table(
        [
            (1, "we use c++ daily", "en", "s"),   # blocked
            (2, "cpp is fine", "en", "s"),        # kept
            (3, "abc++ though", "en", "s"),       # kept: 'c++' needs \b before c
        ]
    )
    got = filter_blocklist(rd.from_arrow(tbl), ["c++"]).to_pandas()
    assert sorted(got["doc_id"]) == [2, 3]


@pytest.mark.usefixtures("ray_session")
def test_filter_blocklist_word_boundaries_and_phrases():
    tbl = _docs_table(
        [
            (1, "contains spam here", "en", "s"),       # blocked: word
            (2, "spammy is fine", "en", "s"),           # kept: boundary
            (3, "a very slow query indeed", "en", "s"),  # blocked: phrase
            (4, "slow and a query apart", "en", "s"),    # kept: not adjacent
            (5, "SPAM uppercase", "en", "s"),            # blocked: lowercased
            (6, "clean document", "en", "s"),
        ]
    )
    got = (
        filter_blocklist(rd.from_arrow(tbl), ["spam", "slow query"])
        .to_pandas()
        .sort_values("doc_id")
    )
    assert got["doc_id"].tolist() == [2, 4, 6]
    assert list(got.columns) == ["doc_id", "source", "lang"]


# --- shuffle_shards ---------------------------------------------------------


@pytest.mark.usefixtures("ray_session")
def test_shuffle_shards_matches_duckdb_and_is_a_permutation():
    tbl = _docs_table([(i, f"doc {i}", "en", "s") for i in range(97)])
    got = (
        shuffle_shards(rd.from_arrow(tbl.select(["doc_id"])), num_shards=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype("int64")
    )
    # non-key input columns ride along untouched (composed pipelines
    # carry source through the shard assignment)
    carried = shuffle_shards(
        rd.from_arrow(tbl.select(["doc_id", "source"])), num_shards=5
    ).to_pandas()
    assert list(carried.columns) == ["doc_id", "source", "shard", "pos"]
    assert (carried["source"] == "s").all()
    want = (
        _duck(
            """
            WITH k AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
                              CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 5
                                   AS BIGINT) AS shard
                       FROM documents)
            SELECT doc_id, shard,
                   row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) - 1
                   AS pos
            FROM k
            """,
            tbl,
        )
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype("int64")
    )
    pd.testing.assert_frame_equal(got[want.columns], want)
    # per-shard positions are exactly 0..len-1 (a permutation, no gaps)
    for _, g in got.groupby("shard"):
        assert sorted(g["pos"]) == list(range(len(g)))


@pytest.mark.usefixtures("ray_session")
def test_shuffle_shards_derives_shard_count_from_rows():
    tbl = _docs_table([(i, "x", "en", "s") for i in range(10)])
    out = shuffle_shards(rd.from_arrow(tbl), approx_rows=250_000).to_pandas()
    assert out["shard"].max() <= 2  # ceil(250k / 100k) = 3 shards


# --- rollup_stats -----------------------------------------------------------


@pytest.mark.usefixtures("ray_session")
def test_rollup_matches_duckdb_grouping_sets():
    tbl = _docs_table(
        [
            (1, "aa", "en", "s1"),
            (2, "bbbb", "de", "s1"),
            (3, "c", "en", "s2"),
            (4, "dd", "en", "s1"),
        ]
    )
    got = (
        rollup_stats(rd.from_arrow(tbl).repartition(3))
        .to_pandas()
        .sort_values(["level", "source", "lang"])
        .reset_index(drop=True)
    )
    want = (
        _duck(
            """
            SELECT CASE WHEN GROUPING(source) = 0 AND GROUPING(lang) = 0
                        THEN 'source_lang'
                        WHEN GROUPING(source) = 0 THEN 'source'
                        ELSE 'total' END AS level,
                   COALESCE(source, '*') AS source,
                   COALESCE(lang, '*') AS lang,
                   count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS n_chars_sum
            FROM documents
            GROUP BY GROUPING SETS ((source, lang), (source), ())
            """,
            tbl,
        )
        .sort_values(["level", "source", "lang"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)
    total = got[got["level"] == "total"]
    assert len(total) == 1
    assert total["n_docs"].iloc[0] == 4
    assert total["n_chars_sum"].iloc[0] == 9


@pytest.mark.usefixtures("ray_session")
def test_rollup_null_group_key_raises():
    tbl = _docs_table([(1, "x", "en", "s")])
    tbl = tbl.set_column(
        tbl.column_names.index("source"),
        "source",
        pa.array([None], pa.string()),
    )
    with pytest.raises(Exception, match="null keys in group column"):
        rollup_stats(rd.from_arrow(tbl))  # eager: the one pass runs here


# --- budget_sample (sampling.py, same curation family) ----------------------


@pytest.mark.usefixtures("ray_session")
def test_budget_sample_hits_token_budgets_approximately():
    from ocr_lib_ray.functions.sampling import budget_sample

    # 200 docs of 10 tokens per source -> 2000 tokens each
    rows = []
    for s in ("a", "b", "c"):
        for i in range(200):
            rows.append((len(rows), "w " * 9 + "w", "en", s))
    tbl = _docs_table(rows)
    out = budget_sample(
        rd.from_arrow(tbl), {"a": 1000.0, "b": 0.0}
    ).to_pandas()
    per_src = out.groupby("source").size()
    assert "b" not in per_src  # zero budget drops the source
    assert per_src["c"] == 200  # unbudgeted source kept whole
    # rate 0.5 on 200 docs: expect ~100 survivors (md5-binomial, wide
    # tolerance — determinism, not the exact count, is the contract)
    assert 60 <= per_src["a"] <= 140


@pytest.mark.usefixtures("ray_session")
def test_budget_sample_deterministic_and_layout_invariant():
    from ocr_lib_ray.functions.sampling import budget_sample

    rows = [(i, f"tok{i} " * 5, "en", f"s{i % 3}") for i in range(90)]
    tbl = _docs_table(rows)
    a = (
        budget_sample(rd.from_arrow(tbl), {"s0": 50.0, "s1": 120.0})
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        budget_sample(rd.from_arrow(tbl).repartition(7), {"s0": 50.0, "s1": 120.0})
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_budget_sample_budget_at_or_above_total_keeps_all():
    from ocr_lib_ray.functions.sampling import budget_sample

    rows = [(i, "one two three", "en", "s") for i in range(10)]
    out = budget_sample(rd.from_arrow(_docs_table(rows)), {"s": 30.0}).to_pandas()
    assert len(out) == 10  # budget == total -> rate 1.0 -> keep all


# --- curate_corpus (composed pipeline) ---------------------------------------


@pytest.mark.usefixtures("ray_session")
def test_curate_corpus_checkpoint_equivalence(tmp_path):
    from ocr_lib_ray.pipelines.curate import curate_corpus

    rows = []
    for i in range(120):
        src = f"s{i % 3}"
        text = "blocked term here" if i % 10 == 0 else f"body {i % 7} " * 4
        rows.append((i, text, "en", src))
    tbl = _docs_table(rows)
    terms = ["blocked term"]
    budgets = {"s0": 50.0, "s2": 0.0}
    a = (
        curate_corpus(rd.from_arrow(tbl), terms, budgets, num_shards=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        curate_corpus(
            rd.from_arrow(tbl).repartition(5),
            terms,
            budgets,
            num_shards=3,
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b[a.columns])
    # every stage bit: blocked docs gone, s2 dropped, dedup collapsed
    # the 7 distinct bodies per source
    assert not a.empty
    assert set(a["source"]) <= {"s0", "s1"}
    assert a["doc_id"].nunique() == len(a)
    assert list(a.columns) == ["doc_id", "source", "shard", "pos"]


@pytest.mark.usefixtures("ray_session")
def test_budget_sample_precomputed_totals_skip_pass_one():
    from ocr_lib_ray.functions.sampling import budget_sample

    rows = [(i, "tok " * 10, "en", "s") for i in range(100)]
    tbl = _docs_table(rows)
    a = (
        budget_sample(rd.from_arrow(tbl), {"s": 500.0})
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        budget_sample(rd.from_arrow(tbl), {"s": 500.0}, totals={"s": 1000})
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_curate_corpus_ppl_gate_drops_worst_tercile():
    from ocr_lib_ray.pipelines.curate import curate_corpus

    # 9 'en' docs in three classes (3 each) so the per-language
    # terciles split them cleanly.  Under the corpus-trained MLE
    # bigram LM: the singleton-vocab docs (c d e f) have only
    # probability-1 pairs -> NLL 0 (head); the pure 'a' runs sit at
    # P(a|a)=30/39 (middle); the mixed 'a a bR' docs pay the rare
    # (a,bR) pair -> highest NLL (tail, dropped).
    rows = []
    i = 0
    for rep in range(3):
        rows.append((i, "a a a a a a a a", "en", "s")); i += 1
    for rep in range(3):
        rows.append((i, f"a a b{rep} a a a", "en", "s")); i += 1
    for rep in range(3):
        rows.append((i, f"c{rep} d{rep} e{rep} f{rep}", "en", "s")); i += 1
    # one solo-language doc: its own tercile boundary -> always kept
    rows.append((i, "zz yy xx ww", "xx", "s")); i += 1
    tbl = _docs_table(rows)
    out = curate_corpus(
        rd.from_arrow(tbl).repartition(3),
        ["blockedterm"],
        {},
        num_shards=2,
        ppl_keep=("head", "middle"),
    ).to_pandas()
    kept = set(out["doc_id"])
    # the tail class (mixed 'a a bR') must be gone; dedup collapses the
    # identical 'a'-run class to its min-id winner
    assert not {3, 4, 5} & kept, "worst-tercile docs must be gone"
    assert 9 in kept, "solo-language doc is its own head"
    assert kept == {0, 6, 7, 8, 9}

    with pytest.raises(ValueError, match="ppl_keep"):
        curate_corpus(
            rd.from_arrow(tbl), ["blockedterm"], {}, ppl_keep=("head", "bogus")
        ).to_pandas()
