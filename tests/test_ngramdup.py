"""Gates for cross-document duplicated-span detection/removal
(functions/ngramdup): planted-span semantics, intra-doc repetition NOT
counted as duplication, overlap coverage, block-layout invariance."""

import pyarrow as pa
import pytest

from ocr_lib_ray.functions.ngramdup import (
    dup_ngram_stats,
    hot_ngrams,
    remove_dup_ngrams,
)


def _ds(rows, num_blocks=1):
    import ray.data as rd

    t = pa.Table.from_arrays(
        [
            pa.array([r[0] for r in rows], pa.int64()),
            pa.array([r[1] for r in rows], pa.string()),
        ],
        names=["doc_id", "text"],
    )
    return rd.from_arrow(t).repartition(num_blocks)


# the 3-gram "shared boiler plate" is planted in docs 1 and 2 only
ROWS = [
    (1, "alpha shared boiler plate omega"),
    (2, "start shared boiler plate end unique2"),
    (3, "totally different words entirely here"),
    (4, ""),  # empty doc: row emitted, zeros
    (5, "repeat repeat repeat repeat repeat"),  # intra-doc only: NOT dup
]


@pytest.mark.usefixtures("ray_session")
def test_planted_span_coverage_and_empty_doc():
    stats = {
        r["doc_id"]: r
        for r in dup_ngram_stats(_ds(ROWS), n=3, min_df=2).take_all()
    }
    assert len(stats) == 5
    # docs 1,2: exactly the 3 tokens of the planted gram are covered
    assert stats[1]["n_dup_tokens"] == 3 and stats[1]["n_hot_grams"] == 1
    assert stats[2]["n_dup_tokens"] == 3
    assert stats[1]["dup_frac"] == round(3 / 5, 6)
    # doc 3 shares nothing; doc 4 empty; doc 5 repeats only within itself
    for i in (3, 4, 5):
        assert stats[i]["n_dup_tokens"] == 0 and stats[i]["dup_frac"] == 0.0
    assert stats[4]["n_tokens"] == 0


@pytest.mark.usefixtures("ray_session")
def test_rewrite_removes_exactly_covered_tokens():
    out = {
        r["doc_id"]: r["text"]
        for r in remove_dup_ngrams(_ds(ROWS), n=3, min_df=2).take_all()
    }
    assert out[1] == "alpha omega"
    assert out[2] == "start end unique2"
    assert out[3] == "totally different words entirely here"
    assert out[4] == ""
    assert out[5] == "repeat repeat repeat repeat repeat"


@pytest.mark.usefixtures("ray_session")
def test_overlapping_hot_grams_union_coverage():
    # "a b c d" in both docs → grams (a b c) and (b c d) both hot in
    # doc 1; coverage is the UNION (4 tokens), not 6
    rows = [(1, "x a b c d y"), (2, "a b c d")]
    stats = {
        r["doc_id"]: r for r in dup_ngram_stats(_ds(rows), n=3, min_df=2).take_all()
    }
    assert stats[1]["n_hot_grams"] == 2 and stats[1]["n_dup_tokens"] == 4
    assert stats[2]["n_dup_tokens"] == 4 and stats[2]["dup_frac"] == 1.0


@pytest.mark.usefixtures("ray_session")
def test_block_layout_invariance_and_min_df():
    one = sorted(
        tuple(r.values()) for r in dup_ngram_stats(_ds(ROWS, 1), n=3, min_df=2).take_all()
    )
    many = sorted(
        tuple(r.values()) for r in dup_ngram_stats(_ds(ROWS, 5), n=3, min_df=2).take_all()
    )
    assert one == many
    # min_df=3: the planted pair no longer qualifies → empty hot set
    assert hot_ngrams(_ds(ROWS), n=3, min_df=3) == set()


@pytest.mark.usefixtures("ray_session")
def test_max_hot_guard():
    with pytest.raises(ValueError, match="max_hot"):
        hot_ngrams(_ds(ROWS), n=3, min_df=2, max_hot=0)


@pytest.mark.usefixtures("ray_session")
def test_decontaminate_flags_eval_overlap_only():
    from ocr_lib_ray.functions.ngramdup import decontaminate

    eval_rows = [(100, "the secret benchmark answer is forty two")]
    train = [
        (1, "clean text with no overlap at all"),
        # contains one eval 5-gram ("secret benchmark answer is forty")
        (2, "leaked prefix the secret benchmark answer is forty something"),
        (3, ""),  # empty: never contaminated
        # full eval doc verbatim → 3 distinct 5-grams hit
        (4, "the secret benchmark answer is forty two"),
    ]
    out = {
        r["doc_id"]: r
        for r in decontaminate(_ds(train), _ds(eval_rows), n=5).take_all()
    }
    assert out[1]["contaminated"] == 0 and out[1]["n_eval_grams"] == 0
    assert out[2]["contaminated"] == 1 and out[2]["n_eval_grams"] == 2
    assert out[3]["contaminated"] == 0
    assert out[4]["n_eval_grams"] == 3 and out[4]["contaminated"] == 1


@pytest.mark.usefixtures("ray_session")
def test_decontaminate_eval_guard():
    from ocr_lib_ray.functions.ngramdup import decontaminate

    with pytest.raises(ValueError, match="max_eval_grams"):
        decontaminate(
            _ds(ROWS), _ds([(9, "a b c d e f g")]), n=5, max_eval_grams=1
        ).take_all()


@pytest.mark.usefixtures("ray_session")
def test_join_path_equals_broadcast():
    """dup_ngram_stats_join (no driver hot set — semi join + Sum-
    aggregate stitch) must equal the broadcast path row-for-row on the
    planted corpus, at two partition counts, on a no-duplicates corpus
    (empty hot side) and on an overlap-heavy one."""
    import pandas as pd

    from ocr_lib_ray.functions.ngramdup import dup_ngram_stats_join

    def both(rows, **kw):
        b = (
            dup_ngram_stats(_ds(rows, num_blocks=2), n=3, min_df=2)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        j = (
            dup_ngram_stats_join(_ds(rows, num_blocks=2), n=3, min_df=2, **kw)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(b, j[b.columns.tolist()])

    both(ROWS, num_partitions=1)
    both(ROWS, num_partitions=7)
    both([(1, "p q r"), (2, "s t u")])  # no hot grams at all
    both(
        [
            (1, "w w w w w w"),
            (2, "a w w w b w w w"),
            (3, ""),
        ]
    )  # overlapping hot-gram coverage + empty doc


@pytest.mark.usefixtures("ray_session")
def test_rewrite_join_path_equals_broadcast():
    """remove_dup_ngrams_join == remove_dup_ngrams on the planted
    corpus, a no-duplicates corpus, and an all-covered document."""
    import pandas as pd

    from ocr_lib_ray.functions.ngramdup import remove_dup_ngrams_join

    for rows in (
        ROWS,
        [(1, "p q r"), (2, "s t u")],
        [(1, "w w w w"), (2, "w w w w"), (3, "")],
    ):
        b = (
            remove_dup_ngrams(_ds(rows, num_blocks=2), n=3, min_df=2)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        j = (
            remove_dup_ngrams_join(_ds(rows, num_blocks=2), n=3, min_df=2, num_partitions=5)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(b, j[b.columns.tolist()])


@pytest.mark.usefixtures("ray_session")
def test_contamination_report_hand_counts():
    """Planted overlap: the eval doc shares exactly its first 5-gram
    window (2 positions) with a training doc; positions are counted,
    short/empty eval docs report (0, 0, 0)."""
    import pyarrow as pa
    import ray.data as rd

    from ocr_lib_ray.functions.ngramdup import contamination_report

    def docs(rows):
        return rd.from_arrow(
            pa.Table.from_arrays(
                [
                    pa.array([r[0] for r in rows], pa.int64()),
                    pa.array([r[1] for r in rows], pa.string()),
                ],
                names=["doc_id", "text"],
            )
        )

    # eval doc 1: tokens a b c d e f -> 2 positions; window [a..e]
    # appears verbatim in train doc 10, window [b..f] nowhere
    eval_ds = docs([(1, "a b c d e f"), (2, "x y"), (3, "")])
    train_ds = docs([(10, "zz a b c d e zz"), (11, "unrelated text here")])
    out = {
        r["doc_id"]: (r["n_grams"], r["n_dirty"], r["dirty_micro"])
        for r in contamination_report(eval_ds, train_ds, n=5).take_all()
    }
    assert out[1] == (2, 1, 500_000)
    assert out[2] == (0, 0, 0)
    assert out[3] == (0, 0, 0)
