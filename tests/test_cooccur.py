"""cooccurrence_topk — windowed collocation counts: hand-checked
window semantics, batch-layout invariance, and ties at the k boundary."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ocr_lib_ray.functions.tokens import cooccurrence_topk


def _docs(texts):
    return pa.Table.from_arrays(
        [
            pa.array(range(len(texts)), pa.int64()),
            pa.array(texts, pa.string()),
        ],
        names=["doc_id", "text"],
    )


@pytest.mark.usefixtures("ray_session")
def test_cooccurrence_window_semantics_hand_checked():
    # "a b c d": window=2 pairs (positions): ab ac bc bd cd -> 5 pairs
    got = (
        cooccurrence_topk(rd.from_arrow(_docs(["a b c d"])), window=2, k=10)
        .to_pandas()
        .sort_values(["w1", "w2"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "w1": ["a", "a", "b", "b", "c"],
            "w2": ["b", "c", "c", "d", "d"],
            "n_pairs": [1, 1, 1, 1, 1],
        }
    )
    want["n_pairs"] = want["n_pairs"].astype("int64")
    pd.testing.assert_frame_equal(got[["w1", "w2", "n_pairs"]], want)


@pytest.mark.usefixtures("ray_session")
def test_cooccurrence_unordered_and_repeated_tokens():
    # "b a b": window=2 -> (a,b) from b-a and a-b, (b,b) from b..b
    got = (
        cooccurrence_topk(rd.from_arrow(_docs(["b a b"])), window=2, k=10)
        .to_pandas()
        .set_index(["w1", "w2"])["n_pairs"]
    )
    assert got[("a", "b")] == 2
    assert got[("b", "b")] == 1


@pytest.mark.usefixtures("ray_session")
def test_cooccurrence_never_crosses_docs_and_layout_invariant():
    texts = ["x y", "y z"] * 20 + ["", "solo"]
    a = (
        cooccurrence_topk(rd.from_arrow(_docs(texts)), window=3, k=50)
        .to_pandas()
        .sort_values(["w1", "w2"])
        .reset_index(drop=True)
    )
    b = (
        cooccurrence_topk(rd.from_arrow(_docs(texts)).repartition(9), window=3, k=50)
        .to_pandas()
        .sort_values(["w1", "w2"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    pairs = set(zip(a["w1"], a["w2"]))
    assert ("x", "z") not in pairs  # never across documents
    assert pairs == {("x", "y"), ("y", "z")}
    assert a.set_index(["w1", "w2"])["n_pairs"].eq(20).all()


@pytest.mark.usefixtures("ray_session")
def test_cooccurrence_k_boundary_is_deterministic():
    # 3 pairs all with count 1; k=2 must keep the lexicographically
    # smallest two (n desc, w1 asc, w2 asc)
    got = cooccurrence_topk(
        rd.from_arrow(_docs(["a b", "c d", "e f"])), window=1, k=2
    ).to_pandas()
    assert list(zip(got["w1"], got["w2"])) == [("a", "b"), ("c", "d")]


@pytest.mark.usefixtures("ray_session")
def test_bpe_pair_counts_golden():
    """BPE round-1 candidates on a hand-countable corpus: 'aaab' has
    pairs aa,aa,ab; 'ab' adds ab; single-char words contribute none;
    tie order is (n DESC, pair ASC)."""
    import pyarrow as pa
    import ray.data as rd

    from ocr_lib_ray.functions.tokens import bpe_pair_counts

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": ["aaab ab x", "ba x y z"],
        }
    )
    out = bpe_pair_counts(rd.from_arrow(tbl), k=10).to_pandas()
    assert list(map(tuple, out.itertuples(index=False))) == [
        ("aa", 2), ("ab", 2), ("ba", 1)
    ]


@pytest.mark.usefixtures("ray_session")
def test_build_vocab_rank_order_and_cap():
    """ids follow (n DESC, md5, token); the cap keeps exactly the
    top-V of that SAME order even when counts arrive in many blocks
    (the multi-block prune-then-cut path)."""
    import hashlib

    from ocr_lib_ray.functions.tokens import build_vocab

    texts = ["a a a b b c", "c d e f g h i j k", "b c x y z w q r s t"]
    full = (
        build_vocab(rd.from_arrow(_docs(texts)).repartition(3))
        .to_pandas()
        .sort_values("token_id")
        .reset_index(drop=True)
    )
    # reference order computed directly
    from collections import Counter

    cnt = Counter(" ".join(texts).split())
    ref = sorted(
        cnt.items(),
        key=lambda kv: (-kv[1], hashlib.md5(kv[0].encode()).hexdigest(), kv[0]),
    )
    assert full["token"].tolist() == [t for t, _ in ref]
    assert full["token_id"].tolist() == list(range(len(ref)))
    assert full["n"].tolist() == [n for _, n in ref]

    capped = (
        build_vocab(rd.from_arrow(_docs(texts)).repartition(3), max_vocab=5)
        .to_pandas()
        .sort_values("token_id")
        .reset_index(drop=True)
    )
    assert len(capped) == 5
    assert capped["token"].tolist() == [t for t, _ in ref[:5]]


@pytest.mark.usefixtures("ray_session")
def test_build_vocab_bucket_invariance():
    """The distributed rank is identical at any rank_buckets level."""
    from ocr_lib_ray.functions.tokens import build_vocab

    texts = ["alpha beta gamma delta", "beta gamma gamma", "x y z alpha"]
    outs = []
    for rb in (1, 16, 256):
        outs.append(
            build_vocab(rd.from_arrow(_docs(texts)).repartition(2), rank_buckets=rb)
            .to_pandas()
            .sort_values("token_id")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])


@pytest.mark.usefixtures("ray_session")
def test_encode_docs_oov_and_positions():
    from ocr_lib_ray.functions.tokens import encode_docs

    # vocab cap 2 -> only the two most frequent tokens get ids; every
    # other token must encode as -1, positions 0-based per doc
    texts = ["a a b c", "", "b a"]
    got = (
        encode_docs(rd.from_arrow(_docs(texts)).repartition(2), max_vocab=2)
        .to_pandas()
        .sort_values(["doc_id", "pos"])
        .reset_index(drop=True)
    )
    # counts: a=3, b=2 -> ids {a, b}; c OOV; empty doc 1 emits nothing
    assert got["doc_id"].tolist() == [0, 0, 0, 0, 2, 2]
    assert got["pos"].tolist() == [0, 1, 2, 3, 0, 1]
    ids = dict()
    a_id = got.loc[0, "token_id"]
    b_id = got.loc[2, "token_id"]
    assert got["token_id"].tolist() == [a_id, a_id, b_id, -1, b_id, a_id]
    assert {a_id, b_id} == {0, 1}
    assert (got["token_id"] >= -1).all()


def test_build_vocab_rejects_bad_buckets():
    from ocr_lib_ray.functions.tokens import build_vocab

    with pytest.raises(ValueError):
        build_vocab(None, rank_buckets=100)  # not a divisor of 65536
    with pytest.raises(ValueError):
        build_vocab(None, max_vocab=0)


@pytest.mark.usefixtures("ray_session")
def test_bpe_train_hand_checked_merge_loop():
    """The iterative loop actually iterates: after 'l'+'l' merges,
    round 2 must count the NEW 'll' symbol, and the padded-space
    replace semantics leave a 4-run as [ll, l, l]-style greedy output
    exactly like str.replace."""
    from ocr_lib_ray.functions.tokens import bpe_train

    # 'hello' x3, 'llll' x1:
    # round 0 pairs: l+l: hello has 1, llll has 2 (greedy pairs at
    # offsets 1,2,3 -> adjacent count is 3 occurrences but COUNTING is
    # per adjacency: l-l appears 1 (hello) *3 + 3 (llll) = 6
    out = bpe_train(
        rd.from_arrow(_docs(["hello hello hello", "llll"])), n_merges=2
    ).to_pandas()
    assert out.loc[0, "left"] == "l" and out.loc[0, "right"] == "l"
    assert out.loc[0, "n"] == 6
    # after merging: hello -> h e ll o; llll -> ll ll
    # round 1 pairs: (e,ll):3 (h,e):3 (ll,o):3 (ll,ll):1 -> tie on 3,
    # lexicographic (left, right): ('e','ll') < ('h','e')? 'e'<'h' yes
    assert out.loc[1, "left"] == "e" and out.loc[1, "right"] == "ll"
    assert out.loc[1, "n"] == 3


@pytest.mark.usefixtures("ray_session")
def test_bpe_train_layout_invariance_and_guard():
    import pandas as pd

    from ocr_lib_ray.functions.tokens import bpe_train

    texts = ["the quick brown fox", "the lazy dog the end", "quick quick"]
    a = bpe_train(rd.from_arrow(_docs(texts)), n_merges=4).to_pandas()
    b = bpe_train(
        rd.from_arrow(_docs(texts)).repartition(3), n_merges=4
    ).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    with pytest.raises(ValueError, match="max_words"):
        bpe_train(rd.from_arrow(_docs(texts)), n_merges=1, max_words=2)
    with pytest.raises(ValueError, match="n_merges"):
        bpe_train(rd.from_arrow(_docs(texts)), n_merges=0)


@pytest.mark.usefixtures("ray_session")
def test_bpe_encode_roundtrip_and_oov_path():
    """Pieces concatenate back to the word (lossless segmentation),
    layout-invariant; an OOV word (not in the training dict) segments
    by applying the same merge list on the fly."""
    import pandas as pd

    from ocr_lib_ray.functions.tokens import bpe_encode

    texts = ["hello hello world", "hold the world"]
    got = (
        bpe_encode(rd.from_arrow(_docs(texts)), n_merges=3)
        .to_pandas()
        .sort_values(["doc_id", "word_pos", "piece_pos"])
        .reset_index(drop=True)
    )
    # roundtrip: concat pieces per (doc, word) == the original word
    joined = (
        got.groupby(["doc_id", "word_pos"], sort=True)["piece"]
        .apply("".join)
        .reset_index()
    )
    want_words = {
        (0, 0): "hello", (0, 1): "hello", (0, 2): "world",
        (1, 0): "hold", (1, 1): "the", (1, 2): "world",
    }
    for _, r in joined.iterrows():
        assert r["piece"] == want_words[(r["doc_id"], r["word_pos"])]
    b = (
        bpe_encode(rd.from_arrow(_docs(texts)).repartition(3), n_merges=3)
        .to_pandas()
        .sort_values(["doc_id", "word_pos", "piece_pos"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, b)


@pytest.mark.usefixtures("ray_session")
def test_bpe_merge_exhaustion_matches_oracle():
    """A corpus whose pairs exhaust before n_merges: the engine stops
    merging, and the oracle's LEFT-JOIN rounds carry the state forward
    instead of zeroing the encode (review finding)."""
    import duckdb
    import pandas as pd
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as em

    from ocr_lib_ray.functions.tokens import bpe_encode, bpe_train

    docs = _docs(["ab ab"])
    t = bpe_train(rd.from_arrow(docs), n_merges=8).to_pandas()
    assert len(t) == 1 and t.loc[0, "left"] == "a" and t.loc[0, "right"] == "b"
    got = (
        bpe_encode(rd.from_arrow(docs), n_merges=8)
        .to_pandas()
        .sort_values(["doc_id", "word_pos", "piece_pos"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", docs)
    want = (
        con.execute(em.oracle_sql()["bpe_encode"])
        .df()
        .sort_values(["doc_id", "word_pos", "piece_pos"])
        .reset_index(drop=True)
        .astype({"doc_id": "int64", "word_pos": "int64", "piece_pos": "int64"})
    )
    pd.testing.assert_frame_equal(got, want)
    assert got["piece"].tolist() == ["ab", "ab"]


@pytest.mark.usefixtures("ray_session")
def test_encode_docs_vocab_df_respects_cap():
    """A caller-supplied UNCAPPED vocab frame still encodes under the
    max_vocab contract (ids >= cap become OOV -1)."""
    from ocr_lib_ray.functions.tokens import build_vocab, encode_docs

    texts = ["a a a b b c"]
    ds = rd.from_arrow(_docs(texts))
    full = build_vocab(ds).to_pandas()  # 3 tokens, uncapped
    assert len(full) == 3
    out = (
        encode_docs(ds, max_vocab=2, vocab_df=full)
        .to_pandas()
        .sort_values(["doc_id", "pos"])
        .reset_index(drop=True)
    )
    # token ranked 2 (the singleton 'c') must be OOV
    assert (out["token_id"] == -1).sum() == 1
    assert set(out["token_id"]) == {0, 1, -1}


@pytest.mark.usefixtures("ray_session")
def test_build_vocab_empty_corpus_typed():
    """All-empty corpus: both rank paths hand back the typed empty
    (token, token_id, n) frame via vocab_frame (Ray drops columns on
    zero-row to_pandas), and encode_docs yields zero rows cleanly."""
    from ocr_lib_ray.functions.tokens import build_vocab, encode_docs, vocab_frame

    ds = rd.from_arrow(_docs(["", ""]))
    for kwargs in ({"max_vocab": 10}, {}):
        vdf = vocab_frame(build_vocab(ds, **kwargs))
        assert list(vdf.columns) == ["token", "token_id", "n"]
        assert vdf["token_id"].dtype == "int64" and len(vdf) == 0
    assert encode_docs(ds, max_vocab=10).count() == 0
