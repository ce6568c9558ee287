"""Text analysis, windowed aggregate, and multimodal plumbing tests."""

import numpy as np
import pyarrow as pa
import pytest

from ocr_lib_ray.functions.multimodal import MediaDecodeStub
from ocr_lib_ray.functions.text_stats import (
    LangId,
    QualityScore,
    doc_stats_batch,
    fingerprint_batch,
    repetition_stats_batch,
)


def docs_batch(texts, ids=None):
    ids = ids or list(range(1, len(texts) + 1))
    return pa.Table.from_arrays(
        [pa.array(ids, pa.int64()), pa.array(texts, pa.string())],
        names=["doc_id", "text"],
    )


def test_doc_stats_golden():
    out = doc_stats_batch(docs_batch(["one two  three", "", "  x  "]))
    assert out.column("n_tokens").to_pylist() == [3, 0, 1]
    assert out.column("n_chars_norm").to_pylist() == [13, 0, 1]
    # avg token len: (13-2)/3
    assert out.column("avg_token_len").to_pylist()[0] == round(11 / 3, 6)


def test_fingerprint_is_normalized_md5():
    import hashlib

    out = fingerprint_batch(docs_batch(["a  b\n c", "a b c"]))
    fps = out.column("fingerprint").to_pylist()
    assert fps[0] == fps[1] == hashlib.md5(b"a b c").hexdigest()


def test_lang_id_heuristic():
    out = LangId()(
        docs_batch(
            [
                "the cat and the dog in the house",
                "der Hund ist nicht ein Tier mit Namen",
                "le chat est un animal pour la maison",
                "el perro es un animal que vive por aqui",
                "这是 一个 中文 文档",
                "zzz qqq xxx",
            ]
        )
    )
    assert out.column("lang_pred").to_pylist() == ["en", "de", "fr", "es", "zh", "und"]


def test_lang_id_extended_profiles():
    """The 8 round-2 profiles classify representative sentences; the
    oracle SQL is generated from the same dict (test_oracle below runs
    it), so this pins the impl side."""
    out = LangId()(
        docs_batch(
            [
                "il gatto non sono che un animale per la casa di lui",
                "um gato para casa com mais alguem ou em familia foi",
                "de kat is een dier van het huis en ik weet dat niet",
                "och att det som en katt på huset är av för med",
                "i w nie na się jest do to że z",
                "bir kedi ve bu da ne için ile olarak daha gibi",
                "yang dan di itu dengan untuk tidak ini dari akan",
                "și în cu este pentru nu mai din sau dar",
            ]
        )
    )
    assert out.column("lang_pred").to_pylist() == [
        "it",
        "pt",
        "nl",
        "sv",
        "pl",
        "tr",
        "id",
        "ro",
    ]


def test_quality_score_signals():
    out = QualityScore()(docs_batch(["the the the the", "alpha beta gamma delta", ""]))
    top = out.column("top_word_ratio").to_pylist()
    assert top[0] == 1.0 and top[1] == 0.25 and top[2] == 0.0
    stop = out.column("stop_ratio").to_pylist()
    assert stop[0] == 1.0 and stop[1] == 0.0


def test_repetition_stats_golden():
    out = repetition_stats_batch(
        docs_batch(
            [
                "a b a b a b",
                # no repeated bigram: top mass = 1 occurrence of heaviest pair
                "xx yy z",
                "",
                # planted duplicated 5-gram at positions 0 and 5
                "one two three four five one two three four five tail",
            ]
        )
    )
    t2 = out.column("top_2gram_char_frac").to_pylist()
    t3 = out.column("top_3gram_char_frac").to_pylist()
    d5 = out.column("dup_5gram_char_frac").to_pylist()
    # doc1: bigram ('a','b') ×3 → mass 6 / 6 chars = 1.0
    assert t2[0] == 1.0
    # trigram ('a','b','a') ×2 → 6/6
    assert t3[0] == 1.0
    # 5-grams: ('a','b','a','b','a') at 0 and ('b','a','b','a','b') at 1 —
    # each occurs once → no duplicated 5-gram
    assert d5[0] == 0.0
    # doc2: heaviest bigram 'xx yy' = 4 chars ×1 / 5 token chars (spaces
    # excluded from the denominator)
    assert t2[1] == 0.8
    assert d5[1] == 0.0
    # empty doc → all zeros
    assert (t2[2], t3[2], d5[2]) == (0.0, 0.0, 0.0)
    # doc4: ('one','two','three','four','five') occurs at 0 and 5 → covers
    # tokens 0..9 of 11; covered chars = 2×(3+3+5+4+4)=38 of total 42
    assert d5[3] == round(38 / 42, 6)


def test_repetition_stats_overlapping_dup_5grams():
    # 'w w w w w w' : every 5-gram is ('w',)*5, occurs 2× → all 6 tokens
    # covered → 1.0; top bigram mass = 5 occurrences × 2 chars / 6 chars
    out = repetition_stats_batch(docs_batch(["w w w w w w"]))
    assert out.column("dup_5gram_char_frac").to_pylist() == [1.0]
    assert out.column("top_2gram_char_frac").to_pylist() == [round(10 / 6, 6)]


def test_media_stub_features_deterministic():
    batch = pa.Table.from_arrays(
        [
            pa.array(["u1", "u2"], pa.string()),
            pa.array([b"\x00" * 100, bytes(range(256))], pa.binary()),
        ],
        names=["url", "html"],
    )
    out1 = MediaDecodeStub()(batch)
    out2 = MediaDecodeStub()(batch)
    assert out1.equals(out2)
    ent = out1.column("byte_entropy").to_pylist()
    assert ent[0] == 0.0 and abs(ent[1] - 8.0) < 1e-9
    assert out1.column("n_bytes").to_pylist() == [100, 256]
    feat = out1.column("feature").to_pylist()
    assert len(feat[0]) == 16 and abs(sum(feat[1]) - 1.0) < 1e-3


def test_media_real_decode_gated():
    """No codec installed → real_decode raises at actor construction
    (informative, not per batch); with a codec the next test runs."""
    from ocr_lib_ray.functions.multimodal import probe_image_decoder

    if probe_image_decoder() is not None:
        pytest.skip("Pillow installed: gate does not apply")
    with pytest.raises(NotImplementedError):
        MediaDecodeStub(real_decode=True)


def test_media_real_decode_with_codec():
    """Skipped-if-no-codec: with Pillow present the probed decoder
    yields 16 thumbnail pixels in [0,1] for a real image and falls back
    to byte features for undecodable payloads."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    buf = io.BytesIO()
    PIL_Image.new("L", (8, 8), color=128).save(buf, format="PNG")
    png = buf.getvalue()
    batch = pa.Table.from_arrays(
        [
            pa.array(["img", "junk"], pa.string()),
            pa.array([png, b"\x01\x02\x03"], pa.binary()),
        ],
        names=["url", "html"],
    )
    out = MediaDecodeStub(real_decode=True)(batch)
    feat = out.column("feature").to_pylist()
    assert len(feat[0]) == 16 and all(0.0 <= v <= 1.0 for v in feat[0])
    assert abs(feat[0][0] - 128 / 255) < 1e-6
    # undecodable payload → deterministic byte-feature fallback
    assert feat[1] == MediaDecodeStub()(batch).column("feature").to_pylist()[1]


def test_canonicalize_url():
    from ocr_lib_ray.functions.urls import canonicalize_url as c

    assert c("HTTP://Example.COM:80/a//b/?utm_source=x&b=2&a=1#frag") == (
        "http://example.com/a/b?a=1&b=2"
    )
    assert c("https://example.com:8443/p/") == "https://example.com:8443/p"
    assert c("https://example.com/") == "https://example.com/"
    assert c("https://example.com/?fbclid=123") == "https://example.com/"
    assert c(c("HTTP://A.B/x//y?z=1")) == c("HTTP://A.B/x//y?z=1")  # idempotent
    # malformed urls pass through instead of raising
    assert c("http://x:abc/") == "http://x:abc/"
    assert c("http://x:99999/") == "http://x:99999/"
    assert c("not a url at all") == "not a url at all"


def test_charset_sniffing():
    from ocr_lib_ray.kernel import extract_document

    # declared windows-1252: 0x93/0x94 are curly quotes
    html = b'<meta charset="iso-8859-1"><p>\x93quoted words here\x94</p>'
    res = extract_document(html)
    assert res.text == "“quoted words here”"
    # undeclared → utf-8
    res2 = extract_document("<p>café words here</p>".encode("utf-8"))
    assert res2.text == "café words here"
    # declared but unknown charset → utf-8 fallback, never crashes
    res3 = extract_document(b'<meta charset="klingon"><p>three words here</p>')
    assert res3.text == "three words here"


def test_extended_entities():
    from ocr_lib_ray.kernel import extract_document

    res = extract_document(
        b"<p>a &mdash; b &hellip; c &rsquo;d &shy;e &unknown; f</p>"
    )
    assert res.text == "a — b … c ’d e &unknown; f"


def test_chunk_spans_golden():
    from ocr_lib_ray.functions.chunking import chunk_spans

    assert chunk_spans(10, 32, 8) == [(0, 10)]
    assert chunk_spans(32, 32, 8) == [(0, 32)]
    assert chunk_spans(33, 32, 8) == [(0, 32), (24, 33)]
    assert chunk_spans(57, 32, 8) == [(0, 32), (24, 56), (48, 57)]
    assert chunk_spans(0, 32, 8) == []
    # consecutive chunks overlap by exactly `overlap` until the tail
    spans = chunk_spans(200, 32, 8)
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert s2 == s1 + 24


def test_chunk_documents_batch():
    from ocr_lib_ray.functions.chunking import chunk_documents_batch

    batch = pa.Table.from_arrays(
        [pa.array([1], pa.int64()), pa.array([" ".join(f"w{i}" for i in range(40))], pa.string())],
        names=["doc_id", "text"],
    )
    out = chunk_documents_batch(batch, size=32, overlap=8)
    assert out.column("chunk_id").to_pylist() == [0, 1]
    assert out.column("n_tokens").to_pylist() == [32, 16]
    t0, t1 = out.column("chunk_text").to_pylist()
    assert t0.split(" ")[0] == "w0" and t1.split(" ")[0] == "w24"


@pytest.mark.usefixtures("ray_session")
def test_model_scorer(sf_small):
    import ray
    import ray.data as rd

    from ocr_lib_ray.functions.scoring import ModelScorer, score_documents

    docs = rd.read_parquet(f"{sf_small}/documents.parquet", columns=["doc_id", "text"])
    out = score_documents(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(out) == 500
    assert ((out["quality_prob"] >= 0) & (out["quality_prob"] <= 1)).all()
    # deterministic across runs
    out2 = score_documents(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out.equals(out2)
    # direct (no-broadcast) path agrees with the actor path
    import pyarrow.parquet as pq2

    direct = ModelScorer()(
        pq2.read_table(f"{sf_small}/documents.parquet", columns=["doc_id", "text"])
    )
    d = direct.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (d["quality_prob"] == out["quality_prob"]).all()


@pytest.mark.usefixtures("ray_session")
def test_pack_sequences(sf_small):
    import ray.data as rd

    from ocr_lib_ray.functions.chunking import chunk_documents, pack_sequences

    docs = rd.read_parquet(f"{sf_small}/documents.parquet", columns=["doc_id", "text"])
    chunks = chunk_documents(docs, size=32, overlap=8)
    n_chunks_total = chunks.count()
    packed = pack_sequences(chunk_documents(docs, 32, 8), budget=128).to_pandas()
    assert (packed["total_tokens"] <= 128).all()
    assert packed["n_chunks"].sum() == n_chunks_total  # every chunk packed once
    # determinism across runs
    packed2 = pack_sequences(chunk_documents(docs, 32, 8), budget=128).to_pandas()
    key = ["partition_id", "seq_id"]
    assert packed.sort_values(key).reset_index(drop=True).equals(
        packed2.sort_values(key).reset_index(drop=True)
    )
    # packing is efficient: mean fill ≥ 60% of budget
    assert packed["total_tokens"].mean() >= 0.6 * 128


@pytest.mark.usefixtures("ray_session")
def test_pack_sequences_partition_scaling(sf_small):
    """P must be derivable from corpus size without changing the packing
    CONTRACT: at any P every chunk lands in exactly one sequence, budget
    holds, and total token volume is identical; the derived default (the
    driver-query path) equals the explicit fixture-scale P."""
    import ray.data as rd

    from ocr_lib_ray.functions.chunking import chunk_documents, pack_sequences

    docs = rd.read_parquet(f"{sf_small}/documents.parquet", columns=["doc_id", "text"])
    n_chunks_total = chunk_documents(docs, 32, 8).count()
    key = ["partition_id", "seq_id"]
    p16 = (
        pack_sequences(chunk_documents(docs, 32, 8), budget=128, num_partitions=16)
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    p64 = pack_sequences(
        chunk_documents(docs, 32, 8), budget=128, num_partitions=64
    ).to_pandas()
    for p in (p16, p64):
        assert (p["total_tokens"] <= 128).all()
        assert p["n_chunks"].sum() == n_chunks_total
    assert p16["total_tokens"].sum() == p64["total_tokens"].sum()
    # partitions nest under crc32 % P (16 | 64): each P=64 partition's
    # docs sit inside ONE P=16 partition → per-partition token volume
    # aggregates exactly
    vol16 = p16.groupby("partition_id")["total_tokens"].sum()
    vol64 = p64.groupby(p64["partition_id"] % 16)["total_tokens"].sum()
    assert vol16.equals(vol64)
    # derived default == explicit P at fixture scale (rows << 100k → 16)
    dflt = (
        pack_sequences(chunk_documents(docs, 32, 8), budget=128)
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert dflt.equals(p16)


@pytest.mark.usefixtures("ray_session")
def test_remove_common_lines():
    """Lines shared across >1 doc are removed; unique lines survive."""
    import ray.data as rd

    from ocr_lib_ray.functions.linedup import remove_common_lines

    docs = rd.from_arrow(
        pa.Table.from_arrays(
            [
                pa.array([1, 2, 3], pa.int64()),
                pa.array(
                    [
                        "unique alpha\nShare this article\nunique beta",
                        "Share this article\nother unique line",
                        "totally distinct document",
                    ],
                    pa.string(),
                ),
            ],
            names=["doc_id", "text"],
        )
    )
    out = remove_common_lines(docs, max_df=1).to_pandas().sort_values("doc_id")
    assert list(out["text"]) == [
        "unique alpha\nunique beta",
        "other unique line",
        "totally distinct document",
    ]


@pytest.mark.usefixtures("ray_session")
def test_tumbling_window_matches_pandas(sf_small):
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from ocr_lib_ray.functions.windows import tumbling_window

    events = rd.read_parquet(f"{sf_small}/events.parquet", columns=["event_type", "ts", "value"])
    got = (
        tumbling_window(events, 3600)
        .to_pandas()
        .sort_values(["event_type", "window_start_us"])
        .reset_index(drop=True)
    )
    df = pq.read_table(f"{sf_small}/events.parquet").to_pandas()
    df["window_start_us"] = (
        df["ts"].astype("int64") // 3_600_000_000
    ) * 3_600_000_000
    want = (
        df.groupby(["event_type", "window_start_us"])["value"]
        .agg(n="count", value_sum="sum", value_min="min", value_max="max")
        .reset_index()
        .sort_values(["event_type", "window_start_us"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got["n"].to_numpy() == want["n"].to_numpy()).all()
    assert np.allclose(got["value_sum"], want["value_sum"])
    assert np.allclose(got["value_min"], want["value_min"])
    assert np.allclose(got["value_max"], want["value_max"])


@pytest.mark.usefixtures("ray_session")
def test_sliding_window_near_epoch_matches_oracle():
    """Events within (k-1)*slide of epoch 0: the impl must emit the same
    (possibly negative-start) windows the SQL oracle's unconditional
    k-offset cross join emits — pins the alignment (a >=0 filter here
    silently diverged from the oracle on near-epoch data)."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from ocr_lib_ray.functions.windows import sliding_window

    tbl = pa.Table.from_arrays(
        [
            pa.array(["click", "click", "view", "view"]),
            pa.array([100, 950_000_000, 0, 2_000_000_000], pa.timestamp("us")),
            pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
        ],
        names=["event_type", "ts", "value"],
    )
    got = (
        sliding_window(rd.from_arrow(tbl), 3600, 900)
        .to_pandas()
        .sort_values(["event_type", "window_start_us"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", tbl)
    want = con.execute(
        """
        WITH off AS (SELECT unnest(generate_series(0, 3)) AS i),
        e AS (SELECT event_type, epoch_us(ts) AS ts_us, value FROM events)
        SELECT event_type,
               (ts_us // 900000000) * 900000000 - i * 900000000 AS window_start_us,
               count(*) AS n, sum(value) AS value_sum,
               min(value) AS value_min, max(value) AS value_max
        FROM e CROSS JOIN off GROUP BY 1, 2
        ORDER BY 1, 2
        """
    ).df()
    assert (got["window_start_us"] < 0).any()  # near-epoch rows exist
    assert len(got) == len(want)
    for col in ("event_type", "window_start_us", "n"):
        assert (got[col].to_numpy() == want[col].to_numpy()).all()
    for col in ("value_sum", "value_min", "value_max"):
        assert np.allclose(got[col], want[col])


@pytest.mark.usefixtures("ray_session")
def test_media_features_over_pages(sf_small):
    from ocr_lib_ray.functions.multimodal import media_features
    from ocr_lib_ray.pipelines.extract import build_pages_dataset

    out = media_features(build_pages_dataset(sf_small)).to_pandas()
    assert len(out) == 500
    assert (out["n_bytes"] > 0).all()


def test_winnow_fingerprint_properties():
    """Bottom-k sketch: near-identical docs share most of their
    fingerprint hashes; disjoint docs share none; empty → empty."""
    from ocr_lib_ray.functions.text_stats import winnow_fingerprint_batch

    out = winnow_fingerprint_batch(
        docs_batch(
            [
                "the quick brown fox jumps over the lazy dog again and again",
                "the quick brown fox jumps over the lazy dog again and AGAIN",
                "completely different words entirely unrelated to anything else",
                "",
            ]
        )
    )
    fps = [set(f.split(",")) if f else set() for f in out.column("winnow_fp").to_pylist()]
    assert len(fps[0] & fps[1]) >= 6  # near-dups share most of bottom-8
    assert not (fps[0] & fps[2])
    assert fps[3] == set()
    assert all(len(h) == 16 for h in fps[0])


def test_null_text_rows_survive_text_ops():
    """One NULL text cell (legal Arrow input) must not kill any text
    operator — it behaves like the empty string."""
    import pyarrow as pa

    from ocr_lib_ray.functions.redact import bpe_token_count_batch, redact_batch
    from ocr_lib_ray.functions.scoring import ModelScorer
    from ocr_lib_ray.functions.text_stats import (
        char_entropy_batch,
        doc_stats_batch,
        winnow_fingerprint_batch,
    )

    batch = pa.Table.from_arrays(
        [pa.array([1, 2], pa.int64()), pa.array(["real words here", None], pa.string())],
        names=["doc_id", "text"],
    )
    assert LangId()(batch).column("lang_pred").to_pylist()[1] == "und"
    assert QualityScore()(batch).column("stop_ratio").to_pylist()[1] == 0.0
    assert fingerprint_batch(batch).num_rows == 2
    assert winnow_fingerprint_batch(batch).column("winnow_fp").to_pylist()[1] == ""
    assert redact_batch(batch).num_rows == 2
    assert bpe_token_count_batch(batch).column("n_bpe_tokens").to_pylist()[1] == 0
    assert ModelScorer()(batch).num_rows == 2
    assert char_entropy_batch(batch).column("char_entropy").to_pylist()[1] == 0.0
    assert doc_stats_batch(batch).num_rows == 2


@pytest.mark.usefixtures("ray_session")
def test_sessionize_salted_equivalent(sf_small):
    """The skew-safe (user, window)-keyed sessionize must produce the
    same sessions as the per-user path — including sessions straddling
    window boundaries (forced with a window barely above the gap)."""
    import ray.data as rd

    from ocr_lib_ray.functions.windows import sessionize, sessionize_salted

    events = rd.read_parquet(f"{sf_small}/events.parquet", columns=["user_id", "ts", "value"])
    key = ["user_id", "session_id"]
    a = (
        sessionize(events, gap_seconds=1800)
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    for window_seconds in (86_400, 3_600):  # 2×gap forces many straddles
        b = (
            sessionize_salted(events, gap_seconds=1800, window_seconds=window_seconds)
            .to_pandas()
            .sort_values(key)
            .reset_index(drop=True)[a.columns.tolist()]
        )
        assert (a[key] == b[key]).all().all()
        assert (a["session_start_us"] == b["session_start_us"]).all()
        assert (a["n_events"] == b["n_events"]).all()
        # partial sums re-associate → compare within float tolerance
        assert np.allclose(a["value_sum"], b["value_sum"])


def test_frame_sampler_windows_and_caps():
    from ocr_lib_ray.functions.multimodal import FrameSampler

    batch = pa.Table.from_arrays(
        [
            pa.array(["u1", "u2", "u3"], pa.string()),
            # 1000 bytes → 4 frames (last short); 10 bytes → 1 frame; empty
            pa.array([bytes(range(256)) * 3 + b"x" * 232, b"0123456789", b""], pa.binary()),
        ],
        names=["url", "html"],
    )
    s = FrameSampler(frame_size=256, stride=2, max_frames=8)
    out = s(batch)
    rows = list(zip(*[out.column(c).to_pylist() for c in out.column_names]))
    # u1: frames 0..3, stride 2 → idx 0 and 2, n_frames 4
    u1 = [r for r in rows if r[0] == "u1"]
    assert [(r[1], r[2]) for r in u1] == [(0, 4), (2, 4)]
    import hashlib
    data = bytes(range(256)) * 3 + b"x" * 232
    assert u1[0][3] == hashlib.md5(data[0:256]).hexdigest()
    assert u1[1][3] == hashlib.md5(data[512:768]).hexdigest()
    # u2: single short frame
    u2 = [r for r in rows if r[0] == "u2"]
    assert [(r[1], r[2]) for r in u2] == [(0, 1)]
    assert u2[0][3] == hashlib.md5(b"0123456789").hexdigest()
    # u3 empty: no rows
    assert not [r for r in rows if r[0] == "u3"]
    # max_frames cap
    capped = FrameSampler(frame_size=1, stride=1, max_frames=3)(batch)
    assert len([u for u in capped.column("url").to_pylist() if u == "u2"]) == 3
    # determinism
    assert s(batch).equals(out)


def test_frame_sampler_guards_and_codec_probe():
    from ocr_lib_ray.functions.multimodal import FrameSampler, probe_video_decoder

    with pytest.raises(ValueError):
        FrameSampler(frame_size=0)
    if probe_video_decoder() is None:
        with pytest.raises(NotImplementedError):
            FrameSampler(real_decode=True)
    else:
        FrameSampler(real_decode=True)


@pytest.mark.usefixtures("ray_session")
def test_bigram_logprob_model_and_edges():
    """Hand-checked MLE bigram scores on a tiny corpus; short/empty
    docs emit (0, 0); the max_vocab guard raises."""
    import math

    import ray.data as rd

    from ocr_lib_ray.functions.lm import bigram_logprob

    # corpus counts: 'a'=3 ('a b' 2x, 'a c' 1x), 'b'=2, pairs: (a,b)x2,
    # (b,a)x1, (a,c)x1
    ds = rd.from_arrow(
        docs_batch(["a b a b", "a c", "x", ""], ids=[1, 2, 3, 4])
    ).repartition(2)
    out = {
        r["doc_id"]: (r["n_pairs"], r["logprob_micro"])
        for r in bigram_logprob(ds).take_all()
    }
    mic = lambda p: math.floor(math.log(p) * 1e6 + 0.5)
    # doc1 pairs: (a,b): 2/3, (b,a): 1/2, (a,b): 2/3
    assert out[1] == (3, 2 * mic(2 / 3) + mic(1 / 2))
    # doc2: (a,c): 1/3
    assert out[2] == (1, mic(1 / 3))
    assert out[3] == (0, 0)
    assert out[4] == (0, 0)
    with pytest.raises(ValueError, match="max_vocab"):
        bigram_logprob(ds, max_vocab=2).take_all()


@pytest.mark.usefixtures("ray_session")
def test_ccnet_buckets_per_lang_terciles():
    """Buckets are per-LANGUAGE terciles of per-pair NLL: the worst
    English doc can still be 'head' in a language of its own; <2-token
    docs score 0 (head); every doc is labeled exactly once."""
    import pyarrow as pa
    import ray.data as rd

    from ocr_lib_ray.functions.lm import ccnet_buckets

    # corpus-wide counts: a=9, b=5; pairs (a,a)=5, (a,b)=3, (b,b)=2 →
    # per-pair NLL strictly ordered doc1 < doc2 < doc3 (no tercile ties)
    texts = [
        "a a a a a",  # en: most predictable (all (a,a))
        "a a b",  # en: middle
        "a b b",  # en: rarest pairs → worst en NLL
        "x",  # en: <2 tokens → score 0 → head
        "a b b",  # solo-lang twin of the worst en doc
    ]
    langs = ["en", "en", "en", "en", "xx"]
    tbl = pa.Table.from_arrays(
        [
            pa.array([1, 2, 3, 4, 5], pa.int64()),
            pa.array(texts, pa.string()),
            pa.array(langs, pa.string()),
        ],
        names=["doc_id", "text", "lang"],
    )
    out = {
        r["doc_id"]: r
        for r in ccnet_buckets(rd.from_arrow(tbl).repartition(3)).take_all()
    }
    assert len(out) == 5
    assert out[4]["nll_micro_per_pair"] == 0 and out[4]["bucket"] == "head"
    # same text, same NLL — but per-lang thresholds put the singleton
    # language's only doc at its own tercile boundary (head), while the
    # identical English doc is the worst of its language (tail)
    assert out[5]["nll_micro_per_pair"] == out[3]["nll_micro_per_pair"]
    assert out[5]["bucket"] == "head"
    assert out[3]["bucket"] == "tail"
    assert set(r["bucket"] for r in out.values()) <= {"head", "middle", "tail"}


@pytest.mark.usefixtures("ray_session")
def test_corpus_report_matches_duckdb():
    """One-pass dashboard aggregate == SQL GROUP BY on a corpus with an
    empty doc, a single-doc group, and multi-batch layout; null group
    keys raise."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ocr_lib_ray.functions.text_stats import corpus_report

    df = pd.DataFrame(
        {
            "text": ["a b c", "", "one two", "x", "deux mots ici", "un"],
            "source": ["s1", "s1", "s1", "s2", "s2", "s2"],
            "lang": ["en", "en", "en", "en", "fr", "fr"],
        }
    )
    got = (
        corpus_report(rd.from_pandas(df).repartition(3))
        .to_pandas()
        .sort_values(["source", "lang"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("d", df)
    want = con.execute(
        """WITH t AS (SELECT source, lang,
                             CASE WHEN text = '' THEN 0
                                  ELSE len(str_split(text, ' ')) END AS nt,
                             CASE WHEN text = '' THEN 1 ELSE 0 END AS emp
                      FROM d)
           SELECT source, lang, count(*) AS n_docs,
                  CAST(sum(nt) AS BIGINT) AS n_tokens_sum,
                  CAST(sum(emp) AS BIGINT) AS n_empty,
                  round(sum(nt) * 1.0 / count(*), 6) AS avg_tokens
           FROM t GROUP BY 1, 2 ORDER BY source, lang"""
    ).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_exact=True
    )

    bad = pd.DataFrame({"text": ["x"], "source": [None], "lang": ["en"]})
    with pytest.raises(Exception, match="null keys"):
        corpus_report(rd.from_pandas(bad)).materialize()


def test_code_detect_routes_code_vs_prose():
    from ocr_lib_ray.functions.text_stats import code_detect_batch

    code = "int main() {\n  int x = 0;\n  x += 1;\n  return x;\n}\n"
    indented = "def f():\n  a = 1\n  b = 2\n  return a + b"
    prose = (
        "This is a plain paragraph of prose text.\n"
        "It goes on for a few lines without punctuation density.\n"
        "Nothing here looks like source code at all.\n"
        "Just ordinary sentences with ordinary words."
    )
    short = "x = 1; y = 2;"  # code-ish but < 3 lines → not routed
    tabbed = "loop:\n\tmov a, b\n\tadd a, 1\n\tjmp loop"
    out = code_detect_batch(docs_batch([code, indented, prose, short, tabbed, ""]))
    assert out.column("is_code").to_pylist() == [1, 1, 0, 0, 1, 0]
    # indent counting: "  x = 0;" etc — 3 indented of 6 lines in `code`
    assert out.column("n_indent").to_pylist()[0] == 3
    assert out.column("n_lines").to_pylist() == [6, 4, 4, 1, 4, 1]


@pytest.mark.usefixtures("ray_session")
def test_dsir_weights_separate_target_from_raw():
    """DSIR sanity: documents sharing the target subset's vocabulary
    score strictly higher than documents that only share the raw
    side's, and empty docs emit (0, 0)."""
    import ray.data as rd

    import pyarrow.compute as pc

    from ocr_lib_ray.functions.importance import dsir_weights

    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(7)), pa.int64()),
            "text": [
                "alpha beta alpha beta gamma",
                "beta alpha beta alpha",
                "alpha beta beta",
                "delta epsilon zeta delta",
                "zeta epsilon delta zeta",
                "epsilon delta zeta",
                "",
            ],
            "lang": ["en", "en", "de", "fr", "fr", "de", "de"],
        }
    )
    out = (
        dsir_weights(
            rd.from_arrow(tbl), lambda b: pc.equal(b.column("lang"), "en")
        )
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # every target-vocab doc (0,1,2 — incl. 2, which was NOT in the
    # target set) outranks every non-target-vocab doc (3,4,5); absolute
    # sign is NOT asserted — raw counts include the target subset, so
    # ln((ct+1)/(cr+1)) ≤ 0 and weights skew negative at tiny scale
    assert min(out.loc[i, "weight_micro"] for i in (0, 1, 2)) > max(
        out.loc[i, "weight_micro"] for i in (3, 4, 5)
    )
    assert out.loc[6, "n_features"] == 0 and out.loc[6, "weight_micro"] == 0
    # n_features = unigrams + bigrams
    assert out.loc[0, "n_features"] == 5 + 4


@pytest.mark.usefixtures("ray_session")
def test_bm25_topk_ranking_semantics():
    """BM25 sanity on a planted corpus: more matching terms rank
    higher; a rare term outweighs a ubiquitous one; zero-match docs
    never appear; k truncates with the (score DESC, id ASC) tie-break."""
    import ray.data as rd

    from ocr_lib_ray.functions.retrieval import bm25_topk

    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(6)), pa.int64()),
            "text": [
                "apple banana cherry",   # both query terms
                "apple apple apple",     # common term only, high tf
                "banana date",           # rare term only
                "date fig grape",        # no query terms
                "apple date",            # common term once
                "",                      # empty
            ],
        }
    )
    # 'apple' df=3 (common), 'banana' df=2 (rarer)
    out = (
        bm25_topk(rd.from_arrow(tbl), {"q": "apple banana"}, k=4)
        .to_pandas()
        .sort_values("score_micro", ascending=False)
        .reset_index(drop=True)
    )
    assert set(out["query_id"]) == {"q"}
    assert 3 not in set(out["doc_id"]) and 5 not in set(out["doc_id"])
    assert len(out) == 4
    # the two-term doc wins
    assert out.loc[0, "doc_id"] == 0
    # every score positive and monotone in the frame
    assert (out["score_micro"] > 0).all()
    assert list(out["score_micro"]) == sorted(out["score_micro"], reverse=True)


@pytest.mark.usefixtures("ray_session")
def test_mad_outliers_flags_planted_giant():
    """MAD robustness: one giant doc among uniform lengths is flagged,
    the uniform docs are not (MAD=0 ⇒ any deviation > 0 is an outlier),
    and a group where every value differs stays unflagged within k·MAD."""
    import ray.data as rd

    from ocr_lib_ray.functions.quantiles import mad_outliers

    tbl = pa.table(
        {
            "id": pa.array(list(range(8)), pa.int64()),
            "g": ["a"] * 5 + ["b"] * 3,
            "v": pa.array([10, 10, 10, 10, 500, 7, 9, 11], pa.int64()),
        }
    )
    out = (
        mad_outliers(rd.from_arrow(tbl), "v", "g", "id", k=3)
        .to_pandas()
        .set_index("id")
        .sort_index()
    )
    # group a: med=10, MAD=0 → only the 500 deviates
    assert list(out.loc[0:4, "is_outlier"]) == [False] * 4 + [True]
    assert out.loc[0, "med"] == 10 and out.loc[0, "mad"] == 0
    # group b: med=9, MAD=2 → all within 3*2
    assert not out.loc[5:7, "is_outlier"].any()


@pytest.mark.usefixtures("ray_session")
def test_nb_classify_learns_separable_labels():
    """NB sanity: on a vocabulary-separable corpus the learned router
    recovers every label, including held-in docs whose label token mix
    leans the other way only in the prior; token-less docs fall back to
    the largest class (tie-break: class name ascending)."""
    import ray.data as rd

    from ocr_lib_ray.functions.classify import nb_classify

    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(7)), pa.int64()),
            "text": [
                "der hund und die katze",
                "die katze und der hund sind hier",
                "the cat and the dog",
                "the dog and the cat are here",
                "der hund",
                "the cat",
                "",
            ],
            "lang": ["de", "de", "en", "en", "de", "en", "en"],
        }
    )
    out = (
        nb_classify(rd.from_arrow(tbl), label_col="lang")
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out["pred"]) == ["de", "de", "en", "en", "de", "en", "en"]
    # empty doc: prior-only; 'en' has 4 docs vs 'de' 3 → en wins
    assert out.loc[6, "pred"] == "en"
    assert (out["score_micro"] < 0).all()  # log-probs are negative


def test_gopher_filter_rule_bits():
    """Each Gopher rule trips on its planted violation and only there;
    integer cross-multiplication boundaries are inclusive per the
    published thresholds."""
    from ocr_lib_ray.functions.text_stats import gopher_filter_batch

    good = "the cat and dog have fun with that friend today " * 5  # 50 words
    docs = [
        good,                                      # passes everything
        "the cat and dog",                         # r_words (too short)
        ("aaaaaaaaaaaaaaa " * 50) + "the of and",  # r_wordlen (mean > 10)
        good + "# # # # # # # # # # # # # # #",    # r_symbol (>10%)
        "- " + "\n- ".join(["the of and that have with x"] * 10),  # r_bullet
        good.replace("the", "###"),                # r_alpha + r_stops hit
        "",                                        # 0 words
    ]
    out = gopher_filter_batch(
        docs_batch(docs, ids=list(range(len(docs))))
    ).to_pandas().set_index("doc_id")
    assert bool(out.loc[0, "passes"])
    assert not out.loc[1, "r_words"] and out.loc[1, "r_stops"]
    assert not out.loc[2, "r_wordlen"]
    assert not out.loc[3, "r_symbol"] and out.loc[3, "r_words"]
    assert not out.loc[4, "r_bullet"]
    assert not out.loc[6, "r_words"] and not out.loc[6, "passes"]
    # vacuous ratio rules hold on the empty doc
    assert out.loc[6, "r_wordlen"] and out.loc[6, "r_alpha"]


@pytest.mark.usefixtures("ray_session")
def test_dsir_bucket_memo_is_width_independent():
    """Two dsir runs with different n_buckets in the same process must
    both be correct — the process memo caches the raw 64-bit hash, not
    the width-specific bucket (regression: a shared bucket memo)."""
    import hashlib

    import pyarrow.compute as pc
    import ray.data as rd

    from ocr_lib_ray.functions import importance
    from ocr_lib_ray.functions.importance import _bucket, dsir_weights

    h = int.from_bytes(hashlib.md5(b"alpha").digest()[8:], "little")
    assert _bucket("alpha", 10_000) == h % 10_000
    assert _bucket("alpha", 7) == h % 7  # second width: memo must not poison

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": ["alpha beta", "gamma delta"],
            "lang": ["en", "de"],
        }
    )
    a = dsir_weights(
        rd.from_arrow(tbl), lambda b: pc.equal(b.column("lang"), "en"), n_buckets=64
    ).to_pandas()
    b = dsir_weights(
        rd.from_arrow(tbl), lambda b: pc.equal(b.column("lang"), "en"), n_buckets=64
    ).to_pandas()
    assert a.equals(b)


@pytest.mark.usefixtures("ray_session")
def test_nb_classify_null_label_raises():
    import ray.data as rd

    from ocr_lib_ray.functions.classify import nb_classify

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": ["a b", "c d"],
            "lang": ["en", None],
        }
    )
    with pytest.raises(Exception, match="null labels"):
        nb_classify(rd.from_arrow(tbl), label_col="lang").materialize()


def test_readability_golden():
    """Flesch micro-units on hand-computable docs: the 'The cat sat.'
    style 1-syllable/word text scores ~106.1; vowel-less words still
    count 1 syllable; empty doc emits zeros."""
    import math

    from ocr_lib_ray.functions.text_stats import readability_batch

    out = readability_batch(
        docs_batch(["The cat sat. It ran! Done?", "", "xyz qrs"])
    ).to_pandas().set_index("doc_id")
    # doc1: W=6, S=3, Syl=7 → 206.835 - 1.015*2 - 84.6*(7/6)
    want = math.floor((206.835 - 1.015 * (6 / 3) - 84.6 * (7 / 6)) * 1e6 + 0.5)
    assert out.loc[1, "flesch_micro"] == want
    assert out.loc[1, "n_sentences"] == 3 and out.loc[1, "n_syllables"] == 7
    assert (out.loc[2] == 0).all()
    # vowel-less words: min 1 syllable each, sentences floor at 1
    assert out.loc[3, "n_syllables"] == 2 and out.loc[3, "n_sentences"] == 1


@pytest.mark.usefixtures("ray_session")
def test_source_divergence_zero_for_identical_blends_and_positive_for_skew():
    import math

    import ray.data as rd

    from ocr_lib_ray.functions.importance import source_divergence

    def docs(rows):
        return rd.from_arrow(
            pa.table(
                {
                    "text": pa.array([t for t, _ in rows], pa.string()),
                    "source": pa.array([s for _, s in rows], pa.string()),
                }
            )
        )

    # two sources with the IDENTICAL token distribution -> every ratio
    # is exactly 1, ln == 0, so the integer KL is exactly 0
    same = docs([("a a b", "s1"), ("a a b", "s2")])
    out = source_divergence(same)
    out = (out.to_pandas() if hasattr(out, "to_pandas") else out).sort_values("source")
    assert out["kl_micro_sum"].tolist() == [0, 0]
    assert out["n_tokens"].tolist() == [3, 3]

    # disjoint vocabularies: each source's every token has
    # n_s == n_g and N == 2 * N_s -> ratio 2, term = n_s * ln(2) micro
    skew = docs([("x x y", "s1"), ("p q r", "s2")])
    out2 = (
        (lambda r: (r.to_pandas() if hasattr(r, "to_pandas") else r))(source_divergence(skew)).sort_values("source").reset_index(drop=True)
    )
    ln2 = math.floor(math.log(2.0) * 1e6 + 0.5)
    assert out2["kl_micro_sum"].tolist() == [3 * ln2, 3 * ln2]

    # block-layout invariance: same bytes at any partitioning
    big = docs([("a b c d e", f"s{i % 3}") for i in range(30)])
    a = (lambda r: (r.to_pandas() if hasattr(r, "to_pandas") else r))(source_divergence(big)).sort_values("source").reset_index(drop=True)
    big2 = docs([("a b c d e", f"s{i % 3}") for i in range(30)]).repartition(7)
    b = (lambda r: (r.to_pandas() if hasattr(r, "to_pandas") else r))(source_divergence(big2)).sort_values("source").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_length_histogram_boundaries_and_empty_bucket():
    """Power-of-two boundaries land in the RIGHT bucket (the float-log2
    hazard this op avoids): 1->b0, 2,3->b1, 4->b2, 8->b3; empty -> -1."""
    import ray.data as rd

    from ocr_lib_ray.functions.text_stats import length_histogram

    def doc(n):
        return " ".join(["w"] * n)

    texts = ["", doc(1), doc(2), doc(3), doc(4), doc(7), doc(8)]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = (
        length_histogram(rd.from_arrow(t).repartition(3))
        .to_pandas()
        .set_index("bucket")
        .sort_index()
    )
    assert out.loc[-1, "n_docs"] == 1
    assert out.loc[0, "n_docs"] == 1      # n=1
    assert out.loc[1, "n_docs"] == 2      # n=2,3
    assert out.loc[2, "n_docs"] == 2      # n=4,7
    assert out.loc[3, "n_docs"] == 1      # n=8


@pytest.mark.usefixtures("ray_session")
def test_sessionize_bucketed_hot_user_and_hand_check():
    """Bucket-first sessionize: a hot user holding most of the corpus
    plus cold singleton users — per-user session ids, gap breaks, and
    sums must match a pandas reference regardless of bucketing."""
    import pandas as pd
    import ray.data as rd

    from ocr_lib_ray.functions.windows import sessionize

    gap = 1800
    rows = []
    # hot user 7: 5000 events in 10 bursts separated by > gap
    base = 1_600_000_000_000_000
    for burst in range(10):
        t0 = base + burst * 10**10
        for i in range(500):
            rows.append((7, t0 + i * 1_000_000, 1.0))
    # cold users 100..149: one event each
    for u in range(100, 150):
        rows.append((u, base + u, 2.0))
    df = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    df["ts"] = pd.to_datetime(df["ts"], unit="us")
    ds = rd.from_pandas(df).repartition(8)
    for nb in (4, 64):
        got = (
            sessionize(ds, gap_seconds=gap, num_buckets=nb)
            .to_pandas()
            .sort_values(["user_id", "session_id"])
            .reset_index(drop=True)
        )
        hot = got[got["user_id"] == 7]
        assert len(hot) == 10
        assert list(hot["session_id"]) == list(range(10))
        assert (hot["n_events"] == 500).all()
        assert np.allclose(hot["value_sum"], 500.0)
        cold = got[got["user_id"] >= 100]
        assert len(cold) == 50
        assert (cold["session_id"] == 0).all()
        assert (cold["n_events"] == 1).all()


@pytest.mark.usefixtures("ray_session")
def test_source_divergence_broadcast_equals_streamed(monkeypatch):
    """Round-5 adaptive path: the broadcast/driver-reduced plan and the
    fully-streamed join fallback must be bit-equal."""
    import pandas as pd
    import ray.data as rd

    import ocr_lib_ray.functions.importance as imp

    docs = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["text", "source"]
    )
    a = imp.source_divergence(docs)
    a = a.to_pandas() if hasattr(a, "to_pandas") else a
    monkeypatch.setattr(imp, "VOCAB_BROADCAST_MAX", 0)
    b = imp.source_divergence(docs)
    b = b.to_pandas() if hasattr(b, "to_pandas") else b
    key = "source"
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )
    assert len(a) > 1
