"""Edge-corpus oracle gate: every document-table query must hash-match
its DuckDB oracle on a corpus of SHORT/EMPTY documents — the cases the
driver's sf fixtures (min ~10 words/doc) never exercise.  This is the
test that catches latent impl/oracle divergences (short-body HTML
rejection, PDF short-body retention, empty-doc quality signals) before
a future fixture does."""

import hashlib

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

# doc_ids chosen to hit every page kind: 3→pdf, 4→pdf_rot, 5→malformed,
# 7→noisy, others plain
EDGE_DOCS = [
    (1, "", "en", "srcA"),
    (2, "one", "en", "srcA"),
    (3, "two words", "en", "srcA"),          # pdf kind (3 % 17 == 3)
    (4, "", "de", "srcB"),                    # pdf_rot kind (4 % 19 == 4)
    (5, "tiny doc", "en", "srcB"),            # malformed kind
    (6, "three word body", "fr", "srcB"),
    (7, "x", "en", "srcC"),                   # noisy kind
    (8, "", "en", "srcA"),                    # pdf_prop kind (8 % 29 == 8), empty
    (20, "the quick brown fox jumps over the lazy dog", "en", "srcC"),  # pdf
    (23, "a longer body with more than eight words to span pdf lines", "en", "srcC"),  # pdf_rot
    (9, "plain document with a normal number of words inside it", "es", "srcC"),
    # pdf_prop with enough words for split-eligible lines AND a char
    # outside PROP_WIDTHS ('?') — pins the unknown-char no-split rule on
    # BOTH sides of the media_features payload reconstruction
    (66, "does the proportional branch keep its golden when lines carry many words? yes it must stay identical", "en", "srcB"),
]

QUERIES = [
    "extract_text",
    "extract_title",
    "extract_spans_stats",
    "sniff_kinds",
    "extract_by_lang",
    "doc_stats",
    "token_quantiles",  # round 3: distributed-histogram quantile_disc
    "token_quantiles_by_lang",  # round 3: per-group variant
    "score_quantiles",  # round 3: sort-path continuous-domain quantiles
    "fingerprint",
    "winnow_fingerprint",
    "dedup_exact",
    "dedup_jaccard",
    "quality_basic",
    "quality_score",
    "model_score",
    "lang_id",
    "lang_confusion",  # round 3: declared-vs-predicted matrix (und/zh edges)
    "length_histogram",  # round 3: log2 buckets (empty-doc -1 bucket)
    "table_checksum",  # round 3: anti-entropy sums (null text, short rows)
    "group_checksum",  # round 3: per-source drill-down of the same sums
    "char_entropy",
    "code_detect",  # round 3: code-vs-prose router, all-integer thresholds
    "bpe_token_count",
    "redact_pii",
    "line_dedup",
    "line_dedup_join",
    "corpus_clean",
    "chunk_documents",
    "media_features",
    "frame_sample",  # round 3: video-shape frame sampling
    "token_counts",
    "top_tokens",
    "vocab_ranked",  # round 3: distributed id rank (empty docs, tiny vocab)
    "vocab_encode",  # round 3: train-then-encode (empty docs emit no rows)
    "bpe_train",  # round 3: iterative merges (1-char words contribute none)
    "bpe_encode",  # round 3: train-then-apply segmentation (1-char words)
    "source_divergence",  # round 3: per-source KL (1-token sources, empties)
    "cooccurrence_topk",  # round 3: window > doc length, empty docs
    "ngram_jaccard",
    "dup_components",  # round 3: distributed CC over jaccard pairs
    "sample_split",
    "dedup_minhash",
    "dedup_fuzzy_keep_best",  # round 3: CC quality-winner (empty-doc clique)
    "pack_sequences",
    "training_data",
    "training_data_curated",  # round 3: mixture + decontam folded in
    "simhash_pairs",  # round 3: md5-upper64 simhash replicated in SQL
    "dedup_incremental",  # round 3: crawl-over-crawl anti-join dedup
    "crawl_diff",  # round 3: snapshot diff (empty docs, tiny key space)
    "dedup_bloom",  # round 3: Bloom-bitmap crawl-over-crawl dedup
    "dedup_normalized",  # round 3: case/punct-blind dedup (empty docs collide)
    "dedup_keep_best",  # round 3: longest-variant winner (n_chars ties)
    "budget_sample",  # round 3: unbudgeted sources + tiny totals
    "temperature_mix",  # round 3: temperature mixing (0-token sources)
    "curate",  # round 3: composed pipeline on empty/short docs
    "curate_quality",  # round 3: + Gopher structural gate (may empty)
    "curate_ppl",  # round 3: + CCNet perplexity gate (1-doc langs, empty docs)
    "filter_blocklist",  # round 3: word-boundary blocklist on short docs
    "shuffle_shards",  # round 3: md5 shard shuffle on a tiny corpus
    "rollup_stats",  # round 3: GROUPING SETS with single-doc groups
    "dedup_incremental_minhash",  # round 3: NEAR-dup crawl-over-crawl
    "minhash_pairs",  # round 3: splitmix64 minhash replicated in SQL
    "minhash_components",  # round 3: distributed CC over LSH pairs
    "dup_cluster_sizes",  # round 3: size histogram (empty-doc cliques)
    "stratified_sample",
    "weighted_sample",  # round 3: quality-proportional md5 sampling
    "weighted_sample_k",  # round 3: A-ES exact-k (0-weight docs excluded)
    "cap_per_source",  # round 3: per-domain doc cap (srcA capped at 3)
    "sample_fixed_k",
    "sample_k_per_group",  # round 3: per-group bottom-k (groups < k)
    "topk_per_group",
    "topk_with_ties",  # round 3: RANK semantics, boundary ties kept
    "tfidf_top_terms",
    "dup_ngram_stats",
    "dup_ngram_stats_join",  # round 3: no-broadcast scale path
    "dedup_ngram_spans",
    "dedup_ngram_spans_join",  # round 3: rewrite via the join path
    "decontaminate",
    "contamination_report",  # round 3: per-eval dirtiness (tiny/empty eval)
    "repetition_stats",  # round 3: Gopher intra-doc repetition filters
    "lm_bigram_score",  # round 3: corpus-trained bigram-LM scoring
    "ccnet_buckets",  # round 3: per-lang perplexity terciles (1-doc langs)
    "dsir_weights",  # round 3: DSIR hashed-ngram importance weights
    "bm25_topk",  # round 3: Okapi BM25 retrieval (terms may all miss)
    "outlier_mad",  # round 3: per-lang median/MAD flags (MAD=0 groups)
    "extract_fields",  # round 3: first-match capture (planted test in
    # test_redact.py; edge/fixture docs extract '')
    "entity_counts",  # round 3: RE2 entity density (planted-entity test
    # in test_redact.py pins non-zero counts; edge/fixture docs are 0)
    "nb_classify",  # round 3: corpus-trained NB (empty docs = prior-only)
    "countmin_topk",  # round 3: count-min sketch (tiny/empty corpora)
    "gopher_filter",  # round 3: Gopher rules (0-word docs, vacuous ratios)
    "bpe_pairs",  # round 3: BPE round-1 pair counts (1-char words skip)
    "readability",  # round 3: Flesch micro-units (0-word, no-vowel docs)
    "quality_band",  # round 3: [P10,P90] percentile outlier trim
    "corpus_report",  # round 3: one-pass dashboard aggregate
    "percent_rank",  # round 3: sort-free window-exact ECDF
    "percent_rank_by_lang",  # round 3: PARTITION BY variant
]

#: document-table queries with NO SQL oracle — empty since round 3:
#: every deterministic document operator is hash-oracled
NO_ORACLE_DOC: set = set()

#: embedding-table queries (edge corpus is documents-only)
EMBEDDING_QUERIES = {
    "knn_brute",
    "knn_lsh",
    "knn_ivf",
    "cosine_dups",
    "cosine_dups_lsh",
    "cluster_kmeans",  # round 3: integer k-means, SQL-oracled at sf
    "quantize_embeddings",  # round 3: SQ8 codes, SQL-oracled at sf
    "knn_sq8",  # round 3: quantized ANN rank, SQL-oracled at sf
    "pq_codes",  # round 3: product-quantization codes, SQL-oracled at sf
    "knn_pq",  # round 3: PQ-ADC ANN rank, SQL-oracled at sf
    "knn_ivf_pq",  # round 3: IVF + residual-PQ ANN rank, SQL-oracled at sf
    "semantic_dedup",  # round 3: cluster + within-cluster prune
    "decontaminate_embedding",  # round 3: eval decontam in embedding space
    "doc_embedding_join",  # round 3: general bucketed hash equi-join
    "doc_semi_join",  # round 3: hash_join how="semi"
    "doc_anti_join",  # round 3: hash_join how="anti"
    "doc_outer_join",  # round 3: hash_join how="full_outer"
    "group_enrich",  # round 3: composite-key (lang, source) join-back
}

#: queries over neither documents nor events (edge corpora here cover
#: only those two tables); SQL-oracled at the sf fixtures + pinned by
#: their own reference-equivalence tests
OTHER_TABLES = {
    "graph_rank",  # round 3: orders x lineitem purchase-graph PageRank
    "graph_triangles",  # round 3: lineitem co-supplier triangle support
    # (K4/path/sparse-graph DuckDB equivalence pinned in test_graph.py)
    # round 3: TPC-H-shaped star-schema family over lineitem/orders/
    # customer/nation/region — DuckDB equivalence at sf0.001 + hand-
    # built k-boundary-tie / empty-window fixtures in test_relational.py
    "pricing_summary",
    "star_revenue",
    "top_customers",
    "order_priority",
    "ship_priority",  # round 3: Q3 shape (semi-gated unshipped top-k)
    "revenue_delta",  # round 3: Q6 shape (predicate-band scalar agg)
    "large_orders",  # round 3: Q18 shape (HAVING-on-join-key filter)
    "promo_revenue",  # round 3: Q14 shape (fact-dim CASE ratio)
    "order_count_dist",  # round 3: Q13 shape (outer-join count histogram;
    # zero-bucket fixture in test_relational.py)
    "top_supplier",  # round 3: Q15 shape (max-over-aggregate; tie +
    # empty-window fixtures in test_relational.py)
    "small_qty_revenue",  # round 3: Q17 shape (decorrelated AVG subquery;
    # strict-threshold fixture in test_relational.py)
    "idle_customers",  # round 3: Q22 shape (scalar broadcast + anti join;
    # typed-empty fixture in test_relational.py)
    "nation_volume",  # round 3: Q7 shape (two-fact two-dim join chain)
    "market_share",  # round 3: Q8 shape (share-of-aggregate star chain)
    "band_revenue",  # round 3: Q19 shape (disjunctive band fixture in
    # test_relational.py)
    "customer_features",  # round 3: per-key lifetime aggregates (single-
    # order sentinel fixture in test_relational.py)
    "copurchase_lift",  # round 3: market-basket pairs (hand-built basket
    # + guard + invariance fixtures in test_basket.py)
}

#: event-table queries: gated below over EDGE_EVENTS (approx_distinct is
#: the HLL sketch — no oracle)
EVENT_SIDE = {
    "tumbling_window",
    "window_distinct_users",  # round 3: exact per-window distinct
    "sessionize_salted",
    "sliding_window",
    "sessionize",
    "sessionize_stream",
    "asof_join",
    "range_join",
    "heavy_hitters",
    "approx_distinct",
    "latest_event",  # round 3: keep-newest-per-key dedup
    "value_quantiles",  # round 3: grid-quantized continuous quantiles
    "fill_windows",  # round 3: gap-filled grid incl. epoch-0 span
    "rolling_stats",  # round 3: per-key moving window (ts-tie order)
    "lag_intervals",  # round 3: per-key LAG gaps (ts-tie order)
    "funnel_stages",  # round 3: sequential funnel (same-ts non-advance)
    "sessionize_assign",  # round 3: per-event labels (ts-tie order)
    "cohort_retention",  # round 3: first-window cohorts incl. epoch 0
    "window_topk",  # round 3: count-tie rank order at the k boundary
    "window_outliers",  # round 3: per-type MAD burst flags (MAD=0 ties)
    "props_stats",  # round 3: JSON props extraction (malformed/typed edges)
    "transition_counts",  # round 3: LAG-pair Markov matrix (ts-tie order)
    "ab_metrics",  # round 3: hash-arm funnel rates (same-ts non-convert)
    "user_type_entropy",  # round 3: micro-nat entropy (1-event users = 0)
}


def test_edge_gate_covers_every_query():
    """Completeness: every queries() entry is either edge-gated here
    (documents or events) or explicitly excluded with a reason — a new
    query cannot silently skip the edge gate."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as em

    covered = (
        set(QUERIES) | NO_ORACLE_DOC | EMBEDDING_QUERIES | EVENT_SIDE | OTHER_TABLES
    )
    missing = set(em.queries()) - covered
    assert not missing, f"queries missing from the edge gate: {sorted(missing)}"


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted("|".join(repr(v) for v in t) for t in df.itertuples(index=False))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def norm_df(df: pd.DataFrame) -> pd.DataFrame:
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_integer_dtype(s):
            # an int column carrying NULLs floats on one side (DuckDB
            # .df()) and may be nullable Int64 on the other — normalize
            # both to float64 so the repr-hash can't spuriously diverge
            out[c] = s.astype("float64") if s.isna().any() else s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        else:
            out[c] = s
    return pd.DataFrame(out)


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_sf")
    ids, texts, langs, sources = zip(*EDGE_DOCS)
    pq.write_table(
        pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(texts, pa.string()),
                pa.array(langs, pa.string()),
                pa.array(sources, pa.string()),
                pa.array([len(t) for t in texts], pa.int64()),
            ],
            names=["doc_id", "text", "lang", "source", "n_chars"],
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", QUERIES)
def test_edge_corpus_matches_oracle(edge_dir, name):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as em

    got = em.queries()[name](edge_dir)
    got = norm_df(got.to_pandas() if hasattr(got, "to_pandas") else got)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{edge_dir}/documents.parquet')"
    )
    want = norm_df(con.execute(em.oracle_sql()[name]).df())
    if len(got) == 0 and len(want) == 0:
        return  # both empty: a 0-row Ray Dataset has no schema to compare
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want), (len(got), len(want))
    assert value_hash(got) == value_hash(want), f"{name} diverges on edge docs"


# --- events-table edge gate ------------------------------------------------

# ties on ts (same user and cross-user), a single-event user, an event at
# epoch 0, and same-ts purchase/view pairs (asof <= boundary)
EDGE_EVENTS = [
    # (event_id, ts_us, user_id, event_type, value)
    (0, 0, 1, "view", 1.00),
    (1, 0, 1, "click", 2.00),
    (2, 1_000_000, 1, "purchase", 3.00),
    (3, 1_000_000, 1, "view", 4.00),          # view at SAME ts as purchase
    (4, 1_000_000, 1, "view", 5.00),          # duplicate (user, ts) view
    (5, 3_600_000_000, 2, "purchase", 6.00),  # user with no views
    (6, 500_000, 3, "error", 7.00),           # single-event user
    (7, 2_000_000, 1, "error", 8.00),
    (8, 3_599_000_000, 1, "error", 9.00),     # just inside click+1h? (click at 0)
]

EVENT_QUERIES = [
    "tumbling_window",
    "window_outliers",  # round 3: per-type MAD burst flags
    "props_stats",  # round 3: JSON props extraction
    "window_distinct_users",  # round 3: exact per-window distinct
    "sessionize_salted",
    "sliding_window",
    "sessionize",
    "sessionize_stream",
    "asof_join",
    "range_join",
    "heavy_hitters",
    "approx_distinct",  # round 3: HLL replicated in SQL (md5-upper64)
    "latest_event",  # round 3: ts-tie-heavy keep-latest (ids 2/3/4 tie)
    "value_quantiles",  # round 3: grid quantization on tie-heavy values
    "fill_windows",  # round 3: the edge events leave empty hours mid-span
    "rolling_stats",  # round 3: moving window over the ts-tie trio
    "lag_intervals",  # round 3: zero-gap ties + single-event user
    "funnel_stages",  # round 3: same-ts purchase/view non-advance
    "sessionize_assign",  # round 3: per-event labels over the ts-tie trio
    "cohort_retention",  # round 3: epoch-0 cohort + single-event user
    "window_topk",  # round 3: count ties inside the sparse edge hours
    "transition_counts",  # round 3: ts-tie LAG pairs + single-event user
    "ab_metrics",  # round 3: same-ts purchase non-convert + no-view users
    "user_type_entropy",  # round 3: single-event/single-type users = 0
]


@pytest.fixture(scope="module")
def edge_events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_ev")
    eid, ts, uid, et, val = zip(*EDGE_EVENTS)
    pq.write_table(
        pa.Table.from_arrays(
            [
                pa.array(eid, pa.int64()),
                pa.array(ts, pa.timestamp("us")),
                pa.array(uid, pa.int64()),
                pa.array(et, pa.string()),
                pa.array(val, pa.float64()),
                # diverse JSON edges for props_stats (no other event
                # query reads props): valid ints (incl. negative),
                # missing key, malformed, string/bool/float values, null
                pa.array(
                    [
                        '{"k": 5}',
                        '{"k": -3}',
                        "{}",
                        "not json",
                        '{"k": "7"}',
                        '{"k": true}',
                        '{"k": 2.5}',
                        None,
                        '{"k": 0}',
                    ][: len(eid)],
                    pa.string(),
                ),
            ],
            names=["event_id", "ts", "user_id", "event_type", "value", "props"],
        ),
        str(d / "events.parquet"),
    )
    return str(d)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_edge_events_match_oracle(edge_events_dir, name):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as em

    got = em.queries()[name](edge_events_dir)
    got = norm_df(got.to_pandas() if hasattr(got, "to_pandas") else got)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{edge_events_dir}/events.parquet')"
    )
    want = norm_df(con.execute(em.oracle_sql()[name]).df())
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want), (len(got), len(want))
    assert value_hash(got) == value_hash(want), f"{name} diverges on edge events"
