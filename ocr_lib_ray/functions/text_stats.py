"""Text analysis operators over document tables (training-data ops).

All batch fns are Arrow-vectorized (`pyarrow.compute` kernels) except
where a per-row Python step is inherent (md5, stopword profiles) — and
those loop over short token lists, not characters.

Normalization is the engine-wide canonical form ``collapse_ws`` (see
kernel/tokenizer.py) whose SQL equivalent is
``trim(regexp_replace(x, '[ \\t\\n\\r\\f\\v]+', ' ', 'g'))``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WS_CLASS = "[ \t\n\r\f\v]+"


def normalize_expr(col: pa.ChunkedArray) -> pa.ChunkedArray:
    """Vectorized collapse_ws."""
    return pc.utf8_trim_whitespace(pc.replace_substring_regex(col, _WS_CLASS, " "))


def token_count(norm: pa.ChunkedArray):
    """Words in normalized text (0 for empty) — vectorized."""
    n = pc.list_value_length(pc.split_pattern(norm, " "))
    return pc.if_else(pc.equal(pc.utf8_length(norm), 0), pa.scalar(0, pa.int32()), n)


def doc_stats_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_chars_norm, n_tokens, avg_token_len) per document."""
    norm = normalize_expr(batch.column("text"))
    n_chars = pc.utf8_length(norm).cast(pa.int64())
    n_tokens = token_count(norm).cast(pa.int64())
    # avg token length = (chars - separators) / tokens; exact rational → round 6
    seps = pc.subtract(n_tokens, pc.min_element_wise(n_tokens, 1))
    avg = pc.if_else(
        pc.greater(n_tokens, 0),
        pc.round(
            pc.divide(
                pc.subtract(n_chars, seps).cast(pa.float64()),
                pc.max_element_wise(n_tokens, 1).cast(pa.float64()),
            ),
            ndigits=6,
        ),
        pa.scalar(0.0),
    )
    return pa.Table.from_arrays(
        [batch.column("doc_id"), n_chars, n_tokens, avg],
        names=["doc_id", "n_chars_norm", "n_tokens", "avg_token_len"],
    )


def char_entropy_batch(batch: pa.Table) -> pa.Table:
    """Shannon entropy (bits) of the normalized text's character
    distribution — a cheap quality/garbage signal."""
    import math

    norm = normalize_expr(batch.column("text")).to_pylist()
    ents = []
    for t in norm:
        if not t:
            ents.append(0.0)
            continue
        counts: dict = {}
        for ch in t:
            counts[ch] = counts.get(ch, 0) + 1
        n = len(t)
        ent = -sum((c / n) * math.log2(c / n) for _, c in sorted(counts.items()))
        ents.append(round(ent, 6))
    return pa.Table.from_arrays(
        [batch.column("doc_id"), pa.array(ents, pa.float64())],
        names=["doc_id", "char_entropy"],
    )


def winnow_fingerprint_batch(batch: pa.Table, n: int = 3, k: int = 8) -> pa.Table:
    """Bottom-k document fingerprint (winnowing-style sketch): the k
    smallest md5-derived hashes of the distinct token n-grams, joined as
    one string — a compact near-dup blocking key whose overlap
    approximates n-gram resemblance (bottom-k sketch property).

    md5 (not crc32) so the oracle SQL can reproduce it byte-for-byte
    (``substr(md5(gram), 1, 16)``; fixed-width lowercase hex sorts
    lexicographically == numerically).  Empty text → empty fingerprint.
    """
    norm = normalize_expr(batch.column("text")).to_pylist()
    fps = []
    for t in norm:
        toks = t.split(" ") if t else []
        if not toks:
            fps.append("")
            continue
        if len(toks) < n:
            grams = {" ".join(toks)}
        else:
            grams = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
        hs = sorted(hashlib.md5(g.encode("utf-8")).hexdigest()[:16] for g in grams)
        fps.append(",".join(hs[:k]))
    return pa.Table.from_arrays(
        [batch.column("doc_id"), pa.array(fps, pa.string())],
        names=["doc_id", "winnow_fp"],
    )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Content fingerprint: md5 hex of normalized text (dedup key)."""
    norm = normalize_expr(batch.column("text")).to_pylist()
    fps = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in norm]
    return pa.Table.from_arrays(
        [batch.column("doc_id"), pa.array(fps, pa.string())],
        names=["doc_id", "fingerprint"],
    )


# --- language id: n-gram/stopword heuristic (deterministic, no model) ------

# Stopword profiles — the single source of truth for BOTH the LangId
# stage and the driver's oracle SQL (generated from this dict in
# __ray_entry__.py, so impl and oracle cannot diverge).  Words shared by
# several languages are fine: the tie-break (hits desc, tag asc) is
# deterministic on both sides.
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "que", "por"},
    "it": {"il", "lo", "gli", "che", "non", "per", "con", "sono", "della", "di"},
    "pt": {"os", "um", "uma", "para", "com", "mais", "em", "ou", "como", "foi"},
    "nl": {"de", "het", "een", "en", "van", "ik", "te", "dat", "niet", "op"},
    "sv": {"och", "att", "det", "som", "en", "på", "är", "av", "för", "med"},
    "pl": {"i", "w", "nie", "na", "się", "jest", "do", "to", "że", "z"},
    "tr": {"bir", "ve", "bu", "da", "ne", "için", "ile", "olarak", "daha", "gibi"},
    "id": {"yang", "dan", "di", "itu", "dengan", "untuk", "tidak", "ini", "dari", "akan"},
    "ro": {"și", "în", "cu", "este", "pentru", "nu", "mai", "din", "sau", "dar"},
}


class LangId:
    """Actor-pool stage: stopword-profile language id + CJK char rule.

    Stateful-stage discipline (profiles built once per actor in
    ``__init__`` — the read-signs-fn-once fix, core.clj:1792-1796).
    Deterministic tie-break: highest hit count, then alphabetical tag;
    no hits → "und"; any CJK codepoint → "zh".
    """

    def __init__(self):
        import re

        tags = sorted(_LANG_PROFILES)  # alphabetical = tie order
        self.tags = tags
        # inverted index: token → tuple of profile indices.  Scoring is
        # then ONE dict lookup per token (stopword hits — a small
        # fraction — pay a tiny inner loop) instead of 12 set probes
        # per token; semantics identical to scoring each profile.
        self.word2langs: dict = {}
        for li, tag in enumerate(tags):
            for w in _LANG_PROFILES[tag]:
                self.word2langs[w] = self.word2langs.get(w, ()) + (li,)
        self.cjk = re.compile("[一-鿿]")  # one C-level scan per doc

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n_langs = len(self.tags)
        preds = []
        for t in texts:
            t = t or ""  # null text cells are legal Arrow input
            if self.cjk.search(t):
                preds.append("zh")
                continue
            counts = [0] * n_langs
            get = self.word2langs.get
            for w in t.lower().split():
                langs = get(w)
                if langs:
                    for li in langs:
                        counts[li] += 1
            best_tag, best_hits = "und", 0
            for li, hits in enumerate(counts):
                if hits > best_hits:  # strict > keeps alphabetical ties
                    best_tag, best_hits = self.tags[li], hits
            preds.append(best_tag)
        return pa.Table.from_arrays(
            [batch.column("doc_id"), pa.array(preds, pa.string())],
            names=["doc_id", "lang_pred"],
        )


_LANG_ID = None


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """Stateless-task form of :class:`LangId` (thin state — the
    inverted index builds in ~50µs — so per the measured thin-state
    rule tasks beat an actor pool: they fuse with the read and skip
    pool ramp-up; the instance is cached per worker process)."""
    global _LANG_ID
    if _LANG_ID is None:
        _LANG_ID = LangId()
    return _LANG_ID(batch)


def repetition_stats_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style INTRA-document repetition signals (the Rae et al.
    2021 appendix-A repetition filters), per document over normalized
    tokens:

    - ``top_2gram_char_frac`` / ``top_3gram_char_frac``: the published
      filter's definition — the MOST FREQUENT word n-gram's character
      share: occurrences × n-gram characters (spaces excluded) / total
      token characters, most-frequent chosen by (count desc, gram
      chars desc) so exact count ties break deterministically.
    - ``dup_5gram_char_frac``: fraction of token characters covered by
      any 5-gram occurring MORE THAN ONCE within the document
      (position-marked, each character counted once — the duplicated-
      n-gram coverage rule).

    Intra-document only — cross-document duplicated spans are
    ``ngramdup.dup_ngram_stats``.  Map-only: no shuffle at any scale;
    the per-doc token loop is inherent (same class as QualityScore).
    Empty documents emit 0.0 everywhere.

    Rounding is HALF-UP (not Python banker's): the fracs are small-
    denominator rationals (char counts), so exact 1e-6 halves occur in
    practice (e.g. 17/128) and DuckDB ``round`` — the oracle — rounds
    half away from zero.
    """
    import math
    from collections import Counter

    def r6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    norms = normalize_expr(batch.column("text")).to_pylist()
    top2, top3, dup5 = [], [], []
    for t in norms:
        toks = t.split(" ") if t else []
        lens = np.array([len(w) for w in toks], dtype=np.int64)
        total = int(lens.sum())
        if total == 0:
            top2.append(0.0)
            top3.append(0.0)
            dup5.append(0.0)
            continue

        def top_mass(n: int) -> float:
            if len(toks) < n:
                return 0.0
            counts = Counter(zip(*(toks[i:] for i in range(n))))
            # most frequent gram; ties → the longer gram (deterministic)
            c, cl = max((c, sum(len(w) for w in g)) for g, c in counts.items())
            return r6(c * cl / total)

        top2.append(top_mass(2))
        top3.append(top_mass(3))
        if len(toks) < 5:
            dup5.append(0.0)
        else:
            grams = list(zip(*(toks[i:] for i in range(5))))
            counts5 = Counter(grams)
            cov = np.zeros(len(toks), dtype=bool)
            for i, g in enumerate(grams):
                if counts5[g] > 1:
                    cov[i : i + 5] = True
            dup5.append(r6(float(lens[cov].sum()) / total))
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            pa.array(top2, pa.float64()),
            pa.array(top3, pa.float64()),
            pa.array(dup5, pa.float64()),
        ],
        names=[
            "doc_id",
            "top_2gram_char_frac",
            "top_3gram_char_frac",
            "dup_5gram_char_frac",
        ],
    )


def code_detect_batch(batch: pa.Table) -> pa.Table:
    """Code-vs-prose router (training-data op): flag documents that
    look like source code so a curation pipeline can route them to a
    code bucket (or drop them from a prose corpus).

    Signals over the RAW text (line structure matters, so no collapse):
    code-punctuation count (``;`` ``{`` ``}``), line count, and
    indented-line count (lines starting with two spaces or a tab).
    Classification is pure INTEGER cross-multiplication — punctuation
    density >= 0.5% of chars, or >= 30% of lines indented, with at
    least 3 lines — so the SQL oracle hash-matches bit-exactly (no
    float densities to round).  Fully vectorized: every signal is one
    ``pyarrow.compute`` substring-count kernel; map-only, zero shuffle.
    """
    text = batch.column("text")

    def cnt(s: str):
        return pc.count_substring(text, s).cast(pa.int64())

    n_chars = pc.utf8_length(text).cast(pa.int64())
    n_punct = pc.add(pc.add(cnt(";"), cnt("{")), cnt("}"))
    n_lines = pc.add(cnt("\n"), 1)
    # a line is indented iff the text has "\n  "/"\n\t" at its boundary
    # (or starts with the prefix) — the vectorized form of per-line
    # startswith, and exactly SQL's per-line LIKE '  %' / LIKE tab%
    n_indent = pc.add(
        pc.add(cnt("\n  "), cnt("\n\t")),
        pc.add(
            pc.starts_with(text, "  ").cast(pa.int64()),
            pc.starts_with(text, "\t").cast(pa.int64()),
        ),
    )
    dense_punct = pc.greater_equal(pc.multiply(n_punct, 200), n_chars)
    dense_indent = pc.greater_equal(
        pc.multiply(n_indent, 10), pc.multiply(n_lines, 3)
    )
    is_code = pc.cast(
        pc.and_(pc.greater_equal(n_lines, 3), pc.or_(dense_punct, dense_indent)),
        pa.int64(),
    )
    return pa.Table.from_arrays(
        [batch.column("doc_id"), n_chars, n_lines, n_indent, n_punct, is_code],
        names=["doc_id", "n_chars", "n_lines", "n_indent", "n_punct", "is_code"],
    )


_QUALITY = None


def quality_score_batch(batch: pa.Table) -> pa.Table:
    """Stateless-task form of :class:`QualityScore` (same rationale as
    :func:`lang_id_batch`)."""
    global _QUALITY
    if _QUALITY is None:
        _QUALITY = QualityScore()
    return _QUALITY(batch)


class QualityScore:
    """Heuristic quality signals per document (also usable as an
    actor-pool stage when taught profiles ride a bundle).

    Signals (all deterministic): stopword ratio (en profile), mean word
    length, alpha-char ratio, digit ratio, max word repetition ratio.
    """

    def __init__(self):
        self.stop = _LANG_PROFILES["en"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        out = {k: [] for k in ("stop_ratio", "mean_word_len", "alpha_ratio", "top_word_ratio")}
        for t in texts:
            toks = (t or "").lower().split()
            n = len(toks)
            if n == 0:
                for k in out:
                    out[k].append(0.0)
                continue
            out["stop_ratio"].append(round(sum(w in self.stop for w in toks) / n, 6))
            out["mean_word_len"].append(round(sum(len(w) for w in toks) / n, 6))
            chars = sum(len(w) for w in toks)
            alpha = sum(sum(c.isalpha() for c in w) for w in toks)
            out["alpha_ratio"].append(round(alpha / max(chars, 1), 6))
            counts: dict = {}
            for w in toks:
                counts[w] = counts.get(w, 0) + 1
            out["top_word_ratio"].append(round(max(counts.values()) / n, 6))
        arrays = [batch.column("doc_id")] + [pa.array(v, pa.float64()) for v in out.values()]
        return pa.Table.from_arrays(arrays, names=["doc_id"] + list(out.keys()))


def corpus_report(docs_ds, group_cols=("source", "lang")):
    """One-pass corpus dashboard: per group (default source x lang) the
    doc count, total/average token count and empty-doc count — the
    summary a curation run prints before and after each filter stage.

    Shuffle discipline: per-batch grouped PARTIALS (one row per group
    per batch — Arrow group_by in C) ride a distinct-groups-sized
    ``groupby().aggregate(Sum)``; the average is derived from the two
    sums afterwards (never averaged across partials).  ``round 6`` on
    the exact rational, once — the repo's float-oracle discipline
    (same as doc_stats_batch.avg_token_len).  Null group keys raise
    (Ray's sort groupby cannot shuffle them; SQL would keep a NULL
    group — silence would diverge from the oracle).
    """
    from ray.data.aggregate import Sum

    gcols = list(group_cols)

    def partials(b: pa.Table) -> pa.Table:
        for c in gcols:
            if b.column(c).null_count:
                raise ValueError(
                    f"corpus_report: null keys in group column {c!r} are "
                    "unsupported — filter or fill them first"
                )
        norm = normalize_expr(b.column("text"))
        nt = token_count(norm).cast(pa.int64())
        empty = pc.cast(pc.equal(norm, ""), pa.int64())
        t = pa.Table.from_arrays(
            [b.column(c) for c in gcols]
            + [nt, empty, pa.array([1] * len(b), pa.int64())],
            names=gcols + ["n_tokens_sum", "n_empty", "n_docs"],
        )
        g = t.group_by(gcols).aggregate(
            [("n_tokens_sum", "sum"), ("n_empty", "sum"), ("n_docs", "sum")]
        )
        return g.rename_columns(gcols + ["n_tokens_sum", "n_empty", "n_docs"])

    agg = (
        docs_ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(gcols)
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens_sum", alias_name="n_tokens_sum"),
            Sum("n_empty", alias_name="n_empty"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        avg = pc.round(
            pc.divide(
                b.column("n_tokens_sum").cast(pa.float64()),
                b.column("n_docs").cast(pa.float64()),
            ),
            ndigits=6,
        )
        return b.append_column("avg_tokens", avg)

    return agg.map_batches(finish, batch_format="pyarrow")


# --- Gopher quality-rule verdict -------------------------------------------

#: Gopher rule 7's English stop-word list (Rae et al. 2021, App. A1.1.2)
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")

import math  # noqa: E402
import re  # noqa: E402 — gopher + readability regex/micro math

_GOPHER_ALPHA = re.compile(r"[A-Za-z]")
_GOPHER_SYMBOL = re.compile(r"#|\.\.\.")


def gopher_filter_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """The published Gopher quality filter (Rae et al. 2021, Appendix
    A1.1.2) as a per-document verdict plus the individual rule bits:

      r_words   50 <= word count <= 100000
      r_wordlen 3 <= mean word length <= 10
      r_symbol  symbol-to-word ratio ('#' or '...') <= 0.1
      r_bullet  <= 90% of lines start with a bullet ('-', '*', '•')
      r_ellip   <= 30% of lines end with '...' or '…'
      r_alpha   >= 80% of words contain an alphabetic character
      r_stops   >= 2 DISTINCT words from the 8-word stop list
      passes    all of the above

    Every ratio rule is an INTEGER cross-multiplication (e.g. mean
    word length in [3,10] ⇔ 3·n ≤ chars ≤ 10·n), so the verdict is
    exact and the oracle hashes bit-for-bit.  Words come from the
    normalized text; lines from the RAW text split on newlines (the
    bullet/ellipsis rules are layout rules).  Zero-word documents fail
    r_words and pass the vacuous ratio rules — passes is still False.
    """
    raw = [t or "" for t in batch.column(text_col).to_pylist()]
    norm = normalize_expr(batch.column(text_col)).to_pylist()
    cols: dict = {k: [] for k in (
        "n_words", "r_words", "r_wordlen", "r_symbol", "r_bullet",
        "r_ellip", "r_alpha", "r_stops", "passes",
    )}
    for rawt, t in zip(raw, norm):
        ws = t.split(" ") if t else []
        n = len(ws)
        chars = sum(len(w) for w in ws)
        n_alpha = sum(1 for w in ws if _GOPHER_ALPHA.search(w))
        n_stops = len({w for w in ws if w in GOPHER_STOPS})
        n_sym = len(_GOPHER_SYMBOL.findall(rawt))
        lines = rawt.split("\n") if rawt else []
        n_lines = len(lines)
        n_bullet = sum(1 for l in lines if l.startswith(("-", "*", "•")))
        n_ellip = sum(1 for l in lines if l.endswith(("...", "…")))
        r = {
            "r_words": 50 <= n <= 100_000,
            "r_wordlen": 3 * n <= chars <= 10 * n,
            "r_symbol": 10 * n_sym <= n,
            "r_bullet": 10 * n_bullet <= 9 * n_lines,
            "r_ellip": 10 * n_ellip <= 3 * n_lines,
            "r_alpha": 5 * n_alpha >= 4 * n,
            "r_stops": n_stops >= 2,
        }
        cols["n_words"].append(n)
        for k, v in r.items():
            cols[k].append(v)
        cols["passes"].append(all(r.values()))
    return pa.Table.from_arrays(
        [batch.column("doc_id"), pa.array(cols["n_words"], pa.int64())]
        + [pa.array(cols[k], pa.bool_()) for k in (
            "r_words", "r_wordlen", "r_symbol", "r_bullet",
            "r_ellip", "r_alpha", "r_stops", "passes")],
        names=["doc_id", "n_words", "r_words", "r_wordlen", "r_symbol",
               "r_bullet", "r_ellip", "r_alpha", "r_stops", "passes"],
    )


# --- Flesch reading ease ----------------------------------------------------

_SENT_RE = re.compile(r"[.!?]+")
_VOWEL_RE = re.compile(r"[aeiouyAEIOUY]+")


def readability_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Flesch reading ease (Flesch 1948) per document, in exact
    micro-units: ``206.835 - 1.015·(W/S) - 84.6·(Syl/W)`` where W =
    words (normalized split), S = sentence count (runs of ``[.!?]`` in
    the RAW text, min 1 when any word exists), Syl = syllable estimate
    (vowel-group runs per word, min 1 per word — the standard cheap
    heuristic; hyphenation dictionaries are out of scope).

    The double chain is computed ONCE per doc and micro-floored, the
    same IEEE ops the SQL oracle runs, so the score hash-verifies.
    Documents with zero words emit score_micro = 0 and n_sentences = 0.
    """
    raw = [t or "" for t in batch.column(text_col).to_pylist()]
    norm = normalize_expr(batch.column(text_col)).to_pylist()
    n_words, n_sents, n_syll, scores = [], [], [], []
    for rawt, t in zip(raw, norm):
        ws = t.split(" ") if t else []
        w = len(ws)
        if w == 0:
            n_words.append(0)
            n_sents.append(0)
            n_syll.append(0)
            scores.append(0)
            continue
        s = max(1, len(_SENT_RE.findall(rawt)))
        syl = sum(max(1, len(_VOWEL_RE.findall(word))) for word in ws)
        score = 206.835 - 1.015 * (w / s) - 84.6 * (syl / w)
        n_words.append(w)
        n_sents.append(s)
        n_syll.append(syl)
        scores.append(math.floor(score * 1e6 + 0.5))
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            pa.array(n_words, pa.int64()),
            pa.array(n_sents, pa.int64()),
            pa.array(n_syll, pa.int64()),
            pa.array(scores, pa.int64()),
        ],
        names=["doc_id", "n_words", "n_sentences", "n_syllables", "flesch_micro"],
    )


def lang_confusion(docs_ds):
    """Declared-vs-predicted language confusion matrix — the model
    monitoring readout a corpus pipeline runs after every LangId
    change: (lang, lang_pred, n) counting documents per (declared
    label, prediction) cell.  Scale shape: the prediction is the
    map-only :func:`lang_id_batch` pass fused with a per-block
    ≤|langs|² partial count; the global groupby is |langs|²-sized."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def parts(b: pa.Table) -> pa.Table:
        if b.column("lang").null_count:
            raise ValueError(
                "lang_confusion: null values in the declared lang column "
                "are unsupported — filter or fill them first (pandas "
                "groupby would silently drop the rows while SQL groups "
                "them under NULL)"
            )
        pred = lang_id_batch(b)
        df = pd.DataFrame(
            {
                "lang": b.column("lang").to_pylist(),
                "lang_pred": pred.column("lang_pred").to_pylist(),
            }
        )
        g = (
            df.groupby(["lang", "lang_pred"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.Table.from_arrays(
            [
                pa.array(g["lang"], pa.string()),
                pa.array(g["lang_pred"], pa.string()),
                pa.array(g["n"].astype("int64")),
            ],
            names=["lang", "lang_pred", "n"],
        )

    return (
        docs_ds.map_batches(parts, batch_format="pyarrow")
        .groupby(["lang", "lang_pred"])
        .aggregate(Sum("n", alias_name="n"))
    )


def length_histogram(docs_ds):
    """Log2-bucketed token-length distribution — the corpus profiling
    histogram (truncation-vs-padding planning, chunk-size choice, and
    the first thing that moves when an extraction bug ships):
    (bucket, n_docs) with bucket k covering [2^k, 2^(k+1)) tokens and
    bucket -1 = empty documents.

    Exactness: the bucket is the integer bit-length (numpy ``frexp``
    exponent — exact for counts < 2^53), never a float ``log2``
    rounded at a power-of-two boundary; the oracle derives the same
    bucket from an integer powers-of-two table.  Scale shape: map-only
    per-block bucket partials, one ≤ 42-row groupby."""
    import numpy as np
    import pandas as pd
    from ray.data.aggregate import Sum

    def parts(b: pa.Table) -> pa.Table:
        norm = normalize_expr(b.column("text"))
        n = token_count(norm).to_numpy(zero_copy_only=False).astype(np.int64)
        _m, e = np.frexp(n.astype(np.float64))
        bucket = np.where(n == 0, np.int64(-1), (e - 1).astype(np.int64))
        g = pd.Series(bucket).value_counts().reset_index()
        g.columns = ["bucket", "n"]
        return pa.Table.from_arrays(
            [
                pa.array(g["bucket"].astype(np.int64)),
                pa.array(g["n"].astype(np.int64)),
            ],
            names=["bucket", "n"],
        )

    return (
        docs_ds.map_batches(parts, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n_docs"))
    )
