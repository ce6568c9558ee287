"""Classifier resource bundle — the ``signs`` template-store analog.

The reference's caller "teaches" the system by passing a template map
(``signs``, /root/reference/src/clj/ocr_lib/core.clj:1782) that
``read-signs-fn`` re-decodes on EVERY page call (core.clj:1792-1796).
Here the equivalent learned/stateful resources are frozen into one
picklable bundle, ``ray.put`` once on the driver, and fetched once per
actor in ``ExtractDocuments.__init__`` — never per batch, never per
document.

The bundle carries the tag-class heuristic tables (which tags are
boilerplate/block/heading) and the language stopword profiles, so a
deployment can extend or re-teach the classifier without code changes
(the extension surface of SURVEY §2.8).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..kernel import tokenizer as _tok


@dataclass(frozen=True)
class ClassifierBundle:
    version: int = 1
    boilerplate_tags: frozenset = field(
        default_factory=lambda: frozenset(_tok.BOILERPLATE_TAGS)
    )
    block_tags: frozenset = field(default_factory=lambda: frozenset(_tok.BLOCK_TAGS))
    heading_tags: frozenset = field(
        default_factory=lambda: frozenset(_tok.HEADING_TAGS)
    )
    #: {lang_tag: stopword frozenset} — LangId profile source of truth
    lang_profiles: dict = field(default_factory=dict)
    #: extra named entities layered over the kernel table
    extra_entities: dict = field(default_factory=dict)
    #: classification-threshold overrides (the caller-threaded
    #: ``matching-value`` analog, core.clj:1772-1806): None = keep the
    #: ExtractConfig value.  Lets a deployment teach acceptance
    #: thresholds through the same bundle that teaches tag classes.
    min_words: int | None = None
    link_density_num: int | None = None
    link_density_den: int | None = None
    residual_cap: int | None = None
    #: taught per-glyph advance table {char: fraction-of-font-size} —
    #: the learned-width store (nauci-slova width teaching,
    #: core_helper.clj:1833-1989; consumed by run_advance, the citaj
    #: analog core_helper.clj:324-361).  None = the flat heuristic.
    glyph_widths: dict | None = None

    def apply_to(self, cfg):
        """ExtractConfig with this bundle's threshold overrides applied
        (a new frozen config; None fields keep the caller's values)."""
        from dataclasses import replace

        overrides = {
            k: v
            for k in ("min_words", "link_density_num", "link_density_den", "residual_cap")
            if (v := getattr(self, k)) is not None
        }
        if getattr(self, "glyph_widths", None) is not None:
            overrides["pdf_glyph_widths"] = self.glyph_widths
        return replace(cfg, **overrides) if overrides else cfg


def build_bundle(
    extra_boilerplate=(),
    lang_profiles=None,
    min_words=None,
    link_density_num=None,
    link_density_den=None,
    residual_cap=None,
    glyph_widths=None,
) -> ClassifierBundle:
    """Driver-side bundle construction (the ``nauci-slova`` analog,
    core_helper.clj:1833-1989 — run once, offline)."""
    from ..functions.text_stats import _LANG_PROFILES

    return ClassifierBundle(
        boilerplate_tags=frozenset(_tok.BOILERPLATE_TAGS) | frozenset(extra_boilerplate),
        lang_profiles={
            k: frozenset(v) for k, v in (lang_profiles or _LANG_PROFILES).items()
        },
        min_words=min_words,
        link_density_num=link_density_num,
        link_density_den=link_density_den,
        residual_cap=residual_cap,
        glyph_widths=dict(glyph_widths) if glyph_widths else None,
    )


def learn_glyph_widths(samples, min_count: int = 1) -> dict:
    """Teach per-glyph advance fractions from measured run extents —
    the ``nauci-slova`` width-teaching analog (core_helper.clj:1833-1989,
    where glyph widths come from the taught template crops).

    ``samples``: iterable of ``(text, font_size, measured_advance)`` —
    e.g. from a PDF whose runs carry known extents (two abutting runs
    give run 1's true advance as ``x2 - x1``).  Solves the
    least-squares system ``Σ_c count(c, text) · w_c = advance / size``
    per sample with numpy lstsq (deterministic); glyphs observed fewer
    than ``min_count`` times are omitted (they fall back to the flat
    heuristic at use time).  Returns {char: fraction-of-font-size}.
    """
    import numpy as np

    chars = sorted({ch for text, _s, _a in samples for ch in text})
    idx = {ch: i for i, ch in enumerate(chars)}
    if not chars:
        return {}
    a = np.zeros((len(samples), len(chars)), dtype=np.float64)
    b = np.zeros(len(samples), dtype=np.float64)
    counts = np.zeros(len(chars), dtype=np.int64)
    for row, (text, size, adv) in enumerate(samples):
        for ch in text:
            a[row, idx[ch]] += 1.0
            counts[idx[ch]] += 1
        b[row] = adv / float(size)
    w, *_ = np.linalg.lstsq(a, b, rcond=None)
    return {
        ch: round(float(w[i]), 6)
        for ch, i in idx.items()
        if counts[i] >= min_count and np.isfinite(w[i]) and w[i] > 0
    }


def infer_glyph_widths(
    samples, min_count: int = 3, pair_candidates=None
) -> tuple:
    """Infer per-glyph advance fractions (and optionally pair-kerning
    deltas) from OBSERVED run extents — no taught table required.  The
    corpus-side completion of the ``nauci-slova`` analog
    (core_helper.clj:1833-1989 learns glyph metrics from sample data;
    :func:`learn_glyph_widths` needs the caller to hand it TRUE
    advances, this solver works from what a document stream actually
    exposes).

    ``samples``: ``[(text, font_size, observed_extent), ...]`` from
    :func:`ocr_lib_ray.kernel.pdf.width_samples` — each extent is the
    left run's true advance PLUS the producer's inter-run gap.  Model:
    ``extent / size = Σ_c count(c)·w_c [+ Σ_p count(p)·k_p] + gap``
    with ONE shared gap unknown (fraction of font size) absorbing the
    constant inter-run spacing, solved by numpy lstsq (deterministic).
    Heterogeneous gaps (mixed word gaps and column gaps) blur into the
    residual — this is an estimator, not the exact solve of
    learn_glyph_widths; the inference test pins that it still recovers
    the fixture font exactly (integer geometry → exact system).

    Kerning (``pair_candidates``): a caller-named CANDIDATE set of
    two-char keys (the AV/To/Ta table every font ships) gets one
    column each; deltas may be negative and plug into run_advance's
    round-4 pair keys.  Candidates, not an open set, by necessity:
    natural text is composed from a word vocabulary, so the sample
    count-matrix rank is bounded by the DISTINCT-WORD count — jointly
    solving every observed pair is structurally underdetermined (a
    measured rank of 12 on 60 samples over 12 words), and min-norm
    lstsq would smear the gap across phantom pair deltas.  Single-font
    model: one table for the corpus, fractions of font size (document
    multi-font corpora by splitting the sample stream upstream).

    Returns ``(widths, gap_fraction)`` — ``widths`` plugs directly into
    ``build_bundle(glyph_widths=...)`` / ``cfg.pdf_glyph_widths``;
    chars below ``min_count`` or with non-positive/non-finite solutions
    are omitted (flat-heuristic fallback at use time, exactly like
    learn_glyph_widths).
    """
    import numpy as np

    samples = [
        (t, float(s), float(e)) for t, s, e in samples if t and s > 0
    ]
    if not samples:
        return {}, 0.0
    chars = sorted({ch for t, _s, _e in samples for ch in t})
    keys = list(chars)
    if pair_candidates:
        # candidate pairs only, and only past min_count observations:
        # an under-observed column makes the system underdetermined and
        # min-norm lstsq smears the shared gap across it
        cand = set(pair_candidates)
        pair_counts: dict = {}
        for t, _s, _e in samples:
            for a_ch, b_ch in zip(t, t[1:]):
                p = a_ch + b_ch
                if p in cand:
                    pair_counts[p] = pair_counts.get(p, 0) + 1
        keys += sorted(p for p, n in pair_counts.items() if n >= min_count)
    idx = {k: i for i, k in enumerate(keys)}
    n_cols = len(keys) + 1  # + shared gap column
    a = np.zeros((len(samples), n_cols), dtype=np.float64)
    b = np.zeros(len(samples), dtype=np.float64)
    counts = np.zeros(len(keys), dtype=np.int64)
    for row, (t, size, extent) in enumerate(samples):
        for ch in t:
            a[row, idx[ch]] += 1.0
            counts[idx[ch]] += 1
        if pair_candidates:
            for pre, nxt in zip(t, t[1:]):
                j = idx.get(pre + nxt)
                if j is not None:  # non-candidate/rare pairs: no column
                    a[row, j] += 1.0
                    counts[j] += 1
        a[row, n_cols - 1] = 1.0
        b[row] = extent / size
    w, *_ = np.linalg.lstsq(a, b, rcond=None)
    out = {}
    for k, i in idx.items():
        if counts[i] < min_count or not np.isfinite(w[i]):
            continue
        if len(k) == 1 and w[i] <= 0:
            continue  # per-char advances must be positive; pairs may kern
        out[k] = round(float(w[i]), 6)
    gap = float(w[n_cols - 1])
    return out, (round(gap, 6) if np.isfinite(gap) else 0.0)


def infer_glyph_widths_ds(
    pages_ds,
    max_samples: int = 200_000,
    min_count: int = 3,
    pair_candidates=None,
):
    """Distributed width inference over a pages Dataset: a map-only
    sample pass (PDF pages → (text, size, extent) rows via the kernel's
    :func:`ocr_lib_ray.kernel.pdf.width_samples`) bounded by
    ``limit(max_samples)`` — the driver collects at most that many tiny
    rows regardless of corpus size — then one deterministic lstsq solve
    (:func:`infer_glyph_widths`).  The solve is
    O(max_samples × observed-glyph-alphabet), driver-side by design:
    the model is one small shared table, the same shape as every other
    broadcast-weights training pass in this engine.

    Returns ``(widths, gap_fraction)``; feed ``widths`` to
    ``build_bundle(glyph_widths=...)`` for a no-taught-bundle
    deployment.
    """
    import pyarrow as pa

    def sample_batch(batch: pa.Table) -> pa.Table:
        from ..kernel.extract import sniff_kind
        from ..kernel.pdf import width_samples

        texts, sizes, extents = [], [], []
        for payload in batch.column("html").to_pylist():
            if payload is None or sniff_kind(payload) != "pdf":
                continue
            for t, s, e in width_samples(
                payload.decode("utf-8", errors="replace")
            ):
                texts.append(t)
                sizes.append(s)
                extents.append(e)
        return pa.table(
            {
                "t": pa.array(texts, pa.string()),
                "s": pa.array(sizes, pa.float64()),
                "e": pa.array(extents, pa.float64()),
            }
        )

    rows = (
        pages_ds.map_batches(sample_batch, batch_format="pyarrow")
        .limit(max_samples)
        .take_all()
    )
    return infer_glyph_widths(
        [(r["t"], r["s"], r["e"]) for r in rows],
        min_count=min_count,
        pair_candidates=pair_candidates,
    )


def broadcast_bundle(bundle: ClassifierBundle):
    """``ray.put`` once; hand the ref to actor constructors."""
    import ray

    return ray.put(bundle)
