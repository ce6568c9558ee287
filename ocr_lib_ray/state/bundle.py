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


def broadcast_bundle(bundle: ClassifierBundle):
    """``ray.put`` once; hand the ref to actor constructors."""
    import ray

    return ray.put(bundle)
