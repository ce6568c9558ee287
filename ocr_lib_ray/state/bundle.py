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

    def apply_to(self, cfg):
        """ExtractConfig with this bundle's threshold overrides applied
        (a new frozen config; None fields keep the caller's values)."""
        from dataclasses import replace

        overrides = {
            k: v
            for k in ("min_words", "link_density_num", "link_density_den", "residual_cap")
            if (v := getattr(self, k)) is not None
        }
        return replace(cfg, **overrides) if overrides else cfg


def build_bundle(
    extra_boilerplate=(),
    lang_profiles=None,
    min_words=None,
    link_density_num=None,
    link_density_den=None,
    residual_cap=None,
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
    )


def broadcast_bundle(bundle: ClassifierBundle):
    """``ray.put`` once; hand the ref to actor constructors."""
    import ray

    return ray.put(bundle)
