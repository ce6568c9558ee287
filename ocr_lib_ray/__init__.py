"""ocr_lib_ray — a Ray-Data-native main-content extraction engine.

Built from scratch against the behavioral spec of
``VladimirMarkovic86/ocr-lib`` (see SURVEY.md): a deterministic
multi-stage per-document parser (normalize → segment → order → classify
→ assemble) lifted to Ray Data — ``read_parquet`` →
``map_batches`` over zero-copy Arrow batches → partitioned
``write_parquet`` — over Common-Crawl-style page tables
``(url, warc_ts, html, text, lang)``.
"""

from .config import DEFAULT_CONFIG, ExtractConfig


def read_document(data: bytes, cfg: ExtractConfig = DEFAULT_CONFIG):
    """Reference-shaped convenience API (``read-image-fn`` parity,
    /root/reference/src/clj/ocr_lib/core.clj:1772-1806): one document's
    bytes (raw or base64) in → ``(text, residual_texts)`` out, where
    residual_texts is the unknown-sign-crops analog (texts of rejected
    blocks, capped per document).  Tuning scalars live on ``cfg``
    instead of seven positional parameters.  Pure local call — use
    :func:`ocr_lib_ray.pipelines.extract.extract_pipeline` for corpora.
    """
    from dataclasses import replace

    from .kernel import extract_document

    if not cfg.keep_residual_texts:
        cfg = replace(cfg, keep_residual_texts=True)
    res = extract_document(data, cfg)
    return res.text, res.residual_texts


__all__ = ["DEFAULT_CONFIG", "ExtractConfig", "read_document"]
__version__ = "0.1.0"
