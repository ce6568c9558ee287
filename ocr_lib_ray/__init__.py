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

__all__ = ["DEFAULT_CONFIG", "ExtractConfig"]
__version__ = "0.1.0"
