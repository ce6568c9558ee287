"""Pure per-document kernels (no Ray): the semantic spec of the engine."""

from .extract import ExtractResult, extract_document, sniff_kind
from .segment import Block, classify, segment
from .tokenizer import TokenizedDoc, collapse_ws, tokenize, tokenize_chunked, unescape

__all__ = [
    "ExtractResult",
    "extract_document",
    "sniff_kind",
    "Block",
    "classify",
    "segment",
    "TokenizedDoc",
    "collapse_ws",
    "tokenize",
    "tokenize_chunked",
    "unescape",
]
