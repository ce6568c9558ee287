"""PDF/layout branch: content-stream tokenize → glyph-run clustering.

Analog of the reference's projection-profile machinery
(``oblast-reda``/``odredi-oblast-reda`` row segmentation,
/root/reference/src/clj/ocr_lib/core_helper.clj:675-732, and
``sort-rows``/``sort-row-elements`` reading order, core.clj:753-785):
glyph runs carry (x, y) positions; runs are clustered into lines by y
proximity, lines are ordered top→bottom, runs within a line left→right,
and consecutive lines whose y-gap exceeds ``pdf_block_gap`` start a new
block (the row-boundary analog).

The tokenizer is a minimal deterministic parser of the text-positioning
subset of the PDF content-stream language: ``Tm``/``Td``/``TD`` set or
translate the text position; ``(string) Tj`` emits a run; ``BT``/``ET``
bracket text objects.  Escapes ``\\(`` ``\\)`` ``\\\\`` inside strings
are honored.  This is NOT a general PDF parser — it is the glyph-run
branch of the extraction engine, fed by the deterministic fixture
generator (and any real content stream using the same operator subset).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from ..config import ExtractConfig
from .tokenizer import collapse_ws

_NUM = r"[+-]?(?:\d+\.?\d*|\.\d+)"
_STR = r"\((?:[^()\\]|\\.)*\)"
_OP_RE = re.compile(
    r"(?P<tl>(?P<tlv>%s)\s+TL)"
    r"|(?P<tm>(?:%s\s+){4}(?P<tmx>%s)\s+(?P<tmy>%s)\s+Tm)"
    r"|(?P<td>(?P<tdx>%s)\s+(?P<tdy>%s)\s+T[dD])"
    r"|(?P<tstar>T\*)"
    r"|(?P<bt>BT)|(?P<et>ET)"
    r"|(?P<tj>(?P<str>%s)\s*(?P<show>Tj|'))"
    r"|(?P<tja>\[(?P<arr>(?:%s|%s|\s+)*)\]\s*TJ)"
    % (_NUM, _NUM, _NUM, _NUM, _NUM, _NUM, _STR, _STR, _NUM)
)
_ARR_ITEM_RE = re.compile(r"(%s)|(%s)" % (_STR, _NUM))
_STR_ESC_RE = re.compile(r"\\([()\\nrtbf]|[0-7]{1,3})")

_ESC_MAP = {"(": "(", ")": ")", "\\": "\\", "n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f"}


def _unescape_pdf(s: str) -> str:
    def sub(m: re.Match) -> str:
        g = m.group(1)
        if g in _ESC_MAP:
            return _ESC_MAP[g]
        return chr(int(g, 8) & 0xFF)

    return _STR_ESC_RE.sub(sub, s)


@dataclass
class GlyphRun:
    x: float
    y: float
    text: str
    start: int  # char offset of the run's string literal in the document
    end: int


def tokenize_pdf(data: str) -> list:
    """Content stream text → glyph runs (the dot-reading analog).

    Operator subset: ``Tm`` (set position), ``Td``/``TD`` (translate;
    TD also sets leading), ``TL`` (leading), ``T*`` (next line),
    ``(s) Tj`` and ``(s) '`` (show; ``'`` moves to next line first),
    ``[(a) -120 (b)] TJ`` (array show — strings concatenated, kerning
    numbers ignored), bracketed by ``BT``/``ET``.
    """
    runs: list = []
    x = y = 0.0
    leading = 14.0
    in_text = False

    def emit(s: str, start: int, end: int) -> None:
        if s and not s.isspace():
            runs.append(GlyphRun(x=x, y=y, text=s, start=start, end=end))

    for m in _OP_RE.finditer(data):
        if m.group("bt"):
            in_text = True
            x = y = 0.0
        elif m.group("et"):
            in_text = False
        elif m.group("tl"):
            leading = float(m.group("tlv"))
        elif m.group("tm"):
            x, y = float(m.group("tmx")), float(m.group("tmy"))
        elif m.group("td"):
            x += float(m.group("tdx"))
            y += float(m.group("tdy"))
            if m.group(0).endswith("TD"):
                leading = -float(m.group("tdy"))
        elif m.group("tstar"):
            y -= leading
        elif m.group("tj") and in_text:
            if m.group("show") == "'":
                y -= leading
            emit(
                _unescape_pdf(m.group("str")[1:-1]),
                m.start("str") + 1,
                m.end("str") - 1,
            )
        elif m.group("tja") and in_text:
            parts = []
            first_s = last_e = None
            for am in _ARR_ITEM_RE.finditer(m.group("arr")):
                if am.group(1) is not None:
                    parts.append(_unescape_pdf(am.group(1)[1:-1]))
                    if first_s is None:
                        first_s = m.start("arr") + am.start(1) + 1
                    last_e = m.start("arr") + am.end(1) - 1
            if parts and first_s is not None:
                emit("".join(parts), first_s, last_e)
    return runs


def cluster_lines(runs: list, cfg: ExtractConfig) -> list:
    """Runs → reading-order lines: ``[(y, [runs sorted by x]) ...]``.

    Sort by (-y, x) then group: a run joins the current line when its y
    is within ``pdf_line_tol`` of the line's first run (sort-rows /
    add-into-sorted-set-fn analog, core.clj:770-875).  Ties are broken
    by (x, start) so the order is total and deterministic.
    """
    if not runs:
        return []
    ordered = sorted(runs, key=lambda r: (-r.y, r.x, r.start))
    lines: list = []
    cur = [ordered[0]]
    cur_y = ordered[0].y
    for r in ordered[1:]:
        if abs(r.y - cur_y) <= cfg.pdf_line_tol:
            cur.append(r)
        else:
            lines.append((cur_y, cur))
            cur = [r]
            cur_y = r.y
    lines.append((cur_y, cur))
    return lines


def split_columns(line_runs: list, cfg: ExtractConfig) -> list:
    """Split one line's x-sorted runs at wide x-gaps (column detection —
    the projection-profile character/column segmentation analog,
    ``oblast-slova``/``odredi-oblast-slova``, core_helper.clj:395-444):
    a gap > ``pdf_col_gap`` between consecutive runs starts a new column
    segment, which gets its own span."""
    if not line_runs:
        return []
    segs = [[line_runs[0]]]
    for prev, r in zip(line_runs, line_runs[1:]):
        if r.x - prev.x > cfg.pdf_col_gap:
            segs.append([r])
        else:
            segs[-1].append(r)
    return segs


def extract_pdf(data: str, cfg: ExtractConfig):
    """PDF branch: returns (text, spans) like the HTML branch.

    Lines are grouped into blocks on y-gap > ``pdf_block_gap``; within a
    block lines join with a single space, blocks join with ``\\n``
    (the row-``\\n`` / word-gap-space assembly rules, core.clj:1620-1690).
    Spans: one per line, kind "pdf-line", offsets into the content
    stream; block_id = the block the line belongs to.
    """
    runs = tokenize_pdf(data)
    lines = cluster_lines(runs, cfg)
    if not lines:
        return "", []
    blocks: list = []  # list of list-of-lines
    cur = [lines[0]]
    for prev, ln in zip(lines, lines[1:]):
        if prev[0] - ln[0] > cfg.pdf_block_gap:
            blocks.append(cur)
            cur = [ln]
        else:
            cur.append(ln)
    blocks.append(cur)
    out_parts = []
    spans = []
    for bid, blk in enumerate(blocks):
        line_texts = []
        for y, rs in blk:
            for seg in split_columns(rs, cfg):
                line_texts.append(collapse_ws(" ".join(r.text for r in seg)))
                spans.append(
                    {
                        "start": min(r.start for r in seg),
                        "end": max(r.end for r in seg),
                        "block_id": bid,
                        "kind": "pdf-line",
                    }
                )
        out_parts.append(" ".join(line_texts))
    return "\n".join(out_parts), spans
