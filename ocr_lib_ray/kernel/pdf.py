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
    r"|(?P<tf>/(?P<fname>\w+)\s+(?P<fsize>%s)\s+Tf)"
    r"|(?P<tm>(?P<tma>%s)\s+(?P<tmb>%s)\s+(?P<tmc>%s)\s+(?P<tmd>%s)"
    r"\s+(?P<tmx>%s)\s+(?P<tmy>%s)\s+Tm)"
    r"|(?P<td>(?P<tdx>%s)\s+(?P<tdy>%s)\s+T[dD])"
    r"|(?P<tstar>T\*)"
    r"|(?P<bt>BT)|(?P<et>ET)"
    r"|(?P<tj>(?P<str>%s)\s*(?P<show>Tj|'))"
    r"|(?P<tja>\[(?P<arr>(?:%s|%s|\s+)*)\]\s*TJ)"
    % (_NUM, _NUM, _NUM, _NUM, _NUM, _NUM, _NUM, _NUM, _NUM, _NUM, _STR, _STR, _NUM)
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


@dataclass(slots=True)
class GlyphRun:
    x: float
    y: float
    text: str
    start: int  # char offset of the run's string literal in the document
    end: int
    size: float = 12.0  # current Tf font size (glyph-width basis)
    rotated: bool = False  # Tm with b≠0 or c≠0 (rotation/shear)
    #: baseline angle of a PURE rotation (radians in [0, 2π), quantized
    #: to 1e-6 for grouping); None for upright runs AND for non-rigid
    #: (sheared / anisotropically scaled) runs.
    angle: float | None = None
    #: the full (a, b, c, d) text matrix, quantized to 1e-6, for
    #: NON-RIGID but INVERTIBLE runs (shear / anisotropic scale) —
    #: these re-flow through the inverse matrix (round 4); None for
    #: upright runs, pure rotations (which carry ``angle``) and
    #: DEGENERATE matrices (|det| ≈ 0, the only remaining residual
    #: class).
    mat: tuple | None = None


def tokenize_pdf(data: str) -> list:
    """Content stream text → glyph runs (the dot-reading analog).

    Operator subset: ``Tm`` (set FULL text matrix — translation from
    (e, f); a nonzero b/c component marks the run rotated/sheared),
    ``/F<n> <size> Tf`` (font size, carried per run as the glyph-width
    basis), ``Td``/``TD`` (translate; TD also sets leading), ``TL``
    (leading), ``T*`` (next line), ``(s) Tj`` and ``(s) '`` (show;
    ``'`` moves to next line first), ``[(a) -120 (b)] TJ`` (array show —
    strings concatenated, kerning numbers ignored), bracketed by
    ``BT``/``ET``.
    """
    import math

    runs: list = []
    x = y = 0.0
    # full text matrix [ma mb; mc md] — Td/TD/T*/' line moves translate
    # WITHIN this matrix, so rotated text advances along its own
    # baseline (identity for upright text: behavior unchanged)
    ma, mb, mc, md = 1.0, 0.0, 0.0, 1.0
    size = 12.0
    rotated = False
    angle: float | None = None
    mat: tuple | None = None
    leading = 14.0
    in_text = False

    def emit(s: str, start: int, end: int) -> None:
        if s and not s.isspace():
            runs.append(
                GlyphRun(
                    x=x,
                    y=y,
                    text=s,
                    start=start,
                    end=end,
                    size=size,
                    rotated=rotated,
                    angle=angle,
                    mat=mat,
                )
            )

    for m in _OP_RE.finditer(data):
        if m.group("bt"):
            in_text = True
            x = y = 0.0
            ma, mb, mc, md = 1.0, 0.0, 0.0, 1.0
            rotated = False
            angle = None
            mat = None
        elif m.group("et"):
            in_text = False
        elif m.group("tl"):
            leading = float(m.group("tlv"))
        elif m.group("tf"):
            size = float(m.group("fsize"))
        elif m.group("tm"):
            x, y = float(m.group("tmx")), float(m.group("tmy"))
            # rotation/shear detection: b or c ≠ 0.  Rotation persists
            # until the next Tm or BT (Td/TD translate WITHIN the
            # current matrix).  A PURE rotation (a≈d, b≈-c) carries its
            # baseline angle for re-flow; a NON-RIGID but invertible
            # matrix (shear / anisotropic scale) carries the quantized
            # matrix for inverse-matrix re-flow (round 4); only a
            # DEGENERATE matrix (|det| ≈ 0: the glyphs collapse onto a
            # line, no reading frame exists) rejects to residuals.
            ma, mb = float(m.group("tma")), float(m.group("tmb"))
            mc, md = float(m.group("tmc")), float(m.group("tmd"))
            rotated = abs(mb) > 1e-9 or abs(mc) > 1e-9
            angle = None
            mat = None
            if rotated and abs(ma - md) <= 1e-6 and abs(mb + mc) <= 1e-6:
                angle = round(math.atan2(mb, ma) % (2.0 * math.pi), 6)
            elif rotated and abs(ma * md - mb * mc) > 1e-9:
                mat = (round(ma, 6), round(mb, 6), round(mc, 6), round(md, 6))
        elif m.group("td"):
            tdx, tdy = float(m.group("tdx")), float(m.group("tdy"))
            x += tdx * ma + tdy * mc
            y += tdx * mb + tdy * md
            if m.group(0).endswith("TD"):
                leading = -tdy
        elif m.group("tstar"):
            x += -leading * mc
            y += -leading * md
        elif m.group("tj") and in_text:
            if m.group("show") == "'":
                x += -leading * mc
                y += -leading * md
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


#: average glyph advance as a fraction of font size — the standard
#: Helvetica-ish heuristic standing in for per-glyph width tables (the
#: reference's learned width machinery, core_helper.clj:324-361).
GLYPH_WIDTH_FRACTION = 0.6

#: baseline tolerance as a fraction of the line's font size — larger
#: type tolerates more baseline jitter (odredi-oblast-reda-ii analog,
#: core_helper.clj:780-892); pdf_line_tol remains the floor.
LINE_TOL_FRACTION = 0.2


def run_advance(r: GlyphRun, widths: dict | None = None) -> float:
    """Estimated x-advance (width) of a run from its font size.

    ``widths`` is the taught per-glyph table {char: fraction-of-font-
    size} (the learned-width analog, core_helper.clj:324-361; taught by
    state/bundle.learn_glyph_widths, the nauci-slova analog) — chars
    missing from the table fall back to the flat heuristic, and
    ``widths=None`` (untaught) is exactly the frozen flat behavior.

    KERNING PAIRS (round 4): the same table may carry TWO-char keys —
    ``widths["AV"] = -0.08`` adds that (signed) fraction-of-font-size
    delta for every adjacent "AV" in the run, the pair-advance
    refinement the reference's greedy width split lacks
    (core_helper.clj:324-361 models per-char widths only).  A table
    with no pair keys behaves bit-identically to round 3."""
    if widths is None:
        return GLYPH_WIDTH_FRACTION * r.size * len(r.text)
    adv = sum(widths.get(ch, GLYPH_WIDTH_FRACTION) for ch in r.text)
    kern = sum(widths.get(a + b, 0.0) for a, b in zip(r.text, r.text[1:]))
    return r.size * (adv + kern)


def cluster_lines(runs: list, cfg: ExtractConfig) -> list:
    """Runs → reading-order lines: ``[(y, [runs sorted by x]) ...]``.

    Sort by (-y, x) then group: a run joins the current line when its y
    is within tolerance of the line's first run (sort-rows /
    add-into-sorted-set-fn analog, core.clj:770-875).  The tolerance is
    font-size-aware — ``max(pdf_line_tol, LINE_TOL_FRACTION × size)`` of
    the line's leading run — so large type tolerates proportional
    baseline jitter (baseline-refinement analog,
    core_helper.clj:780-892).  Ties are broken by (x, start) so the
    order is total and deterministic.
    """
    if not runs:
        return []
    ordered = sorted(runs, key=lambda r: (-r.y, r.x, r.start))
    lines: list = []
    cur = [ordered[0]]
    cur_y = ordered[0].y
    cur_tol = max(cfg.pdf_line_tol, LINE_TOL_FRACTION * ordered[0].size)
    for r in ordered[1:]:
        if abs(r.y - cur_y) <= cur_tol:
            cur.append(r)
        else:
            lines.append((cur_y, cur))
            cur = [r]
            cur_y = r.y
            cur_tol = max(cfg.pdf_line_tol, LINE_TOL_FRACTION * r.size)
    lines.append((cur_y, cur))
    return lines


def split_columns(line_runs: list, cfg: ExtractConfig) -> list:
    """Split one line's x-sorted runs at wide WHITESPACE gaps (column
    detection — the projection-profile character/column segmentation
    analog, ``oblast-slova``/``odredi-oblast-slova``,
    core_helper.clj:395-444): the gap is measured from the END of the
    previous run (its origin plus the font-size-derived advance, the
    learned-glyph-width analog, core_helper.clj:324-361), not origin to
    origin — two long abutting runs are one segment regardless of their
    origins.  A gap > ``pdf_col_gap`` starts a new column segment, which
    gets its own span."""
    if not line_runs:
        return []
    segs = [[line_runs[0]]]
    for prev, r in zip(line_runs, line_runs[1:]):
        if r.x - (prev.x + run_advance(prev, cfg.pdf_glyph_widths)) > cfg.pdf_col_gap:
            segs.append([r])
        else:
            segs[-1].append(r)
    return segs


_STREAM_RE = re.compile(r"stream\r?\n(.*?)endstream", re.DOTALL)


def extract_pdf(data: str, cfg: ExtractConfig):
    """PDF branch: returns (text, spans, residuals, residual_texts) like
    the HTML branch's classify step.

    Multi-page object model (one notch): each ``stream…endstream``
    content block is a PAGE — pages extract independently (their y
    coordinate spaces are unrelated, so a global y-sort would interleave
    pages) and concatenate in file order with ``\\n``.  Span offsets stay
    relative to the whole document.  Data without stream markers (raw
    content-stream strings, the unit-test surface) is one page.
    """
    pages = [(m.start(1), m.group(1)) for m in _STREAM_RE.finditer(data)]
    if not pages:
        t, sp, res, rt, _nb = _extract_pdf_page(data, cfg)
        return t, sp, res, rt
    texts: list = []
    spans: list = []
    residuals: list = []
    residual_texts: list = []
    block_base = 0
    for off, body in pages:
        t, sp, res, rt, nb = _extract_pdf_page(body, cfg)
        if t:
            texts.append(t)
        for s in sp:
            s["start"] += off
            s["end"] += off
            s["block_id"] += block_base
        spans.extend(sp)
        residuals.extend(r + block_base for r in res)
        residual_texts.extend(rt)
        # advance past this page's residual ids too: residual ids and
        # content block ids share one id space per document, and a
        # later page's blocks must not collide with an earlier page's
        # rejected (rotated) runs
        block_base += nb + len(res)
    return (
        "\n".join(texts),
        spans,
        residuals[: cfg.residual_cap],
        residual_texts[: cfg.residual_cap],
    )


def _layout_blocks(runs: list, cfg: ExtractConfig, block_base: int):
    """Reading-frame runs → (block text parts, spans, n_blocks).

    Lines are grouped into blocks on y-gap > ``pdf_block_gap``; within a
    block lines join with a single space, blocks join with ``\\n`` at
    the caller (the row-``\\n`` / word-gap-space assembly rules,
    core.clj:1620-1690).  Spans: one per column segment, kind
    "pdf-line", offsets into the content stream; block_id starts at
    ``block_base``.
    """
    lines = cluster_lines(runs, cfg)
    out_parts: list = []
    spans: list = []
    if not lines:
        return out_parts, spans, 0
    blocks: list = []  # list of list-of-lines
    cur = [lines[0]]
    for prev, ln in zip(lines, lines[1:]):
        if prev[0] - ln[0] > cfg.pdf_block_gap:
            blocks.append(cur)
            cur = [ln]
        else:
            cur.append(ln)
    blocks.append(cur)
    for bid, blk in enumerate(blocks):
        line_texts = []
        for _y, rs in blk:
            for seg in split_columns(rs, cfg):
                line_texts.append(collapse_ws(" ".join(r.text for r in seg)))
                spans.append(
                    {
                        "start": min(r.start for r in seg),
                        "end": max(r.end for r in seg),
                        "block_id": block_base + bid,
                        "kind": "pdf-line",
                    }
                )
        out_parts.append(" ".join(line_texts))
    return out_parts, spans, len(blocks)


def _extract_pdf_page(data: str, cfg: ExtractConfig):
    """One page's content stream → (text, spans, residuals, texts,
    n_blocks).

    UPRIGHT runs lay out via :func:`_layout_blocks`.

    PURE-ROTATION runs (Tm with a≈d, b≈-c ≠ 0 — watermarks, stamps,
    vertical labels) are RE-FLOWED along their own baseline (the
    reference's baseline-tracking machinery is the spec,
    core_helper.clj:780-892): each angle group's coordinates rotate
    into the run frame (x' = x·cosθ + y·sinθ, y' = -x·sinθ + y·cosθ —
    baseline horizontal again) and the same line/column/block
    clustering applies.  Rotated blocks append AFTER the upright blocks
    in ascending-angle order (deterministic reading order: upright
    content first, then each rotated layer).

    NON-RIGID but INVERTIBLE runs (shear / anisotropic scale — round 4,
    the deterministic shear normalization) re-flow through the INVERSE
    text matrix: device coordinates map back into text space, where
    baselines are horizontal by construction (for a pure rotation the
    inverse IS the transpose, so this generalizes the rotation path —
    verified equal).  Each quantized-matrix group lays out in its own
    frame and appends after the rotation layers in ascending matrix
    order.

    DEGENERATE runs (|det| ≈ 0 — the glyphs collapse onto a line, so
    no reading frame exists) reject into the residual stream in
    deterministic (-y, x, start) fallback order, one residual per run,
    ids continuing after ALL content blocks and capped at
    ``cfg.residual_cap`` (texts kept under ``cfg.keep_residual_texts``)
    — the unknown-sign-reject analog, core.clj:1637-1672.
    """
    import math
    from dataclasses import replace

    runs = tokenize_pdf(data)
    upright = [r for r in runs if not r.rotated]
    out_parts, spans, n_blocks = _layout_blocks(upright, cfg, 0)

    # re-flow each pure-rotation angle group in its own frame
    by_angle: dict = {}
    for r in runs:
        if r.rotated and r.angle is not None:
            by_angle.setdefault(r.angle, []).append(r)
    for theta in sorted(by_angle):
        cos_t, sin_t = math.cos(theta), math.sin(theta)
        frame = [
            replace(r, x=r.x * cos_t + r.y * sin_t, y=-r.x * sin_t + r.y * cos_t)
            for r in by_angle[theta]
        ]
        parts, sp, nb = _layout_blocks(frame, cfg, n_blocks)
        out_parts.extend(parts)
        spans.extend(sp)
        n_blocks += nb

    # re-flow each non-rigid invertible matrix group via M^-1
    by_mat: dict = {}
    for r in runs:
        if r.rotated and r.angle is None and r.mat is not None:
            by_mat.setdefault(r.mat, []).append(r)
    for key in sorted(by_mat):
        a, b, c, d = key
        det = a * d - b * c
        frame = [
            replace(
                r,
                x=(d * r.x - c * r.y) / det,
                y=(-b * r.x + a * r.y) / det,
            )
            for r in by_mat[key]
        ]
        parts, sp, nb = _layout_blocks(frame, cfg, n_blocks)
        out_parts.extend(parts)
        spans.extend(sp)
        n_blocks += nb

    sheared = sorted(
        (r for r in runs if r.rotated and r.angle is None and r.mat is None),
        key=lambda r: (-r.y, r.x, r.start),
    )
    residuals = []
    residual_texts = []
    for i, r in enumerate(sheared):
        if len(residuals) >= cfg.residual_cap:
            break
        residuals.append(n_blocks + i)
        if cfg.keep_residual_texts:
            residual_texts.append(collapse_ws(r.text))
    return "\n".join(out_parts), spans, residuals, residual_texts, n_blocks


def width_samples(data: str, cfg: ExtractConfig | None = None) -> list:
    """Observed run-extent samples for CORPUS-SIDE width inference —
    the measurement half of the ``nauci-slova`` learning analog
    (core_helper.clj:1833-1989 learns glyph metrics from sample data at
    load time; here the samples come from the document stream itself,
    so no taught bundle is required).

    For every pair of ADJACENT upright runs on one baseline with the
    SAME font size, the observed extent of the left run is
    ``x_right − x_left`` — its true glyph advance plus whatever
    inter-run gap the producer left.  Returns
    ``[(text, size, extent), ...]`` with extent in points; the solver
    (``state.bundle.infer_glyph_widths``) models the shared gap as one
    extra unknown.  Pairs with non-positive extent (overlapping or
    re-ordered runs) and mixed-size pairs (the fraction-of-size model
    would conflate two bases) are skipped.  Pages iterate exactly like
    :func:`extract_pdf`; rotated/sheared runs are excluded — their
    extents live in a different frame.
    """
    if cfg is None:
        cfg = ExtractConfig()
    pages = [m.group(1) for m in _STREAM_RE.finditer(data)] or [data]
    samples: list = []
    for body in pages:
        upright = [r for r in tokenize_pdf(body) if not r.rotated]
        for _y, rs in cluster_lines(upright, cfg):
            for prev, r in zip(rs, rs[1:]):
                extent = r.x - prev.x
                if prev.text and extent > 0 and prev.size == r.size:
                    samples.append((prev.text, prev.size, extent))
    return samples
