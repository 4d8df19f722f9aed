"""Minimal deterministic PDF writer/parser (pure Python, stdlib only).

Closes the last unported reference surface: `pdf_conversion.py:109-160
add_last_page_watermark` parses a PDF, appends a page sized like the
last page, lays the watermark text into a 1-inch-margin text box in
12 pt Helvetica, and re-serializes. The reference uses PyMuPDF; this
container has no fitz/pypdf, so the fetch stub uses this writer — the
emitted bytes are STRUCTURALLY VALID PDF 1.7 (catalog, page tree,
uncompressed content streams, correct xref offsets, trailer), and the
parser half round-trips our own subset so the append step is a real
parse → append-page-object → re-serialize, not a byte concat.

Scope: exactly the subset the conversion stub needs — Type1 Helvetica,
text-only content streams, no compression. A real deployment swaps
`add_last_page_watermark` for the pypdf/fitz implementation; the Spark
plumbing around it (Arrow batch shape, schema, derivations) is
identical either way.
"""

from __future__ import annotations

import re

PAGE_W, PAGE_H = 595, 842  # A4 in points
MARGIN = 72                # 1 inch, as the reference's text_rect
FONT_SIZE = 12
LEADING = 14
# Helvetica 12pt averages ~6.1pt/char; usable width (595-144)pt => ~73
WRAP_COLS = 73


def wrap_text(text: str, cols: int = WRAP_COLS) -> list[str]:
    """Greedy word-wrap preserving blank lines (deterministic stand-in
    for insert_textbox's wrapping)."""
    lines: list[str] = []
    for para in text.split("\n"):
        if not para:
            lines.append("")
            continue
        cur = ""
        for w in para.split(" "):
            cand = w if not cur else f"{cur} {w}"
            if len(cand) <= cols:
                cur = cand
            else:
                if cur:
                    lines.append(cur)
                cur = w
        lines.append(cur)
    return lines


def _esc(s: str) -> str:
    return s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")


def _unesc(s: str) -> str:
    return s.replace("\\(", "(").replace("\\)", ")").replace("\\\\", "\\")


def _content_stream(lines: list[str], box: tuple[int, int]) -> bytes:
    w, h = box
    parts = [f"BT /F1 {FONT_SIZE} Tf {LEADING} TL {MARGIN} {h - MARGIN - FONT_SIZE} Td"]
    for i, line in enumerate(lines):
        if i:
            parts.append("T*")
        parts.append(f"({_esc(line)}) Tj")
    parts.append("ET")
    return " ".join(parts).encode("latin-1", "replace")


def build_pdf(
    pages: list[list[str]], boxes: list[tuple[int, int]] | None = None
) -> bytes:
    """Serialize pages of text lines into a valid uncompressed PDF.

    Object layout: 1=Catalog, 2=Pages, 3=Helvetica font, then per page
    i: obj 4+2i (Page) and obj 5+2i (its content stream). The xref
    table carries real byte offsets; consumers like pypdf/qpdf parse
    the result.
    """
    boxes = boxes or [(PAGE_W, PAGE_H)] * len(pages)
    objs: dict[int, bytes] = {}
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(len(pages)))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {len(pages)} >>".encode()
    )
    objs[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    for i, (lines, box) in enumerate(zip(pages, boxes)):
        pnum, cnum = 4 + 2 * i, 5 + 2 * i
        objs[pnum] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {box[0]} {box[1]}] "
            f"/Resources << /Font << /F1 3 0 R >> >> /Contents {cnum} 0 R >>"
        ).encode()
        stream = _content_stream(lines, box)
        objs[cnum] = (
            f"<< /Length {len(stream)} >>\nstream\n".encode()
            + stream
            + b"\nendstream"
        )
    out = bytearray(b"%PDF-1.7\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    n = max(objs) + 1
    out += f"xref\n0 {n}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, n):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {n} /Root 1 0 R >>\nstartxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


_OBJ_RE = re.compile(rb"(\d+) 0 obj\n(.*?)\nendobj\n", re.S)
_KIDS_RE = re.compile(rb"/Kids \[([^\]]*)\]")
_CONTENTS_RE = re.compile(rb"/Contents (\d+) 0 R")
_BOX_RE = re.compile(rb"/MediaBox \[0 0 (\d+) (\d+)\]")
_STREAM_RE = re.compile(rb"stream\n(.*?)\nendstream", re.S)
_TJ_RE = re.compile(rb"\(((?:\\.|[^\\()])*)\) Tj")


def _objects(pdf: bytes) -> dict[int, bytes]:
    return {int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(pdf)}


def pdf_page_count(pdf: bytes) -> int:
    objs = _objects(pdf)
    return len(_KIDS_RE.search(objs[2]).group(1).split(b"R")) - 1


def pdf_pages(pdf: bytes) -> tuple[list[list[str]], list[tuple[int, int]]]:
    """Parse our subset back into (pages of text lines, media boxes)."""
    objs = _objects(pdf)
    kids = [
        int(k) for k in _KIDS_RE.search(objs[2]).group(1).split(b" 0 R") if k.strip()
    ]
    pages, boxes = [], []
    for pnum in kids:
        page = objs[pnum]
        bw, bh = _BOX_RE.search(page).groups()
        boxes.append((int(bw), int(bh)))
        cnum = int(_CONTENTS_RE.search(page).group(1))
        stream = _STREAM_RE.search(objs[cnum]).group(1)
        pages.append(
            [_unesc(m.group(1).decode("latin-1")) for m in _TJ_RE.finditer(stream)]
        )
    return pages, boxes


def add_last_page_watermark(pdf_bytes: bytes, watermark_text: str) -> bytes:
    """Reference `pdf_conversion.py:126 add_last_page_watermark`: parse,
    append a page with the LAST page's dimensions carrying the wrapped
    watermark text, re-serialize."""
    pages, boxes = pdf_pages(pdf_bytes)
    last_box = boxes[-1] if boxes else (PAGE_W, PAGE_H)
    return build_pdf(pages + [wrap_text(watermark_text)], boxes + [last_box])
