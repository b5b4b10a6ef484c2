"""Minimal real PDF text extraction for tool-emitted payloads.

The reference shells out to poppler (pdftotext/docmt,
/root/reference/src/tpdf/docmt.py:33-64); no PDF library ships in this
container, but the subset tool-emitted PDFs actually use is parseable with
the stdlib: FlateDecode is plain zlib, and text sits in content streams as
``BT .. ET`` blocks of ``Tj``/``TJ``/``'``/``"`` show operators with
``Td/TD/T*/Tm`` line positioning.

Supported: uncompressed or FlateDecode content streams, literal ``(..)``
strings (with escapes and octal), hex ``<..>`` strings (1-byte latin-ish
codes), line breaks from Td/TD/T*/Tm vertical moves.  Not supported (the
parser skips them rather than erroring): CID/Type0 multi-byte encodings,
encrypted documents, object streams -- real tool output for logs/reports
overwhelmingly uses the simple form.

The extracted lines feed the SAME grid kernel as plain-text turns, so PDF
payloads get identical layout analysis (columns, tables, boilerplate).
"""

from __future__ import annotations

import re
import zlib

# the dict must be the one BELONGING to this stream: `[^<>]|<<.*?>>`
# keeps the match inside a single (possibly one-level-nested) dict, so a
# non-greedy `<<(.*?)>>` can't start at an unrelated earlier object and
# attribute that object's /Filter to this stream
_STREAM_RE = re.compile(
    rb"<<((?:[^<>]|<<.*?>>)*?)>>\s*stream\r?\n", re.DOTALL
)
_ESCAPES = {
    b"n": "\n", b"r": "\r", b"t": "\t", b"b": "\b", b"f": "\f",
    b"(": "(", b")": ")", b"\\": "\\",
}


def _content_streams(payload: bytes):
    """Yield decompressed content-stream bytes from a raw PDF body."""
    for m in _STREAM_RE.finditer(payload):
        start = m.end()
        end = payload.find(b"endstream", start)
        if end < 0:
            continue
        data = payload[start:end].rstrip(b"\r\n")
        d = m.group(1)
        if b"/FlateDecode" in d:
            try:
                data = zlib.decompress(data)
            except zlib.error:
                continue
        elif re.search(rb"/Filter\s*[/\[]", d):
            continue  # other codecs unsupported
        if b"BT" in data:
            yield data


def _decode_literal(body: bytes) -> str:
    """PDF literal string body (between parens) -> text."""
    out: list[str] = []
    i = 0
    while i < len(body):
        c = body[i: i + 1]
        if c == b"\\" and i + 1 < len(body):
            nxt = body[i + 1: i + 2]
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
                continue
            if nxt.isdigit():  # octal, up to 3 digits
                j = i + 1
                while j < min(i + 4, len(body)) and body[j: j + 1].isdigit():
                    j += 1
                out.append(chr(int(body[i + 1: j], 8) & 0xFF))
                i = j
                continue
            i += 2  # line continuation / unknown escape: drop backslash
            continue
        out.append(c.decode("latin-1"))
        i += 1
    return "".join(out)


# one token of a content stream we care about
_TOK_RE = re.compile(
    rb"\((?P<lit>(?:[^()\\]|\\.)*)\)"       # literal string
    rb"|<(?P<hex>[0-9A-Fa-f\s]*)>"          # hex string
    rb"|(?P<num>[-+]?\d*\.?\d+)"            # number
    rb"|(?P<op>[A-Za-z'\"*]+)"              # operator
)


def _stream_lines(data: bytes) -> list[str]:
    """Walk one content stream's text operators -> text lines.

    String tokens are buffered until their show operator arrives, because
    ``'`` / ``"`` mean move-to-next-line-THEN-show; TJ arrays deliver
    several buffered strings (the interleaved numbers are kerning and are
    ignored)."""
    lines: list[str] = []
    cur: list[str] = []
    strings: list[str] = []
    nums: list[float] = []

    def newline():
        nonlocal cur
        if cur:
            lines.append("".join(cur).rstrip())
            cur = []

    for m in _TOK_RE.finditer(data):
        if m.group("lit") is not None:
            strings.append(_decode_literal(m.group("lit")))
            continue
        if m.group("hex") is not None:
            h = re.sub(rb"\s", b"", m.group("hex"))
            if len(h) % 2:
                h += b"0"
            strings.append(bytes.fromhex(h.decode("ascii")).decode("latin-1"))
            continue
        if m.group("num") is not None:
            try:
                nums.append(float(m.group("num")))
            except ValueError:
                pass
            continue
        op = m.group("op")
        if op in (b"Tj", b"TJ"):
            cur.extend(strings)
        elif op in (b"'", b'"'):
            newline()
            cur.extend(strings)
        elif op == b"T*":
            newline()
        elif op in (b"Td", b"TD"):
            # vertical move => new line; pure horizontal move keeps line
            if len(nums) >= 2 and nums[-1] != 0:
                newline()
            elif len(nums) >= 2 and abs(nums[-2]) > 0 and cur:
                cur.append(" ")
        elif op in (b"Tm", b"BT", b"ET"):
            newline()
        strings.clear()
        nums.clear()
    newline()
    return [ln for ln in lines if ln.strip()]


def pdf_text_lines(payload: bytes) -> list[str]:
    """PDF payload -> text lines (empty when nothing parseable).

    Content streams (≈ pages) are separated by one blank line so the
    downstream grid kernel never merges blocks across page boundaries --
    the text-space analogue of the reference's per-page processing."""
    if not payload or not payload.startswith(b"%PDF"):
        return []
    out: list[str] = []
    for data in _content_streams(payload):
        lines = _stream_lines(data)
        if lines and out:
            out.append("")
        out.extend(lines)
    return out


def pdf_text(payload: bytes) -> str:
    return "\n".join(pdf_text_lines(payload))


def looks_like_pdf(payload: bytes) -> bool:
    return bool(payload) and payload.startswith(b"%PDF")


# ---------------------------------------------------------------------------
# tiny writer (tests / fixtures): one page, one Flate content stream
# ---------------------------------------------------------------------------

def make_pdf(lines: list[str], compress: bool = True) -> bytes:
    """Build a minimal single-page PDF showing ``lines`` -- the shape tool
    output takes.  Used by tests; not a general-purpose writer."""

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    ops = ["BT", "/F1 11 Tf", "72 760 Td"]
    for i, ln in enumerate(lines):
        if i:
            ops.append("0 -14 Td")
        ops.append(f"({esc(ln)}) Tj")
    ops.append("ET")
    content = "\n".join(ops).encode("latin-1")
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b" /Filter /FlateDecode"
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >> endobj",
        b"4 0 obj << /Length %d%s >> stream\n%s\nendstream endobj"
        % (len(content), filt, content),
        b"5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> "
        b"endobj",
    ]
    body = b"%PDF-1.4\n" + b"\n".join(objs)
    return body + b"\ntrailer << /Root 1 0 R >>\n%%EOF\n"
