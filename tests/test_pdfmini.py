"""Minimal PDF text extraction: writer/parser roundtrip plus operator and
escape edge cases."""

import zlib

from crrf_det_spark.pdfmini import (
    looks_like_pdf,
    make_pdf,
    pdf_text,
    pdf_text_lines,
)


def test_roundtrip_compressed_and_raw():
    lines = ["Quarterly report", "Revenue  1,234  up", "Cost  567  down"]
    for compress in (True, False):
        payload = make_pdf(lines, compress=compress)
        assert looks_like_pdf(payload)
        assert pdf_text_lines(payload) == lines


def test_escapes_and_parens():
    lines = [r"paren (pair) kept", "back\\slash", "tab\tchar"]
    assert pdf_text_lines(make_pdf(lines)) == lines


def test_tj_array_and_prime_operator():
    content = (
        b"BT /F1 11 Tf 72 760 Td [(Hel) -20 (lo)] TJ 0 -14 Td (world) Tj "
        b"(next line) ' ET"
    )
    payload = (
        b"%%PDF-1.4\n4 0 obj << /Length %d >> stream\n%s\nendstream endobj\n"
        % (len(content), content)
    )
    # TJ array concatenates (kerning numbers ignored); the 0 -14 Td is a
    # vertical move, so "world" starts a new line; ' shows on a fresh line
    assert pdf_text_lines(payload) == ["Hello", "world", "next line"]


def test_hex_strings_and_octal():
    content = b"BT 72 760 Td <48 6921> Tj 0 -14 Td (\\110\\151) Tj ET"
    payload = (
        b"%%PDF-1.4\n4 0 obj << /Length %d >> stream\n%s\nendstream endobj\n"
        % (len(content), content)
    )
    assert pdf_text_lines(payload) == ["Hi!", "Hi"]


def test_horizontal_td_keeps_line():
    content = b"BT 72 760 Td (left) Tj 200 0 Td (right) Tj ET"
    payload = (
        b"%%PDF-1.4\n4 0 obj << /Length %d >> stream\n%s\nendstream endobj\n"
        % (len(content), content)
    )
    assert pdf_text_lines(payload) == ["left right"]


def test_not_pdf_and_garbage():
    assert pdf_text(b"") == ""
    assert pdf_text(b"plain text") == ""
    assert not looks_like_pdf(b"nope")
    # corrupt flate stream is skipped, not raised
    bad = (
        b"%%PDF-1.4\n4 0 obj << /Length 5 /Filter /FlateDecode >> stream\n"
        b"xxxxx\nendstream endobj\n"
    )
    assert pdf_text(bad) == ""
    # unsupported filter is skipped
    other = (
        b"%%PDF-1.4\n4 0 obj << /Length 5 /Filter /DCTDecode >> stream\n"
        b"\xff\xd8\xff\xe0x\nendstream endobj\n"
    )
    assert pdf_text(other) == ""


def test_grid_kernel_over_pdf_table():
    """PDF payload -> lines -> the SAME grid kernel detects the table."""
    from crrf_det_spark.extract import extract_turn

    lines = [
        "Account      Q1      Q2",
        "Revenue      100     200",
        "Cost         40      90",
        "",
        "Totals are preliminary and unaudited, pending review.",
    ]
    text = "\n".join(pdf_text_lines(make_pdf(lines)))
    segs = extract_turn(text)
    assert any(s["type"] == "table" for s in segs)
    tbl = next(s for s in segs if s["type"] == "table")
    assert tbl["rows"][0] == ["Account", "Q1", "Q2"]


def test_compressed_stream_is_actually_flate():
    payload = make_pdf(["x"], compress=True)
    assert b"/FlateDecode" in payload
    start = payload.find(b"stream\n") + len(b"stream\n")
    end = payload.find(b"\nendstream")
    zlib.decompress(payload[start:end])  # raises if not real zlib data


def test_pages_separated_by_blank_line():
    c1 = b"BT 72 760 Td (page one line) Tj ET"
    c2 = b"BT 72 760 Td (page two line) Tj ET"
    payload = (
        b"%%PDF-1.4\n"
        b"4 0 obj << /Length %d >> stream\n%s\nendstream endobj\n"
        b"6 0 obj << /Length %d >> stream\n%s\nendstream endobj\n"
        % (len(c1), c1, len(c2), c2)
    )
    assert pdf_text_lines(payload) == ["page one line", "", "page two line"]
