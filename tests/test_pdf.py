"""Tests for the from-scratch PDF renderer + extractor (functions/pdf.py).

The reference's pdf path is ``pdfminer.high_level.extract_text``
(``/root/reference/europarl/rules/extraction.py:44-45``); pdfminer is not
installed here, so these tests pin the reimplementation: structural
validity of rendered PDFs, the object grammar, stream filters, xref
handling (incl. /Prev chains and damaged files), the content-stream text
interpreter, and the render→extract round trip used by the
``pdf_roundtrip`` oracle query.
"""

import re
import zlib

import pytest

from europarl_crawler_ray.functions.pdf import (
    pdf_to_text,
    render_pdf_pages,
    render_pdf_text,
    unwrap_lines,
    wrap_words,
)


# ------------------------------------------------------------ round trip


@pytest.mark.parametrize(
    "text",
    [
        "hello world",
        "",
        "a" * 300,
        "parens (nested (deep)) and \\ backslash and % percent",
        "tabs\tand\x07bells stay",  # escaped as octal in the literal string
        " ".join(f"word{i}" for i in range(1200)),  # multi-page
    ],
)
def test_roundtrip(text):
    assert unwrap_lines(pdf_to_text(render_pdf_text(text))) == text


@pytest.mark.parametrize("compress", [True, False])
@pytest.mark.parametrize("tj_words", [True, False])
def test_roundtrip_variants(compress, tj_words):
    text = "alpha beta gamma delta epsilon zeta " * 30
    text = text.strip()
    pdf = render_pdf_text(text, compress=compress, tj_words=tj_words)
    assert unwrap_lines(pdf_to_text(pdf)) == text


def test_pdfminer_shaped_output():
    # each line ends \n, each page ends \x0c — pdfminer extract_text shape
    out = pdf_to_text(render_pdf_pages(["line one", "line two"]))
    assert out == "line one\nline two\n\x0c"


def test_multipage_form_feeds():
    lines = [f"l{i}" for i in range(100)]
    out = pdf_to_text(render_pdf_pages(lines, lines_per_page=30))
    assert out.count("\x0c") == 4  # 100 lines / 30 per page
    assert out.split("\x0c")[0].split("\n")[:2] == ["l0", "l1"]


def test_wrap_unwrap_inverse():
    text = " ".join(f"w{i}" * (i % 7 + 1) for i in range(500))
    assert unwrap_lines("".join(ln + "\n" for ln in wrap_words(text))) == text


# ----------------------------------------------------- structural validity


def test_rendered_pdf_structure():
    pdf = render_pdf_text("structural check")
    assert pdf.startswith(b"%PDF-1.4\n")
    assert pdf.rstrip().endswith(b"%%EOF")
    # the classic xref offsets must be byte-exact
    xref_off = int(re.search(rb"startxref\s+(\d+)", pdf).group(1))
    assert pdf[xref_off : xref_off + 4] == b"xref"
    for m in re.finditer(rb"(\d{10}) 00000 n", pdf):
        off = int(m.group(1))
        assert re.match(rb"\d+ 0 obj", pdf[off : off + 20])


# ------------------------------------------------------- parser features


def _wrap_objects(objs: dict[int, bytes], root: int = 1, xref: bool = True) -> bytes:
    """Assemble raw objects into a PDF body with a classic xref table."""
    buf = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(buf)
        buf += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    start = len(buf)
    if xref:
        buf += b"xref\n0 %d\n0000000000 65535 f \n" % (max(objs) + 1)
        for num in range(1, max(objs) + 1):
            buf += b"%010d 00000 n \n" % offsets.get(num, 0)
    buf += b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n" % (
        max(objs) + 1,
        root,
        start,
    )
    return bytes(buf)


def _doc_with_content(content: bytes, extra: bytes = b"") -> bytes:
    return _wrap_objects(
        {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
            4: b"<< /Length %d >>\nstream\n" % len(content) + content + b"\nendstream",
        }
    )


def test_hex_strings_and_escapes():
    content = b"BT (lit\\tstring\\)) Tj T* <48692068657821> Tj ET"
    out = pdf_to_text(_doc_with_content(content))
    assert out == "lit\tstring)\nHi hex!\n\x0c"


def test_octal_escapes_and_line_continuation():
    content = b"BT (\\101\\102\\103 and cont\\\ninued) Tj ET"
    assert pdf_to_text(_doc_with_content(content)) == "ABC and continued\n\x0c"


def test_tj_kerning_word_gaps():
    content = b"BT [(no) -50 (gap) -250 (space)] TJ ET"
    # -50 is glyph kerning (no gap); -250 crosses the word-gap threshold
    assert pdf_to_text(_doc_with_content(content)) == "nogap space\n\x0c"


def test_quote_operators_start_new_lines():
    content = b"BT (a) Tj (b) ' 1 2 (c) \" ET"
    assert pdf_to_text(_doc_with_content(content)) == "a\nb\nc\n\x0c"


def test_tm_y_change_is_newline_td_x_only_is_not():
    content = (
        b"BT 1 0 0 1 72 700 Tm (one) Tj 50 0 Td (-same-line) Tj "
        b"1 0 0 1 72 650 Tm (two) Tj ET"
    )
    assert pdf_to_text(_doc_with_content(content)) == "one-same-line\ntwo\n\x0c"


def test_ascii_hex_filter():
    inner = b"BT (hexed) Tj ET"
    hexed = inner.hex().encode() + b">"
    doc = _wrap_objects(
        {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
            4: b"<< /Length %d /Filter /ASCIIHexDecode >>\nstream\n" % len(hexed)
            + hexed
            + b"\nendstream",
        }
    )
    assert pdf_to_text(doc) == "hexed\n\x0c"


def test_filter_chain_and_indirect_length():
    inner = b"BT (chained) Tj ET"
    flated = zlib.compress(inner)
    hexed = flated.hex().encode() + b">"
    doc = _wrap_objects(
        {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
            4: b"<< /Length 5 0 R /Filter [/ASCIIHexDecode /FlateDecode] >>\nstream\n"
            + hexed
            + b"\nendstream",
            5: b"%d" % len(hexed),
        }
    )
    assert pdf_to_text(doc) == "chained\n\x0c"


def test_contents_array_concatenation():
    c1, c2 = b"BT (part1) Tj", b"T* (part2) Tj ET"
    doc = _wrap_objects(
        {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >>",
            4: b"<< /Length %d >>\nstream\n" % len(c1) + c1 + b"\nendstream",
            5: b"<< /Length %d >>\nstream\n" % len(c2) + c2 + b"\nendstream",
        }
    )
    assert pdf_to_text(doc) == "part1\npart2\n\x0c"


def test_nested_pages_tree():
    doc = _wrap_objects(
        {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R 6 0 R] /Count 2 >>",
            3: b"<< /Type /Pages /Kids [4 0 R] /Count 1 /Parent 2 0 R >>",
            4: b"<< /Type /Page /Parent 3 0 R /Contents 5 0 R >>",
            5: b"<< /Length 14 >>\nstream\nBT (pA) Tj ET\nendstream",
            6: b"<< /Type /Page /Parent 2 0 R /Contents 7 0 R >>",
            7: b"<< /Length 14 >>\nstream\nBT (pB) Tj ET\nendstream",
        }
    )
    assert pdf_to_text(doc) == "pA\n\x0c" + "pB\n\x0c"


def test_incremental_update_prev_chain():
    """An appended xref section with /Prev: the NEWEST definition of an
    object wins; untouched objects come from the previous section."""
    base = _doc_with_content(b"BT (old) Tj ET")
    new_content = b"BT (new) Tj ET"
    upd = bytearray(base)
    off4 = len(upd)
    upd += (
        b"4 0 obj\n<< /Length %d >>\nstream\n" % len(new_content)
        + new_content
        + b"\nendstream\nendobj\n"
    )
    prev_xref = int(re.search(rb"startxref\s+(\d+)", base).group(1))
    new_xref = len(upd)
    upd += b"xref\n4 1\n%010d 00000 n \n" % off4
    upd += b"trailer\n<< /Size 5 /Root 1 0 R /Prev %d >>\nstartxref\n%d\n%%%%EOF\n" % (
        prev_xref,
        new_xref,
    )
    assert pdf_to_text(bytes(upd)) == "new\n\x0c"


def test_damaged_xref_falls_back_to_object_scan():
    pdf = bytearray(render_pdf_text("resilient"))
    m = re.search(rb"startxref\s+(\d+)", pdf)
    pdf[m.start(1) : m.end(1)] = b"9" * (m.end(1) - m.start(1))  # bogus offset
    assert unwrap_lines(pdf_to_text(bytes(pdf))) == "resilient"


def test_garbage_inputs_return_none():
    for blob in [None, b"", b"GIF89a", b"%PDF-1.4\nnothing here", b"%PDF-" + b"\x00" * 64]:
        out = pdf_to_text(blob)
        assert out is None or out == ""


def test_no_trailing_newline_artifacts_in_unwrap():
    # empty pages / blank lines never inject separators into recovery
    out = pdf_to_text(render_pdf_pages([], lines_per_page=10))
    assert unwrap_lines(out or "") == ""


def test_unicode_text_renders_as_utf16_hex_strings():
    # non-latin-1 text must not crash the renderer (review finding):
    # it switches to UTF-16BE hex strings, which the extractor decodes
    for text in ["你好 world", "naïve café — em—dash", "emoji 🎉 ok"]:
        assert unwrap_lines(pdf_to_text(render_pdf_text(text))) == text


def test_td_then_tm_restoring_y_still_breaks_line():
    # review finding: Td moved the baseline but left the tracked y stale,
    # so a Tm RESTORING the old y missed the line break
    content = (
        b"BT 1 0 0 1 72 700 Tm (a) Tj 0 -14 Td (b) Tj "
        b"1 0 0 1 72 700 Tm (c) Tj ET"
    )
    assert pdf_to_text(_doc_with_content(content)) == "a\nb\nc\n\x0c"


def test_tstar_updates_tracked_y():
    content = b"BT 14 TL 1 0 0 1 72 700 Tm (a) Tj T* (b) Tj 1 0 0 1 72 686 Tm (-same) Tj ET"
    # after T*, baseline is 686; the Tm to 686 is NOT a move
    assert pdf_to_text(_doc_with_content(content)) == "a\nb-same\n\x0c"


def test_text_with_newlines_and_formfeeds_roundtrip_normalized():
    # '\n' and '\x0c' are structural in the extractor's output; the
    # pdf_roundtrip query normalizes them to spaces on both sides
    text = "hello\nworld\x0cagain"
    safe = text.replace("\x0c", " ").replace("\n", " ")
    assert unwrap_lines(pdf_to_text(render_pdf_text(safe))) == safe


def test_runs_of_spaces_roundtrip():
    text = "a  double   triple    quad"
    assert unwrap_lines(pdf_to_text(render_pdf_text(text))) == text
    # tj variant falls back to Tj for lines with space runs
    assert unwrap_lines(pdf_to_text(render_pdf_text(text, tj_words=True))) == text


def test_wrap_boundary_empty_word_roundtrip():
    # ADVICE r2: a wrap boundary landing on an empty word (trailing space
    # after a >=width word, leading space, space runs at the boundary)
    # used to emit an empty line that unwrap_lines dropped, losing a space
    cases = [
        "x" * 90 + " ",
        " " + "x" * 90,
        "x" * 90 + "  tail",
        "a" * 89 + " " + " " * 5 + "b",
        ("w " * 60).strip() + " ",
        " ",
        "  ",
    ]
    for t in cases:
        for kw in ({}, {"tj_words": True}):
            assert unwrap_lines(pdf_to_text(render_pdf_text(t, **kw))) == t, (t, kw)


def test_wrap_words_never_emits_droppable_empty_line():
    import random

    rng = random.Random(11)
    from europarl_crawler_ray.functions.pdf import wrap_words

    for _ in range(500):
        t = "".join(rng.choice("ab ") for _ in range(rng.randint(0, 140)))
        lines = wrap_words(t)
        # only a fully-empty input may produce the single empty line
        assert all(ln != "" for ln in lines) or t == ""
        assert unwrap_lines(pdf_to_text(render_pdf_text(t))) == t


def test_xref_stream_roundtrip_all_variants():
    """PDF 1.5: cross-reference stream (W-packed, PNG Up predictor) and
    ObjStm-packed objects parse structurally — not via the brute scan."""
    text = "xref stream body " * 30
    for kw in (
        {"xref_stream": True},
        {"xref_stream": True, "objstm": True},
        {"xref_stream": True, "objstm": True, "compress": False},
        {"xref_stream": True, "tj_words": True},
    ):
        data = render_pdf_text(text, **kw)
        assert b"\nxref\n" not in data and b"trailer" not in data
        assert unwrap_lines(pdf_to_text(data)) == text, kw


def test_objstm_catalog_is_not_plain_text_in_file():
    """With objstm=True the catalog/page dicts exist ONLY inside the
    compressed object stream — a brute-force 'N G obj' scan cannot find
    them, so successful extraction proves the ObjStm decode path."""
    data = render_pdf_text("packed objects", xref_stream=True, objstm=True)
    assert b"Catalog" not in data  # lives only inside the Flate payload
    assert b"/Type /ObjStm" in data
    assert unwrap_lines(pdf_to_text(data)) == "packed objects"


def test_xref_stream_prev_chain_incremental_update():
    """An appended incremental update whose xref STREAM carries /Prev to
    the original must win for its redefined object (newest-first parse)."""
    import re
    import zlib

    base = render_pdf_text("old body text", xref_stream=True)
    old_start = int(re.search(rb"startxref\s+(\d+)", base).group(1))
    # redefine the first page's content stream (object 5) with new text
    new_content = b"BT\n/F1 11 Tf\n14 TL\n1 0 0 1 72 770 Tm\n(new body text) Tj\nT*\nET"
    upd = bytearray(base)
    obj5_off = len(upd)
    upd += (
        b"5 0 obj\n<< /Length %d >>\nstream\n" % len(new_content)
        + new_content
        + b"\nendstream\nendobj\n"
    )
    # xref stream for the update: entries for obj 5 and the xref obj itself
    xref_num = 99
    xref_off = len(upd)
    stride = 7
    rows = (
        bytes([1]) + obj5_off.to_bytes(4, "big") + (0).to_bytes(2, "big")
        + bytes([1]) + xref_off.to_bytes(4, "big") + (0).to_bytes(2, "big")
    )
    raw = zlib.compress(rows, 6)
    upd += (
        b"99 0 obj\n<< /Type /XRef /Size 100 /W [1 4 2] /Index [5 1 99 1] "
        b"/Root 1 0 R /Prev %d /Length %d /Filter /FlateDecode >>\nstream\n"
        % (old_start, len(raw))
        + raw
        + b"\nendstream\nendobj\nstartxref\n%d\n%%%%EOF\n" % xref_off
    )
    assert unwrap_lines(pdf_to_text(bytes(upd))) == "new body text"
    # untouched original still extracts the old text
    assert unwrap_lines(pdf_to_text(base)) == "old body text"


def _append_update(base: bytes, new_objs: list, xref_num: int, entries: dict,
                   prev: int) -> bytes:
    """Append an incremental update: ``new_objs`` = [(num, body_bytes)],
    ``entries`` = {num: ('t1',) or ('t2', container, idx)}; a plain
    (unfiltered) xref stream with W [1 4 2] and /Prev -> prev."""
    upd = bytearray(base)
    offs = {}
    for num, body in new_objs:
        offs[num] = len(upd)
        upd += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    xref_off = len(upd)
    nums = sorted(entries) + [xref_num]
    rows = b""
    index = []
    for num in nums:
        e = entries.get(num, ("t1",))
        if num == xref_num:
            rows += bytes([1]) + xref_off.to_bytes(4, "big") + (0).to_bytes(2, "big")
        elif e[0] == "t1":
            rows += bytes([1]) + offs[num].to_bytes(4, "big") + (0).to_bytes(2, "big")
        else:
            rows += bytes([2]) + e[1].to_bytes(4, "big") + e[2].to_bytes(2, "big")
        index += [num, 1]
    xdict = (
        b"<< /Type /XRef /Size %d /W [1 4 2] /Index [%s] /Root 1 0 R "
        b"/Prev %d /Length %d >>"
        % (xref_num + 1, " ".join(str(i) for i in index).encode(), prev, len(rows))
    )
    upd += (
        b"%d 0 obj\n" % xref_num + xdict + b"\nstream\n" + rows
        + b"\nendstream\nendobj\nstartxref\n%d\n%%%%EOF\n" % xref_off
    )
    return bytes(upd)


def _new_page_objects(contents_num: int) -> tuple[bytes, bytes]:
    page = (
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 3 0 R >> >> /Contents %d 0 R >>" % contents_num
    )
    stream = b"BT\n/F1 11 Tf\n14 TL\n1 0 0 1 72 770 Tm\n(new text) Tj\nT*\nET"
    content = b"<< /Length %d >>\nstream\n" % len(stream) + stream + b"\nendstream"
    return page, content


def test_objstm_stale_copy_does_not_shadow_newer_on_disk_object():
    """Review finding: an ObjStm holding an OLD copy of object 4 must not
    shadow the newer on-disk (type-1) definition added by an update."""
    import re

    base = render_pdf_text("old text", xref_stream=True, objstm=True)
    prev = int(re.search(rb"startxref\s+(\d+)", base).group(1))
    page, content = _new_page_objects(8)
    upd = _append_update(
        base,
        [(4, page), (8, content)],
        xref_num=9,
        entries={4: ("t1",), 8: ("t1",)},
        prev=prev,
    )
    assert unwrap_lines(pdf_to_text(upd)) == "new text"
    assert unwrap_lines(pdf_to_text(base)) == "old text"


def test_old_type1_entry_does_not_override_newer_type2():
    """Review finding: the newest xref maps object 4 into an ObjStm
    (type 2); the older section's type-1 entry must not win."""
    import re

    base = render_pdf_text("old text", xref_stream=True)
    prev = int(re.search(rb"startxref\s+(\d+)", base).group(1))
    page, content = _new_page_objects(8)
    header = b"4 0\n"
    objstm_payload = header + page + b" "
    objstm = (
        b"<< /Type /ObjStm /N 1 /First %d /Length %d >>\nstream\n"
        % (len(header), len(objstm_payload))
        + objstm_payload
        + b"\nendstream"
    )
    upd = _append_update(
        base,
        [(7, objstm), (8, content)],
        xref_num=9,
        entries={4: ("t2", 7, 0), 7: ("t1",), 8: ("t1",)},
        prev=prev,
    )
    assert unwrap_lines(pdf_to_text(upd)) == "new text"


def test_decodeparms_shorter_than_filter_list_still_applies_all_filters():
    """Review finding: DecodeParms [null] with two filters must not drop
    the second filter."""
    import zlib as _z

    from europarl_crawler_ray.functions.pdf import _Lexer, _PdfDocument

    inner = _z.compress(b"BT (x) Tj ET", 6)
    hexed = inner.hex().encode() + b">"
    sdict = (
        b"<< /Length " + str(len(hexed)).encode()
        + b" /Filter [/ASCIIHexDecode /FlateDecode] /DecodeParms [null] >>"
    )
    body = (
        b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n" + sdict + b"\nstream\n" + hexed + b"\nendstream\nendobj\n"
    )
    assert pdf_to_text(body) == "x\n\x0c"


def test_freed_object_is_not_resurrected_from_older_section():
    """Review finding: an update marking object 5 FREE must delete it —
    not let the older section's 'n' entry resurrect the old body."""
    import re

    base = render_pdf_text("old text", compress=False)
    prev = int(re.search(rb"(?s)startxref\s+(\d+)", base).group(1))
    upd = bytearray(base)
    xref_off = len(upd)
    upd += (
        b"xref\n5 1\n0000000000 00001 f \n"
        b"trailer\n<< /Size 7 /Root 1 0 R /Prev "
        + str(prev).encode()
        + b" >>\nstartxref\n"
        + str(xref_off).encode()
        + b"\n%%EOF\n"
    )
    # the page's /Contents now resolves to nothing -> empty page
    assert pdf_to_text(bytes(upd)) == "\x0c"
    assert unwrap_lines(pdf_to_text(base)) == "old text"


def test_hybrid_reference_file_follows_xrefstm():
    """Review finding: hybrid-reference PDFs (classic table marks packed
    objects free; trailer /XRefStm points at the stream that maps them
    type-2) must load the stream's entries first."""
    import re

    base = render_pdf_text("hybrid text", xref_stream=True, objstm=True)
    stream_off = int(re.search(rb"(?s)startxref\s+(\d+)", base).group(1))
    hyb = bytearray(base)
    xref_off = len(hyb)
    # classic section marking the ObjStm-packed objects (1-4) free — the
    # shape Acrobat-era hybrid writers emit for downlevel readers
    hyb += (
        b"xref\n0 5\n"
        b"0000000000 65535 f \n"
        + b"".join(b"0000000000 00001 f \n" for _ in range(4))
        + b"trailer\n<< /Size 8 /Root 1 0 R /XRefStm "
        + str(stream_off).encode()
        + b" >>\nstartxref\n"
        + str(xref_off).encode()
        + b"\n%%EOF\n"
    )
    assert unwrap_lines(pdf_to_text(bytes(hyb))) == "hybrid text"
