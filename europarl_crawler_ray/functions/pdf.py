"""From-scratch PDF text extraction + a minimal valid-PDF renderer.

The reference extracts PDF text with ``pdfminer.high_level.extract_text``
(``/root/reference/europarl/rules/extraction.py:6,44-45``); 14 of its 23
rules are ``.pdf``/``.xml`` format so the majority of its documents go
through this path. pdfminer is not installed in this environment, so —
mirroring the approach taken for bs4 in ``functions/extract.py`` — this
module implements the needed subset from scratch against the public PDF
spec (ISO 32000-1):

``pdf_to_text(data)``
    A real PDF parser: classic cross-reference tables (with ``/Prev``
    chains for incremental updates), a brute-force object scan fallback
    for damaged or xref-stream files, the full object grammar (dicts,
    arrays, literal strings with escapes/octal/line continuations, hex
    strings, names with ``#xx`` escapes, numbers, booleans, null,
    indirect references), stream decoding (``FlateDecode`` via zlib,
    ``ASCIIHexDecode``, filter chains, indirect ``/Length``), the page
    tree walk (``Catalog → Pages → Kids``, nested ``Pages`` nodes,
    inheritable ``/Contents`` arrays), and a content-stream text
    interpreter covering ``BT/ET  Tf  Td  TD  Tm  T*  TL  Tj  '  "  TJ``.

    Output shape mirrors ``pdfminer.high_level.extract_text`` for simple
    left-to-right documents: each text line ends with ``"\\n"``, each page
    ends with a form feed ``"\\x0c"``.  Word-gap heuristic for ``TJ``
    kerning: an adjustment ≤ ``-180`` (thousandths of text space — the
    magnitude a space glyph typically occupies) inserts one space.

``render_pdf_pages(lines, ...)``
    A deterministic renderer producing structurally valid PDFs (header,
    catalog/page-tree/font/content objects, optional FlateDecode'd
    content streams, byte-exact classic xref table, trailer, startxref).
    Used by ``sources/synth.py`` for the ``.pdf``-format rules and by the
    ``pdf_roundtrip`` oracle query: render a document's text → extract it
    back → byte-identical to the source text.
"""

from __future__ import annotations

import re
import zlib

# --------------------------------------------------------------- lexer


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"
_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")


class Ref:
    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int):
        self.num, self.gen = num, gen

    def __repr__(self):  # pragma: no cover - debug aid
        return f"{self.num} {self.gen} R"


class Name(str):
    """A PDF name (distinct from a text string)."""


class _Lexer:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # '%' comment to EOL
                while self.pos < n and d[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def peek(self) -> int:
        return self.data[self.pos] if self.pos < len(self.data) else -1

    # -- tokens ---------------------------------------------------------

    def read_keyword(self) -> str:
        start = self.pos
        d, n = self.data, len(self.data)
        while self.pos < n and d[self.pos] not in _WS and d[self.pos] not in _DELIM:
            self.pos += 1
        return d[start : self.pos].decode("latin-1")

    def read_name(self) -> Name:
        assert self.data[self.pos] == 0x2F  # '/'
        self.pos += 1
        out = bytearray()
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = d[self.pos]
            if c in _WS or c in _DELIM:
                break
            if c == 0x23 and self.pos + 2 < n:  # '#xx'
                try:
                    out.append(int(d[self.pos + 1 : self.pos + 3], 16))
                    self.pos += 3
                    continue
                except ValueError:
                    pass
            out.append(c)
            self.pos += 1
        return Name(out.decode("latin-1"))

    def read_literal_string(self) -> bytes:
        assert self.data[self.pos] == 0x28  # '('
        self.pos += 1
        out = bytearray()
        depth = 1
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = d[self.pos]
            if c == 0x5C:  # backslash
                self.pos += 1
                if self.pos >= n:
                    break
                e = d[self.pos]
                if e in b"nrtbf":
                    out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[e])
                    self.pos += 1
                elif e in b"()\\":
                    out.append(e)
                    self.pos += 1
                elif e in b"\r\n":  # line continuation
                    self.pos += 1
                    if e == 0x0D and self.pos < n and d[self.pos] == 0x0A:
                        self.pos += 1
                elif 0x30 <= e <= 0x37:  # octal, 1-3 digits
                    oct_digits = bytearray()
                    while len(oct_digits) < 3 and self.pos < n and 0x30 <= d[self.pos] <= 0x37:
                        oct_digits.append(d[self.pos])
                        self.pos += 1
                    out.append(int(oct_digits, 8) & 0xFF)
                else:  # spec: backslash before other chars is dropped
                    out.append(e)
                    self.pos += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                self.pos += 1
            elif c == 0x29:
                depth -= 1
                self.pos += 1
                if depth == 0:
                    return bytes(out)
                out.append(c)
            else:
                out.append(c)
                self.pos += 1
        return bytes(out)

    def read_hex_string(self) -> bytes:
        assert self.data[self.pos] == 0x3C  # '<'
        self.pos += 1
        digits = bytearray()
        d, n = self.data, len(self.data)
        while self.pos < n and d[self.pos] != 0x3E:
            c = d[self.pos]
            if c not in _WS:
                digits.append(c)
            self.pos += 1
        self.pos += 1  # '>'
        if len(digits) % 2:
            digits.append(0x30)  # odd count: final digit padded with 0
        try:
            return bytes.fromhex(digits.decode("ascii"))
        except ValueError:
            return b""

    # -- object grammar -------------------------------------------------

    def parse_object(self):
        """Parse one object. Returns (value, is_keyword)."""
        self.skip_ws()
        c = self.peek()
        if c < 0:
            raise EOFError("unexpected end of PDF data")
        if c == 0x2F:  # '/'
            return self.read_name(), False
        if c == 0x28:  # '('
            return self.read_literal_string(), False
        if c == 0x3C:  # '<' or '<<'
            if self.data[self.pos : self.pos + 2] == b"<<":
                return self._parse_dict(), False
            return self.read_hex_string(), False
        if c == 0x5B:  # '['
            return self._parse_array(), False
        if c == 0x5D:  # ']'
            self.pos += 1
            return "]", True
        if c == 0x3E:  # '>>' (handled in _parse_dict; bare means malformed)
            self.pos += 2
            return ">>", True
        m = _NUM_RE.match(self.data, self.pos)
        if m and m.start() == self.pos and (0x30 <= c <= 0x39 or c in (0x2B, 0x2D, 0x2E)):
            self.pos = m.end()
            tok = m.group()
            return (float(tok) if b"." in tok else int(tok)), False
        kw = self.read_keyword()
        if kw == "true":
            return True, False
        if kw == "false":
            return False, False
        if kw == "null":
            return None, False
        if not kw:  # lone delimiter like '{' '}' — skip it
            self.pos += 1
            return self.parse_object()
        return kw, True

    def _parse_array(self) -> list:
        self.pos += 1  # '['
        out: list = []
        while True:
            self.skip_ws()
            if self.peek() == 0x5D:
                self.pos += 1
                return out
            if self.peek() < 0:
                return out
            val, is_kw = self.parse_object()
            if is_kw and val == "R" and len(out) >= 2:
                gen, num = out.pop(), out.pop()
                out.append(Ref(int(num), int(gen)))
            elif is_kw and val == "]":
                return out
            elif not is_kw:
                out.append(val)

    def _parse_dict(self) -> dict:
        self.pos += 2  # '<<'
        out: dict = {}
        pending: list = []
        key: Name | None = None
        while True:
            self.skip_ws()
            if self.data[self.pos : self.pos + 2] == b">>":
                self.pos += 2
                if key is not None and pending:
                    out[key] = pending[0]
                return out
            if self.peek() < 0:
                return out
            val, is_kw = self.parse_object()
            if key is None:
                if isinstance(val, Name):
                    key = val
                    pending = []
                # else: malformed key — skip
            else:
                if is_kw and val == "R" and len(pending) >= 2:
                    gen, num = pending.pop(), pending.pop()
                    pending.append(Ref(int(num), int(gen)))
                elif not is_kw:
                    pending.append(val)
                if pending and not is_kw or (is_kw and val == "R"):
                    # a dict value is exactly one object (the num/gen of a
                    # ref are absorbed above)
                    if len(pending) == 1 and not _might_be_ref_prefix(self, pending):
                        out[key] = pending[0]
                        key, pending = None, []


def _might_be_ref_prefix(lex: _Lexer, pending: list) -> bool:
    """True if the single pending value could be the object-number of an
    indirect reference (``N G R``) — decided by lookahead."""
    if not (len(pending) == 1 and isinstance(pending[0], int)):
        return False
    save = lex.pos
    lex.skip_ws()
    m = _NUM_RE.match(lex.data, lex.pos)
    if not m or m.start() != lex.pos:
        lex.pos = save
        return False
    p = m.end()
    while p < len(lex.data) and lex.data[p] in _WS:
        p += 1
    ok = lex.data[p : p + 1] == b"R"
    lex.pos = save
    return ok


# ------------------------------------------------------------ document


class _PdfDocument:
    def __init__(self, data: bytes):
        self.data = data
        self.offsets: dict[int, int] = {}  # obj num -> byte offset
        self.compressed: dict[int, tuple[int, int]] = {}  # num -> (objstm, idx)
        self._free: set[int] = set()  # newest revision marked these deleted
        self.trailer: dict = {}
        self._cache: dict[int, object] = {}
        self._load_xref()
        if (not self.offsets and not self.compressed) or "Root" not in self.trailer:
            self._scan_objects()

    # -- xref -----------------------------------------------------------

    def _load_xref(self) -> None:
        tail = self.data[-2048:]
        m = None
        for m in re.finditer(rb"startxref\s+(\d+)", tail):
            pass
        if m is None:
            return
        offset = int(m.group(1))
        seen_offsets = set()
        while offset and offset not in seen_offsets and offset < len(self.data):
            seen_offsets.add(offset)
            offset = self._parse_xref_section(offset)

    def _register(self, num: int, typ: int, a: int = 0, b: int = 0) -> None:
        """Record one xref entry with newest-first precedence across ALL
        three maps: sections are parsed newest-first, so whichever map
        claims an object first wins — an older on-disk ('n'/type-1) entry
        never overrides a newer compressed (type-2) one, and an object
        the newest revision marked FREE (type-0/'f') stays deleted
        instead of being resurrected from an older section (review
        findings)."""
        if num in self.offsets or num in self.compressed or num in self._free:
            return
        if typ == 0:
            if num != 0:  # entry 0 is the permanent free-list head
                self._free.add(num)
        elif typ == 1:
            self.offsets[num] = a
        else:
            self.compressed[num] = (a, b)

    def _parse_xref_section(self, offset: int) -> int:
        """Parse one classic xref table + trailer; returns /Prev or 0."""
        lex = _Lexer(self.data, offset)
        lex.skip_ws()
        if self.data[lex.pos : lex.pos + 4] != b"xref":
            # xref *stream* (PDF 1.5+, ISO 32000-1 §7.5.8) or garbage; the
            # brute-force object scan still backstops truly damaged files
            return self._parse_xref_stream(lex.pos)
        lex.pos += 4
        # entries are COLLECTED first: in a hybrid-reference file the
        # trailer's /XRefStm entries take precedence over this classic
        # section's (which typically marks ObjStm-packed objects free),
        # so the stream must register before the table (review finding)
        entries: list[tuple[int, int, int]] = []
        while True:
            lex.skip_ws()
            if self.data[lex.pos : lex.pos + 7] == b"trailer":
                lex.pos += 7
                trailer, _ = lex.parse_object()
                if not isinstance(trailer, dict):
                    return 0
                xrefstm = trailer.get("XRefStm")
                if isinstance(xrefstm, (int, float)) and 0 < int(xrefstm) < len(self.data):
                    self._parse_xref_stream(int(xrefstm))
                for num, typ, off in entries:
                    self._register(num, typ, off)
                for k, v in trailer.items():
                    self.trailer.setdefault(k, v)
                prev = trailer.get("Prev")
                return int(prev) if isinstance(prev, (int, float)) else 0
            m = re.match(rb"(\d+)\s+(\d+)", self.data[lex.pos : lex.pos + 40])
            if not m:
                return 0
            start, count = int(m.group(1)), int(m.group(2))
            lex.pos += m.end()
            for i in range(count):
                lex.skip_ws()
                entry = self.data[lex.pos : lex.pos + 18]
                em = re.match(rb"(\d{10})\s(\d{5})\s([nf])", entry)
                if not em:
                    return 0
                lex.pos += em.end()
                entries.append(
                    (start + i, 1 if em.group(3) == b"n" else 0, int(em.group(1)))
                )

    def _parse_xref_stream(self, pos: int) -> int:
        """Parse a /Type/XRef cross-reference STREAM at ``pos`` (W-packed
        binary rows, optional /Index subsections, PNG-predicted Flate
        payloads); returns /Prev or 0. Type-2 rows register objects packed
        in object streams (``self.compressed``)."""
        m = re.match(rb"(\d+)\s+(\d+)\s+obj", self.data[pos : pos + 40])
        if not m:
            return 0
        lex = _Lexer(self.data, pos + m.end())
        try:
            value, _ = lex.parse_object()
        except (EOFError, AssertionError):
            return 0
        if not isinstance(value, dict) or value.get("Type") != "XRef":
            return 0
        lex.skip_ws()
        if self.data[lex.pos : lex.pos + 6] != b"stream":
            return 0
        try:
            payload = _Stream(self, value, self._stream_bytes(lex, value)).decoded()
        except Exception:
            return 0
        w = [int(x) for x in (self.resolve(value.get("W")) or [])]
        if len(w) != 3:
            return 0
        size = int(self.resolve(value.get("Size")) or 0)
        index = self.resolve(value.get("Index")) or [0, size]
        row_w = sum(w)
        rows = [payload[i : i + row_w] for i in range(0, len(payload) - row_w + 1, row_w)]
        it = iter(rows)

        def field(row: bytes, j: int, default: int) -> int:
            lo = sum(w[:j])
            return int.from_bytes(row[lo : lo + w[j]], "big") if w[j] else default

        for s in range(0, len(index) - 1, 2):
            start, count = int(index[s]), int(index[s + 1])
            for i in range(count):
                row = next(it, None)
                if row is None or len(row) < row_w:
                    break
                typ = field(row, 0, 1)  # w1=0 → default type 1
                self._register(start + i, typ, field(row, 1, 0), field(row, 2, 0))
        for k, v in value.items():
            if k not in ("Type", "W", "Index", "Length", "Filter", "DecodeParms", "DP"):
                self.trailer.setdefault(k, v)
        prev = value.get("Prev")
        return int(prev) if isinstance(prev, (int, float)) else 0

    def _scan_objects(self) -> None:
        """Fallback: brute-force scan for ``N G obj`` markers. Later
        occurrences win (matches incremental-update semantics for appended
        redefinitions)."""
        for m in re.finditer(rb"(?<![0-9])(\d+)\s+(\d+)\s+obj\b", self.data):
            self.offsets[int(m.group(1))] = m.start()
        if "Root" not in self.trailer:
            tm = None
            for tm in re.finditer(rb"trailer", self.data):
                pass
            if tm is not None:
                obj, _ = _Lexer(self.data, tm.end()).parse_object()
                if isinstance(obj, dict):
                    for k, v in obj.items():
                        self.trailer.setdefault(k, v)
        if "Root" not in self.trailer:
            # last resort: any object with /Type /Catalog
            for num in self.offsets:
                obj = self.get_object(num)
                if isinstance(obj, dict) and obj.get("Type") == "Catalog":
                    self.trailer["Root"] = Ref(num, 0)
                    break

    # -- objects --------------------------------------------------------

    def resolve(self, val, _depth: int = 0):
        while isinstance(val, Ref) and _depth < 32:
            val = self.get_object(val.num)
            _depth += 1
        return val

    def get_object(self, num: int):
        if num in self._cache:
            return self._cache[num]
        off = self.offsets.get(num)
        if off is None:
            comp = self.compressed.get(num)
            if comp is None:
                return None
            self._cache[num] = None  # cycle guard
            self._load_objstm(comp[0])
            return self._cache.get(num)
        self._cache[num] = None  # cycle guard
        lex = _Lexer(self.data, off)
        m = re.match(rb"(\d+)\s+(\d+)\s+obj", self.data[off : off + 40])
        if not m:
            return None
        lex.pos = off + m.end()
        try:
            value, _ = lex.parse_object()
        except EOFError:
            return None
        lex.skip_ws()
        if isinstance(value, dict) and self.data[lex.pos : lex.pos + 6] == b"stream":
            value = _Stream(self, value, self._stream_bytes(lex, value))
        self._cache[num] = value
        return value

    def _load_objstm(self, container: int) -> None:
        """Materialize every object packed in a /Type/ObjStm stream
        (ISO 32000-1 §7.5.7): header of N (objnum, offset) integer pairs,
        bodies at /First + offset."""
        stm = self.get_object(container)
        if not isinstance(stm, _Stream):
            return
        if self.resolve(stm.dict.get("Type")) != "ObjStm":
            return
        try:
            data = stm.decoded()
        except Exception:
            return
        n = int(self.resolve(stm.dict.get("N")) or 0)
        first = int(self.resolve(stm.dict.get("First")) or 0)
        hdr = _Lexer(data)
        pairs: list[tuple[int, int]] = []
        try:
            for _ in range(n):
                objnum, _kw = hdr.parse_object()
                rel, _kw = hdr.parse_object()
                pairs.append((int(objnum), int(rel)))
        except (EOFError, ValueError, TypeError):
            return
        for objnum, rel in pairs:
            # cache ONLY objects the xref actually maps to THIS container:
            # an ObjStm may hold stale copies of objects whose newest
            # definition is on disk (offsets) or in another ObjStm —
            # caching those would shadow the newer revision (review
            # finding). With no xref info at all (brute-scan fallback),
            # orphan packed objects are admitted unless defined on disk.
            mapped = self.compressed.get(objnum)
            if mapped is not None and mapped[0] != container:
                continue
            if mapped is None and objnum in self.offsets:
                continue
            if self._cache.get(objnum) is not None:
                continue  # an already-parsed definition wins
            try:
                value, _ = _Lexer(data, first + rel).parse_object()
            except (EOFError, AssertionError):
                continue
            self._cache[objnum] = value

    def _stream_bytes(self, lex: _Lexer, sdict: dict) -> bytes:
        pos = lex.pos + 6  # past 'stream'
        if self.data[pos : pos + 2] == b"\r\n":
            pos += 2
        elif self.data[pos : pos + 1] in (b"\n", b"\r"):
            pos += 1
        length = self.resolve(sdict.get("Length"))
        if isinstance(length, (int, float)) and pos + int(length) <= len(self.data):
            raw = self.data[pos : pos + int(length)]
            # sanity: endstream should follow (possibly after EOL)
            after = self.data[pos + int(length) : pos + int(length) + 16]
            if b"endstream" in after:
                return raw
        end = self.data.find(b"endstream", pos)
        if end < 0:
            end = len(self.data)
        raw = self.data[pos:end]
        return raw.rstrip(b"\r\n")


class _Stream:
    def __init__(self, doc: _PdfDocument, sdict: dict, raw: bytes):
        self.dict = sdict
        self.doc = doc
        self.raw = raw

    def decoded(self) -> bytes:
        filters = self.doc.resolve(self.dict.get("Filter"))
        if filters is None:
            return self.raw
        if not isinstance(filters, list):
            filters = [filters]
        parms = self.doc.resolve(self.dict.get("DecodeParms") or self.dict.get("DP"))
        if not isinstance(parms, list):
            parms = [parms] * len(filters)
        elif len(parms) < len(filters):
            # writers commonly omit trailing null entries — zip would
            # silently DROP the unmatched filters (review finding)
            parms = parms + [None] * (len(filters) - len(parms))
        data = self.raw
        for f, pm in zip(filters, parms):
            f = self.doc.resolve(f)
            if f == "FlateDecode":
                d = zlib.decompressobj()
                data = d.decompress(data)  # tolerate trailing garbage
                data = self._unpredict(data, self.doc.resolve(pm))
            elif f == "ASCIIHexDecode":
                hexpart = data.split(b">", 1)[0]
                digits = bytes(c for c in hexpart if c not in _WS)
                if len(digits) % 2:
                    digits += b"0"
                data = bytes.fromhex(digits.decode("ascii"))
            else:
                raise ValueError(f"unsupported PDF stream filter: {f}")
        return data

    def _unpredict(self, data: bytes, pm) -> bytes:
        """Undo a PNG row predictor (Predictor 10-15, the common case for
        xref streams — ISO 32000-1 table 8/10); Predictor 1/absent is a
        no-op. Row filters reuse the PNG semantics (None/Sub/Up/Average/
        Paeth) at bpp = Colors·BitsPerComponent/8."""
        if not isinstance(pm, dict):
            return data
        pred = int(self.doc.resolve(pm.get("Predictor")) or 1)
        if pred < 10:
            if pred not in (1,):
                raise ValueError(f"unsupported predictor {pred}")
            return data
        columns = int(self.doc.resolve(pm.get("Columns")) or 1)
        colors = int(self.doc.resolve(pm.get("Colors")) or 1)
        bpc = int(self.doc.resolve(pm.get("BitsPerComponent")) or 8)
        bpp = max(1, colors * bpc // 8)
        stride = columns * bpp
        out = bytearray()
        prev = bytearray(stride)
        for r in range(0, len(data) - stride, stride + 1):
            ft = data[r]
            row = bytearray(data[r + 1 : r + 1 + stride])
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                up = prev[x]
                upleft = prev[x - bpp] if x >= bpp else 0
                if ft == 0:
                    pass
                elif ft == 1:
                    row[x] = (row[x] + left) & 0xFF
                elif ft == 2:
                    row[x] = (row[x] + up) & 0xFF
                elif ft == 3:
                    row[x] = (row[x] + (left + up) // 2) & 0xFF
                elif ft == 4:
                    p = left + up - upleft
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - upleft)
                    pr = left if pa <= pb and pa <= pc else (up if pb <= pc else upleft)
                    row[x] = (row[x] + pr) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter {ft}")
            out += row
            prev = row
        return bytes(out)


# ----------------------------------------------------- page tree walk


def _walk_pages(doc: _PdfDocument, node, acc: list, depth: int = 0) -> None:
    node = doc.resolve(node)
    if not isinstance(node, dict) or depth > 64:
        return
    t = node.get("Type")
    if t == "Pages" or (t is None and "Kids" in node):
        kids = doc.resolve(node.get("Kids")) or []
        for kid in kids:
            _walk_pages(doc, kid, acc, depth + 1)
    elif t == "Page":
        acc.append(node)


def _page_content(doc: _PdfDocument, page: dict) -> bytes:
    contents = doc.resolve(page.get("Contents"))
    if contents is None:
        return b""
    if isinstance(contents, _Stream):
        return contents.decoded()
    if isinstance(contents, list):
        parts = []
        for ref in contents:
            obj = doc.resolve(ref)
            if isinstance(obj, _Stream):
                parts.append(obj.decoded())
        # spec: multiple content streams form ONE stream when concatenated
        # with whitespace between them
        return b"\n".join(parts)
    return b""


# --------------------------------------------- content-stream interpreter

# TJ adjustment (thousandths of text space) at or below which a word gap is
# emitted — the typical advance of a space glyph (~250) with margin.
_TJ_SPACE_THRESHOLD = -180.0


def _decode_pdf_string(b: bytes) -> str:
    if b[:2] == b"\xfe\xff":
        try:
            return b[2:].decode("utf-16-be")
        except UnicodeDecodeError:
            pass
    return b.decode("latin-1")


def _page_text(content: bytes) -> str:
    """Interpret a content stream's text operators into lines.

    Line model: shown text accumulates into the current line; any vertical
    move (``Td``/``TD`` with ty≠0, ``T*``, ``'``, ``"``, or a ``Tm`` that
    changes y) flushes it. Mirrors how pdfminer groups glyphs of one
    baseline into an LTTextLine.
    """
    lex = _Lexer(content)
    stack: list = []
    lines: list[str] = []
    cur: list[str] = []

    def flush():
        if cur:
            lines.append("".join(cur))
            cur.clear()

    y = None  # current baseline (text-space); None until a Tm sets it
    leading = 0.0  # TL / TD-set line leading

    def newline():
        flush()

    while True:
        lex.skip_ws()
        if lex.peek() < 0:
            break
        try:
            val, is_kw = lex.parse_object()
        except (EOFError, AssertionError):
            break
        if not is_kw:
            stack.append(val)
            continue
        op = val
        if op == "Tj" and stack:
            cur.append(_decode_pdf_string(stack[-1]) if isinstance(stack[-1], bytes) else "")
        elif op == "TJ" and stack and isinstance(stack[-1], list):
            for el in stack[-1]:
                if isinstance(el, bytes):
                    cur.append(_decode_pdf_string(el))
                elif isinstance(el, (int, float)) and el <= _TJ_SPACE_THRESHOLD:
                    if cur and not cur[-1].endswith(" "):
                        cur.append(" ")
        elif op == "'" and stack:
            newline()
            if y is not None:
                y -= leading
            cur.append(_decode_pdf_string(stack[-1]) if isinstance(stack[-1], bytes) else "")
        elif op == '"' and len(stack) >= 3:
            newline()
            if y is not None:
                y -= leading
            cur.append(_decode_pdf_string(stack[-1]) if isinstance(stack[-1], bytes) else "")
        elif op in ("Td", "TD") and len(stack) >= 2:
            ty = stack[-1]
            if isinstance(ty, (int, float)):
                if op == "TD":
                    leading = -float(ty)
                if ty != 0:
                    newline()
                if y is not None:
                    # keep the tracked baseline honest so a later Tm that
                    # RESTORES the pre-Td y still registers as a move
                    y += float(ty)
        elif op == "TL" and stack and isinstance(stack[-1], (int, float)):
            leading = float(stack[-1])
        elif op == "T*":
            newline()
            if y is not None:
                y -= leading
        elif op == "Tm" and len(stack) >= 6:
            new_y = stack[-1]
            if isinstance(new_y, (int, float)) and new_y != y:
                if y is not None:
                    newline()
                y = new_y
        elif op in ("BT", "ET"):
            if op == "ET":
                flush()
        # all other operators (Tf Tc Tw Tz Ts graphics ops …): no text
        if op not in ("R",):
            stack.clear()
    flush()
    return "".join(ln + "\n" for ln in lines)


# --------------------------------------------------------------- public


def pdf_to_text(data: bytes) -> str | None:
    """Extract text from PDF bytes; None on anything unparseable.

    Output contract (pdfminer ``extract_text``-shaped): each text line
    ends ``"\\n"``; each page ends with ``"\\x0c"``.
    """
    if not isinstance(data, (bytes, bytearray, memoryview)):
        return None
    data = bytes(data)
    if not data.startswith(b"%PDF-"):
        return None
    try:
        doc = _PdfDocument(data)
        root = doc.resolve(doc.trailer.get("Root"))
        if not isinstance(root, dict):
            return None
        pages: list[dict] = []
        _walk_pages(doc, root.get("Pages"), pages)
        out: list[str] = []
        for page in pages:
            out.append(_page_text(_page_content(doc, page)))
            out.append("\x0c")
        return "".join(out) if pages else None
    except Exception:
        return None


def wrap_words(text: str, width: int = 90) -> list[str]:
    """Deterministic greedy word-wrap (split on single spaces only) used by
    the renderer; inverse of ``unwrap_lines``. No word is ever split, so
    ``unwrap_lines(wrap_words(t)) == t`` for any space-separated ``t``
    without runs of spaces."""
    words = text.split(" ")
    lines: list[str] = []
    cur: list[str] = []
    n = 0
    for w in words:
        add = len(w) + (1 if cur else 0)
        # Never break BEFORE an empty word (a break there would strand the
        # space it encodes on an empty line that extraction cannot keep),
        # and never break while the current line still joins to "" (text
        # starting with a space): either way an empty rendered line would
        # be dropped by unwrap_lines and a space silently lost.
        breakable = w != "" and not (len(cur) == 1 and cur[0] == "")
        if cur and n + add > width and breakable:
            lines.append(" ".join(cur))
            cur, n = [w], len(w)
        else:
            cur.append(w)
            n += add
    lines.append(" ".join(cur))
    return lines


def unwrap_lines(extracted: str) -> str:
    """Recover the original text from ``pdf_to_text`` output of a PDF
    rendered with ``render_pdf_pages(wrap_words(text))``."""
    lines: list[str] = []
    for page in extracted.split("\x0c"):
        lines.extend(ln for ln in page.split("\n") if ln != "")
    return " ".join(lines)


def _show_string(s: str) -> bytes:
    """One PDF string object showing ``s``: a literal string with escapes
    for latin-1-encodable text, else a UTF-16BE hex string with BOM (the
    PDF text-string form; ``_decode_pdf_string`` round-trips both)."""
    try:
        raw = s.encode("latin-1")
    except UnicodeEncodeError:
        return b"<" + (b"\xfe\xff" + s.encode("utf-16-be")).hex().encode("ascii") + b">"
    out = bytearray(b"(")
    for ch in raw:
        if ch in b"()\\":
            out += b"\\" + bytes([ch])
        elif ch < 0x20 or ch > 0x7E:
            out += b"\\%03o" % ch
        else:
            out.append(ch)
    out += b")"
    return bytes(out)


def render_pdf_pages(
    lines: list[str],
    lines_per_page: int = 48,
    compress: bool = True,
    tj_words: bool = False,
    xref_stream: bool = False,
    objstm: bool = False,
) -> bytes:
    """Render text lines into a structurally valid one-column PDF.

    ``compress``: FlateDecode the content streams (exercises the stream
    filter path). ``tj_words``: emit each line as a ``TJ`` array of words
    with ``-250`` kerning gaps instead of literal spaces (exercises the
    word-gap heuristic). ``xref_stream``: write a PDF 1.5 cross-reference
    STREAM (W-packed rows, PNG Up predictor) instead of the classic
    table. ``objstm``: additionally pack the non-stream objects (catalog,
    page tree, font, page dicts) into a /Type/ObjStm object stream —
    requires ``xref_stream`` (classic tables cannot express type-2
    entries).
    """
    if objstm and not xref_stream:
        raise ValueError("objstm=True requires xref_stream=True")
    pages = [lines[i : i + lines_per_page] for i in range(0, len(lines), lines_per_page)] or [[]]
    n_pages = len(pages)
    # object layout: 1=Catalog 2=Pages 3=Font, then per page i:
    # (4+2i)=Page, (5+2i)=Contents
    objects: dict[int, bytes] = {}
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n_pages))
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[2] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode("latin-1")
    )
    objects[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>"

    body_parts: dict[int, bytes] = {}
    for i, page_lines in enumerate(pages):
        content = bytearray()
        content += b"BT\n/F1 11 Tf\n14 TL\n1 0 0 1 72 770 Tm\n"
        for ln in page_lines:
            if tj_words and " " in ln and "  " not in ln:
                # word-gap kerning exercise; skipped for runs of spaces
                # (the TJ gap heuristic collapses them)
                parts = b" -250 ".join(_show_string(w) for w in ln.split(" "))
                content += b"[" + parts + b"] TJ\nT*\n"
            else:
                content += _show_string(ln) + b" Tj\nT*\n"
        content += b"ET"
        raw = bytes(content)
        if compress:
            raw = zlib.compress(raw, 6)
            sdict = b"<< /Length %d /Filter /FlateDecode >>" % len(raw)
        else:
            sdict = b"<< /Length %d >>" % len(raw)
        page_num, cont_num = 4 + 2 * i, 5 + 2 * i
        objects[page_num] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> /Contents {cont_num} 0 R >>"
        ).encode("latin-1")
        body_parts[cont_num] = sdict + b"\nstream\n" + raw + b"\nendstream"

    max_num = 3 + 2 * n_pages
    if not xref_stream:
        buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
        offsets: dict[int, int] = {}
        for num in range(1, max_num + 1):
            offsets[num] = len(buf)
            body = body_parts.get(num, objects.get(num, b"null"))
            buf += b"%d 0 obj\n" % num + body + b"\nendobj\n"
        xref_off = len(buf)
        buf += b"xref\n0 %d\n" % (max_num + 1)
        buf += b"0000000000 65535 f \n"
        for num in range(1, max_num + 1):
            buf += b"%010d 00000 n \n" % offsets[num]
        buf += (
            b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (max_num + 1, xref_off)
        )
        return bytes(buf)

    # ---- PDF 1.5 layout: xref stream (+ optional object stream) --------
    buf = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    packed_nums = sorted(objects) if objstm else []  # dict objects only
    objstm_num = max_num + 1
    xref_num = max_num + 2 if objstm else max_num + 1
    offsets = {}
    compressed: dict[int, int] = {}  # num -> index inside the ObjStm
    if objstm:
        bodies = [objects[n2] for n2 in packed_nums]
        rels = []
        pos = 0
        for b in bodies:
            rels.append(pos)
            pos += len(b) + 1
        header = " ".join(f"{n2} {r}" for n2, r in zip(packed_nums, rels)).encode() + b"\n"
        payload = header + b" ".join(bodies) + b" "
        raw = zlib.compress(payload, 6)
        sdict = (
            b"<< /Type /ObjStm /N %d /First %d /Length %d /Filter /FlateDecode >>"
            % (len(packed_nums), len(header), len(raw))
        )
        offsets[objstm_num] = len(buf)
        buf += b"%d 0 obj\n" % objstm_num + sdict + b"\nstream\n" + raw + b"\nendstream\nendobj\n"
        compressed = {n2: i for i, n2 in enumerate(packed_nums)}
    for num in range(1, max_num + 1):
        if num in compressed:
            continue
        offsets[num] = len(buf)
        body = body_parts.get(num, objects.get(num, b"null"))
        buf += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    # xref stream rows: W = [1, 4, 2]; entry 0 = free, packed = type 2,
    # on-disk = type 1, plus the xref stream itself
    xref_off = len(buf)
    size = xref_num + 1
    rows = bytearray()
    stride = 7
    for num in range(size):
        if num == 0:
            rows += bytes([0]) + (0).to_bytes(4, "big") + (65535).to_bytes(2, "big")
        elif num in compressed:
            rows += bytes([2]) + objstm_num.to_bytes(4, "big") + compressed[num].to_bytes(2, "big")
        else:
            off = xref_off if num == xref_num else offsets[num]
            rows += bytes([1]) + off.to_bytes(4, "big") + (0).to_bytes(2, "big")
    # PNG Up predictor (the form real-world xref streams use)
    pred = bytearray()
    prev = bytes(stride)
    for i in range(0, len(rows), stride):
        row = rows[i : i + stride]
        pred.append(2)
        pred += bytes((row[j] - prev[j]) & 0xFF for j in range(stride))
        prev = row
    raw = zlib.compress(bytes(pred), 6)
    xdict = (
        b"<< /Type /XRef /Size %d /W [1 4 2] /Root 1 0 R /Length %d "
        b"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns %d >> >>"
        % (size, len(raw), stride)
    )
    buf += b"%d 0 obj\n" % xref_num + xdict + b"\nstream\n" + raw + b"\nendstream\nendobj\n"
    buf += b"startxref\n%d\n%%%%EOF\n" % xref_off
    return bytes(buf)


def render_pdf_text(text: str, **kw) -> bytes:
    """Render free text (word-wrapped at 90 cols) into a valid PDF such
    that ``unwrap_lines(pdf_to_text(render_pdf_text(t))) == t``."""
    return render_pdf_pages(wrap_words(text), **kw)
