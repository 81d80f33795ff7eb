"""Deterministic OLE2 (CFB) fixture writers for golden tests.

Builds well-formed compound files per the published [MS-CFB] spec —
regular FAT chains, a mini FAT + mini stream for sub-4096-byte
streams, and a directory whose sibling lists are degenerate (right-
linked) binary trees — plus minimal but spec-shaped payloads:

- ``make_doc``: [MS-DOC] FIB + CLX piece table (one cp1252 piece);
- ``make_xls``: [MS-XLS] BIFF8 workbook globals (SST, BOUNDSHEET)
  and per-sheet substreams (LABELSST / NUMBER cells);
- ``make_ppt``: [MS-PPT] TextBytesAtom / TextCharsAtom records;
- ``make_msg``: [MS-OXMSG] property substreams + one attachment
  storage (for the embedded-document recursion path);
- each with an optional SummaryInformation property-set stream.
"""

from __future__ import annotations

import struct

_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF
_FATSECT = 0xFFFFFFFD

# entry: (path, name, kind, data) — path is () for top level; storages
# are implied by stream paths and materialized automatically


def write_cfb(streams: list[tuple[tuple[str, ...], str, bytes]]) -> bytes:
    sec, minisec, cutoff = 512, 64, 4096

    # ---- directory model: root + storages + streams, tree order
    storages = []
    seen = set()
    for path, _name, _data in streams:
        for i in range(1, len(path) + 1):
            p = path[:i]
            if p not in seen:
                seen.add(p)
                storages.append(p)

    # ---- split streams mini/big, lay out payload areas
    mini_payload = bytearray()
    mini_chains: dict[tuple, tuple[int, int]] = {}  # key -> (start, nsec)
    minifat: list[int] = []
    big_order: list[tuple] = []
    for path, name, data in streams:
        key = (path, name)
        if len(data) < cutoff:
            start = len(minifat)
            nsec = max(1, -(-len(data) // minisec))
            mini_payload += data + b"\x00" * (nsec * minisec - len(data))
            for i in range(nsec - 1):
                minifat.append(start + i + 1)
            minifat.append(_ENDOFCHAIN)
            mini_chains[key] = (start, nsec)
        else:
            big_order.append(key)

    ministream = bytes(mini_payload)
    n_ms_sec = -(-len(ministream) // sec) if ministream else 0
    minifat_raw = b"".join(struct.pack("<I", v) for v in minifat)
    minifat_raw += b"\xff" * (-len(minifat_raw) % sec)
    n_minifat_sec = len(minifat_raw) // sec

    stream_bytes = {(p, n): d for p, n, d in streams}
    big_secs = {k: -(-len(stream_bytes[k]) // sec) for k in big_order}

    n_entries = 1 + len(storages) + len(streams)
    n_dir_sec = -(-(n_entries * 128) // sec)

    n_data = sum(big_secs.values()) + n_ms_sec + n_minifat_sec + n_dir_sec
    n_fat = 1
    while -(-((n_data + n_fat) * 4) // sec) > n_fat:
        n_fat += 1

    # ---- assign sector numbers in order: big, ministream, minifat,
    #      directory, FAT
    cursor = 0
    big_start: dict[tuple, int] = {}
    for k in big_order:
        big_start[k] = cursor
        cursor += big_secs[k]
    ms_start = cursor if n_ms_sec else _ENDOFCHAIN
    cursor += n_ms_sec
    minifat_start = cursor if n_minifat_sec else _ENDOFCHAIN
    cursor += n_minifat_sec
    dir_start = cursor
    cursor += n_dir_sec
    fat_start = cursor
    cursor += n_fat
    total = cursor

    fat = [_FREESECT] * (n_fat * (sec // 4))

    def chain(start: int, nsec: int):
        for i in range(nsec - 1):
            fat[start + i] = start + i + 1
        if nsec:
            fat[start + nsec - 1] = _ENDOFCHAIN

    for k in big_order:
        chain(big_start[k], big_secs[k])
    chain(ms_start if n_ms_sec else 0, n_ms_sec)
    chain(minifat_start if n_minifat_sec else 0, n_minifat_sec)
    chain(dir_start, n_dir_sec)
    for i in range(n_fat):
        fat[fat_start + i] = _FATSECT

    # ---- directory entries
    # order: root, then DFS over tree with right-sibling chains
    entries: list[dict] = []

    def add_entry(name, kind, start, size, child=_FREESECT):
        entries.append({"name": name, "kind": kind, "start": start,
                        "size": size, "left": _FREESECT,
                        "right": _FREESECT, "child": child})
        return len(entries) - 1

    add_entry("Root Entry", 5, ms_start if n_ms_sec else _ENDOFCHAIN,
              len(ministream))

    def build_level(path: tuple[str, ...]) -> int:
        """Add this level's children; return index of first or FREE."""
        kids = []
        for sp in storages:
            if sp[:-1] == path and len(sp) == len(path) + 1:
                kids.append(("storage", sp[-1], sp))
        for (p, n, d) in streams:
            if p == path:
                kids.append(("stream", n, (p, n, d)))
        first = _FREESECT
        prev = None
        for kind, name, ref in kids:
            if kind == "storage":
                idx = add_entry(name, 1, 0, 0)
            else:
                p, n, d = ref
                key = (p, n)
                if key in mini_chains:
                    start = mini_chains[key][0]
                else:
                    start = big_start[key]
                idx = add_entry(name, 2, start, len(d))
            if first == _FREESECT:
                first = idx
            if prev is not None:
                entries[prev]["right"] = idx
            prev = idx
        # fill storage children after allocating this level (DFS)
        for kind, name, ref in kids:
            if kind == "storage":
                for e_i, e in enumerate(entries):
                    if e["name"] == name and e["kind"] == 1 \
                            and e["child"] == _FREESECT:
                        e["child"] = build_level(ref)
                        break
        return first

    entries[0]["child"] = build_level(())

    dir_raw = bytearray()
    for e in entries:
        raw = bytearray(128)
        nm = e["name"].encode("utf-16-le")[:62]
        raw[0:len(nm)] = nm
        struct.pack_into("<H", raw, 64, len(nm) + 2)
        raw[66] = e["kind"]
        raw[67] = 1  # black
        struct.pack_into("<III", raw, 68, e["left"], e["right"], e["child"])
        struct.pack_into("<I", raw, 116,
                         e["start"] if e["start"] != _ENDOFCHAIN
                         else _ENDOFCHAIN)
        struct.pack_into("<Q", raw, 120, e["size"])
        dir_raw += raw
    dir_raw += b"\x00" * (n_dir_sec * sec - len(dir_raw))
    # mark padding slots as unallocated entries
    for i in range(n_entries, n_dir_sec * 4):
        struct.pack_into("<III", dir_raw, i * 128 + 68,
                         _FREESECT, _FREESECT, _FREESECT)

    # ---- header
    head = bytearray(512)
    head[0:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<HH", head, 24, 0x003E, 0x0003)   # minor, major v3
    struct.pack_into("<H", head, 28, 0xFFFE)            # little-endian
    struct.pack_into("<HH", head, 30, 9, 6)             # 512 / 64
    struct.pack_into("<I", head, 44, n_fat)
    struct.pack_into("<I", head, 48, dir_start)
    struct.pack_into("<I", head, 56, cutoff)
    struct.pack_into("<II", head, 60,
                     minifat_start if n_minifat_sec else _ENDOFCHAIN,
                     n_minifat_sec)
    struct.pack_into("<II", head, 68, _ENDOFCHAIN, 0)   # no DIFAT sectors
    for i in range(109):
        struct.pack_into("<I", head, 76 + 4 * i,
                         fat_start + i if i < n_fat else _FREESECT)

    # ---- assemble
    out = bytearray(head)
    body = bytearray(b"\x00" * (total * sec))

    def put(start: int, data: bytes):
        body[start * sec:start * sec + len(data)] = data

    for k in big_order:
        put(big_start[k], stream_bytes[k])
    if n_ms_sec:
        put(ms_start, ministream)
    if n_minifat_sec:
        put(minifat_start, minifat_raw)
    put(dir_start, bytes(dir_raw))
    fat_raw = b"".join(struct.pack("<I", v) for v in fat)
    put(fat_start, fat_raw)
    return bytes(out + body)


# ------------------------------------------------- SummaryInformation --

_SI_FMTID = struct.pack("<IHH8s", 0xF29F85E0, 0x4FF9, 0x1068,
                        bytes([0xAB, 0x91, 0x08, 0x00,
                               0x2B, 0x27, 0xB3, 0xD9]))
_PIDSI_BY_KEY = {"title": 2, "subject": 3, "author": 4, "keywords": 5,
                 "comments": 6, "last_author": 8, "app_name": 18}


def summary_info(**props: str) -> bytes:
    """Property-set stream with VT_LPSTR values (cp1252)."""
    items = [(_PIDSI_BY_KEY[k], v) for k, v in props.items()
             if k in _PIDSI_BY_KEY]
    vals = []
    for _pid, v in items:
        raw = v.encode("cp1252", "replace") + b"\x00"
        raw += b"\x00" * (-len(raw) % 4)
        vals.append(struct.pack("<II", 30, len(raw)) + raw)
    n = len(items)
    off = 8 + 8 * n
    pairs = b""
    for (pid, _v), val in zip(items, vals):
        pairs += struct.pack("<II", pid, off)
        off += len(val)
    section = struct.pack("<II", off, n) + pairs + b"".join(vals)
    head = struct.pack("<HHI16sI", 0xFFFE, 0, 0x00020006, b"\x00" * 16, 1)
    return head + _SI_FMTID + struct.pack("<I", 48) + section


# -------------------------------------------------------------- Word --


def make_doc(paragraphs: list[str], *, title: str | None = None,
             unicode_piece: bool = False,
             header: str | None = None, footer: str | None = None,
             footnotes: list[str] | None = None,
             comments: list[str] | None = None,
             endnotes: list[str] | None = None) -> bytes:
    """Word-97 .doc with the full FIB subrange layout: main text,
    footnotes, header/footer stories (PlcfHdd: 6 separator stories,
    then the per-section even/odd/first sextet — header in the odd
    header story, footer in the odd footer story), comments, and
    endnotes, all covered by a single piece."""
    main = "\r".join(paragraphs) + "\r"
    ftn = "".join(p + "\r" for p in (footnotes or []))
    hdr = (header + "\r") if header else ""
    ftr = (footer + "\r") if footer else ""
    hdd = hdr + ftr
    atn = "".join(p + "\r" for p in (comments or []))
    edn = "".join(p + "\r" for p in (endnotes or []))
    text = main + ftn + hdd + atn + edn
    fib = bytearray(0x600)
    struct.pack_into("<H", fib, 0, 0xA5EC)       # wIdent
    struct.pack_into("<H", fib, 2, 0x00C1)       # nFib (Word 97)
    struct.pack_into("<H", fib, 0x000A, 0)       # flags: 0Table
    struct.pack_into("<6I", fib, 0x004C, len(main), len(ftn), len(hdd),
                     0, len(atn), len(edn))      # ccpText..ccpEdn
    text_off = len(fib)
    if unicode_piece:
        raw = text.encode("utf-16-le")
        fc_raw = text_off                       # uncompressed: byte off
    else:
        raw = text.encode("cp1252", "replace")
        fc_raw = 0x40000000 | (text_off * 2)    # compressed: fc/2 coding
    word = bytes(fib) + raw

    # CLX: Pcdt with a single piece over every subrange
    plc = struct.pack("<II", 0, len(text))
    pcd = struct.pack("<HIH", 0, fc_raw, 0)
    pcdt = b"\x02" + struct.pack("<I", len(plc) + len(pcd)) + plc + pcd
    table = bytearray(pcdt)
    word = bytearray(word)
    struct.pack_into("<II", word, 0x01A2, 0, len(pcdt))  # fcClx, lcbClx
    if hdd:
        # PlcfHdd: 13 CPs = 6 separator stories + even/odd header,
        # even/odd footer, first header/footer (all CPs relative to
        # the hdd subrange)
        lh, lf = len(hdr), len(hdd)
        cps = [0] * 8 + [lh, lh, lf, lf, lf]
        plcfhdd = struct.pack(f"<{len(cps)}i", *cps)
        struct.pack_into("<II", word, 0x00F2, len(table), len(plcfhdd))
        table += plcfhdd

    streams = [((), "WordDocument", bytes(word)),
               ((), "0Table", bytes(table))]
    if title is not None:
        streams.append(((), "\x05SummaryInformation",
                        summary_info(title=title)))
    return write_cfb(streams)


def make_doc95(paragraphs: list[str]) -> bytes:
    """Word 6/95-style .doc: nFib < 0x00C1, contiguous cp1252 text at
    [fcMin, fcMac), no piece table."""
    text = "\r".join(paragraphs) + "\r"
    raw = text.encode("cp1252", "replace")
    fib = bytearray(0x300)
    struct.pack_into("<H", fib, 0, 0xA5EC)
    struct.pack_into("<H", fib, 2, 0x0065)       # nFib (Word 6)
    struct.pack_into("<II", fib, 0x0018, len(fib), len(fib) + len(raw))
    return write_cfb([((), "WordDocument", bytes(fib) + raw)])


# ------------------------------------------------------------- Excel --


def _rec(op: int, payload: bytes) -> bytes:
    return struct.pack("<HH", op, len(payload)) + payload


def _bof(dt: int) -> bytes:
    return _rec(0x0809, struct.pack("<HHHHII", 0x0600, dt, 0, 0, 0, 0))


def make_xls(sheets: dict[str, list[list[object]]], *,
             title: str | None = None) -> bytes:
    strings: list[str] = []
    index: dict[str, int] = {}
    for rows in sheets.values():
        for row in rows:
            for v in row:
                if isinstance(v, str) and v not in index:
                    index[v] = len(strings)
                    strings.append(v)
    sst = struct.pack("<II", len(strings), len(strings))
    for s in strings:
        enc = s.encode("utf-16-le")
        sst += struct.pack("<HB", len(s), 1) + enc

    sheet_blobs: list[bytes] = []
    for rows in sheets.values():
        blob = _bof(0x0010)
        for r, row in enumerate(rows):
            for c, v in enumerate(row):
                if isinstance(v, str):
                    blob += _rec(0x00FD, struct.pack("<HHHI", r, c, 0,
                                                     index[v]))
                else:
                    blob += _rec(0x0203, struct.pack("<HHH", r, c, 0)
                                 + struct.pack("<d", float(v)))
        blob += _rec(0x000A, b"")
        sheet_blobs.append(blob)

    # globals with BOUNDSHEET offsets patched after layout
    def globals_blob(offsets: list[int]) -> bytes:
        g = _bof(0x0005) + _rec(0x00FC, sst)
        for off, name in zip(offsets, sheets):
            enc = name.encode("cp1252", "replace")
            g += _rec(0x0085, struct.pack("<IHBB", off, 0, len(enc), 0)
                      + enc)
        return g + _rec(0x000A, b"")

    offsets = [0] * len(sheets)
    for _ in range(2):  # fixpoint: globals size depends only on itself
        g = globals_blob(offsets)
        pos, offsets = len(g), []
        for blob in sheet_blobs:
            offsets.append(pos)
            pos += len(blob)
    book = globals_blob(offsets) + b"".join(sheet_blobs)
    streams = [((), "Workbook", book)]
    if title is not None:
        streams.append(((), "\x05SummaryInformation",
                        summary_info(title=title)))
    return write_cfb(streams)


# -------------------------------------------------------- PowerPoint --


def make_ppt(lines: list[str], *, title: str | None = None) -> bytes:
    doc = b""
    for line in lines:
        try:
            enc = line.encode("cp1252")
            doc += struct.pack("<HHI", 0, 0x0FA8, len(enc)) + enc
        except UnicodeEncodeError:
            enc = line.encode("utf-16-le")
            doc += struct.pack("<HHI", 0, 0x0FA0, len(enc)) + enc
    streams = [((), "PowerPoint Document", doc)]
    if title is not None:
        streams.append(((), "\x05SummaryInformation",
                        summary_info(title=title)))
    return write_cfb(streams)


# ------------------------------------------------------------ Outlook --


def make_msg(subject: str, body: str, *, sender: str | None = None,
             attachments: list[tuple[str, bytes]] | None = None) -> bytes:
    def ustr(s: str) -> bytes:
        return s.encode("utf-16-le")

    streams: list[tuple[tuple[str, ...], str, bytes]] = [
        ((), "__properties_version1.0", b"\x00" * 32),
        ((), "__substg1.0_0037001F", ustr(subject)),
        ((), "__substg1.0_1000001F", ustr(body)),
    ]
    if sender is not None:
        streams.append(((), "__substg1.0_0C1A001F", ustr(sender)))
    for i, (name, payload) in enumerate(attachments or []):
        d = f"__attach_version1.0_#{i:08d}"
        streams.append(((d,), "__substg1.0_3704001F", ustr(name)))
        streams.append(((d,), "__substg1.0_37010102", payload))
    return write_cfb(streams)


# ---------------------------------------------------------- Publisher --


def make_pub(stories: list[str], *, author: str | None = None,
             title: str | None = None) -> bytes:
    """Publisher: Quill/QuillSub/CONTENTS with one TEXT bit per story
    (the layout _pub_text reads: CHNKINK signature, 24-byte bit
    descriptors from 0x20, utf-16-le payloads)."""
    header = bytearray(b"CHNKINK ") + b"\x00" * (512 - 8)
    payloads = b""
    base = 512
    for i, story in enumerate(stories[:20]):
        raw = story.encode("utf-16-le")
        off = 0x20 + i * 24
        header[off:off + 2] = b"\x18\x00"
        header[off + 2:off + 6] = b"TEXT"
        struct.pack_into("<HHH", header, off + 6, 0, 0, 0)
        header[off + 12:off + 16] = b"TEXT"
        struct.pack_into("<II", header, off + 16, base + len(payloads),
                         len(raw))
        payloads += raw
    streams = [(("Quill", "QuillSub"), "CONTENTS",
                bytes(header) + payloads)]
    props = {k: v for k, v in (("author", author), ("title", title))
             if v is not None}
    if props:
        streams.append(((), "\x05SummaryInformation",
                        summary_info(**props)))
    return write_cfb(streams)


# -------------------------------------------------------------- Visio --


def lzw_compress_literal(data: bytes) -> bytes:
    """Valid Visio-LZSS stream using literals only (flag byte 0xFF +
    8 literal bytes per group) — exercises the real decompressor."""
    out = bytearray()
    for i in range(0, len(data), 8):
        grp = data[i:i + 8]
        out.append(0xFF if len(grp) == 8 else (1 << len(grp)) - 1)
        out += grp
    return bytes(out)


def make_visio(stories: list[str], *, author: str | None = None,
               title: str | None = None, compress: bool = True,
               version: int = 11) -> bytes:
    """Minimal VSD: VisioDocument header + trailer pointer to one
    pointer stream that points to one chunk stream holding a 0x0E
    text chunk per story (the layout visio.py walks)."""
    chunks = bytearray()
    # 27-byte list header: marker, child count, empty list body
    chunks += b"\xff\xff\xff\xff" + struct.pack("<II", len(stories), 0)
    chunks += b"\x00" * (27 - len(chunks))
    for i, story in enumerate(stories):
        if version >= 11:
            raw = story.encode("utf-16-le")
        else:
            raw = story.encode("cp1252", "replace")
        chunks += struct.pack("<IIII", 0x0E, i, 0, 8 + len(raw))
        chunks += struct.pack("<HB", 2, 0x50)
        chunks += b"\x00" * 8 + raw
    chunk_blob = bytes(chunks)

    doc = bytearray(b"Visio (TM) Drawing\r\n")
    doc += b"\x00" * (0x1A - len(doc))
    doc += struct.pack("<H", version)
    doc += b"\x00" * (0x24 - len(doc))
    # trailer pointer at 0x24 (18 bytes) + pad to a data area
    data_at = 0x40
    if compress:
        body = lzw_compress_literal(b"\x00" * 4 + chunk_blob)
        fmt_chunks = 0xD6
    else:
        body = chunk_blob
        fmt_chunks = 0xD4
    # pointer stream (uncompressed): table offset 8, count 1, pad,
    # then one 18-byte pointer to the chunk stream
    ptr_at = data_at + len(body)
    ptr_stream = struct.pack("<II", 8, 0) + struct.pack("<II", 1, 0)
    ptr_stream += struct.pack("<IIIIH", 0x15, 0, data_at, len(body),
                              fmt_chunks)
    doc += struct.pack("<IIIIH", 0x14, 0, ptr_at, len(ptr_stream), 0x54)
    doc += b"\x00" * (data_at - len(doc))
    doc += body + ptr_stream
    struct.pack_into("<I", doc, 0x1C, len(doc))

    streams = [((), "VisioDocument", bytes(doc))]
    props = {k: v for k, v in (("author", author), ("title", title))
             if v is not None}
    if props:
        streams.append(((), "\x05SummaryInformation",
                        summary_info(**props)))
    return write_cfb(streams)
