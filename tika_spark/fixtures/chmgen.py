"""Deterministic CHM (ITSF) fixture writer for golden tests.

Produces spec-shaped version-3 CHM files: ITSF header + header
section table, ITSP directory with one or more PMGL listing chunks
(ENCINT-coded entries, sorted by name), and content stored either in
raw section 0 or in an LZX "MSCompressed" section 1 built with
uncompressed-type LZX blocks (block type 3 — a valid encoder choice
that exercises the full ControlData/ResetTable/decoder path without a
Huffman encoder).
"""

from __future__ import annotations

import struct

_BLOCK_LEN = 4096


def _encint(v: int) -> bytes:
    out = bytearray()
    while True:
        out.insert(0, v & 0x7F)
        v >>= 7
        if not v:
            break
    for i in range(len(out) - 1):
        out[i] |= 0x80
    return bytes(out)


def lzx_store(data: bytes) -> bytes:
    """LZX stream holding ``data`` as uncompressed-type blocks:
    1 header bit (no E8), one type-3 block, 16-bit alignment, R0-R2,
    raw bytes, odd-length pad."""
    bits = []  # (value, width)
    bits.append((0, 1))             # intel E8: off
    bits.append((3, 3))             # block type: uncompressed
    bits.append((len(data) >> 16, 8))
    bits.append((len(data) & 0xFFFF, 16))
    # pack MSB-first into 16-bit LE words
    acc = val = 0
    words = []
    for v, w in bits:
        val = (val << w) | v
        acc += w
        while acc >= 16:
            words.append((val >> (acc - 16)) & 0xFFFF)
            acc -= 16
    if acc:
        words.append((val << (16 - acc)) & 0xFFFF)
    head = b"".join(struct.pack("<H", w) for w in words)
    body = struct.pack("<III", 1, 1, 1) + data
    if len(data) & 1:
        body += b"\x00"
    return head + body


def make_chm(entries: dict[str, bytes], *, compressed: bool = False,
             reset_interval_frames: int = 1) -> bytes:
    """Build a CHM. ``entries`` maps names ('/page.html') to payloads.

    ``compressed=False`` stores everything in raw section 0;
    ``compressed=True`` packs the document payloads into an LZX
    section 1 with ControlData + ResetTable system entries.
    ``reset_interval_frames`` sets the LZXC reset interval in 0x8000
    frames (real-world files commonly use 2, i.e. reset_interval ==
    window == 0x10000, while the ResetTable still carries one entry
    per frame).
    """
    dir_entries: list[tuple[str, int, int, int]] = []  # name,sec,off,len
    section0 = bytearray()
    if not compressed:
        for name in sorted(entries):
            payload = entries[name]
            dir_entries.append((name, 0, len(section0), len(payload)))
            section0 += payload
    else:
        blob = bytearray()
        for name in sorted(entries):
            payload = entries[name]
            dir_entries.append((name, 1, len(blob), len(payload)))
            blob += payload
        fpr = max(1, reset_interval_frames)
        interval = fpr * 0x8000
        # one independent LZX run per reset interval; the reset table
        # records an offset per *frame*, so intermediate frames inside
        # a run point at the run start (only multiples of fpr mark the
        # start of a decodable span)
        comp = bytearray()
        frame_offsets: list[int] = []
        for start in range(0, max(1, len(blob)), interval):
            run = lzx_store(bytes(blob[start:start + interval]))
            n_frames = max(
                1, -(-min(interval, len(blob) - start) // 0x8000))
            frame_offsets += [len(comp)] * n_frames
            comp += run
        comp = bytes(comp)
        # LZXC v2 control data: len, 'LZXC', ver, reset interval,
        # window size, cache size (interval/window in 0x8000 units)
        control = struct.pack("<I4sIIII", 24, b"LZXC", 2, fpr,
                              max(2, fpr), 0)
        # reset table: ver, n_blocks, entry size, table offset,
        # uncompressed len, compressed len, frame size(0x8000), offsets
        reset = struct.pack("<IIIIQQQ", 2, len(frame_offsets), 8, 40,
                            len(blob), len(comp), 0x8000)
        reset += b"".join(struct.pack("<Q", o) for o in frame_offsets)
        sys_entries = [
            ("::DataSpace/Storage/MSCompressed/ControlData", control),
            ("::DataSpace/Storage/MSCompressed/Content", comp),
            ("::DataSpace/Storage/MSCompressed/Transform/"
             "{7FC28940-9D31-11D0-9B27-00A0C91E9C7C}/"
             "InstanceData/ResetTable", reset),
        ]
        for name, payload in sys_entries:
            dir_entries.append((name, 0, len(section0), len(payload)))
            section0 += payload
        dir_entries.sort()

    # ---- PMGL chunks
    chunks: list[bytes] = []
    cur = bytearray()
    for name, sec, off, ln in dir_entries:
        enc_name = name.encode("utf-8")
        rec = (_encint(len(enc_name)) + enc_name + _encint(sec)
               + _encint(off) + _encint(ln))
        if 20 + len(cur) + len(rec) > _BLOCK_LEN - 8:
            chunks.append(bytes(cur))
            cur = bytearray()
        cur += rec
    chunks.append(bytes(cur))

    pmgl = bytearray()
    for i, body in enumerate(chunks):
        chunk = bytearray(_BLOCK_LEN)
        chunk[0:4] = b"PMGL"
        struct.pack_into("<I", chunk, 4, _BLOCK_LEN - 20 - len(body))
        struct.pack_into("<i", chunk, 12, i - 1)                # prev
        struct.pack_into("<i", chunk, 16,
                         i + 1 if i + 1 < len(chunks) else -1)  # next
        chunk[20:20 + len(body)] = body
        pmgl += chunk

    # ---- ITSP directory header (84 bytes)
    itsp = bytearray(84)
    itsp[0:4] = b"ITSP"
    struct.pack_into("<I", itsp, 4, 1)            # version
    struct.pack_into("<I", itsp, 8, 84)           # header length
    struct.pack_into("<I", itsp, 16, _BLOCK_LEN)  # dir block length
    struct.pack_into("<I", itsp, 20, 2)           # quickref density
    struct.pack_into("<I", itsp, 24, 1)           # index depth
    struct.pack_into("<i", itsp, 28, -1)          # root index chunk
    struct.pack_into("<I", itsp, 32, 0)           # first PMGL
    struct.pack_into("<I", itsp, 36, len(chunks) - 1)  # last PMGL
    directory = bytes(itsp) + bytes(pmgl)

    # ---- ITSF header: 56-byte fixed part + section table + data off
    header_len = 96
    filesize_sec = struct.pack("<IIQII", 0x01FE, 0, 0, 0, 0)  # 24 bytes
    fs_off = header_len
    dir_off = fs_off + len(filesize_sec)
    data_off = dir_off + len(directory)

    head = bytearray(header_len)
    head[0:4] = b"ITSF"
    struct.pack_into("<I", head, 4, 3)            # version 3
    struct.pack_into("<I", head, 8, header_len)
    struct.pack_into("<I", head, 16, 0)           # timestamp (fixed)
    struct.pack_into("<I", head, 20, 0x0409)      # language
    struct.pack_into("<QQ", head, 56, fs_off, len(filesize_sec))
    struct.pack_into("<QQ", head, 72, dir_off, len(directory))
    struct.pack_into("<Q", head, 88, data_off)

    out = bytes(head) + filesize_sec + directory + bytes(section0)
    # patch total file size into the file-size section (u64 at +8)
    out = bytearray(out)
    struct.pack_into("<Q", out, fs_off + 8, len(out))
    return bytes(out)
