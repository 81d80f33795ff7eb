"""Deterministic 7z archive builder for fixtures and oracles.

Counterpart of fixtures/olegen.py: emits byte-stable 7z containers so
tests and driver oracles can synthesize archives per document row.
Supports the layouts the reader (pkg/sevenz.py) must handle:

- one folder per stream-bearing file, Copy or LZMA1 or LZMA2 codec;
- a single multi-substream folder (``solid=True``);
- empty files (kEmptyStream/kEmptyFile vectors);
- an LZMA1-compressed kEncodedHeader (``encoded_header=True``).

No timestamps are written (kMTime omitted), so output depends only on
the inputs.
"""

from __future__ import annotations

import lzma
import struct
import zlib


def _num(v: int) -> bytes:
    """7z variable-length number (canonical shortest form): the first
    byte's n high bits set → n little-endian extra bytes, remaining
    low bits of the first byte are the value's top bits."""
    if v < 0x80:
        return bytes([v])
    for n in range(1, 8):
        hi = v >> (8 * n)
        if hi < (1 << (7 - n)):
            first = (0x100 - (1 << (8 - n))) | hi
            low = v & ((1 << (8 * n)) - 1)
            return bytes([first]) + low.to_bytes(n, "little")
    return b"\xff" + v.to_bytes(8, "little")


def _bitvector(bits: list[bool]) -> bytes:
    out = bytearray()
    b = 0
    mask = 0x80
    for bit in bits:
        if bit:
            b |= mask
        mask >>= 1
        if not mask:
            out.append(b)
            b, mask = 0, 0x80
    if mask != 0x80:
        out.append(b)
    return bytes(out)


_LZMA1_PROPS = bytes([93]) + struct.pack("<I", 1 << 20)  # lc3 lp0 pb2
_LZMA1_FILTER = {"id": lzma.FILTER_LZMA1, "lc": 3, "lp": 0, "pb": 2,
                 "dict_size": 1 << 20}
_LZMA2_PROPS = bytes([16])                               # 1 MiB dict
_LZMA2_FILTER = {"id": lzma.FILTER_LZMA2, "dict_size": 1 << 20}


def _compress(payload: bytes, codec: str) -> tuple[bytes, bytes, bytes]:
    """→ (packed_bytes, codec_id, codec_props)."""
    if codec == "copy":
        return payload, b"\x00", b""
    if codec == "lzma1":
        c = lzma.LZMACompressor(format=lzma.FORMAT_RAW,
                                filters=[_LZMA1_FILTER])
        return c.compress(payload) + c.flush(), b"\x03\x01\x01", \
            _LZMA1_PROPS
    if codec == "lzma2":
        c = lzma.LZMACompressor(format=lzma.FORMAT_RAW,
                                filters=[_LZMA2_FILTER])
        return c.compress(payload) + c.flush(), b"\x21", _LZMA2_PROPS
    if codec == "bzip2":
        import bz2
        return bz2.compress(payload), b"\x04\x02\x02", b""
    if codec == "deflate":
        d = zlib.compressobj(wbits=-15)
        return d.compress(payload) + d.flush(), b"\x04\x01\x08", b""
    raise ValueError(f"unknown codec {codec}")


def _bcj_lzma_folder(payload: bytes) -> tuple[bytes, bytes, int]:
    """Two-coder folder (x86 BCJ → LZMA1) exercising bind pairs:
    → (packed_bytes, folder_block, out_size)."""
    c = lzma.LZMACompressor(format=lzma.FORMAT_RAW,
                            filters=[{"id": lzma.FILTER_X86},
                                     _LZMA1_FILTER])
    packed = c.compress(payload) + c.flush()
    blk = bytearray()
    blk += _num(2)                               # two coders
    blk += bytes([3 | 0x20]) + b"\x03\x01\x01"   # LZMA1 + props
    blk += _num(len(_LZMA1_PROPS)) + _LZMA1_PROPS
    blk += bytes([4]) + b"\x03\x03\x01\x03"      # BCJ x86, no props
    blk += _num(1) + _num(0)                     # bind: bcj.in0 ← lzma.out0
    return packed, bytes(blk), len(payload)


def _folder_block(codec_id: bytes, props: bytes) -> bytes:
    """One single-coder folder definition."""
    flags = len(codec_id) | (0x20 if props else 0)
    out = _num(1) + bytes([flags]) + codec_id
    if props:
        out += _num(len(props)) + props
    return out


def _streams_info(pack_pos: int, pack_sizes: list[int],
                  folder_blocks: list[bytes],
                  folder_out_sizes: list[int],
                  substream_counts: list[int] | None = None,
                  substream_sizes: list[list[int]] | None = None) -> bytes:
    out = bytearray()
    out += _num(0x06)                       # kPackInfo
    out += _num(pack_pos) + _num(len(pack_sizes))
    out += _num(0x09)                       # kSize
    for s in pack_sizes:
        out += _num(s)
    out += _num(0x00)                       # kEnd (PackInfo)
    out += _num(0x07)                       # kUnpackInfo
    out += _num(0x0B) + _num(len(folder_blocks)) + b"\x00"  # kFolder, !ext
    for fb in folder_blocks:
        out += fb
    out += _num(0x0C)                       # kCodersUnpackSize
    for s in folder_out_sizes:
        out += _num(s)
    out += _num(0x00)                       # kEnd (UnpackInfo)
    if substream_counts is not None:
        out += _num(0x08)                   # kSubStreamsInfo
        out += _num(0x0D)                   # kNumUnpackStream
        for c in substream_counts:
            out += _num(c)
        out += _num(0x09)                   # kSize (all but last/folder)
        for sizes in substream_sizes or []:
            for s in sizes[:-1]:
                out += _num(s)
        out += _num(0x00)                   # kEnd (SubStreams)
    out += _num(0x00)                       # kEnd (StreamsInfo)
    return bytes(out)


def make_7z(files: list[tuple[str, bytes]], codec: str = "lzma2",
            solid: bool = False, encoded_header: bool = False) -> bytes:
    """Build a 7z archive containing ``files`` (name, payload).

    ``solid`` packs every non-empty payload into ONE folder with
    substream sizes; otherwise each non-empty file gets its own
    folder. Empty payloads become kEmptyStream entries.
    """
    nonempty = [(n, p) for n, p in files if p]
    body = bytearray()
    pack_sizes: list[int] = []
    folder_blocks: list[bytes] = []
    folder_out_sizes: list[int] = []
    substream_counts = None
    substream_sizes = None
    if solid and nonempty:
        joined = b"".join(p for _, p in nonempty)
        packed, cid, props = _compress(joined, codec)
        body += packed
        pack_sizes.append(len(packed))
        folder_blocks.append(_folder_block(cid, props))
        folder_out_sizes.append(len(joined))
        substream_counts = [len(nonempty)]
        substream_sizes = [[len(p) for _, p in nonempty]]
    elif codec == "bcj-lzma1":
        for _, p in nonempty:
            packed, blk, out_size = _bcj_lzma_folder(p)
            body += packed
            pack_sizes.append(len(packed))
            folder_blocks.append(blk)
            # both coder out-streams: LZMA's then BCJ's (equal sizes)
            folder_out_sizes.extend([out_size, out_size])
    else:
        for _, p in nonempty:
            packed, cid, props = _compress(p, codec)
            body += packed
            pack_sizes.append(len(packed))
            folder_blocks.append(_folder_block(cid, props))
            folder_out_sizes.append(len(p))

    header = bytearray()
    header += _num(0x01)                    # kHeader
    if nonempty:
        header += _num(0x04)                # kMainStreamsInfo
        header += _streams_info(0, pack_sizes, folder_blocks,
                                folder_out_sizes, substream_counts,
                                substream_sizes)
    # FilesInfo
    header += _num(0x05) + _num(len(files))
    empties = [not p for _, p in files]
    if any(empties):
        vec = _bitvector(empties)
        header += _num(0x0E) + _num(len(vec)) + vec       # kEmptyStream
        ef = _bitvector([True] * sum(empties))            # all are files
        header += _num(0x0F) + _num(len(ef)) + ef         # kEmptyFile
    names = b"\x00" + "".join(n + "\x00" for n, _ in files) \
        .encode("utf-16-le")
    header += _num(0x11) + _num(len(names)) + names       # kName
    header += _num(0x00)                    # kEnd (FilesInfo)
    header += _num(0x00)                    # kEnd (Header)

    if encoded_header:
        packed, cid, props = _compress(bytes(header), "lzma1")
        hdr_pos = len(body)
        body += packed
        enc = bytearray()
        enc += _num(0x17)                   # kEncodedHeader
        enc += _streams_info(hdr_pos, [len(packed)],
                             [_folder_block(cid, props)], [len(header)])
        header = enc

    nh_off = len(body)
    nh_size = len(header)
    nh_crc = zlib.crc32(bytes(header))
    start_hdr = struct.pack("<QQI", nh_off, nh_size, nh_crc)
    out = bytearray()
    out += b"7z\xbc\xaf\x27\x1c" + bytes([0, 4])
    out += struct.pack("<I", zlib.crc32(start_hdr))
    out += start_hdr
    out += body
    out += header
    return bytes(out)
