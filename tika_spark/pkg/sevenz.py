"""From-scratch 7z container reader (SURVEY.md §2 E6 family).

The reference parses 7z through commons-compress
(tika-parsers/.../pkg/PackageParser.java:40-62 routes
``application/x-7z-compressed`` to SevenZFile) and explodes entries
through the same embedded-document machinery as zip/tar. This module
reimplements that surface from the published 7z format description
(the 7z SDK's ``7zFormat.txt``), not from any implementation source:

- signature header (``'7z\\xbc\\xaf\\x27\\x1c'`` + start-header
  locating the end header);
- the property-tagged header tree: PackInfo / UnpackInfo(Folders) /
  SubStreamsInfo / FilesInfo, with 7z variable-length numbers and
  bit vectors;
- kEncodedHeader (the header itself compressed as a one-folder
  streams-info — decoded recursively);
- folder coder chains decoded via stdlib primitives: Copy, LZMA1,
  LZMA2, Delta and BCJ/x86 (mapped onto ``lzma`` raw-filter chains),
  BZip2 (``bz2``) and Deflate (``zlib``). Multi-input coders (BCJ2)
  are rejected per-folder, not per-archive.

Zip-bomb posture matches pkg/parser.py: per-archive output budget,
entry cap, and streamed LZMA decode with ``max_length`` so a
pathological member cannot OOM an executor. At 100 TB scale the
parser sees one archive per row inside an Arrow batch; everything
here is O(archive) memory with hard caps.
"""

from __future__ import annotations

import bz2
import lzma
import struct
import zlib

# property ids (7zFormat.txt)
_K_END = 0x00
_K_HEADER = 0x01
_K_MAIN_STREAMS = 0x04
_K_FILES_INFO = 0x05
_K_PACK_INFO = 0x06
_K_UNPACK_INFO = 0x07
_K_SUBSTREAMS = 0x08
_K_SIZE = 0x09
_K_CRC = 0x0A
_K_FOLDER = 0x0B
_K_CODERS_UNPACK_SIZE = 0x0C
_K_NUM_UNPACK_STREAM = 0x0D
_K_EMPTY_STREAM = 0x0E
_K_EMPTY_FILE = 0x0F
_K_NAME = 0x11
_K_ENCODED_HEADER = 0x17
_K_DUMMY = 0x19

MAGIC = b"7z\xbc\xaf\x27\x1c"


class SevenZError(ValueError):
    pass


class _Reader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def byte(self) -> int:
        if self.pos >= len(self.data):
            raise SevenZError("truncated header")
        b = self.data[self.pos]
        self.pos += 1
        return b

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise SevenZError("truncated header")
        b = self.data[self.pos:self.pos + n]
        self.pos += n
        return b

    def number(self) -> int:
        """7z variable-length number: the first byte's high bits give
        the count of little-endian extra bytes."""
        first = self.byte()
        mask = 0x80
        value = 0
        for i in range(8):
            if not first & mask:
                value |= (first & (mask - 1)) << (8 * i)
                return value
            value |= self.byte() << (8 * i)
            mask >>= 1
        return value

    def bitvector(self, n: int) -> list[bool]:
        bits = []
        b = 0
        mask = 0
        for _ in range(n):
            if not mask:
                b = self.byte()
                mask = 0x80
            bits.append(bool(b & mask))
            mask >>= 1
        return bits

    def bitvector_or_all(self, n: int) -> list[bool]:
        """AllAreDefined byte + optional vector (kSize/kCRC layout)."""
        return [True] * n if self.byte() else self.bitvector(n)


class _Coder:
    __slots__ = ("codec", "n_in", "n_out", "props")

    def __init__(self, codec: bytes, n_in: int, n_out: int, props: bytes):
        self.codec = codec
        self.n_in = n_in
        self.n_out = n_out
        self.props = props


class _Folder:
    __slots__ = ("coders", "bind_pairs", "packed_indices",
                 "unpack_sizes", "num_substreams", "substream_sizes")

    def __init__(self):
        self.coders: list[_Coder] = []
        self.bind_pairs: list[tuple[int, int]] = []  # (in_idx, out_idx)
        self.packed_indices: list[int] = []
        self.unpack_sizes: list[int] = []   # one per coder out stream
        self.num_substreams = 1
        self.substream_sizes: list[int] = []

    @property
    def output_size(self) -> int:
        """Size of the folder's final (unbound) output stream."""
        bound_outs = {o for _, o in self.bind_pairs}
        out_idx = 0
        for i, c in enumerate(self.coders):
            for j in range(c.n_out):
                if out_idx + j not in bound_outs:
                    return self.unpack_sizes[out_idx + j]
            out_idx += c.n_out
        return self.unpack_sizes[-1] if self.unpack_sizes else 0


def _read_folder(r: _Reader) -> _Folder:
    f = _Folder()
    n_coders = r.number()
    if n_coders == 0 or n_coders > 32:
        raise SevenZError(f"bad coder count {n_coders}")
    total_in = total_out = 0
    for _ in range(n_coders):
        flags = r.byte()
        id_size = flags & 0x0F
        codec = r.take(id_size)
        if flags & 0x10:  # complex
            n_in = r.number()
            n_out = r.number()
        else:
            n_in = n_out = 1
        props = b""
        if flags & 0x20:
            props = r.take(r.number())
        if flags & 0x80:
            raise SevenZError("alternative coder methods unsupported")
        f.coders.append(_Coder(codec, n_in, n_out, props))
        total_in += n_in
        total_out += n_out
    for _ in range(total_out - 1):
        f.bind_pairs.append((r.number(), r.number()))
    n_packed = total_in - len(f.bind_pairs)
    if n_packed == 1:
        bound_ins = {i for i, _ in f.bind_pairs}
        f.packed_indices = [next(i for i in range(total_in)
                                 if i not in bound_ins)]
    else:
        f.packed_indices = [r.number() for _ in range(n_packed)]
    return f


def _read_streams_info(r: _Reader):
    """kMainStreamsInfo / kEncodedHeader body → (pack_pos,
    pack_sizes, folders, folder→pack mapping)."""
    pack_pos = 0
    pack_sizes: list[int] = []
    folders: list[_Folder] = []
    folder_crc: list[bool] = []
    while True:
        t = r.number()
        if t == _K_END:
            break
        if t == _K_PACK_INFO:
            pack_pos = r.number()
            n_pack = r.number()
            if n_pack > 1 << 20:
                raise SevenZError("absurd pack stream count")
            while True:
                t2 = r.number()
                if t2 == _K_END:
                    break
                if t2 == _K_SIZE:
                    pack_sizes = [r.number() for _ in range(n_pack)]
                elif t2 == _K_CRC:
                    defined = r.bitvector_or_all(n_pack)
                    r.take(4 * sum(defined))
                else:
                    raise SevenZError(f"bad packinfo prop {t2}")
        elif t == _K_UNPACK_INFO:
            if r.number() != _K_FOLDER:
                raise SevenZError("expected kFolder")
            n_folders = r.number()
            if n_folders > 1 << 20:
                raise SevenZError("absurd folder count")
            if r.byte():  # external
                raise SevenZError("external folder data unsupported")
            folders = [_read_folder(r) for _ in range(n_folders)]
            if r.number() != _K_CODERS_UNPACK_SIZE:
                raise SevenZError("expected kCodersUnpackSize")
            for f in folders:
                n_out = sum(c.n_out for c in f.coders)
                f.unpack_sizes = [r.number() for _ in range(n_out)]
            while True:
                t2 = r.number()
                if t2 == _K_END:
                    break
                if t2 == _K_CRC:
                    folder_crc = r.bitvector_or_all(len(folders))
                    r.take(4 * sum(folder_crc))
                else:
                    raise SevenZError(f"bad unpackinfo prop {t2}")
        elif t == _K_SUBSTREAMS:
            _read_substreams(r, folders, folder_crc)
        else:
            raise SevenZError(f"bad streamsinfo prop {t}")
    for f in folders:
        if not f.substream_sizes:
            f.substream_sizes = [f.output_size]
    return pack_pos, pack_sizes, folders


def _read_substreams(r: _Reader, folders: list[_Folder],
                     folder_crc: list[bool]):
    have_counts = False
    while True:
        t = r.number()
        if t == _K_END:
            break
        if t == _K_NUM_UNPACK_STREAM:
            have_counts = True
            for f in folders:
                f.num_substreams = r.number()
                if f.num_substreams > 1 << 20:
                    raise SevenZError("absurd substream count")
        elif t == _K_SIZE:
            # all but the last substream of each folder are explicit
            for f in folders:
                if f.num_substreams == 0:
                    continue
                sizes = [r.number() for _ in range(f.num_substreams - 1)]
                sizes.append(f.output_size - sum(sizes))
                f.substream_sizes = sizes
        elif t == _K_CRC:
            # a 1-substream folder whose folder-level CRC is already
            # defined is skipped in the substream digest list
            n_digests = 0
            for i, f in enumerate(folders):
                has_folder_crc = i < len(folder_crc) and folder_crc[i]
                if f.num_substreams == 1 and has_folder_crc:
                    continue
                n_digests += f.num_substreams
            defined = r.bitvector_or_all(n_digests)
            r.take(4 * sum(defined))
        else:
            raise SevenZError(f"bad substreams prop {t}")
    if have_counts:
        for f in folders:
            if not f.substream_sizes and f.num_substreams:
                # counts given but one substream and no kSize
                f.substream_sizes = [f.output_size]


# codec ids
_COPY = b"\x00"
_DELTA = b"\x03"
_LZMA1 = b"\x03\x01\x01"
_LZMA2 = b"\x21"
_BCJ_X86 = b"\x03\x03\x01\x03"
_BCJ_X86_ALT = b"\x04"
_BZIP2 = b"\x04\x02\x02"
_DEFLATE = b"\x04\x01\x08"


def _lzma1_filter(props: bytes) -> dict:
    if len(props) < 5:
        raise SevenZError("short LZMA props")
    d = props[0]
    if d >= 225:
        raise SevenZError("bad LZMA props byte")
    lc = d % 9
    lp = (d // 9) % 5
    pb = d // 45
    dict_size = struct.unpack_from("<I", props, 1)[0]
    return {"id": lzma.FILTER_LZMA1, "lc": lc, "lp": lp, "pb": pb,
            "dict_size": max(4096, min(dict_size, 1 << 26))}


def _lzma2_filter(props: bytes) -> dict:
    if not props:
        raise SevenZError("missing LZMA2 props")
    p = props[0] & 0x3F
    if p > 40:
        raise SevenZError("bad LZMA2 dict prop")
    dict_size = 0xFFFFFFFF if p == 40 else (2 | (p & 1)) << (p // 2 + 11)
    return {"id": lzma.FILTER_LZMA2,
            "dict_size": max(4096, min(dict_size, 1 << 26))}


def _chain_order(folder: _Folder) -> list[int]:
    """Coder indices in decode order, packed stream → final output.

    Only linear chains are supported (every coder 1-in/1-out, bind
    pairs forming a path) — which covers everything 7-Zip itself
    produces except BCJ2. Multi-input folders raise."""
    if any(c.n_in != 1 or c.n_out != 1 for c in folder.coders):
        raise SevenZError("non-linear coder (BCJ2?) unsupported")
    # with 1-in/1-out coders, in-stream i and out-stream i belong to
    # coder i; bind pair (i, o) feeds coder o's output into coder i.
    src = folder.packed_indices[0]
    order = [src]
    consumer = {o: i for i, o in folder.bind_pairs}
    cur = src
    guard = 0
    while cur in consumer:
        guard += 1
        if guard > len(folder.coders):
            raise SevenZError("coder chain cycle")
        cur = consumer[cur]
        order.append(cur)
    # order currently lists coders from the one nearest the packed
    # bytes outward? bind pair (in_idx=i, out_idx=o) means coder o's
    # OUTPUT feeds coder i's INPUT: decode flows o -> i. The packed
    # stream enters coder `src` first.
    return order


def _decode_folder(folder: _Folder, packed: bytes, budget: int) -> bytes:
    out_size = min(folder.output_size, budget)
    order = _chain_order(folder)
    coders = [folder.coders[i] for i in order]
    data = packed
    i = 0
    while i < len(coders):
        c = coders[i]
        if c.codec == _COPY:
            i += 1
            continue
        if c.codec == _BZIP2:
            d = bz2.BZ2Decompressor()
            data = d.decompress(data, out_size)
            i += 1
            continue
        if c.codec == _DEFLATE:
            d = zlib.decompressobj(wbits=-15)
            data = d.decompress(data, out_size)
            i += 1
            continue
        if c.codec in (_LZMA1, _LZMA2):
            base = (_lzma1_filter(c.props) if c.codec == _LZMA1
                    else _lzma2_filter(c.props))
            # fold any following delta/BCJ coders into the same raw
            # chain (liblzma cannot run them standalone); filters are
            # listed in COMPRESSION order: [bcj..., lzma]
            tail: list[dict] = []
            j = i + 1
            while j < len(coders):
                cj = coders[j]
                if cj.codec == _DELTA:
                    dist = (cj.props[0] + 1) if cj.props else 1
                    tail.append({"id": lzma.FILTER_DELTA, "dist": dist})
                elif cj.codec in (_BCJ_X86, _BCJ_X86_ALT):
                    tail.append({"id": lzma.FILTER_X86})
                else:
                    break
                j += 1
            filters = list(reversed(tail)) + [base]
            d = lzma.LZMADecompressor(format=lzma.FORMAT_RAW,
                                      filters=filters)
            data = d.decompress(data, out_size)
            i = j
            continue
        raise SevenZError(f"unsupported codec {c.codec.hex()}")
    return data[:out_size]


class _FileEntry:
    __slots__ = ("name", "has_stream", "is_empty_file")

    def __init__(self, name: str, has_stream: bool, is_empty_file: bool):
        self.name = name
        self.has_stream = has_stream
        self.is_empty_file = is_empty_file


def _read_files_info(r: _Reader) -> list[_FileEntry]:
    n_files = r.number()
    if n_files > 1 << 20:
        raise SevenZError("absurd file count")
    empty_stream = [False] * n_files
    empty_file: list[bool] = []
    names: list[str] = []
    while True:
        t = r.number()
        if t == _K_END:
            break
        size = r.number()
        body = _Reader(r.take(size))
        if t == _K_EMPTY_STREAM:
            empty_stream = body.bitvector(n_files)
        elif t == _K_EMPTY_FILE:
            empty_file = body.bitvector(sum(empty_stream))
        elif t == _K_NAME:
            if body.byte():
                raise SevenZError("external names unsupported")
            raw = body.data[body.pos:]
            names = raw.decode("utf-16-le", "replace").split("\x00")
            if names and names[-1] == "":
                names.pop()
        # kMTime/kWinAttributes/kDummy/etc: skipped via sized body
    entries = []
    empty_i = 0
    for i in range(n_files):
        name = names[i] if i < len(names) else f"entry-{i}"
        if empty_stream[i]:
            is_empty = empty_file[empty_i] if empty_i < len(empty_file) \
                else False
            empty_i += 1
            entries.append(_FileEntry(name, False, is_empty))
        else:
            entries.append(_FileEntry(name, True, False))
    return entries


def sevenz_children(data: bytes, budget: int,
                    max_entries: int = 1000):
    """Parse a 7z archive → ([(name, payload), ...], truncated).

    Raises SevenZError on a corrupt container; a folder that fails to
    decode (unsupported codec, bad stream) drops only that folder's
    members, matching the per-entry fault isolation of the zip path.
    """
    if data[:6] != MAGIC:
        raise SevenZError("bad 7z signature")
    if len(data) < 32:
        raise SevenZError("truncated start header")
    nh_off, nh_size = struct.unpack_from("<QQ", data, 12)
    start = 32 + nh_off
    if nh_size == 0:
        return [], False
    if start + nh_size > len(data) or nh_size > 1 << 26:
        raise SevenZError("header out of range")
    r = _Reader(data[start:start + nh_size])
    t = r.number()
    if t == _K_ENCODED_HEADER:
        pack_pos, pack_sizes, folders = _read_streams_info(r)
        if not folders:
            raise SevenZError("empty encoded header")
        base = 32 + pack_pos
        packed = data[base:base + sum(pack_sizes)]
        header = _decode_folder(folders[0], packed, 1 << 26)
        r = _Reader(header)
        t = r.number()
    if t != _K_HEADER:
        raise SevenZError(f"expected kHeader, got {t}")

    pack_pos, pack_sizes, folders = [], [], []
    entries: list[_FileEntry] = []
    pack_pos = 0
    while True:
        t = r.number()
        if t == _K_END:
            break
        if t == _K_MAIN_STREAMS:
            pack_pos, pack_sizes, folders = _read_streams_info(r)
        elif t == _K_FILES_INFO:
            entries = _read_files_info(r)
        else:
            raise SevenZError(f"bad header prop {t}")

    # decode folders lazily: walk files in order; files with streams
    # consume folder substreams sequentially
    out: list[tuple[str, bytes]] = []
    truncated = False
    used = 0
    folder_i = 0
    sub_i = 0
    folder_data: bytes | None = None
    folder_off = 0
    pack_off = 32 + pack_pos
    folder_pack_off = [pack_off]
    fi = 0
    for f in folders:
        n = len(f.packed_indices)
        pack_off += sum(pack_sizes[fi:fi + n])
        fi += n
        folder_pack_off.append(pack_off)

    for e in entries:
        if len(out) >= max_entries or used >= budget:
            truncated = True
            break
        if not e.has_stream:
            out.append((e.name, b""))
            continue
        # advance to the folder holding the next substream
        while folder_i < len(folders) and \
                sub_i >= len(folders[folder_i].substream_sizes):
            folder_i += 1
            sub_i = 0
            folder_data = None
            folder_off = 0
        if folder_i >= len(folders):
            truncated = True
            break
        f = folders[folder_i]
        if folder_data is None:
            lo = folder_pack_off[folder_i]
            hi = folder_pack_off[folder_i + 1]
            try:
                folder_data = _decode_folder(
                    f, data[lo:hi], min(f.output_size, budget))
            except (SevenZError, lzma.LZMAError, OSError, zlib.error,
                    EOFError, IndexError):
                # fault-isolate: skip this folder's members
                folder_data = b""
        size = f.substream_sizes[sub_i]
        payload = folder_data[folder_off:folder_off + size]
        folder_off += size
        sub_i += 1
        cap = budget - used
        if len(payload) > cap:
            payload, truncated = payload[:cap], True
        used += len(payload)
        out.append((e.name, payload))
    return out, truncated
