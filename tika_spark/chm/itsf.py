"""CHM (ITSF) container reader: directory walk + content sections.

From the published ITSS/CHM format descriptions (the format Tika's
in-repo accessors parse — tika-parsers/.../chm/accessor/
ChmItsfHeader.java, ChmItspHeader.java, ChmPmglHeader.java,
ChmDirectoryListingSet.java, ChmLzxcControlData.java,
ChmLzxcResetTable.java):

- ITSF header -> directory (ITSP) offset + content-section-0 data
  offset (version 3 carries it directly; version 2 content starts
  right after the directory);
- ITSP header -> 4096-byte directory chunks; PMGL listing chunks hold
  entries as (ENCINT name-length, name, ENCINT section, ENCINT
  offset, ENCINT length); PMGI index chunks are skipped;
- content section 0 is stored raw; section 1 ("MSCompressed") is an
  LZX-compressed blob described by the LZXC ControlData (window size,
  reset interval) and ResetTable (compressed offset per 0x8000-byte
  frame group) system files, decompressed via tika_spark.chm.lzx.
"""

from __future__ import annotations

import struct

from tika_spark.chm.lzx import LzxDecoder, LzxError

MAGIC = b"ITSF"

_CONTROL = "::DataSpace/Storage/MSCompressed/ControlData"
_CONTENT = "::DataSpace/Storage/MSCompressed/Content"
_RESET = ("::DataSpace/Storage/MSCompressed/Transform/"
          "{7FC28940-9D31-11D0-9B27-00A0C91E9C7C}/"
          "InstanceData/ResetTable")


class ChmError(ValueError):
    pass


def _encint(data: bytes, p: int) -> tuple[int, int]:
    v = 0
    for _ in range(9):
        if p >= len(data):
            raise ChmError("truncated ENCINT")
        b = data[p]
        p += 1
        v = (v << 7) | (b & 0x7F)
        if not b & 0x80:
            return v, p
    raise ChmError("ENCINT too long")


class ChmEntry:
    __slots__ = ("name", "section", "offset", "length")

    def __init__(self, name, section, offset, length):
        self.name, self.section = name, section
        self.offset, self.length = offset, length


class ChmFile:
    def __init__(self, data: bytes):
        if len(data) < 96 or not data.startswith(MAGIC):
            raise ChmError("not a CHM file")
        self.data = data
        (version,) = struct.unpack_from("<I", data, 4)
        # 56-byte fixed header, then the header section table: two
        # (u64 offset, u64 length) pairs — entry 0 = file-size section,
        # entry 1 = the ITSP directory; version 3 appends the content-
        # section-0 data offset as a u64 at byte 88
        dir_off, dir_len = struct.unpack_from("<QQ", data, 56 + 16)
        if version >= 3:
            (self.data_offset,) = struct.unpack_from("<Q", data, 88)
        else:
            self.data_offset = dir_off + dir_len
        self.entries: list[ChmEntry] = []
        self._parse_directory(dir_off, dir_len)
        self._section1: bytes | None = None

    def _parse_directory(self, dir_off: int, dir_len: int):
        d = self.data
        if d[dir_off:dir_off + 4] != b"ITSP":
            raise ChmError("missing ITSP directory header")
        (hdr_len,) = struct.unpack_from("<I", d, dir_off + 8)
        (block_len,) = struct.unpack_from("<I", d, dir_off + 16)
        if not 512 <= block_len <= 65536:
            raise ChmError(f"bad directory block length {block_len}")
        chunks_start = dir_off + hdr_len
        n_chunks = max(0, (dir_off + dir_len - chunks_start) // block_len)
        for c in range(min(n_chunks, 1 << 16)):
            base = chunks_start + c * block_len
            tag = d[base:base + 4]
            if tag != b"PMGL":
                continue  # PMGI index chunks (and padding) are skipped
            (quickref_len,) = struct.unpack_from("<I", d, base + 4)
            p = base + 20
            end = base + block_len - quickref_len
            while p < end:
                try:
                    nlen, p = _encint(d, p)
                    if nlen == 0 or p + nlen > end:
                        break
                    name = d[p:p + nlen].decode("utf-8", "replace")
                    p += nlen
                    section, p = _encint(d, p)
                    offset, p = _encint(d, p)
                    length, p = _encint(d, p)
                except ChmError:
                    break
                self.entries.append(ChmEntry(name, section, offset, length))

    # ----------------------------------------------------------- access --

    def _find(self, name: str) -> ChmEntry | None:
        for e in self.entries:
            if e.name == name:
                return e
        return None

    def _read_section0(self, offset: int, length: int) -> bytes:
        start = self.data_offset + offset
        return self.data[start:start + length]

    def _decompress_section1(self) -> bytes:
        control_e = self._find(_CONTROL)
        content_e = self._find(_CONTENT)
        reset_e = self._find(_RESET)
        if control_e is None or content_e is None:
            raise ChmError("no MSCompressed section")
        control = self._read_section0(control_e.offset, control_e.length)
        if len(control) < 24 or control[4:8] != b"LZXC":
            raise ChmError("bad LZXC control data")
        (version,) = struct.unpack_from("<I", control, 8)
        (reset_interval,) = struct.unpack_from("<I", control, 12)
        (window_size,) = struct.unpack_from("<I", control, 16)
        if version == 2:
            reset_interval *= 0x8000
            window_size *= 0x8000
        wbits = max(15, window_size.bit_length() - 1)
        comp = self._read_section0(content_e.offset, content_e.length)

        out_len = None
        block_offsets = [0]
        if reset_e is not None:
            rt = self._read_section0(reset_e.offset, reset_e.length)
            if len(rt) >= 40:
                (n_blocks,) = struct.unpack_from("<I", rt, 4)
                (table_off,) = struct.unpack_from("<I", rt, 12)
                (out_len,) = struct.unpack_from("<Q", rt, 16)
                block_offsets = [
                    struct.unpack_from("<Q", rt, table_off + 8 * i)[0]
                    for i in range(min(
                        n_blocks, (len(rt) - table_off) // 8))] or [0]
        if out_len is None:
            out_len = reset_interval * 8  # defensive upper bound

        dec = LzxDecoder(wbits)
        out = bytearray()
        # ResetTable entries are one per 0x8000-byte *frame*, but the
        # encoder resets its state only every reset_interval bytes
        # (frames_per_reset frames).  Walk the table in reset-interval
        # strides: each stride's compressed span runs from the first
        # frame's offset to the first frame of the next stride.
        frames_per_reset = max(1, reset_interval // 0x8000)
        for i in range(0, len(block_offsets), frames_per_reset):
            dec.reset()
            boff = block_offsets[i]
            j = i + frames_per_reset
            end = block_offsets[j] if j < len(block_offsets) else len(comp)
            remaining = out_len - len(out)
            chunk_out = min(reset_interval, remaining)
            if chunk_out <= 0:
                break
            out += dec.decompress(comp[boff:end], chunk_out,
                                  abs_base=len(out))
        return bytes(out[:out_len])

    def read_entry(self, e: ChmEntry) -> bytes:
        if e.section == 0:
            return self._read_section0(e.offset, e.length)
        if self._section1 is None:
            self._section1 = self._decompress_section1()
        return self._section1[e.offset:e.offset + e.length]

    def content_entries(self) -> list[ChmEntry]:
        """Real document entries (name starts with '/', not a system
        '::' or '/#'/'/$' internal file)."""
        return [e for e in self.entries
                if e.name.startswith("/") and not e.name.startswith(
                    ("/#", "/$")) and e.length > 0]
