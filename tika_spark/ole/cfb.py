"""From-scratch Compound File Binary (OLE2) reader.

Implements the container format from the published [MS-CFB] spec —
the structure the reference reads through POI's POIFSFileSystem
(tika-parsers/.../microsoft/POIFSContainerDetector.java,
OfficeParser.java:72-85). Sector FAT chains, the mini FAT / mini
stream for streams below the 4096-byte cutoff, and the directory
red-black tree (walked as a plain binary tree — balance and color are
irrelevant for reading).

Bounded and defensive: chain walks carry step limits so a corrupt or
adversarial FAT loop cannot spin an executor (the reference's
zip-bomb-guard intent, sax/SecureContentHandler.java:65-80).
"""

from __future__ import annotations

import struct
import sys as _sys

MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF
_MAX_SECTORS = 1 << 20  # 512 MiB of 512-byte sectors — chain walk cap


class CfbError(ValueError):
    pass


class Entry:
    __slots__ = ("name", "kind", "start", "size", "clsid", "path")

    def __init__(self, name: str, kind: int, start: int, size: int,
                 clsid: bytes, path: tuple[str, ...]):
        self.name = name
        self.kind = kind          # 1=storage, 2=stream, 5=root
        self.start = start
        self.size = size
        self.clsid = clsid
        self.path = path          # ancestor storage names, excl. root


class CfbFile:
    """Parsed compound file: ``entries`` in tree order and
    ``read(entry) -> bytes``."""

    def __init__(self, data: bytes):
        if len(data) < 512 or not data.startswith(MAGIC):
            raise CfbError("not a compound file")
        self.data = data
        (sector_shift, mini_shift) = struct.unpack_from("<HH", data, 30)
        if sector_shift not in (9, 12) or mini_shift != 6:
            raise CfbError(f"bad sector shifts {sector_shift}/{mini_shift}")
        self.sec = 1 << sector_shift
        self.minisec = 1 << mini_shift
        (self.n_fat,) = struct.unpack_from("<I", data, 44)
        (self.first_dir,) = struct.unpack_from("<I", data, 48)
        (self.cutoff,) = struct.unpack_from("<I", data, 56)
        (self.first_minifat, self.n_minifat,
         self.first_difat, self.n_difat) = struct.unpack_from("<IIII",
                                                              data, 60)
        self.fat = self._load_fat()
        self.entries: list[Entry] = []
        self._dir_raw = self._read_chain(self.first_dir)
        self._load_directory()
        root = self.entries[0] if self.entries else None
        self._ministream = (self._read_chain(root.start)[:root.size]
                            if root is not None else b"")
        self.minifat = self._load_minifat()

    # ----------------------------------------------------------- sectors --

    def _sector(self, n: int) -> bytes:
        off = self.sec * (n + 1)
        return self.data[off:off + self.sec]

    def _load_fat(self) -> list[int]:
        # FAT sector numbers: 109 DIFAT slots in the header, then DIFAT
        # sectors (each holds sec/4 - 1 slots + next-DIFAT pointer)
        slots = list(struct.unpack_from("<109I", self.data, 76))
        nxt, seen = self.first_difat, 0
        while nxt not in (_ENDOFCHAIN, _FREESECT) and seen < 4096:
            raw = self._sector(nxt)
            vals = struct.unpack(f"<{self.sec // 4}I", raw)
            slots.extend(vals[:-1])
            nxt = vals[-1]
            seen += 1
        # array('I'), not a list of boxed ints: the FAT of a 100 MB
        # file is ~800 KB of u32s — a Python list would hold ~28
        # bytes/entry and this loads on BOTH the detect (refine_ole2)
        # and extract passes of every OLE2 document
        import array
        fat = array.array("I")
        for s in slots[:self.n_fat]:
            if s in (_ENDOFCHAIN, _FREESECT):
                continue
            fat.frombytes(self._sector(s))
        if _sys.byteorder == "big":  # CFB is little-endian on disk
            fat.byteswap()
        return fat

    def _read_chain(self, start: int) -> bytes:
        out, cur, steps = [], start, 0
        while cur not in (_ENDOFCHAIN, _FREESECT) and steps < _MAX_SECTORS:
            out.append(self._sector(cur))
            cur = self.fat[cur] if cur < len(self.fat) else _ENDOFCHAIN
            steps += 1
        return b"".join(out)

    def _load_minifat(self) -> list[int]:
        raw = self._read_chain(self.first_minifat) \
            if self.first_minifat not in (_ENDOFCHAIN, _FREESECT) else b""
        n = len(raw) // 4
        return list(struct.unpack(f"<{n}I", raw[:n * 4])) if n else []

    # --------------------------------------------------------- directory --

    def _load_directory(self):
        raw = self._dir_raw
        n = len(raw) // 128
        parsed = []
        for i in range(n):
            e = raw[i * 128:(i + 1) * 128]
            (namelen,) = struct.unpack_from("<H", e, 64)
            namelen = min(namelen, 64)
            name = e[:max(0, namelen - 2)].decode("utf-16-le", "replace")
            kind = e[66]
            left, right, child = struct.unpack_from("<III", e, 68)
            clsid = e[80:96]
            (start,) = struct.unpack_from("<I", e, 116)
            (size,) = struct.unpack_from("<Q", e, 120)
            if self.sec == 512:
                size &= 0xFFFFFFFF  # v3 writers may leave garbage high bits
            parsed.append((name, kind, left, right, child, clsid,
                           start, size))
        self._parsed_dir = parsed
        if not parsed:
            raise CfbError("empty directory")
        root = parsed[0]
        self.entries.append(Entry(root[0], root[1], root[6], root[7],
                                  root[5], ()))
        self._walk(root[4], (), set())

    def _walk(self, idx: int, path: tuple[str, ...], seen: set[int]):
        if idx == _FREESECT or idx >= len(self._parsed_dir) or idx in seen:
            return
        seen.add(idx)
        name, kind, left, right, child, clsid, start, size = \
            self._parsed_dir[idx]
        self._walk(left, path, seen)
        if kind in (1, 2):
            self.entries.append(Entry(name, kind, start, size, clsid, path))
        if kind == 1 and child != _FREESECT:
            # share `seen`: each directory index is visited at most
            # once globally, so cross-storage cycles (A's tree ->
            # B's tree -> A) terminate instead of recursing unbounded
            self._walk(child, path + (name,), seen)
        self._walk(right, path, seen)

    # ------------------------------------------------------------ access --

    def read(self, entry: Entry) -> bytes:
        if entry.kind == 5:
            return self._ministream
        if entry.size < self.cutoff:
            out, cur, steps = [], entry.start, 0
            while cur not in (_ENDOFCHAIN, _FREESECT) and \
                    steps < _MAX_SECTORS:
                off = cur * self.minisec
                out.append(self._ministream[off:off + self.minisec])
                cur = self.minifat[cur] if cur < len(self.minifat) \
                    else _ENDOFCHAIN
                steps += 1
            return b"".join(out)[:entry.size]
        return self._read_chain(entry.start)[:entry.size]

    def stream(self, name: str, path: tuple[str, ...] = ()) -> bytes | None:
        for e in self.entries:
            if e.kind == 2 and e.name == name and e.path == path:
                return self.read(e)
        return None

    def top_level_names(self) -> set[str]:
        return {e.name for e in self.entries if e.path == () and e.kind != 5}
