"""Deterministic SQLite and DBF fixture builders.

``make_sqlite`` serializes an in-memory database built from the given
tables — the SQLite file format has no timestamps or randomness, so
identical inputs yield identical bytes (asserted in tests, which is
what lets driver oracles hash the parse output).
"""

from __future__ import annotations

import sqlite3
import struct


def make_sqlite(tables: list[tuple[str, list[str], list[tuple]]]) -> bytes:
    """Build a SQLite file: [(table, columns, rows), ...] in order."""
    conn = sqlite3.connect(":memory:")
    try:
        for name, cols, rows in tables:
            qn = '"' + name.replace('"', '""') + '"'
            conn.execute(f"CREATE TABLE {qn} ({', '.join(cols)})")
            if rows:
                ph = ", ".join("?" * len(rows[0]))
                conn.executemany(f"INSERT INTO {qn} VALUES ({ph})", rows)
        conn.commit()
        return bytes(conn.serialize())
    finally:
        conn.close()


def make_dbf(fields: list[tuple[str, str, int]],
             rows: list[tuple], deleted: set[int] = frozenset()) -> bytes:
    """Build a dBase III .dbf: fields = [(name, type, length)], rows
    of str-able values (left-padded per dBase numeric convention for
    'N', right-padded otherwise). ``deleted`` marks record indices
    flagged with '*'."""
    n_fields = len(fields)
    header_size = 32 + 32 * n_fields + 1
    record_size = 1 + sum(f[2] for f in fields)
    out = bytearray()
    out += bytes([0x03, 99, 1, 1])                   # version, Y-M-D stamp
    out += struct.pack("<I", len(rows))
    out += struct.pack("<HH", header_size, record_size)
    out += bytes(20)
    for name, ftype, flen in fields:
        fd = bytearray(32)
        fd[0:11] = name.encode("ascii")[:10].ljust(11, b"\x00")
        fd[11] = ord(ftype)
        fd[16] = flen
        out += fd
    out += b"\x0d"
    for i, row in enumerate(rows):
        out += b"*" if i in deleted else b" "
        for (name, ftype, flen), v in zip(fields, row):
            s = str(v).encode("latin-1", "replace")[:flen]
            out += s.rjust(flen) if ftype == "N" else s.ljust(flen)
    out += b"\x1a"
    return bytes(out)
