"""Real pixel decode for the multimodal tier: PNG, pure zlib + numpy.

Upgrades the multimodal ``real_decode`` integration point from a stub
to a working decoder for the web's most common lossless format (no
codec library needed — PNG is DEFLATE + per-row prediction filters,
RFC 2083): 8-bit grayscale / gray+alpha / RGB / RGBA / palette,
non-interlaced. Everything else (JPEG/video/audio PCM) remains behind
the clearly-marked NotImplementedError hook in
:mod:`tika_spark.analysis.multimodal`.

On top of the decoder sit the training-pipeline image ops:
per-channel statistics in exact micro-units (integer pixel sums are
order-independent, so the distributed outputs are hash-checkable) and
deterministic block-average / nearest-neighbor resize. The Spark
operator follows the extraction job's contract: binary column enters
Python once per Arrow batch, never returns, corrupt payloads become
status rows.

Scale: decode is per-row CPU work with no shuffle — the operator is
embarrassingly parallel and the output is a few numbers per image, so
a 100 TB image corpus is bounded by scan + decode CPU, exactly like
the text-extraction map.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

PIXEL_STATS_SCHEMA = ("id long, width int, height int, n_channels int, "
                      "mean_micro array<long>, status string")


def decode_png(data: bytes) -> np.ndarray:
    """PNG → uint8 array of shape (h, w, channels).

    Supports bit depth 8, color types 0/2/3/4/6, non-interlaced
    (palette expands to RGB). All five row filters implemented:
    None/Up are vectorized, Sub is a per-lane cumulative sum mod 256,
    Average/Paeth run the spec's sequential recurrences. Raises
    ValueError for anything else — callers surface a status row.
    """
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    ihdr = None
    plte = None
    idat: list[bytes] = []
    n = len(data)
    while pos + 8 <= n:
        (ln,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or len(ihdr) < 13:
        raise ValueError("missing IHDR")
    w, h, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr[:13])
    if depth != 8 or comp or filt or interlace or color not in _CHANNELS:
        raise ValueError(
            f"unsupported PNG (depth={depth} color={color} "
            f"interlace={interlace})")
    if not (0 < w <= 1 << 16 and 0 < h <= 1 << 16):
        raise ValueError("bad dimensions")
    channels = _CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != (stride + 1) * h:
        raise ValueError("IDAT size mismatch")
    bpp = channels
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = raw[y * (stride + 1)]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride,
                            offset=y * (stride + 1) + 1).astype(np.int64)
        if f == 0:
            rec = row
        elif f == 2:          # Up
            rec = (row + prev) % 256
        elif f == 1:          # Sub: per-lane prefix sum
            rec = row.copy()
            for lane in range(bpp):
                rec[lane::bpp] = np.cumsum(rec[lane::bpp]) % 256
        elif f == 3:          # Average
            rec = row.copy()
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + (left + prev[x]) // 2) % 256
        elif f == 4:          # Paeth
            rec = row.copy()
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
                rec[x] = (rec[x] + pr) % 256
        else:
            raise ValueError(f"bad filter {f}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    arr = out.reshape(h, w, channels)
    if color == 3:
        if plte is None or len(plte) % 3:
            raise ValueError("palette image without PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        if int(arr.max()) >= len(pal):
            raise ValueError("palette index out of range")
        arr = pal[arr[:, :, 0]]
    return arr


def png_bytes(arr: np.ndarray) -> bytes:
    """uint8 (h, w[, c]) array → PNG bytes (filter 0 rows, one IDAT).
    The deterministic fixture/sink counterpart of :func:`decode_png`
    — byte-stable for identical input arrays."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b""))


def channel_means_micro(arr: np.ndarray) -> list[int]:
    """Per-channel mean in integer micro-units: integer pixel sums are
    exact and order-independent, so the same image hashes identically
    on any engine (round-half-up on the single final division)."""
    h, w, c = arr.shape
    npx = h * w
    sums = arr.reshape(npx, c).sum(axis=0, dtype=np.int64)
    return [int((s * 1_000_000 + npx // 2) // npx) for s in sums]


def resize_image(arr: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Deterministic resize: exact block-average pooling when the
    target divides the source; nearest-neighbor (floor grid) sampling
    otherwise. Both are reproducible across partitions/retries —
    no interpolation-library variance."""
    h, w, c = arr.shape
    if h % th == 0 and w % tw == 0:
        bh, bw = h // th, w // tw
        return (arr.reshape(th, bh, tw, bw, c).astype(np.int64)
                .sum(axis=(1, 3)) // (bh * bw)).astype(np.uint8)
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    return arr[ys][:, xs]


def image_pixel_stats(df: DataFrame, id_col: str = "id",
                      payload_col: str = "payload",
                      type_col: str = "media_type") -> DataFrame:
    """mapInPandas full-decode stage: (id, payload, type) →
    per-image dimensions and exact per-channel micro-unit means.
    PNG decodes for real; other media types and corrupt payloads
    yield status rows ('unsupported' / 'error'), never task failures
    — the H1 fault-isolation contract."""
    slim = df.select(id_col, payload_col, type_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload, mt in zip(pdf[id_col], pdf[payload_col],
                                      pdf[type_col]):
                row = {"id": i, "width": 0, "height": 0,
                       "n_channels": 0, "mean_micro": [],
                       "status": "unsupported"}
                if (mt or "") == "image/png":
                    try:
                        arr = decode_png(bytes(payload or b""))
                        row.update(width=arr.shape[1],
                                   height=arr.shape[0],
                                   n_channels=arr.shape[2],
                                   mean_micro=channel_means_micro(arr),
                                   status="ok")
                    except Exception:
                        row["status"] = "error"
                rows.append(row)
            yield pd.DataFrame(rows)

    return slim.mapInPandas(run, schema=PIXEL_STATS_SCHEMA)
