"""Video columns: MJPEG-in-AVI container parse + frame sampling.

The training-data-pipeline video tier: videos ride the pages/media
table as opaque ``binary`` payloads; a ``mapInPandas`` stage parses
the container, samples frames at deterministic indices, and decodes
each sampled frame with the from-scratch baseline JPEG decoder
(:mod:`tika_spark.analysis.jpegcodec`) — one Arrow pass, one output
row per sampled frame, errors as status rows (H1 fault isolation).

MJPEG (Motion JPEG) is the one mainstream video codec whose frames
are plain JPEG images, so the full pipeline — container demux, frame
selection, pixel decode, per-frame stats — runs with zero external
codec libraries. Inter-frame codecs (H.264 etc.) remain the
documented ``NotImplementedError`` hook in multimodal.real_decode.

Scale design: frame sampling is per-row work (no shuffle); the
binary column crosses into Python once; sampled-frame stats rows are
tiny. Giant videos follow the same size-bucket skew defusal as giant
pages (pipeline/job.py). Reference parity: the reference's video
coverage is metadata-only (video/FLVParser.java; mp4/MP4Parser.java
duration) — frame decode is the pipeline extension, not a port.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

VIDEO_FRAME_SCHEMA = ("id long, frame_idx int, n_frames int, "
                      "width int, height int, mean_micro array<int>, "
                      "status string")


# ------------------------------------------------------------ AVI container

def avi_mjpeg_bytes(frames: list[bytes], width: int, height: int,
                    fps: int = 25) -> bytes:
    """Minimal-but-valid AVI RIFF wrapper around pre-encoded JPEG
    frames (fixture builder): hdrl (avih + one 'vids'/'MJPG' strl),
    movi with one '00dc' chunk per frame, idx1 index."""
    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    n = len(frames)
    max_bytes = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // max(fps, 1),  # us per frame
        max_bytes * fps,           # max bytes/sec
        0, 0x10,                   # padding, flags (HASINDEX)
        n, 0, 1, max_bytes,        # frames, initial, streams, bufsize
        width, height, 0, 0, 0, 0)
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"MJPG", 0, 0, 0, 0,
        1, fps,                    # scale, rate
        0, n, max_bytes, 0xFFFFFFFF, 0,
        0, 0, width, height)
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh)
                     + chunk(b"strf", strf)))
    movi_body = b"".join(chunk(b"00dc", f) for f in frames)
    movi = lst(b"movi", movi_body)
    # idx1: one entry per frame, offsets relative to 'movi' fourcc
    idx = bytearray()
    off = 4
    for f in frames:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) & 1)
    riff_body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def avi_frames(data: bytes) -> list[bytes]:
    """Demux an AVI: the compressed payload of every video chunk
    ('##dc'/'##db') inside the 'movi' list, in stream order. Raises
    ValueError for non-AVI or structurally broken files."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    out: list[bytes] = []

    def walk(pos: int, end: int, in_movi: bool):
        while pos + 8 <= end:
            fourcc = data[pos:pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            body_end = pos + 8 + size
            if body_end > end:
                raise ValueError("chunk overruns container")
            if fourcc == b"LIST":
                ltype = data[pos + 8:pos + 12]
                walk(pos + 12, body_end, in_movi or ltype == b"movi")
            elif in_movi and fourcc[2:4] in (b"dc", b"db"):
                out.append(data[pos + 8:body_end])
            pos = body_end + (size & 1)

    # clamp to the actual buffer: a declared RIFF size larger than
    # the payload must surface as a clean ValueError, not a raw
    # struct error from reading past the end
    walk(12, min(8 + struct.unpack_from("<I", data, 4)[0], len(data)),
         False)
    return out


# -------------------------------------------------------------- operator

def _demux(payload: bytes):
    """(kind, frames): 'jpeg' + compressed frames for MJPEG AVI,
    'raw' + composited RGB arrays for animated GIF."""
    if payload[:4] == b"RIFF":
        return "jpeg", avi_frames(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from tika_spark.analysis.pixels import gif_frames
        return "raw", gif_frames(payload)
    raise ValueError("not a supported video container")


def sample_frame_stats(df: DataFrame, every: int = 2,
                       id_col: str = "id",
                       payload_col: str = "payload") -> DataFrame:
    """mapInPandas frame-sampling stage: (id, payload) → one row per
    sampled frame (indices 0, every, 2*every, …) with decoded
    dimensions and exact per-channel micro-unit means. Containers:
    MJPEG AVI (frames decoded through the from-scratch baseline JPEG
    decoder) and animated GIF (frames composited per the GIF89a
    disposal rules). Corrupt containers or frames yield status rows,
    never task failures."""
    from tika_spark.analysis.jpegcodec import decode_jpeg
    from tika_spark.analysis.pixels import channel_means_micro

    slim = df.select(id_col, payload_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    kind, frames = _demux(bytes(payload or b""))
                except Exception:
                    rows.append({"id": i, "frame_idx": -1,
                                 "n_frames": 0, "width": 0,
                                 "height": 0, "mean_micro": [],
                                 "status": "error"})
                    continue
                n = len(frames)
                for idx in range(0, n, max(every, 1)):
                    row = {"id": i, "frame_idx": idx, "n_frames": n,
                           "width": 0, "height": 0, "mean_micro": [],
                           "status": "error"}
                    try:
                        arr = decode_jpeg(frames[idx]) \
                            if kind == "jpeg" else frames[idx]
                        row.update(width=arr.shape[1],
                                   height=arr.shape[0],
                                   mean_micro=channel_means_micro(arr),
                                   status="ok")
                    except Exception:
                        pass
                    rows.append(row)
            yield pd.DataFrame(rows, columns=[
                "id", "frame_idx", "n_frames", "width", "height",
                "mean_micro", "status"])

    return slim.mapInPandas(run, schema=VIDEO_FRAME_SCHEMA)


def video_fixture(doc_id: int) -> bytes:
    """Deterministic video per document row: 3 + doc_id%4 solid gray
    frames (v = (doc_id*11 + 17*frame) % 256) at (16 + doc_id%8) × 8.
    Even ids: MJPEG AVI at quality 50 — frame means follow the JPEG
    DC-quantization closed form. Odd ids: animated GIF over a
    grayscale identity palette — frame means are exactly v
    (lossless). Both SQL-replayable by the oracle."""
    n = 3 + doc_id % 4
    w, h = 16 + doc_id % 8, 8
    vals = [(doc_id * 11 + 17 * f) % 256 for f in range(n)]
    if doc_id % 2 == 0:
        from tika_spark.analysis.jpegcodec import jpeg_bytes
        frames = [jpeg_bytes(np.full((h, w, 1), v, dtype=np.uint8),
                             quality=50) for v in vals]
        return avi_mjpeg_bytes(frames, w, h)
    from tika_spark.analysis.pixels import gif_anim_bytes
    pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
    return gif_anim_bytes(
        [np.full((h, w), v, dtype=np.uint8) for v in vals], pal)
