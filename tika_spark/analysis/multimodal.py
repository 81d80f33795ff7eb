"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride the same pages table as HTML does — an opaque
``binary`` column plus typed metadata columns — and are processed by
``mapInPandas`` stages exactly like the extraction job (one Arrow pass,
binary never re-shuffled, errors become status rows).

The actual codec work (PIL/ffmpeg-class decode) is NOT available in
this environment; ``decode_payload`` is therefore a deterministic fake
keyed only on payload bytes (documented below), and ``real_decode`` is
the clearly-marked integration point that raises NotImplementedError.
Everything Spark-side — schema, batching, partitioning, UDF signature,
error rows — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MEDIA_META_SCHEMA = ("id long, media_type string, n_bytes long, "
                     "width int, height int, duration_ms int, "
                     "status string")


def real_decode(payload: bytes, media_type: str):
    """Integration point for a real codec (PIL.Image.open /
    soundfile / pyav). Not available in this container."""
    raise NotImplementedError(
        "codec libraries are not installed in this environment; "
        "decode_payload uses the deterministic fake below")


def fake_decode(payload: bytes, media_type: str) -> dict:
    """Deterministic stand-in for decode: metadata derived purely from
    payload length + first bytes, so tests/oracles can pin it.

    width  = 16 + n % 624        height = 16 + (n * 7) % 464
    duration_ms = n (audio/video) else 0
    """
    n = len(payload)
    return {
        "n_bytes": n,
        "width": 16 + n % 624,
        "height": 16 + (n * 7) % 464,
        "duration_ms": n if media_type.split("/")[0] in
        ("audio", "video") else 0,
    }


def decode_media(df: DataFrame, id_col: str = "id",
                 payload_col: str = "payload",
                 type_col: str = "media_type") -> DataFrame:
    """mapInPandas media-metadata stage.

    Same scale contract as the extraction job: the binary column enters
    Python once per batch and is absent from the output schema; a
    corrupt payload yields a status='error' row, never a task failure.
    """
    cols = [id_col, payload_col, type_col]
    slim = df.select(*cols)  # prune before the Python stage

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload, mt in zip(pdf[id_col], pdf[payload_col],
                                      pdf[type_col]):
                try:
                    meta = fake_decode(bytes(payload or b""), mt or "")
                    rows.append({"id": i, "media_type": mt,
                                 **meta, "status": "ok"})
                except Exception:
                    rows.append({"id": i, "media_type": mt, "n_bytes": 0,
                                 "width": 0, "height": 0,
                                 "duration_ms": 0, "status": "error"})
            yield pd.DataFrame(rows)

    return slim.mapInPandas(run, schema=MEDIA_META_SCHEMA)
