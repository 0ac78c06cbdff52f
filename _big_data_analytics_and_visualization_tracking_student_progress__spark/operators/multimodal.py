"""Multimodal column plumbing: opaque `binary` payload columns with typed
metadata, decoded / feature-extracted via Arrow-batched `mapInPandas`.

The decode itself is STUBBED (image/audio libraries are not in this
container): `decode_stub` produces a deterministic fake so the Spark-side
contract — schema, batch shape, partitioning, UDF signature — is real and
tested, and a production deployment swaps `_fake_decode` for
PIL/torchaudio/ffmpeg without touching any plan code.

Scale notes: binary payloads ride through Spark as Arrow binary columns;
`mapInPandas` streams record batches (no full-partition materialization),
so partition sizing is governed by `maxPartitionBytes` on the parquet
side exactly like any other column.  Keep payloads out of shuffles: stamp
metadata first, shuffle on metadata, fetch payloads late (the plans here
follow that pattern).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", IntegerType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Derive an opaque binary payload column (+ typed metadata) from a
    text fixture column — stands in for image/audio bytes read from an
    object store."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.lit("image/fake").alias("media_type"),
        payload.alias("payload"),
        F.length(payload).cast("int").alias("n_bytes"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a real decoder.  Production swaps this
    for PIL.Image.open / torchaudio.load etc."""
    n = len(payload)
    return (n % 640 + 1, (n * 7) % 480 + 1, n % 30 + 1)


def real_decode(payload: bytes):  # pragma: no cover - explicit stub
    """The real decoder hook — requires image/audio libs absent from this
    container."""
    raise NotImplementedError(
        "media decoding requires PIL/torchaudio/ffmpeg; wire them in here"
    )


def decode_stub(media: DataFrame) -> DataFrame:
    """Arrow-batched decode: mapInPandas over record batches, emitting
    typed metadata columns.  The batch loop is the exact shape a real
    decoder uses (payload bytes in, feature columns out).

    The closure is deliberately SELF-CONTAINED (no references to this
    module): nested functions pickle by value, so executors never need
    this package importable — required because the driver process may
    run from any working directory."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def fake(payload: bytes) -> tuple[int, int, int]:
            # keep in sync with _fake_decode above
            n = len(payload)
            return (n % 640 + 1, (n * 7) % 480 + 1, n % 30 + 1)

        for pdf in batches:
            dims = pdf["payload"].map(fake)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "width": dims.map(lambda d: d[0]),
                    "height": dims.map(lambda d: d[1]),
                    "n_frames": dims.map(lambda d: d[2]),
                }
            )

    return media.mapInPandas(_decode, DECODED_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_payload", BinaryType()),
        StructField("n_bytes", IntegerType()),
    ]
)


def resize_stub(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """1→1 payload transform (the resize shape): bytes in, bytes out,
    metadata updated.  The stub 'resize' deterministically truncates/pads
    the payload to width×height bytes; production swaps the inner
    function for PIL resize + re-encode without touching the plan."""
    target = width * height

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def fake(payload: bytes) -> bytes:
            return payload[:target].ljust(target, b"\x00")

        for pdf in batches:
            out = pdf["payload"].map(fake)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload": out,
                    "n_bytes": out.map(len),
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(_resize, RESIZED_SCHEMA)


def frame_sample_stub(media: DataFrame, every_n_bytes: int = 256) -> DataFrame:
    """1→N expansion (the video frame-sampling shape): each payload emits
    one row per sampled 'frame' (here: every_n_bytes chunk).  mapInPandas
    is the right surface because the output row count per input row is
    data-dependent — no exploding array materialization of all frames at
    once; batches stream out as Arrow."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for j, off in enumerate(range(0, len(payload), every_n_bytes)):
                    ids.append(doc_id)
                    idxs.append(j)
                    frames.append(payload[off : off + every_n_bytes])
            yield _pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "frame_payload": frames,
                    "n_bytes": [len(f) for f in frames],
                }
            )

    return media.mapInPandas(_sample, FRAMES_SCHEMA)
