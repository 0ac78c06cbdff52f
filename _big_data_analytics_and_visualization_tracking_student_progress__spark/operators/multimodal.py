"""Multimodal column plumbing: opaque `binary` payload columns with typed
metadata, decoded / feature-extracted via Arrow-batched `mapInPandas`.

Decode comes in two tiers: `decode_bmp`/`real_decode` is a REAL
stdlib-only 24-bit BMP parser (magic, pixel-array offset, DIB dims,
4-byte-padded stride walk — `encode_bmp` builds spec-conformant files
any viewer opens), exercised end-to-end by the oracle-checked
`multimodal_decode` query; `decode_stub` keeps a deterministic fake for
formats whose libraries (PIL/torchaudio/ffmpeg) are not in this
container — a production deployment swaps the fake for the real library
without touching any plan code, exactly as `decode_bmp` demonstrates.

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


def encode_bmp(width: int, height: int) -> bytes:
    """Build a real, spec-conformant 24-bit uncompressed BMP
    (BITMAPFILEHEADER + BITMAPINFOHEADER + bottom-up BGR rows padded to
    4-byte stride) whose pixel bytes are a pure function of the stored
    pixel index i: (B,G,R) = (i%256, (2i)%256, (3i)%256).  Stdlib-only
    (struct); any external image viewer opens the output.  The
    index-only pixel rule keeps the decoded checksum closed-form for
    the DuckDB oracle while the bytes still exercise a real container
    format (magic, offsets, stride padding)."""
    import struct

    stride = (width * 3 + 3) & ~3
    pixel_bytes = bytearray()
    for r in range(height):  # stored rows, bottom-up per BI_RGB
        row = bytearray()
        for x in range(width):
            i = r * width + x
            row += bytes(((i % 256), (2 * i) % 256, (3 * i) % 256))
        row += b"\x00" * (stride - len(row))
        pixel_bytes += row
    offset = 14 + 40
    size = offset + len(pixel_bytes)
    file_header = struct.pack("<2sIHHI", b"BM", size, 0, 0, offset)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_bytes),
        2835, 2835, 0, 0,
    )
    return bytes(file_header + dib + pixel_bytes)


def real_decode(payload: bytes) -> tuple[int, int, int]:
    """REAL stdlib BMP decoder (closes the former NotImplementedError
    stub): parses the 'BM' magic, pixel-array offset, BITMAPINFOHEADER
    dims/bpp/compression, walks rows at the 4-byte-padded stride
    (handling top-down negative-height images), and returns
    (width, height, pixel_sum) where pixel_sum is the sum of all pixel
    bytes excluding padding.  Only 24-bit BI_RGB is supported — other
    media still need PIL/torchaudio/ffmpeg and should be wired into
    the same mapInPandas shape."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    n_rows = abs(height)
    stride = (width * 3 + 3) & ~3
    # bounds-check BEFORE slicing: out-of-range slices silently return
    # partial data, which would yield a quietly-wrong pixel_sum on a
    # truncated or corrupt payload (ADVICE r5)
    if width <= 0:
        raise ValueError(f"invalid BMP width {width}")
    need = offset + n_rows * stride
    if offset < 54 or need > len(payload):
        raise ValueError(
            f"truncated BMP: needs {need} bytes "
            f"(offset {offset} + {n_rows} rows × stride {stride}), "
            f"payload has {len(payload)}"
        )
    total = 0
    for r in range(n_rows):
        lo = offset + r * stride
        total += sum(payload[lo : lo + width * 3])
    return (width, n_rows, total)


def encode_png(width: int, height: int) -> bytes:
    """Build a real 8-bit grayscale PNG (signature, IHDR, one zlib IDAT
    with filter-type-0 scanlines, IEND — all CRC-correct) whose pixel
    bytes follow the same index rule as `encode_bmp`'s blue channel:
    pixel i = i % 256.  Stdlib-only (struct + zlib + binascii)."""
    import binascii
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        crc = binascii.crc32(tag + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = bytearray()
    for r in range(height):
        raw.append(0)  # filter type None per scanline
        raw += bytes((r * width + x) % 256 for x in range(width))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 9))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> tuple[int, int, int]:
    """REAL stdlib PNG decoder for the grayscale/filter-0 profile
    `encode_png` emits: verifies the signature, walks chunks (validating
    each CRC), inflates the concatenated IDAT stream with zlib, applies
    per-scanline filter types (None/Sub/Up supported), and returns
    (width, height, pixel_sum)."""
    import binascii
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, width, height, bit_depth, color_type = 8, None, None, None, None
    idat = bytearray()
    while pos < len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if binascii.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, bit_depth, color_type = struct.unpack_from(
                ">IIBB", body
            )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None or (bit_depth, color_type) != (8, 0):
        raise ValueError(
            f"unsupported PNG: depth={bit_depth} color_type={color_type}"
        )
    raw = zlib.decompress(bytes(idat))
    stride = width  # 1 byte/pixel grayscale
    total = 0
    prev = bytes(stride)
    for r in range(height):
        lo = r * (stride + 1)
        ftype, line = raw[lo], bytearray(raw[lo + 1 : lo + 1 + stride])
        if ftype == 1:  # Sub
            for x in range(1, stride):
                line[x] = (line[x] + line[x - 1]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unsupported PNG filter type {ftype}")
        total += sum(line)
        prev = bytes(line)
    return (width, height, total)


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


DECODED_BMP_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_pixels", LongType()),
        StructField("pixel_sum", LongType()),
    ]
)


def encode_bmp_media(media: DataFrame) -> DataFrame:
    """1→1 payload transform: replace each opaque payload with a real
    24-bit BMP whose dimensions derive deterministically from the
    payload size (w = n%31+1, h = n%17+1) — the fixture-side stand-in
    for 'the object store holds actual image files'.  Same
    self-contained-closure rule as decode_stub (executors never import
    this package)."""

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import pandas as _pd

        def bmp(width: int, height: int) -> bytes:
            # keep in sync with encode_bmp above
            stride = (width * 3 + 3) & ~3
            px = bytearray()
            for r in range(height):
                row = bytearray()
                for x in range(width):
                    i = r * width + x
                    row += bytes(((i % 256), (2 * i) % 256, (3 * i) % 256))
                row += b"\x00" * (stride - len(row))
                px += row
            offset = 14 + 40
            fh = _struct.pack("<2sIHHI", b"BM", offset + len(px), 0, 0, offset)
            dib = _struct.pack(
                "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(px),
                2835, 2835, 0, 0,
            )
            return bytes(fh + dib + px)

        for pdf in batches:
            out = pdf["n_bytes"].map(lambda n: bmp(n % 31 + 1, n % 17 + 1))
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "image/bmp",
                    "payload": out,
                    "n_bytes": out.map(len),
                }
            )

    return media.mapInPandas(_encode, MEDIA_SCHEMA)


def encode_png_media(media: DataFrame) -> DataFrame:
    """1→1 payload transform: replace each opaque payload with a real
    8-bit grayscale PNG (dims derive from payload size: w = n%29+1,
    h = n%13+1).  Self-contained closure, same rule as decode_stub."""

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import binascii as _ba
        import struct as _struct
        import zlib as _zlib

        import pandas as _pd

        def chunk(tag: bytes, body: bytes) -> bytes:
            crc = _ba.crc32(tag + body) & 0xFFFFFFFF
            return (
                _struct.pack(">I", len(body)) + tag + body
                + _struct.pack(">I", crc)
            )

        def png(width: int, height: int) -> bytes:
            # keep in sync with encode_png above
            ihdr = _struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
            raw = bytearray()
            for r in range(height):
                raw.append(0)
                raw += bytes((r * width + x) % 256 for x in range(width))
            return (
                b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", _zlib.compress(bytes(raw), 9))
                + chunk(b"IEND", b"")
            )

        for pdf in batches:
            out = pdf["n_bytes"].map(lambda n: png(n % 29 + 1, n % 13 + 1))
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "image/png",
                    "payload": out,
                    "n_bytes": out.map(len),
                }
            )

    return media.mapInPandas(_encode, MEDIA_SCHEMA)


def decode_png_media(media: DataFrame) -> DataFrame:
    """REAL PNG decode over the Arrow batch pipeline: chunk walk with
    CRC validation, zlib inflate, scanline unfilter — the inflate step
    makes this the 'decode is genuinely CPU work' profile (BMP is pure
    header+walk), which is exactly what you'd scale out with
    mapInPandas at 100 TB."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import binascii as _ba
        import struct as _struct
        import zlib as _zlib

        import pandas as _pd

        def parse(payload: bytes) -> tuple[int, int, int]:
            # keep in sync with decode_png above
            if payload[:8] != b"\x89PNG\r\n\x1a\n":
                raise ValueError("not a PNG payload")
            pos, width, height, depth, ctype = 8, None, None, None, None
            idat = bytearray()
            while pos < len(payload):
                (length,) = _struct.unpack_from(">I", payload, pos)
                tag = payload[pos + 4 : pos + 8]
                body = payload[pos + 8 : pos + 8 + length]
                (crc,) = _struct.unpack_from(">I", payload, pos + 8 + length)
                if _ba.crc32(tag + body) & 0xFFFFFFFF != crc:
                    raise ValueError(f"bad CRC in {tag!r} chunk")
                if tag == b"IHDR":
                    width, height, depth, ctype = _struct.unpack_from(
                        ">IIBB", body
                    )
                elif tag == b"IDAT":
                    idat += body
                elif tag == b"IEND":
                    break
                pos += 12 + length
            if width is None or (depth, ctype) != (8, 0):
                raise ValueError(f"unsupported PNG: {depth}/{ctype}")
            raw = _zlib.decompress(bytes(idat))
            total, prev = 0, bytes(width)
            for r in range(height):
                lo = r * (width + 1)
                ftype = raw[lo]
                line = bytearray(raw[lo + 1 : lo + 1 + width])
                if ftype == 1:
                    for x in range(1, width):
                        line[x] = (line[x] + line[x - 1]) & 0xFF
                elif ftype == 2:
                    for x in range(width):
                        line[x] = (line[x] + prev[x]) & 0xFF
                elif ftype != 0:
                    raise ValueError(f"unsupported PNG filter {ftype}")
                total += sum(line)
                prev = bytes(line)
            return (width, height, total)

        for pdf in batches:
            dims = pdf["payload"].map(parse)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": dims.map(lambda d: d[0]),
                    "height": dims.map(lambda d: d[1]),
                    "n_pixels": dims.map(lambda d: d[0] * d[1]),
                    "pixel_sum": dims.map(lambda d: d[2]),
                }
            )

    return media.mapInPandas(_decode, DECODED_BMP_SCHEMA)


def decode_bmp(media: DataFrame) -> DataFrame:
    """REAL decode over the Arrow batch pipeline: mapInPandas streams
    payload batches through the stdlib BMP parser (magic, pixel offset,
    dims, stride walk) and emits typed metadata + a pixel checksum.
    This is the production decode shape with an actual format behind
    it — swapping the inner parser for PIL/ffmpeg touches no plan
    code."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import pandas as _pd

        def parse(payload: bytes) -> tuple[int, int, int]:
            # keep in sync with real_decode above
            if payload[:2] != b"BM":
                raise ValueError("not a BMP payload")
            offset = _struct.unpack_from("<I", payload, 10)[0]
            width, height = _struct.unpack_from("<ii", payload, 18)
            bpp = _struct.unpack_from("<H", payload, 28)[0]
            comp = _struct.unpack_from("<I", payload, 30)[0]
            if bpp != 24 or comp != 0:
                raise ValueError(f"unsupported BMP: bpp={bpp} comp={comp}")
            n_rows = abs(height)
            stride = (width * 3 + 3) & ~3
            total = 0
            for r in range(n_rows):
                lo = offset + r * stride
                total += sum(payload[lo : lo + width * 3])
            return (width, n_rows, total)

        for pdf in batches:
            dims = pdf["payload"].map(parse)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": dims.map(lambda d: d[0]),
                    "height": dims.map(lambda d: d[1]),
                    "n_pixels": dims.map(lambda d: d[0] * d[1]),
                    "pixel_sum": dims.map(lambda d: d[2]),
                }
            )

    return media.mapInPandas(_decode, DECODED_BMP_SCHEMA)


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
