"""Multimodal column plumbing (SURVEY §2.O): image/audio/video as opaque
``binary`` columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

``decode_image`` really decodes the self-describing uncompressed
formats (BMP 24-bit, PPM P6) in pure Python — no codec library needed —
and ``resize_images`` resamples real pixel grids for those payloads,
falling back to a deterministic byte-sample for opaque media.
Compressed codecs (PNG/JPEG/audio/video) remain out of scope for this
container; the Spark-side plumbing (schema, Arrow batch iteration,
partitioning, UDF signatures) is identical for them.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

#: schema of a multimodal asset row: opaque payload + typed metadata
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.StructType(
            [
                T.StructField("byte_len", T.LongType()),
                T.StructField("checksum", T.StringType()),
            ]
        )),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def decode_image(payload: bytes) -> tuple[int, int, bytes]:
    """Decode an image payload to ``(width, height, rgb)`` — rgb is
    row-major top-down RGB24 (3 bytes/pixel).

    Pure-Python decoders for the two self-describing uncompressed
    formats (no codec library in this container, none needed):

    - **BMP** (``BM`` magic): BITMAPINFOHEADER, 24-bit, uncompressed.
      Rows are 4-byte aligned, stored bottom-up (top-down when the
      header height is negative), BGR byte order.
    - **PPM** (``P6`` magic): binary RGB, ``#`` comments allowed,
      maxval ≤ 255.

    Raises ``ValueError`` on any other payload — callers that accept
    arbitrary media fall back to opaque-bytes handling (resize_images).
    """
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    raise ValueError("unsupported image format (BMP 24-bit / PPM P6 only)")


def _decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    import struct

    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if hdr_size < 40 or planes != 1:
        raise ValueError("unsupported BMP DIB header")
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    top_down = h < 0
    h = abs(h)
    row_stride = (w * 3 + 3) & ~3  # rows padded to 4-byte boundary
    if len(payload) < data_offset + row_stride * h:
        raise ValueError("truncated BMP pixel data")
    out = bytearray(w * h * 3)
    for row in range(h):
        src_row = row if top_down else h - 1 - row
        base = data_offset + src_row * row_stride
        dst = row * w * 3
        line = payload[base : base + w * 3]
        # BGR → RGB
        out[dst : dst + w * 3 : 3] = line[2::3]
        out[dst + 1 : dst + w * 3 : 3] = line[1::3]
        out[dst + 2 : dst + w * 3 : 3] = line[0::3]
    return w, h, bytes(out)


def _decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    # header = magic + 3 whitespace-separated ints, '#' comments allowed
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("truncated PPM header")
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    rgb = payload[pos : pos + w * h * 3]
    if len(rgb) != w * h * 3:
        raise ValueError("truncated PPM pixel data")
    return w, h, rgb


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Encode row-major top-down RGB24 pixels as an uncompressed 24-bit
    BMP (the sink-side twin of :func:`decode_image`; also builds the
    in-repo decode test fixtures)."""
    import struct

    if len(rgb) != width * height * 3:
        raise ValueError("rgb length != width*height*3")
    row_stride = (width * 3 + 3) & ~3
    pad = b"\x00" * (row_stride - width * 3)
    body = bytearray()
    for row in range(height - 1, -1, -1):  # bottom-up
        line = rgb[row * width * 3 : (row + 1) * width * 3]
        bgr = bytearray(len(line))
        bgr[0::3] = line[2::3]
        bgr[1::3] = line[1::3]
        bgr[2::3] = line[0::3]
        body += bgr + pad
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(body), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + bytes(body)


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Encode RGB24 pixels as binary PPM (P6)."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length != width*height*3")
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def resize_rgb(
    img: tuple[int, int, bytes], width: int, height: int
) -> bytes:
    """Nearest-neighbour resample of decoded RGB24 pixels onto a
    width×height grid (real 2-D geometry, not byte sampling)."""
    sw, sh, rgb = img
    out = bytearray(width * height * 3)
    for y in range(height):
        sy = (y * sh) // height
        row_base = sy * sw * 3
        dst = y * width * 3
        for x in range(width):
            sx = (x * sw) // width
            src = row_base + sx * 3
            out[dst : dst + 3] = rgb[src : src + 3]
            dst += 3
    return bytes(out)


def fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a learned feature extractor: windowed
    byte-sum projection. Keeps the distributed plumbing honest (real
    bytes in, fixed-width vector out) without a codec dependency."""
    if not payload:
        return [0.0] * dim
    chunk = max(1, len(payload) // dim)
    out = []
    for i in range(dim):
        window = payload[i * chunk : (i + 1) * chunk]
        out.append(float(sum(window) % 997))
    return out


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a multimodal asset table from the documents fixture: the
    text payload re-encoded as opaque bytes + typed metadata, i.e. the
    storage shape a 100 TB image/audio lake would use (payload column
    kept out of dimension joins; metadata queryable without touching
    bytes)."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("text/plain").alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.octet_length("text").cast("long").alias("byte_len"),
            F.sha2(payload, 256).alias("checksum"),
        ).alias("meta"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("pixels", T.BinaryType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("frame_len", T.LongType()),
    ]
)


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for decode→resize: nearest-neighbour
    sample of the raw bytes onto a width×height grid (a real deployment
    swaps in `decode_image` + an interpolating resampler; the Spark
    plumbing is identical)."""
    n = width * height
    if not payload:
        return bytes(n)
    size = len(payload)
    return bytes(payload[(i * size) // n] for i in range(n))


def resize_images(
    assets: DataFrame, width: int = 16, height: int = 16
) -> DataFrame:
    """Arrow-batched decode→resize over binary payloads (mapInPandas,
    1 row in → 1 row out, fixed-size binary out). Payload bytes never
    visit the driver; output geometry is declared in the schema so the
    downstream feature pipeline can rely on it.

    Decodable payloads (BMP/PPM, see :func:`decode_image`) get a real
    2-D nearest-neighbour resample to RGB24 (``width*height*3`` bytes);
    opaque payloads fall back to the deterministic byte-sample
    (``width*height`` bytes) so the operator is total over mixed-media
    tables — the dispatch happens per row inside the Arrow batch, never
    on the driver.
    """

    def one(p) -> bytes:
        b = bytes(p)
        try:
            return resize_rgb(decode_image(b), width, height)
        except ValueError:
            return fake_resize(b, width, height)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": width,
                    "height": height,
                    "pixels": pdf["payload"].map(one),
                }
            )

    return assets.mapInPandas(batches, schema=RESIZED_SCHEMA)


def sample_frames(
    assets: DataFrame, frame_size: int = 256, every_n: int = 4
) -> DataFrame:
    """Frame sampling for video-shaped payloads: treat the payload as
    consecutive ``frame_size``-byte frames and keep every ``every_n``-th
    (mapInPandas, 1 row in → N rows out — the fan-out batch shape a real
    video decoder produces). Frame count per asset is pure arithmetic on
    byte length, so this IS DuckDB-oracle-checkable (catalog x19)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                b = bytes(p)
                n_frames = (len(b) + frame_size - 1) // frame_size
                for fi in range(0, n_frames, every_n):
                    ids.append(aid)
                    idxs.append(fi)
                    frames.append(b[fi * frame_size : (fi + 1) * frame_size])
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": pd.Series(frames, dtype=object),
                    "frame_len": pd.Series(
                        [len(f) for f in frames], dtype="int64"
                    ),
                }
            )

    return assets.mapInPandas(batches, schema=FRAME_SCHEMA)


def extract_features(assets: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    mapInPandas — the real 100 TB pattern: batches stream through
    Python, nothing collects on the driver, output schema is declared
    up front."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "byte_len": pdf["payload"].map(len),
                    "feature": pdf["payload"].map(
                        lambda p: fake_feature(bytes(p), dim)
                    ),
                }
            )

    return assets.mapInPandas(batches, schema=FEATURE_SCHEMA)
