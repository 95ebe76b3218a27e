"""Multimodal column plumbing (SURVEY §2.O): image/audio/video as opaque
``binary`` columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

The decode step itself is STUBBED — image/audio codecs are not in this
container — behind ``decode_image``; everything Spark-side (schema,
batch iteration, partitioning, UDF signatures) is real and tested.
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


def decode_image(payload: bytes) -> "object":
    """Decode an image payload to pixels. STUB: codec libraries are not
    available in this environment."""
    raise NotImplementedError(
        "image decode requires a codec library not present in this container"
    )


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
    visit the driver; output width is declared in the schema so the
    downstream feature pipeline can rely on it."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": width,
                    "height": height,
                    "pixels": pdf["payload"].map(
                        lambda p: fake_resize(bytes(p), width, height)
                    ),
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
