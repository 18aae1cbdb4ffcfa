"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, decoded/feature-extracted through Arrow-batched pandas UDFs.

The container has no image/audio libraries, so REAL decoding is stubbed
behind ``decode_media_real`` (import-gated, raises NotImplementedError with a
clear marker). Everything Spark-side is real and tested: the binary column
type, the manifest schema, the mapInPandas batch shape (bytes in → features
out), and partitioning. The fake "decode" is deterministic arithmetic on the
payload bytes, which is what makes a value-exact DuckDB oracle possible even
for the UDF path (the oracle recomputes the same bytes from md5 hex).

Scale shape: payloads ride the scan as a binary column (parquet keeps them
out of unrelated projections); decode is mapInPandas over pruned
(media_id, payload) batches — Arrow moves the bytes zero-copy into Python;
feature extraction is embarrassingly parallel, no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from kgforge.registry import register
from kgforge.tables import load

KINDS = ("image", "audio", "video")


def decode_media_real(payload: bytes, kind: str):
    """Real decode — NOT AVAILABLE in this container (no PIL/libav).

    The Spark-side plumbing (binary transport, batch shape, schema) is
    exercised by mm_features below with a deterministic fake decode.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - no media libs in sandbox
        raise NotImplementedError(
            "media decode requires image/audio libraries not present in this "
            "environment; see mm_features for the tested fake-decode path"
        ) from e
    raise NotImplementedError("real decode path not wired in the sandbox")


def media_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media manifest derived from documents: a 16-byte binary
    payload (md5 of the text) plus kind-typed metadata."""
    docs = load(spark, sf_dir, "documents")
    kind = F.element_at(
        F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3).cast("int") + 1
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.unhex(F.md5("text")).alias("payload"),  # binary column
        F.when(F.col("doc_id") % 3 == 0, (F.col("doc_id") % 640 + 16).cast("int"))
        .otherwise(F.lit(None).cast("int"))
        .alias("width"),
        F.when(F.col("doc_id") % 3 == 0, (F.col("doc_id") % 480 + 16).cast("int"))
        .otherwise(F.lit(None).cast("int"))
        .alias("height"),
        F.when(F.col("doc_id") % 3 != 0, ((F.col("doc_id") % 300) / 10.0))
        .otherwise(F.lit(None).cast("double"))
        .alias("duration_s"),
        F.col("n_chars").alias("src_bytes"),
    )


@register(
    "mm_manifest",
    sql="""
    SELECT doc_id AS media_id,
           (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
           upper(md5(text)) AS payload_hex,
           CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id % 640 + 16 AS INT) END AS width,
           CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id % 480 + 16 AS INT) END AS height,
           CASE WHEN doc_id % 3 <> 0 THEN (doc_id % 300) / 10.0 END AS duration_s,
           n_chars AS src_bytes
    FROM documents
    """,
    doc=(
        "Typed multimodal manifest: binary payload column + kind-dependent "
        "metadata (image dims / av duration). Output hex-encodes the payload "
        "so the oracle compares bytes value-exactly."
    ),
)
def mm_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = media_manifest(spark, sf_dir)
    return m.select(
        "media_id",
        "kind",
        F.hex("payload").alias("payload_hex"),
        "width",
        "height",
        "duration_s",
        "src_bytes",
    )


FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("b0", IntegerType()),
        StructField("b1", IntegerType()),
        StructField("b2", IntegerType()),
        StructField("b3", IntegerType()),
        StructField("mean_byte", DoubleType()),
    ]
)


def extract_features(manifest: DataFrame) -> DataFrame:
    """Arrow-batched 'decode': binary payload → fixed-width feature row.

    Stands in for image-resize / audio-frame-sample: same batch shape
    (bytes in, numeric features out), deterministic so it stays testable.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(b) for b in payloads],
                    "b0": [b[0] for b in payloads],
                    "b1": [b[1] for b in payloads],
                    "b2": [b[2] for b in payloads],
                    "b3": [b[3] for b in payloads],
                    "mean_byte": [sum(b) / len(b) for b in payloads],
                }
            )

    return manifest.select("media_id", "kind", "payload").mapInPandas(
        run, FEATURES_SCHEMA
    )


_BYTE_SQL = (
    "((strpos('0123456789abcdef', substr(md5(text), {i}, 1)) - 1) * 16"
    " + strpos('0123456789abcdef', substr(md5(text), {j}, 1)) - 1)"
)


def _byte(i: int) -> str:  # byte i (0-based) of the md5 payload
    return _BYTE_SQL.format(i=2 * i + 1, j=2 * i + 2)


@register(
    "mm_features",
    sql=f"""
    SELECT doc_id AS media_id,
           (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
           16 AS n_bytes,
           CAST({_byte(0)} AS INT) AS b0,
           CAST({_byte(1)} AS INT) AS b1,
           CAST({_byte(2)} AS INT) AS b2,
           CAST({_byte(3)} AS INT) AS b3,
           ({" + ".join(_byte(i) for i in range(16))}) / 16.0 AS mean_byte
    FROM documents
    """,
    doc=(
        "mapInPandas feature extraction over the binary payload (Arrow batch "
        "transport of bytes); deterministic fake decode keeps a full oracle."
    ),
)
def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_features(media_manifest(spark, sf_dir))
