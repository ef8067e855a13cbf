"""Multimodal column handling: image/audio/video as opaque `binary` columns
with typed metadata, processed by Arrow-batched kernels over mapInPandas.

The container has no image/audio codecs, so the DECODE step is stubbed
(NotImplementedError behind `decoder=`), but everything Spark-side is real
and tested: binary schema, batch shape, partitioning, metadata extraction,
and the deterministic fake feature path used by the correctness gate.

`attach_payload` derives a deterministic 16-byte binary payload per document
(unhex(md5(text))) so the metadata kernel output has a closed-form SQL
oracle; with real data you'd read the bytes from the lake instead.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("magic", StringType()),  # first 4 bytes, lowercase hex
        StructField("width", IntegerType()),  # fake-decoded: byte 0
        StructField("height", IntegerType()),  # fake-decoded: byte 1
        StructField("checksum", LongType()),  # first 4 bytes as big-endian uint32
    ]
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload: binary) — deterministic stand-in media bytes."""
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.unhex(F.md5("text")).alias("payload"),
    )


def real_decoder(payload: bytes) -> dict:
    """Where a real image decode would go (PIL/libvips are not in this
    container). Kept as an explicit, clearly-marked stub."""
    raise NotImplementedError(
        "image/audio decoding requires codec libraries not present in this "
        "environment; wire a decoder via media_metadata(decoder=...)"
    )


def fake_decoder(payload: bytes) -> dict:
    """Deterministic fake decode: dimensions from the leading bytes."""
    return {"width": payload[0] if payload else 0, "height": payload[1] if len(payload) > 1 else 0}


def media_metadata(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decoder: Callable[[bytes], dict] = fake_decoder,
) -> DataFrame:
    """Arrow-batched metadata + (stub-)decode over a binary column.

    One mapInPandas crossing; bytes stay in Arrow buffers until the kernel
    touches them. Batch size is governed by
    spark.sql.execution.arrow.maxRecordsPerBatch — size it down for
    multi-MB media blobs (same mega-row guidance as the extraction kernel).
    """

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            ids, nb, magic, w, h, cks = [], [], [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                d = decoder(b)
                ids.append(str(doc_id))
                nb.append(len(b))
                magic.append(b[:4].hex())
                w.append(int(d.get("width", 0)))
                h.append(int(d.get("height", 0)))
                cks.append(int.from_bytes(b[:4], "big") if len(b) >= 4 else 0)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_bytes": pd.array(nb, dtype="int32"),
                    "magic": magic,
                    "width": pd.array(w, dtype="int32"),
                    "height": pd.array(h, dtype="int32"),
                    "checksum": pd.array(cks, dtype="int64"),
                }
            )

    return df.mapInPandas(kernel, schema=MEDIA_META_SCHEMA)
