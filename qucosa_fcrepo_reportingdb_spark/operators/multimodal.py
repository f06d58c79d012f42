"""Multimodal column handling: opaque binary payloads with typed metadata,
decode / feature-extract / frame-sample as Arrow-batched pandas UDFs.

The container has no image/audio codecs, so the DECODE step is a
deterministic stub (documented below); everything around it — binary
column schema, mapInPandas batch shape, metadata struct, partition-local
processing — is the real production plumbing. Swapping `_decode_stub` for
PIL/librosa/ffmpeg is a one-function change (see `decode_image`, which
raises NotImplementedError until a codec is present).

Scale design: decode is scan-local mapInPandas (no shuffle); Arrow moves
the binary batches; per-partition batch size is bounded by
spark.sql.execution.arrow.maxRecordsPerBatch. Frame sampling explodes k
rows per asset — k is bounded, so output is O(k * assets).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qucosa_fcrepo_reportingdb_spark.plans.common import fan_out, t

CHECKSUM_MOD = 997
FRAME_STRIDE = 64  # pseudo "frame" every 64 bytes


def attach_binary(docs: DataFrame) -> DataFrame:
    """Model an asset table: binary payload column + typed metadata struct.
    (Here the payload is the utf-8 text encoding; in production it is the
    image/audio/video blob read by a binaryFile scan.)"""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode(F.col("text"), "utf-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.encode(F.col("text"), "utf-8")).alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(content: bytes):
    """Real decode path — requires an image codec, absent in this
    environment. The pipeline gates on it with try/except so the stub is
    used instead."""
    raise NotImplementedError(
        "no image codec in this environment; production swaps in "
        "PIL.Image.open(io.BytesIO(content))")


def _decode_stub(content: bytes) -> tuple[int, int, int]:
    """Deterministic fake 'decode': (n_bytes, first_byte, checksum).
    Stands in for width/height/channel extraction."""
    if content is None or len(content) == 0:
        return (0, -1, 0)
    return (len(content), content[0], sum(content) % CHECKSUM_MOD)


def decode_features(assets: DataFrame) -> DataFrame:
    """mapInPandas decode: one Arrow batch in, metadata columns out.
    Partition-local, no shuffle."""
    schema = ("asset_id long, n_bytes int, first_byte int, checksum int, "
              "decoder string")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_stub(c) for c in pdf["content"]]
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "n_bytes": [f[0] for f in feats],
                "first_byte": [f[1] for f in feats],
                "checksum": [f[2] for f in feats],
                "decoder": "stub",
            })

    return assets.mapInPandas(run, schema=schema)


def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary plumbing end-to-end: attach binary -> Arrow-batched decode ->
    typed features. Oracle recomputes the stub arithmetic from the text
    (ASCII corpus: bytes == code points)."""
    docs = fan_out(t(spark, sf_dir, "documents"), "doc_id")
    # no orderBy: a global sort would re-run the decode UDF for range-
    # partition sampling, and the correctness compare is order-insensitive
    return decode_features(attach_binary(docs))


DECODE_STATS_SQL = f"""
SELECT doc_id AS asset_id,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       CAST(unicode(substr(text, 1, 1)) AS INT) AS first_byte,
       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(range(1, length(text) + 1),
                           i -> CAST(unicode(substr(text, i, 1)) AS BIGINT))),
            (acc, x) -> acc + x) % {CHECKSUM_MOD} AS INT) AS checksum,
       'stub' AS decoder
FROM documents
ORDER BY asset_id
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plumbing: k pseudo-frames per asset at fixed byte
    stride (production: video frame timestamps). Pure expression explode —
    deterministic, oracle-checkable, O(k) rows per asset."""
    docs = t(spark, sf_dir, "documents")
    assets = attach_binary(docs)
    return (
        assets.select(
            "asset_id",
            F.col("meta.n_bytes").alias("n_bytes"),
            F.posexplode(
                F.expr(f"sequence(0, CAST((meta.n_bytes - 1) "
                       f"DIV {FRAME_STRIDE} AS INT))")
            ).alias("frame_idx", "stride_no"),
        )
        .select(
            "asset_id",
            "frame_idx",
            (F.col("frame_idx") * FRAME_STRIDE).alias("byte_offset"),
            "n_bytes",
        )
        .orderBy("asset_id", "frame_idx")
    )


FRAME_SAMPLE_SQL = f"""
SELECT doc_id AS asset_id,
       CAST(u.i AS INT) AS frame_idx,
       CAST(u.i * {FRAME_STRIDE} AS INT) AS byte_offset,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes
FROM documents,
     LATERAL (SELECT unnest(range(0,
        CAST(floor((octet_length(encode(text)) - 1) / {FRAME_STRIDE})
             AS BIGINT) + 1)) AS i) u
ORDER BY asset_id, frame_idx
"""


QUERIES = {
    "multimodal_decode_stats": multimodal_decode_stats,
    "multimodal_frame_sample": multimodal_frame_sample,
}

ORACLES = {
    "multimodal_decode_stats": DECODE_STATS_SQL,
    "multimodal_frame_sample": FRAME_SAMPLE_SQL,
}
