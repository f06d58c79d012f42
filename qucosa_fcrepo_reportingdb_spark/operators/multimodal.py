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


def read_assets(spark: SparkSession, path: str,
                pattern: str = "*") -> DataFrame:
    """Production multimodal ingestion: Spark's `binaryFile` source scans a
    directory tree of opaque blobs (images/audio/video) into
    (path, modificationTime, length, content) — splits parallelize per
    file, no decode on the scan. Mapped to the asset schema used by
    decode_features: deterministic asset_id from the path (xxhash64, the
    same id any re-run derives), binary content, typed metadata struct.

    At 100 TB this is the entry point: object-store listing parallelism,
    partition-pruned by glob, decode deferred to the Arrow-batched
    mapInPandas stage."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(path)
    )
    return df.select(
        F.xxhash64("path").alias("asset_id"),
        F.col("content"),
        F.struct(
            F.col("path").alias("uri"),
            F.col("length").alias("n_bytes"),
            F.col("modificationTime").alias("modified"),
        ).alias("meta"),
    )


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


def decode_image(content: bytes) -> tuple[str, int, int, int]:
    """Real decode path: ``(format, width, height, channels)`` for the two
    formats decodable with zero dependencies — binary PPM (P6) and
    uncompressed BMP (BITMAPINFOHEADER). Compressed formats (PNG/JPEG/...)
    raise NotImplementedError — THOSE need a codec this container lacks;
    production swaps this function for PIL.Image.open. Both parsers
    validate the payload length so truncated blobs are rejected, not
    silently mis-sized."""
    import struct

    if content is None or len(content) < 2:
        raise NotImplementedError("payload too short to carry a header")
    if content[:2] == b"P6":
        # header: "P6" <ws> width <ws> height <ws> maxval <single ws>,
        # '#' comments allowed between tokens
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(content) and content[pos:pos + 1].isspace():
                pos += 1
            if content[pos:pos + 1] == b"#":
                while pos < len(content) and content[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < len(content) and not content[pos:pos + 1].isspace():
                pos += 1
            if pos == start:
                raise NotImplementedError("malformed PPM header")
            try:
                fields.append(int(content[start:pos]))
            except ValueError:
                # a text payload that merely STARTS with "P6"
                raise NotImplementedError("malformed PPM header") from None
        pos += 1  # exactly one whitespace byte after maxval
        width, height, maxval = fields
        if maxval <= 0 or maxval > 65535 or width <= 0 or height <= 0:
            raise NotImplementedError("malformed PPM header")
        bpc = 1 if maxval < 256 else 2
        if len(content) - pos < width * height * 3 * bpc:
            raise NotImplementedError("truncated PPM payload")
        return ("ppm", width, height, 3)
    if content[:2] == b"BM":
        if len(content) < 54:
            raise NotImplementedError("truncated BMP header")
        hdr_size, width, height = struct.unpack_from("<Iii", content, 14)
        planes, bpp = struct.unpack_from("<HH", content, 26)
        compression, = struct.unpack_from("<I", content, 30)
        if hdr_size < 40 or planes != 1 or compression != 0 \
                or bpp not in (8, 24, 32) or width <= 0:
            raise NotImplementedError("unsupported BMP variant")
        row_bytes = (width * bpp // 8 + 3) & ~3  # rows pad to 4 bytes
        offset, = struct.unpack_from("<I", content, 10)
        if len(content) < offset + row_bytes * abs(height):
            raise NotImplementedError("truncated BMP payload")
        return ("bmp", width, abs(height), bpp // 8)
    raise NotImplementedError(
        "no codec for this format in this environment; production swaps "
        "in PIL.Image.open(io.BytesIO(content))")


def _decode_stub(content: bytes) -> tuple[int, int, int]:
    """Deterministic fallback 'decode': (n_bytes, first_byte, checksum).
    Stands in for feature extraction on formats decode_image can't parse."""
    if content is None or len(content) == 0:
        return (0, -1, 0)
    return (len(content), content[0], sum(content) % CHECKSUM_MOD)


def decode_features(assets: DataFrame) -> DataFrame:
    """mapInPandas decode: one Arrow batch in, metadata columns out.
    Partition-local, no shuffle. PPM/BMP payloads get real dimensions
    (decoder = format name); anything else takes the deterministic stub
    path with NULL dimensions — the seam production widens per codec."""
    schema = ("asset_id long, n_bytes int, first_byte int, checksum int, "
              "decoder string, width int, height int, channels int")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for c in pdf["content"]:
                n_bytes, first_byte, checksum = _decode_stub(c)
                try:
                    fmt, w, h, ch = decode_image(c)
                except NotImplementedError:
                    fmt, w, h, ch = "stub", None, None, None
                rows.append((n_bytes, first_byte, checksum, fmt, w, h, ch))
            out = pd.DataFrame(
                rows, columns=["n_bytes", "first_byte", "checksum",
                               "decoder", "width", "height", "channels"])
            out.insert(0, "asset_id", pdf["asset_id"].to_numpy())
            yield out

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
       'stub' AS decoder,
       CAST(NULL AS INT) AS width,
       CAST(NULL AS INT) AS height,
       CAST(NULL AS INT) AS channels
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


def multimodal_real_decode_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the REAL image decoder (not the stub) under the correctness
    gate: synthesize a valid binary-PPM (P6) payload per document with
    dimensions derived arithmetically from n_chars, push the bytes through
    the same Arrow-batched mapInPandas decode as production, and roll up
    per decoded dimension. The oracle recomputes width/height/total bytes
    from the same arithmetic — any divergence in the parser (header walk,
    payload-length validation) breaks the hash.

    Scale shape: payload synthesis and decode are scan-local; one
    map-side-combinable aggregation on the (small) dims key space."""
    docs = fan_out(t(spark, sf_dir, "documents"), "doc_id")
    w = (F.col("n_chars") % 31 + 1).cast("int")
    h = (F.col("n_chars") % 17 + 1).cast("int")
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode(
            F.concat(F.lit("P6\n"),
                     w.cast("string"), F.lit(" "), h.cast("string"),
                     F.lit("\n255\n"),
                     F.expr("repeat('x', CAST((n_chars % 31 + 1) * "
                            "(n_chars % 17 + 1) * 3 AS INT))")),
            "utf-8").alias("content"),
    )
    return (
        decode_features(assets)
        .groupBy("width", "height", "decoder")
        .agg(F.count(F.lit(1)).alias("n_assets"),
             F.sum(F.col("n_bytes").cast("long")).alias("total_bytes"))
        .select("width", "height", "decoder", "n_assets", "total_bytes")
        .orderBy("width", "height")
    )


REAL_DECODE_ROLLUP_SQL = """
WITH dims AS (
  SELECT CAST((n_chars % 31) + 1 AS INT) AS width,
         CAST((n_chars % 17) + 1 AS INT) AS height
  FROM documents)
SELECT width, height, 'ppm' AS decoder,
       CAST(COUNT(*) AS BIGINT) AS n_assets,
       CAST(SUM(3 + length(CAST(width AS VARCHAR)) + 1
                + length(CAST(height AS VARCHAR)) + 5
                + width * height * 3) AS BIGINT) AS total_bytes
FROM dims
GROUP BY width, height
ORDER BY width, height
"""


QUERIES = {
    "multimodal_decode_stats": multimodal_decode_stats,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_real_decode_rollup": multimodal_real_decode_rollup,
}

ORACLES = {
    "multimodal_decode_stats": DECODE_STATS_SQL,
    "multimodal_frame_sample": FRAME_SAMPLE_SQL,
    "multimodal_real_decode_rollup": REAL_DECODE_ROLLUP_SQL,
}
