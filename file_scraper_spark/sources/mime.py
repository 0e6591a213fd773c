"""Extension -> MIME type lookup (reference A6, src/fs.rs:56-58).

The reference calls a per-file library lookup; the scalable Spark form
is a broadcast dimension join: the mapping is a tiny static table, the
fact side never shuffles, and the lookup runs JVM-side inside
whole-stage codegen (no Python UDF in the hot path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Deterministic subset of the IANA registry (public knowledge), lowercase.
EXTENSION_MIME: dict[str, str] = {
    "txt": "text/plain",
    "csv": "text/csv",
    "html": "text/html",
    "htm": "text/html",
    "css": "text/css",
    "js": "text/javascript",
    "json": "application/json",
    "xml": "application/xml",
    "pdf": "application/pdf",
    "zip": "application/zip",
    "gz": "application/gzip",
    "tar": "application/x-tar",
    "parquet": "application/vnd.apache.parquet",
    "avro": "application/avro",
    "png": "image/png",
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "gif": "image/gif",
    "webp": "image/webp",
    "svg": "image/svg+xml",
    "mp3": "audio/mpeg",
    "wav": "audio/wav",
    "flac": "audio/flac",
    "mp4": "video/mp4",
    "mkv": "video/x-matroska",
    "webm": "video/webm",
    "md": "text/markdown",
    "py": "text/x-python",
    "rs": "text/x-rust",
}


def mime_dim(spark: SparkSession) -> DataFrame:
    """The extension->mime mapping as a broadcastable dimension."""
    return spark.createDataFrame(
        sorted(EXTENSION_MIME.items()), schema="ext string, mime_type string"
    )


def extension_col(filename: Column) -> Column:
    """Lowercased extension, NULL when the name has no '.'."""
    ext = F.lower(F.substring_index(filename, ".", -1))
    return F.when(filename.contains("."), ext).otherwise(F.lit(None))


def with_mime_type(df: DataFrame, spark: SparkSession, filename_col: str = "filename") -> DataFrame:
    """Attach mime_type via broadcast lookup; NULL when unknown
    (matches the reference's Option<String>, src/db.rs:13)."""
    dim = F.broadcast(mime_dim(spark))
    out = df.withColumn("_ext", extension_col(F.col(filename_col)))
    return out.join(dim, out._ext == dim.ext, "left").drop("_ext", "ext")
