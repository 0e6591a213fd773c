"""Multimodal (binary) columns + the Pandas-UDF surface ([EXT]).

Media handling at 100 TB: image/audio/video payloads travel as opaque
``binary`` columns next to a typed metadata struct; decode / feature
extraction runs in Arrow-batched Python (``mapInPandas`` — one
serialization per batch, not per row) on executors, so the pipeline
partitions by file and scales linearly.

Codec status: header-parseable formats decode for REAL in pure Python
(``parse_wav`` RIFF chunk walk, ``parse_bmp`` — see
``multimodal_wav_decode`` for the oracle-checked end-to-end proof);
compressed codecs (PNG/JPEG/video) need PIL/ffmpeg, absent in this
container, so ``decode_media`` raises NotImplementedError for them
unless ``fake=True`` (deterministic pseudo-features keeping the
Spark-side plumbing — schema, batch shape, UDF signature — real and
oracle-testable). The fixture's binary payload is derived
deterministically from documents.text (utf-8 bytes).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from file_scraper_spark.registry import query
from file_scraper_spark.tables import load

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("header_hex", T.StringType()),
        T.StructField("fake_width", T.LongType()),
        T.StructField("fake_height", T.LongType()),
    ]
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents as a multimodal table: payload binary + metadata
    struct (the schema shape a real media lakehouse table would have)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("text/fake").alias("format"),
            F.col("n_chars").alias("declared_size"),
            F.col("lang").alias("tag"),
        ).alias("media_meta"),
    )


def parse_wav(payload: bytes) -> dict:
    """REAL (pure-Python) RIFF/WAVE header parse: fmt chunk walk, PCM
    layout fields, sample count from the data chunk — no audio lib
    needed for the metadata a pipeline filters on (rate/channels/
    duration). Raises ValueError on malformed input."""
    import struct  # noqa: PLC0415

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data_len = 12, None, None
    while pos + 8 <= len(payload):
        cid, clen = payload[pos : pos + 4], struct.unpack(
            "<I", payload[pos + 4 : pos + 8]
        )[0]
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            fmt = (audio_fmt, channels, rate, bits)
        elif cid == b"data":
            data_len = clen
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data_len is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, rate, bits = fmt
    frame = channels * (bits // 8)
    n_samples = data_len // frame if frame else 0
    return {
        "kind": "wav",
        "channels": channels,
        "sample_rate": rate,
        "bits": bits,
        "n_samples": n_samples,
        "duration_ms": (n_samples * 1000) // rate if rate else 0,
    }


def parse_bmp(payload: bytes) -> dict:
    """REAL (pure-Python) BMP header parse (BITMAPINFOHEADER)."""
    import struct  # noqa: PLC0415

    if len(payload) < 26 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    width, height = struct.unpack("<ii", payload[18:26])
    return {"kind": "bmp", "width": width, "height": abs(height)}


def decode_media(payload: bytes, fake: bool = False) -> dict:
    """Media decode. Header-parseable formats (WAV, BMP) decode for
    REAL in pure Python; compressed codecs (PNG/JPEG/...) need PIL/
    ffmpeg, absent in this container, so they raise NotImplementedError
    unless ``fake=True`` (deterministic pseudo-features keeping the
    plumbing testable)."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return parse_wav(payload)
    if payload[:2] == b"BM":
        return parse_bmp(payload)
    if not fake:
        raise NotImplementedError(
            "compressed media codecs not available in this environment; "
            "pass fake=True for deterministic pseudo-decode"
        )
    return pseudo_decode(payload)


def pseudo_decode(payload: bytes) -> dict:
    """Deterministic pseudo-features (the documented fake path) —
    schema-stable regardless of payload magic bytes, so the generic
    feature extractor cannot be derailed by text that happens to start
    with 'BM' or 'RIFF'."""
    n = len(payload)
    return {
        "n_bytes": n,
        "header_hex": payload[:4].hex(),
        "fake_width": (n % 640) + 1,
        "fake_height": (n % 480) + 1,
    }


def extract_features(media: DataFrame, batch_hint: str = "fake") -> DataFrame:
    """Arrow-batched feature extraction over the payload column."""
    fake = batch_hint == "fake"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                pseudo_decode(p) if fake else decode_media(p)
                for p in pdf["payload"]
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media.select("doc_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


@query(
    "multimodal_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           lower(hex(encode(substring(text, 1, 4)))) AS header_hex,
           CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) AS fake_width,
           CAST(octet_length(encode(text)) % 480 + 1 AS BIGINT) AS fake_height
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline end-to-end: encode -> mapInPandas
    pseudo-decode -> typed features. (Fixture text is ASCII, so the
    first 4 utf-8 bytes == first 4 chars for the oracle.)"""
    return extract_features(media_table(spark, sf_dir))


@query(
    "udf_surface",
    oracle="""
    SELECT lang,
           CAST(SUM(n_chars * 2 + 1) AS BIGINT) AS scaled_sum,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents
    GROUP BY lang
    """,
)
def udf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas-UDF surface: a vectorized scalar UDF feeding a grouped
    aggregation — integer semantics, so even the UDF path is
    oracle-exact. (Arrow batch transfer; never row-at-a-time Python.)"""

    @F.pandas_udf(T.LongType())
    def scale(s: pd.Series) -> pd.Series:
        return s * 2 + 1

    docs = load(spark, sf_dir, "documents")
    return (
        docs.select("lang", scale(F.col("n_chars")).alias("scaled"))
        .groupBy("lang")
        .agg(
            F.sum("scaled").alias("scaled_sum"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


@query(
    "udf_grouped_map",
    oracle="""
    SELECT doc_id, lang,
           CAST(n_chars - min_c AS BIGINT) AS chars_above_min,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT doc_id, lang, n_chars,
             MIN(n_chars) OVER (PARTITION BY lang) AS min_c,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n_chars, doc_id) AS rnk
      FROM documents
    )
    """,
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map Pandas UDF (applyInPandas): per-language frame in,
    transformed frame out — integer rank/offset semantics, so even
    this Python path is oracle-exact against a window formulation."""

    def per_lang(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "lang": pdf["lang"],
                "chars_above_min": pdf["n_chars"] - pdf["n_chars"].min(),
                "rnk": pdf.index + 1,
            }
        )

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return docs.groupBy("lang").applyInPandas(
        per_lang,
        schema="doc_id long, lang string, chars_above_min long, rnk long",
    )


@query(
    "udf_grouped_agg",
    oracle="""
    SELECT lang,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS mean_chars
    FROM documents
    GROUP BY lang
    """,
    tags=("udf",),
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate Pandas UDF (UDAF surface): per-lang mean of
    n_chars computed in pandas. Oracle-exact: the UDAF receives the
    whole group, so the mean is one exact int64 sum followed by one
    correctly-rounded double division — bit-identical to
    SUM(int)::DOUBLE / COUNT(*) in any IEEE engine (pandas' float
    s.mean() would NOT be: its summation order is engine-specific)."""

    @F.pandas_udf(T.DoubleType())
    def mean_chars(s: pd.Series) -> float:
        return float(int(s.sum()) / len(s))

    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(mean_chars(F.col("n_chars")).alias("mean_chars"))


FRAME_SIZE = 32  # bytes per pseudo-frame
FRAME_STRIDE = 4  # sample every 4th frame
FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_len", T.LongType()),
        T.StructField("frame_head", T.StringType()),
    ]
)


@query(
    "multimodal_framesample",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, text, octet_length(encode(text)) AS nb
      FROM documents
    )
    SELECT doc_id,
           CAST(k AS BIGINT) AS frame_idx,
           CAST(LEAST({FRAME_SIZE}, nb - k * {FRAME_SIZE}) AS BIGINT)
             AS frame_len,
           substring(text, CAST(k * {FRAME_SIZE} + 1 AS BIGINT), 4)
             AS frame_head
    FROM m CROSS JOIN range(0, 65536, {FRAME_STRIDE}) t(k)
    WHERE k * {FRAME_SIZE} < nb
    """,
    tags=("multimodal",),
)
def multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over a binary media column: treat each payload as
    a fixed-frame-size 'video' (32-byte frames) and emit every 4th
    frame with typed metadata — the plumbing a real video pipeline
    needs (frame extraction via ffmpeg is stubbed; the slicing, Arrow
    batch shape, and exploded one-row-per-frame output are real).

    Scale shape: mapInPandas explodes rows executor-side with no
    shuffle at all; output partitioning inherits the scan. The oracle
    re-derives the same frames with substring arithmetic (fixture
    payloads are ASCII, so byte offsets == char offsets)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_len": [], "frame_head": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                for k in range(0, (n + FRAME_SIZE - 1) // FRAME_SIZE, FRAME_STRIDE):
                    off = k * FRAME_SIZE
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(k)
                    out["frame_len"].append(min(FRAME_SIZE, n - off))
                    out["frame_head"].append(payload[off : off + 4].decode("utf-8"))
            yield pd.DataFrame(out)

    media = media_table(spark, sf_dir)
    return media.select("doc_id", "payload").mapInPandas(sample, FRAME_SCHEMA)


@query(
    "udtf_surface",
    oracle="""
    SELECT doc_id, CAST(pos AS INT) AS pos, word
    FROM (
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS word,
             CAST(generate_subscripts(string_split(text, ' '), 1) - 1
                  AS INT) AS pos
      FROM documents WHERE doc_id < 50
    )
    WHERE len(word) >= 6
    """,
    tags=("udf", "udtf"),
)
def udtf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (user-defined TABLE function) — the third member of
    the UDF family next to the scalar/grouped pandas UDFs: one input
    row expands to N output rows (here: long words with positions),
    applied per row via SQL LATERAL. Deterministic integer/string
    semantics, so even this Python path is oracle-exact against the
    unnest formulation.

    Scale shape: a UDTF runs inside the scan stage (no shuffle); the
    lateral expansion never materializes on the driver."""
    from pyspark.sql.functions import udtf  # noqa: PLC0415

    @udtf(returnType="pos int, word string")
    class ExpandWords:
        def eval(self, text: str):  # noqa: ANN001
            for i, w in enumerate((text or "").split(" ")):
                if len(w) >= 6:
                    yield i, w

    spark.udtf.register("expand_words", ExpandWords)
    load(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 50
    ).createOrReplaceTempView("docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.word
        FROM docs_udtf d, LATERAL expand_words(d.text) t
        """
    )


@query(
    "udf_arrow_map",
    oracle="""
    SELECT doc_id,
           CAST(n_chars * 3 + 7 AS BIGINT) AS scaled,
           CAST(length(text) AS BIGINT) AS text_len
    FROM documents
    WHERE doc_id % 5 = 0
    """,
)
def udf_arrow_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-native map UDF (`mapInPandas`' zero-copy sibling): the
    function receives raw `pyarrow.RecordBatch`es and computes with
    `pyarrow.compute` kernels — no pandas materialization at all, the
    leanest Python hot path Spark offers. Integer arithmetic, so even
    this path is oracle-exact.

    Scale shape: per-batch streaming through Python workers; memory is
    bounded by `spark.sql.execution.arrow.maxRecordsPerBatch`
    regardless of partition size, and the filter is applied before
    the Python boundary (pushed to the scan)."""
    import pyarrow as pa  # noqa: PLC0415
    import pyarrow.compute as pc  # noqa: PLC0415

    def scale(batches):
        for b in batches:
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("doc_id"),
                    pc.add(pc.multiply(b.column("n_chars"), 3), 7),
                    pc.utf8_length(b.column("text")).cast(pa.int64()),
                ],
                names=["doc_id", "scaled", "text_len"],
            )

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return docs.select("doc_id", "n_chars", "text").mapInArrow(
        scale, "doc_id long, scaled long, text_len long"
    )


@query(
    "udf_arrow_grouped",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MAX(n_chars) - MIN(n_chars) AS BIGINT) AS chars_range
    FROM documents
    GROUP BY lang
    """,
)
def udf_arrow_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped Arrow UDF (`applyInArrow`): each language's documents
    arrive as one `pyarrow.Table`; the function reduces it with
    pyarrow.compute aggregations and returns a one-row table. The
    sixth and last member of the Python UDF family (row UDF excluded
    by design), all on integer-exact arithmetic.

    Scale shape: one shuffle on the group key; each group must fit a
    worker's memory as a Table — the same contract as applyInPandas,
    minus the pandas conversion cost. For unbounded groups the
    built-in agg path (udf_grouped_agg) is the scale form."""
    import pyarrow as pa  # noqa: PLC0415
    import pyarrow.compute as pc  # noqa: PLC0415

    def reduce_lang(table: "pa.Table") -> "pa.Table":
        chars = table.column("n_chars")
        return pa.table(
            {
                "lang": [table.column("lang")[0].as_py()],
                "n_docs": [table.num_rows],
                "total_chars": [pc.sum(chars).as_py()],
                "chars_range": [
                    pc.max(chars).as_py() - pc.min(chars).as_py()
                ],
            },
            schema=pa.schema(
                [
                    ("lang", pa.string()),
                    ("n_docs", pa.int64()),
                    ("total_chars", pa.int64()),
                    ("chars_range", pa.int64()),
                ]
            ),
        )

    docs = load(spark, sf_dir, "documents").select("lang", "n_chars")
    return docs.groupBy("lang").applyInArrow(
        reduce_lang,
        "lang string, n_docs long, total_chars long, chars_range long",
    )


WAV_SCHEMA = (
    "doc_id long, channels long, sample_rate long, bits long, "
    "n_samples long, duration_ms long"
)


@query(
    "multimodal_wav_decode",
    oracle="""
    SELECT doc_id,
           CAST(1 + doc_id % 2 AS BIGINT) AS channels,
           CAST(8000 + (doc_id % 8) * 1000 AS BIGINT) AS sample_rate,
           CAST(16 AS BIGINT) AS bits,
           CAST(octet_length(encode(text)) // (2 * (1 + doc_id % 2))
                AS BIGINT) AS n_samples,
           CAST((octet_length(encode(text)) // (2 * (1 + doc_id % 2)))
                * 1000 // (8000 + (doc_id % 8) * 1000) AS BIGINT)
             AS duration_ms
    FROM documents
    """,
)
def multimodal_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio-metadata decode end-to-end: each document's payload
    is wrapped in a deterministic PCM WAV container (44-byte RIFF
    header built with struct.pack — rate 8000+(id%8)*1000 Hz,
    channels 1+id%2, 16-bit) and then decoded by the genuine
    ``parse_wav`` chunk walker, all inside one Arrow-batched
    mapInPandas. The oracle recomputes the expected metadata from the
    same integer formulas — so the parser's output (not a stub) is
    what hash-matches. This is the plumbing shape for real audio at
    100 TB: binary column in, typed metadata out, one Python batch
    hop, linear partitioning; only the codec body would change
    (soundfile/ffmpeg instead of header walk)."""
    import struct  # noqa: PLC0415

    media = media_table(spark, sf_dir)

    def wav_header(n_data: int, channels: int, rate: int, bits: int = 16) -> bytes:
        byte_rate = rate * channels * bits // 8
        block = channels * bits // 8
        return (
            b"RIFF"
            + struct.pack("<I", 36 + n_data)
            + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, channels, rate, byte_rate, block, bits)
            + b"data"
            + struct.pack("<I", n_data)
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                channels = 1 + int(doc_id) % 2
                rate = 8000 + (int(doc_id) % 8) * 1000
                wav = wav_header(len(payload), channels, rate) + bytes(payload)
                feats = decode_media(wav)  # the REAL parser path
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "channels": feats["channels"],
                        "sample_rate": feats["sample_rate"],
                        "bits": feats["bits"],
                        "n_samples": feats["n_samples"],
                        "duration_ms": feats["duration_ms"],
                    }
                )
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(run, WAV_SCHEMA)


@query(
    "multimodal_bmp_decode",
    oracle="""
    SELECT doc_id,
           CAST(16 + doc_id % 640 AS BIGINT) AS width,
           CAST(octet_length(encode(text)) % 480 + 1 AS BIGINT)
             AS height,
           CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes
    FROM documents
    """,
)
def multimodal_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image-metadata decode end-to-end — the image twin of
    multimodal_wav_decode: each payload is framed as a top-down BMP
    (14-byte file header + BITMAPINFOHEADER with width = 16+id%640
    and NEGATIVE height = -(len%480+1), the top-down encoding the
    parser must abs()) and decoded by the genuine ``parse_bmp``
    header walk inside one Arrow-batched mapInPandas. The oracle
    recomputes the expected dimensions from the same integer
    formulas, so a parser regression (e.g. dropping the negative-
    height normalization) hash-mismatches. Same 100 TB plumbing
    contract as the WAV path: binary in, typed metadata out, one
    Python batch hop, linear partitioning; PIL/libjpeg would replace
    only the header walk for compressed formats."""
    import struct  # noqa: PLC0415

    media = media_table(spark, sf_dir)

    def bmp_header(width: int, height: int, n_data: int) -> bytes:
        return (
            b"BM"
            + struct.pack("<I", 54 + n_data)
            + b"\x00\x00\x00\x00"
            + struct.pack("<I", 54)
            + struct.pack("<IiiHH", 40, width, height, 1, 24)
            + b"\x00" * 24  # rest of BITMAPINFOHEADER
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                width = 16 + int(doc_id) % 640
                height = -((len(payload) % 480) + 1)  # top-down BMP
                bmp = bmp_header(width, height, len(payload)) + bytes(
                    payload
                )
                feats = decode_media(bmp)  # the REAL parser path
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "width": feats["width"],
                        "height": feats["height"],
                        "payload_bytes": len(payload),
                    }
                )
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(
        run,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("width", T.LongType()),
                T.StructField("height", T.LongType()),
                T.StructField("payload_bytes", T.LongType()),
            ]
        ),
    )


def build_tar(entries: list[tuple[str, bytes]]) -> bytes:
    """Minimal deterministic POSIX ustar writer (fixed mtime/uid, so
    shard bytes are reproducible): 512-byte headers with octal size
    and checksum, data padded to block size, two zero end blocks."""
    out = bytearray()
    for name, data in entries:
        hdr = bytearray(512)
        hdr[0:100] = name.encode()[:100].ljust(100, b"\x00")
        hdr[100:108] = b"0000644\x00"
        hdr[108:116] = b"0000000\x00"
        hdr[116:124] = b"0000000\x00"
        hdr[124:136] = f"{len(data):011o}".encode() + b"\x00"
        hdr[136:148] = b"00000000000\x00"  # fixed mtime: reproducible
        hdr[148:156] = b" " * 8  # checksum field blank for the sum
        hdr[156] = ord("0")  # regular file
        hdr[257:263] = b"ustar\x00"
        hdr[263:265] = b"00"
        chk = sum(hdr)
        hdr[148:156] = f"{chk:06o}".encode() + b"\x00 "
        out += hdr + data
        pad = (-len(data)) % 512
        out += b"\x00" * pad
    out += b"\x00" * 1024
    return bytes(out)


def parse_tar(payload: bytes) -> dict:
    """REAL (pure-Python) ustar walk: per entry, parse the octal size,
    VERIFY the header checksum, skip padded data; stops at the zero
    end block. Raises ValueError on malformed input — the fail-loud
    contract decode_media's formats share."""
    pos, n, data_bytes = 0, 0, 0
    while pos + 512 <= len(payload):
        hdr = payload[pos : pos + 512]
        if hdr == b"\x00" * 512:
            break
        if hdr[257:262] != b"ustar":
            raise ValueError("not a ustar header")
        stored = int(hdr[148:156].split(b"\x00")[0].strip() or b"0", 8)
        summed = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if stored != summed:
            raise ValueError("tar header checksum mismatch")
        size = int(hdr[124:136].split(b"\x00")[0].strip() or b"0", 8)
        n += 1
        data_bytes += size
        pos += 512 + size + ((-size) % 512)
    return {"n_entries": n, "data_bytes": data_bytes, "tar_bytes": len(payload)}


@query(
    "multimodal_tar_index",
    oracle="""
    SELECT doc_id,
           CAST(2 AS BIGINT) AS n_entries,
           CAST(octet_length(encode(text)) + octet_length(encode(lang)) + 20
                AS BIGINT) AS data_bytes,
           CAST(512 + octet_length(encode(text))
                  + (512 - octet_length(encode(text)) % 512) % 512
                + 512 + (octet_length(encode(lang)) + 20)
                  + (512 - (octet_length(encode(lang)) + 20) % 512) % 512
                + 1024 AS BIGINT) AS tar_bytes
    FROM documents
    """,
)
def multimodal_tar_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-shard indexing — the storage format multimodal
    training corpora actually ship in (tar shards of paired entries
    per sample): each doc is framed as a two-entry ustar shard
    (``<id>.txt`` payload + ``<id>.meta`` sidecar) by a deterministic
    pure-Python tar writer, then INDEXED by the genuine ``parse_tar``
    block walk — octal sizes, verified header checksums, 512-byte
    padding, zero end blocks — inside one Arrow-batched mapInPandas.
    The index (entry count, data bytes, shard bytes) is what a
    WebDataset loader builds once per shard to enable random access.

    The oracle recomputes every size analytically from the framing
    formulas (two headers + block-padded payloads + end blocks), so a
    parser regression — checksum skip, padding slip, premature end —
    hash-mismatches. Same 100 TB plumbing contract as the WAV/BMP
    twins: binary in, typed index out, one Python batch hop, linear
    partitioning; a real deployment points parse_tar at shard files
    from the binaryFile source unchanged."""
    media = media_table(spark, sf_dir)
    docs = media.select(
        "doc_id", "payload", F.col("media_meta.tag").alias("tag")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, tag in zip(
                pdf["doc_id"], pdf["payload"], pdf["tag"]
            ):
                meta = f'{{"lang": "{tag}", "k": 1}}'.encode()
                assert len(meta) == len(tag.encode()) + 20
                shard = build_tar(
                    [
                        (f"{int(doc_id)}.txt", bytes(payload)),
                        (f"{int(doc_id)}.meta", meta),
                    ]
                )
                idx = parse_tar(shard)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "n_entries": idx["n_entries"],
                        "data_bytes": idx["data_bytes"],
                        "tar_bytes": idx["tar_bytes"],
                    }
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        run,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("n_entries", T.LongType()),
                T.StructField("data_bytes", T.LongType()),
                T.StructField("tar_bytes", T.LongType()),
            ]
        ),
    )


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def build_png(width: int, height: int, payload: bytes) -> bytes:
    """Minimal deterministic PNG-structured container: signature +
    IHDR (13-byte data) + one IDAT carrying ``payload`` verbatim +
    IEND, each chunk framed length(4,BE) | type(4) | data | CRC32
    (over type+data, zlib.crc32 — the real PNG CRC). Pixels are NOT
    encoded (no zlib stream): the INDEXER under test walks chunk
    structure, it never inflates image data — exactly what a shard
    indexer does to a real PNG."""
    import struct  # noqa: PLC0415
    import zlib  # noqa: PLC0415

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", payload)
        + chunk(b"IEND", b"")
    )


def parse_png(payload: bytes) -> dict:
    """REAL chunk walk: verify the 8-byte signature, then per chunk
    parse the big-endian length, VERIFY the CRC32 over type+data,
    and stop at IEND. Raises ValueError on malformed input — the
    fail-loud contract decode_media's formats share."""
    import struct  # noqa: PLC0415
    import zlib  # noqa: PLC0415

    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG signature")
    pos, n, data_bytes = 8, 0, 0
    width = height = None
    while pos + 12 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (stored,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if stored != (zlib.crc32(ctype + data) & 0xFFFFFFFF):
            raise ValueError(f"png chunk crc mismatch in {ctype!r}")
        if ctype == b"IHDR":
            width, height = struct.unpack(">II", data[:8])
        n += 1
        data_bytes += length
        pos += 12 + length
        if ctype == b"IEND":
            return {
                "n_chunks": n,
                "data_bytes": data_bytes,
                "png_bytes": pos,
                "width": width,
                "height": height,
            }
    raise ValueError("png truncated before IEND")


@query(
    "multimodal_png_index",
    oracle="""
    SELECT doc_id,
           CAST(3 AS BIGINT) AS n_chunks,
           CAST(13 + octet_length(encode(text)) AS BIGINT) AS data_bytes,
           CAST(8 + 25 + 12 + octet_length(encode(text)) + 12 AS BIGINT)
             AS png_bytes,
           CAST(64 AS BIGINT) AS width,
           CAST(1 + n_chars // 64 AS BIGINT) AS height
    FROM documents
    """,
)
def multimodal_png_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PNG-container indexing — the OTHER shard-framing family next
    to multimodal_tar_index's fixed 512-byte blocks: length-prefixed
    big-endian chunks with per-chunk CRC32 (PNG/MNG/ICC all frame
    this way; so do many custom training-shard formats). Each doc's
    payload is wrapped as signature + IHDR + one IDAT + IEND by a
    deterministic writer, then indexed by the genuine ``parse_png``
    walk — length parse, CRC32 VERIFICATION over type+data (the real
    polynomial via zlib.crc32), IHDR dimension extraction, IEND
    termination — in one Arrow-batched mapInPandas.

    The oracle recomputes every field analytically from the framing
    formulas (8 sig + 25 IHDR chunk + 12-byte IDAT overhead +
    payload + 12 IEND; dims 64 x ceil-ish rows), so a parser
    regression — CRC skip, off-by-one in the length math, missed
    IEND — hash-mismatches; a CRC failure raises rather than
    mis-indexing (fail-loud, pinned by the ValueError contract).
    Same scale plumbing as the tar/WAV/BMP twins: binary in, typed
    index out, one Python batch hop, linear partitioning, no
    shuffle."""
    media = media_table(spark, sf_dir)
    docs = media.select(
        "doc_id", "payload", F.col("media_meta.declared_size").alias("nch")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, nch in zip(
                pdf["doc_id"], pdf["payload"], pdf["nch"]
            ):
                png = build_png(64, 1 + int(nch) // 64, bytes(payload))
                idx = parse_png(png)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "n_chunks": idx["n_chunks"],
                        "data_bytes": idx["data_bytes"],
                        "png_bytes": idx["png_bytes"],
                        "width": idx["width"],
                        "height": idx["height"],
                    }
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        run,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("n_chunks", T.LongType()),
                T.StructField("data_bytes", T.LongType()),
                T.StructField("png_bytes", T.LongType()),
                T.StructField("width", T.LongType()),
                T.StructField("height", T.LongType()),
            ]
        ),
    )
