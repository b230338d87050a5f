"""Multimodal column handling: opaque binary payloads + typed metadata.

The reference's ``Data`` body section (raw bytes, AMQPJsonFunction.scala:
139-148) is the multimodal precedent: bytes flow through the engine
untouched, with schema-level typing.  Here the ``documents`` table stands
in for a media table (its UTF-8 bytes as the blob); the pattern — binary
column + metadata projection + Arrow-batched Python decode — is exactly
what image/audio/video processing needs at scale:

- Metadata extraction (size, content hash, modality tag) stays JVM-side.
- Decode / feature-extract runs in ``mapInPandas`` (Arrow batches, one
  Python worker per partition — the only sane place for codec libraries
  on a 1000-executor cluster).  The actual image decode is STUBBED
  (``decode_image_stub``) because no codec libs exist in this container;
  the Spark-side plumbing (schema, batching, partitioning) is real and
  tested with a deterministic fake.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from streaming_amqp_spark.tables import load_table

FAKE_DECODE = True  # no codec libs in this container (see module docstring)


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JVM-side metadata over a binary column: byte length, content hash,
    modality tag, and derived (deterministic) media attributes."""
    d = load_table(spark, sf_dir, "documents")
    blob = F.col("text").cast("binary")
    nbytes = F.octet_length(blob)
    return d.select(
        "doc_id",
        nbytes.alias("n_bytes"),
        F.md5(blob).alias("content_md5"),
        # the isNotNull guard matters: Catalyst rewrites element_at over a
        # literal array into CASE WHEN idx=1 ... ELSE 'video' END, whose
        # non-exhaustive ELSE turns a NULL blob's NULL index into 'video'
        # — a silent wrong value (pathological-corpus probe, round 11)
        F.when(
            nbytes.isNotNull(),
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (nbytes % 3 + 1).cast("int"),
            ),
        ).alias("modality"),
        (nbytes % 640).alias("fake_width"),
        (nbytes % 480).alias("fake_height"),
    )


_META_SQL = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS content_md5,
       (['image', 'audio', 'video'])[octet_length(encode(text)) % 3 + 1]
         AS modality,
       octet_length(encode(text)) % 640 AS fake_width,
       octet_length(encode(text)) % 480 AS fake_height
FROM documents
"""


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
    ]
)


def decode_image_stub(payload: bytes) -> tuple[int, int, int, float]:
    """Stub for the real image decode (no codec libraries in container).

    Returns (width, height, channels, mean_byte).  With FAKE_DECODE the
    values derive deterministically from the bytes; a real deployment
    would replace the body with e.g. PIL/libvips and keep the signature.
    """
    if not FAKE_DECODE:
        raise NotImplementedError(
            "real image decode requires codec libs (PIL/libvips) not present "
            "in this container; set FAKE_DECODE or install a decoder"
        )
    n = len(payload)
    return (n % 640 or 1, n % 480 or 1, 3, float(sum(payload)) / max(n, 1))


def decode_images(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Arrow-batched decode over ``mapInPandas``: processes whole record
    batches per Python worker invocation, never row-at-a-time."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # a NULL blob decodes to NULL features, never a worker crash
            # (pathological-corpus probe, round 11); pandas nullable
            # dtypes keep the Arrow columns typed with None present
            decoded = [
                None if b is None else decode_image_stub(b)
                for b in pdf[blob_col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_bytes": pd.array(
                        [
                            None if b is None else len(b)
                            for b in pdf[blob_col]
                        ],
                        dtype="Int32",
                    ),
                    "width": pd.array(
                        [None if d is None else d[0] for d in decoded],
                        dtype="Int32",
                    ),
                    "height": pd.array(
                        [None if d is None else d[1] for d in decoded],
                        dtype="Int32",
                    ),
                    "channels": pd.array(
                        [None if d is None else d[2] for d in decoded],
                        dtype="Int32",
                    ),
                    "mean_byte": pd.array(
                        [None if d is None else d[3] for d in decoded],
                        dtype="Float64",
                    ),
                }
            )

    return df.mapInPandas(_decode, schema=DECODED_SCHEMA)


def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline: binary column → Arrow batches →
    per-batch Python decode → typed feature rows.  (Stub decode: see
    module docstring.  mean_byte is integer-sum/len — exact, so the DuckDB
    oracle reproduces it.)"""
    d = load_table(spark, sf_dir, "documents")
    with_blob = d.select("doc_id", F.col("text").cast("binary").alias("blob"))
    return decode_images(with_blob)


# The stub's arithmetic is exact-integer (sum of bytes / length), so even
# the mapInPandas path is oracle-checkable.  mean_byte sums the UTF-8
# BYTES via a hex-digit fold (DuckDB cannot index a BLOB directly), so
# the oracle is byte-exact on ANY text, not just ASCII (r11 probe: the
# old unicode(text[i]) code-point fold diverged on non-ASCII docs).
# CASE-NULL channels + NULL-propagating n keep a NULL blob's row
# all-NULL, matching the engine's None-safe decode.  b is MATERIALIZED:
# inlined, the hx expression would re-expand per lambda element (O(n²)).
_DECODE_SQL = """
WITH b AS MATERIALIZED (
  SELECT doc_id, text, octet_length(encode(text)) AS n,
         hex(encode(text)) AS hx
  FROM documents
)
SELECT doc_id,
       CAST(n AS INTEGER) AS n_bytes,
       CAST(CASE WHEN n % 640 = 0 THEN 1 ELSE n % 640 END AS INTEGER) AS width,
       CAST(CASE WHEN n % 480 = 0 THEN 1 ELSE n % 480 END AS INTEGER) AS height,
       CASE WHEN text IS NULL THEN NULL ELSE 3 END AS channels,
       -- coalesce + greatest(n,1): the stub's sum/max(n,1) is 0.0 for an
       -- EMPTY payload (DuckDB list_sum([]) is NULL); the outer CASE
       -- keeps a NULL payload NULL (DuckDB greatest ignores NULLs)
       CASE WHEN text IS NULL THEN NULL ELSE
         CAST(coalesce(list_sum(list_transform(range(1, n + 1),
                i -> (strpos('0123456789ABCDEF', substring(hx, 2*i-1, 1)) - 1)
                       * 16
                   + (strpos('0123456789ABCDEF', substring(hx, 2*i, 1)) - 1))),
              0)
              AS DOUBLE) / greatest(n, 1)
       END AS mean_byte
FROM b
"""


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("new_width", T.IntegerType()),
        T.StructField("new_height", T.IntegerType()),
        T.StructField("resized_md5", T.StringType()),
    ]
)

RESIZE_BOX = 224  # aspect-fit target (the standard vision-model input box)


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-fit resize plumbing over Arrow batches: per-image target
    dimensions (fit the RESIZE_BOX, preserve ratio) + the 'resized' payload
    hash.  The pixel resample itself is stubbed (prefix-truncate) — no
    codec libs in this container — but the batch shape, schema, and the
    vectorized-Python execution path are the real thing.

    Scale: ``mapInPandas`` keeps one Python worker per partition fed by
    Arrow batches; dimension math is plain doubles, identical in the
    oracle."""
    d = load_table(spark, sf_dir, "documents")
    src = d.select("doc_id", F.col("text").cast("binary").alias("blob"))

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                if blob is None:
                    # NULL blob -> NULL dims/fingerprint, never a worker
                    # crash (pathological-corpus probe, round 11)
                    rows.append((doc_id, None, None, None, None, None))
                    continue
                n = len(blob)
                w, h = (n % 640 or 1), (n % 480 or 1)  # ≡ decode_image_stub dims
                scale = float(RESIZE_BOX) / float(max(w, h))
                nw = max(1, int(w * scale))
                nh = max(1, int(h * scale))
                # fingerprint = md5 of the UPPERCASE HEX of the byte
                # prefix: DuckDB's md5 only takes VARCHAR, and a raw byte
                # prefix can split a multi-byte character (invalid UTF-8),
                # so hashing the hex rendering keeps the oracle byte-exact
                # on ANY payload (r11 probe: md5-of-bytes was
                # oracle-checkable for ASCII only)
                prefix = bytes(blob)[: nw * nh % max(n, 1)]
                rows.append(
                    (
                        doc_id,
                        w,
                        h,
                        nw,
                        nh,
                        hashlib.md5(prefix.hex().upper().encode()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "new_width",
                    "new_height",
                    "resized_md5",
                ],
            )

    return src.mapInPandas(_resize, schema=RESIZED_SCHEMA)


# int(w*scale) truncates toward zero = floor for the positive values here;
# the fingerprint hashes the UPPERCASE HEX of the byte prefix (2 hex
# chars per byte), ≡ the engine's md5(prefix.hex().upper()) — byte-exact
# for any payload where character-based substring(text, ...) was
# ASCII-only (r11 probe).  NULL text propagates: w/h/new_*/md5 all NULL.
_RESIZE_SQL = f"""
WITH b AS MATERIALIZED (
  SELECT doc_id, octet_length(encode(text)) AS n,
         hex(encode(text)) AS hx,
         CASE WHEN octet_length(encode(text)) % 640 = 0 THEN 1
              ELSE octet_length(encode(text)) % 640 END AS w,
         CASE WHEN octet_length(encode(text)) % 480 = 0 THEN 1
              ELSE octet_length(encode(text)) % 480 END AS h
  FROM documents
)
SELECT doc_id,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       -- the CASE guards matter: DuckDB greatest IGNORES NULLs, so an
       -- unguarded greatest(1, trunc(NULL)) manufactures 1x1 dims for a
       -- NULL payload where the engine correctly yields NULL
       CASE WHEN n IS NULL THEN NULL ELSE
         CAST(greatest(1, CAST(trunc(w * ({RESIZE_BOX}.0 / greatest(w, h))) AS BIGINT))
              AS INTEGER)
       END AS new_width,
       CASE WHEN n IS NULL THEN NULL ELSE
         CAST(greatest(1, CAST(trunc(h * ({RESIZE_BOX}.0 / greatest(w, h))) AS BIGINT))
              AS INTEGER)
       END AS new_height,
       md5(substring(hx, 1, 2 *
           ((greatest(1, CAST(trunc(w * ({RESIZE_BOX}.0 / greatest(w, h))) AS BIGINT))
             * greatest(1, CAST(trunc(h * ({RESIZE_BOX}.0 / greatest(w, h))) AS BIGINT)))
            % greatest(n, 1)))) AS resized_md5
FROM b
"""


FRAME_BYTES = 100  # stub "frame" granularity
FRAME_STRIDE = 5  # keep every 5th frame


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for video-like payloads: chunk the binary column into
    fixed-size frames, keep every FRAME_STRIDE-th, fingerprint each.

    All JVM-side (sequence → explode → substring → md5): at 100 TB the
    frame index never touches Python, and the explode is a flatMap — no
    shuffle until a downstream agg.  A real deployment swaps the substring
    for a keyframe extractor in mapInPandas; schema and lineage stay."""
    d = load_table(spark, sf_dir, "documents")
    n = F.octet_length(F.col("text").cast("binary"))
    n_frames = F.floor(n / F.lit(FRAME_BYTES)).cast("int")
    return (
        d.select("doc_id", "text", n_frames.alias("n_frames"))
        .where(F.col("n_frames") >= 1)
        .select(
            "doc_id",
            "n_frames",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1)
            ).alias("frame_idx"),
            "text",
        )
        .where(F.col("frame_idx") % FRAME_STRIDE == 0)
        .select(
            "doc_id",
            "frame_idx",
            "n_frames",
            F.md5(
                F.expr(
                    f"substring(text, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES})"
                )
            ).alias("frame_md5"),
        )
    )


_FRAME_SQL = f"""
WITH b AS (
  SELECT doc_id, text,
         CAST(floor(octet_length(encode(text)) / {FRAME_BYTES}.0) AS INTEGER)
           AS n_frames
  FROM documents
  WHERE octet_length(encode(text)) >= {FRAME_BYTES}
)
SELECT doc_id, frame_idx, n_frames,
       md5(substring(text, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES}))
         AS frame_md5
FROM (SELECT doc_id, text, n_frames,
             CAST(unnest(range(0, n_frames)) AS INTEGER) AS frame_idx
      FROM b)
WHERE frame_idx % {FRAME_STRIDE} = 0
"""


# Audio framing constants: PCM16 mono at 8 kHz (telephony), 20 ms frames /
# 10 ms hop — standard narrowband speech windowing.  8 kHz rather than
# 16 kHz so the test corpus's blob sizes (≤ ~600 bytes ⇒ ≤ ~300 samples)
# actually produce frames; at 16 kHz/25 ms every test doc would be
# sub-frame and the operator would be exercised on zero rows.
AUDIO_SR = 8_000
AUDIO_FRAME = 160  # samples per frame (20 ms)
AUDIO_HOP = 80  # samples per hop (10 ms)


def multimodal_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio frame windowing: treat the blob as PCM16 mono (n_samples =
    bytes ÷ 2) and emit the 20 ms / 10 ms-hop frame grid — (frame_id,
    start/end sample, start/end ms) — the exact row set a downstream
    Arrow decode step (MFCC/fbank extraction) consumes.  Millisecond
    positions use integer division (sample·1000 div SR): exact BIGINTs
    in both engines.

    Pure per-row sequence arithmetic, zero shuffle — framing 100 TB of
    audio is a scan; docs shorter than one frame yield no rows (not a
    partial frame)."""
    d = load_table(spark, sf_dir, "documents")
    n_samples = (F.octet_length(F.col("text").cast("binary")) / F.lit(2)).cast(
        "long"
    )
    # the when() guard is the ONLY thing making the sequence legal for
    # sub-frame docs (sequence(0, negative, +hop) throws; CaseWhen
    # evaluates branches lazily per row) — same idiom as the CDC chunker
    starts = F.sequence(
        F.lit(0).cast("long"), n_samples - F.lit(AUDIO_FRAME), F.lit(AUDIO_HOP)
    )
    frame = F.explode(
        F.when(n_samples >= AUDIO_FRAME, starts).otherwise(
            F.array().cast("array<long>")
        )
    )
    out = d.select(
        "doc_id", n_samples.alias("n_samples"), frame.alias("start_sample")
    )
    return out.select(
        "doc_id",
        "n_samples",
        (F.col("start_sample") / F.lit(AUDIO_HOP)).cast("long").alias(
            "frame_id"
        ),
        "start_sample",
        (F.col("start_sample") + F.lit(AUDIO_FRAME)).alias("end_sample"),
        F.expr(f"(start_sample * 1000) div {AUDIO_SR}").alias("t_start_ms"),
        F.expr(f"((start_sample + {AUDIO_FRAME}) * 1000) div {AUDIO_SR}").alias(
            "t_end_ms"
        ),
    )


_AUDIO_FRAMES_SQL = f"""
WITH a AS (
  SELECT doc_id, octet_length(encode(text)) // 2 AS n_samples
  FROM documents
)
SELECT doc_id, n_samples,
       s // {AUDIO_HOP} AS frame_id,
       s AS start_sample,
       s + {AUDIO_FRAME} AS end_sample,
       (s * 1000) // {AUDIO_SR} AS t_start_ms,
       ((s + {AUDIO_FRAME}) * 1000) // {AUDIO_SR} AS t_end_ms
FROM a, UNNEST(range(0, greatest(n_samples - {AUDIO_FRAME} + 1, 0),
                     {AUDIO_HOP})) AS t(s)
"""


def multimodal_storage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-modality storage accounting: blob count, total/max bytes and
    the p99 — the capacity panel for a mixed media lake.  One scan, one
    3-row aggregate."""
    meta = multimodal_meta(spark, sf_dir)
    return meta.groupBy("modality").agg(
        F.count("*").alias("n_blobs"),
        F.sum("n_bytes").alias("total_bytes"),
        F.max("n_bytes").alias("max_bytes"),
        F.percentile("n_bytes", F.lit(0.99)).alias("p99_bytes"),
    )


_STORAGE_SQL = f"""
WITH meta AS ({_META_SQL})
SELECT modality,
       count(*) AS n_blobs,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       max(n_bytes) AS max_bytes,
       quantile_cont(n_bytes, 0.99) AS p99_bytes
FROM meta
GROUP BY modality
"""


QUERIES = {
    "multimodal_meta": multimodal_meta,
    "multimodal_audio_frames": multimodal_audio_frames,
    "multimodal_storage_report": multimodal_storage_report,
    "multimodal_decode_features": multimodal_decode_features,
    "multimodal_resize": multimodal_resize,
    "multimodal_frame_sample": multimodal_frame_sample,
}

ORACLES = {
    "multimodal_meta": _META_SQL,
    "multimodal_audio_frames": _AUDIO_FRAMES_SQL,
    "multimodal_storage_report": _STORAGE_SQL,
    "multimodal_decode_features": _DECODE_SQL,
    "multimodal_resize": _RESIZE_SQL,
    "multimodal_frame_sample": _FRAME_SQL,
}
