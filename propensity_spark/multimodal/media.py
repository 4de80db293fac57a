"""Multimodal column handling (extension scope, SURVEY.md §7):
image/audio/video as opaque BINARY payloads + typed metadata, with
decode / feature-extract / resize / frame-sample implemented as
Arrow-batched Pandas functions over ``mapInPandas``.

The container ships no image/audio libraries, so the actual byte
decoding is STUBBED: ``_decode_stub`` derives deterministic fake
dimensions from the payload bytes (documented below), and the real
decoders raise NotImplementedError behind an import-try. Everything
Spark-side is real and tested: the binary column construction, the
mapInPandas batch iterator signature, the output schema, and the
partition-preserving plan (map-only — no shuffle at any scale).

The fixtures carry no binary columns, so payloads are synthesized from
`documents.text` (utf-8 bytes) — which also makes the whole pipeline
DuckDB-oracle-checkable: the fake decode is pure arithmetic on
octet_length.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from propensity_spark.io import load_table

MEDIA_SCHEMA = (
    "doc_id bigint, mime string, byte_len bigint, width int, height int, n_frames int"
)


def _decode_stub(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: (width, height, n_frames) from byte
    length. Replace with PIL/libav decoding where available."""
    n = len(payload)
    return 16 + n % 624, 16 + (n * 7) % 464, 1 + n % 24


def decode_image(payload: bytes):  # pragma: no cover - real decoder absent
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires PIL; container ships none (stub via _decode_stub)"
        ) from exc


def _extract_media_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: one Arrow batch in, one metadata frame out.
    Vectorized over the batch; no per-row Python beyond the byte ops."""
    for pdf in batches:
        lens = pdf["payload"].map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "mime": pdf["mime"],
                "byte_len": lens,
                "width": (16 + lens % 624).astype("int32"),
                "height": (16 + (lens * 7) % 464).astype("int32"),
                "n_frames": (1 + lens % 24).astype("int32"),
            }
        )


def with_media_columns(docs: DataFrame) -> DataFrame:
    """Attach the opaque binary payload + typed metadata columns —
    the multimodal column convention (payload BINARY, mime STRING)."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.when(F.col("source") == "web", "image/jpeg")
        .when(F.col("source") == "api", "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
    )


def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode plumbing end-to-end: build payloads, run the
    Arrow-batched mapInPandas extractor, emit typed metadata."""
    docs = load_table(spark, sf_dir, "documents")
    media = with_media_columns(docs)
    return media.mapInPandas(_extract_media_meta, schema=MEDIA_SCHEMA)


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plumbing: explode a deterministic frame index per
    media row (every 5th fake frame) — the shape a video pipeline uses
    before per-frame feature extraction."""
    meta = q_media_metadata(spark, sf_dir)
    return meta.select(
        "doc_id",
        "n_frames",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(5))).alias("frame_idx"),
    )


def q_media_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full multimodal plumbing in one gate entry: binary payload
    construction -> Arrow-batched mapInPandas metadata decode -> frame
    sampling explode, at per-frame grain with the metadata columns
    carried along. Map-only end to end — no shuffle at any scale."""
    meta = q_media_metadata(spark, sf_dir)
    return meta.select(
        "doc_id",
        "mime",
        "byte_len",
        "width",
        "height",
        "n_frames",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(5))).alias("frame_idx"),
    )


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: (doc_id, payload, mime) -> same schema plus the
    target dims, payload rewritten by the (stubbed) resampler. The real
    implementation decodes, resamples, re-encodes inside the same
    mapInPandas worker (PIL/libav absent in this container — the stub
    truncates/pads bytes to a deterministic target length so byte_len
    tracks the requested resolution). Map-only; Arrow batch size bounds
    executor memory exactly as in the metadata extractor."""
    target_len = width * height // 8  # stub: fake compressed size

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                (p[:target_len] if len(p) >= target_len else p.ljust(target_len, b"\0"))
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "mime": pdf["mime"],
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(
        _resize,
        schema="doc_id bigint, payload binary, mime string, width int, height int",
    )


EMB_DIM = 16


def _extract_embeddings(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: payload bytes -> L2-normalized byte-histogram
    embedding (EMB_DIM buckets over byte values). Stands in for a real
    image/audio encoder (CLIP/wav2vec): deterministic, vectorized with
    numpy over the whole Arrow batch, and exactly the array<float>
    shape a learned encoder would emit — so the downstream ANN/dedup
    operators run unchanged when a real model replaces it."""
    import numpy as np

    for pdf in batches:
        mats = np.zeros((len(pdf), EMB_DIM), dtype="float32")
        for i, payload in enumerate(pdf["payload"]):  # per-doc histogram
            arr = np.frombuffer(payload, dtype=np.uint8)
            hist = np.bincount(arr // (256 // EMB_DIM), minlength=EMB_DIM)
            mats[i] = hist
        norms = np.linalg.norm(mats, axis=1, keepdims=True)
        mats = mats / np.where(norms == 0, 1.0, norms)
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "embedding": list(mats)})


def extract_embeddings(media: DataFrame) -> DataFrame:
    """The multimodal -> vector bridge: (doc_id, payload) -> (doc_id,
    embedding array<float>) via Arrow-batched mapInPandas. Map-only —
    no shuffle at any scale; executor memory is bounded by the Arrow
    batch size. The output is join-compatible with every operator in
    `vector/similarity.py` (brute-force top-k, LSH buckets, IVF,
    quantization)."""
    return media.mapInPandas(
        _extract_embeddings, schema="doc_id bigint, embedding array<float>"
    )


ORACLES = {
    "media_pipeline": """
        WITH meta AS (
            SELECT doc_id,
                   CASE WHEN source = 'web' THEN 'image/jpeg'
                        WHEN source = 'api' THEN 'audio/wav'
                        ELSE 'video/mp4' END AS mime,
                   octet_length(encode(text)) AS byte_len,
                   CAST(16 + octet_length(encode(text)) % 624 AS INT) AS width,
                   CAST(16 + (octet_length(encode(text)) * 7) % 464 AS INT) AS height,
                   CAST(1 + octet_length(encode(text)) % 24 AS INT) AS n_frames
            FROM documents
        )
        SELECT doc_id, mime, byte_len, width, height, n_frames,
               CAST(unnest(range(0, n_frames, 5)) AS INT) AS frame_idx
        FROM meta
    """,
}

QUERIES = {
    "media_pipeline": q_media_pipeline,
}


def cogroup_align(events: DataFrame, features: DataFrame) -> DataFrame:
    """The cogrouped-pandas operator surface
    (`groupBy.cogroup.applyInPandas`): per-key alignment of two frames
    in one Arrow-batched worker — the shape for custom per-entity
    merges no built-in join expresses (pandas merge_asof, per-user
    sessionized reconciliation, ...). Demonstrated with a per-user
    summary either side could not compute alone: event count + value
    sum from the left, feature-row count from the right. Both sides
    shuffle once on the key; worker memory holds ONE key's rows from
    each side, not a partition."""
    import pandas as pd

    def align(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        uid = (left["user_id"] if len(left) else right["user_id"]).iloc[0]
        return pd.DataFrame(
            {
                "user_id": [uid],
                "n_events": [len(left)],
                "sum_value": [float(left["value"].sum()) if len(left) else 0.0],
                "n_feature_rows": [len(right)],
            }
        )

    return (
        events.groupBy("user_id")
        .cogroup(features.groupBy("user_id"))
        .applyInPandas(
            align,
            schema="user_id bigint, n_events bigint, sum_value double, n_feature_rows bigint",
        )
    )


# ---------------------------------------------------------------------------
# media_bridge: ONE tagged-union gate entry for the multimodal bridge
# surface. Normalized (section, k1 BIGINT, k2 BIGINT, n BIGINT, v DOUBLE):
#   hist    — (doc_id, bucket, count, 0.0): integer byte-histogram counts
#             RECOVERED from the real `extract_embeddings` output. The
#             embedding is L2-normalized, but sum(counts) = byte_len, so
#             norm = byte_len / sum(emb) and cnt_i = round(emb_i * norm)
#             — an exact-integer check of the Arrow mapInPandas encoder
#             (float32 error ~1e-4 per count, far below the rounding
#             threshold).
#   resize  — (doc_id, new_byte_len, first_byte, 0.0): resize_media
#             plumbing; the stub pads/truncates to width*height/8 bytes
#             and must preserve the leading payload bytes.
#   cogroup — (user_id, n_feature_rows, n_events, sum_value): the
#             cogrouped applyInPandas per-key merge of events with a
#             click-derived feature frame.
# ---------------------------------------------------------------------------

RESIZE_W, RESIZE_H = 64, 32  # stub target length = 64*32/8 = 256 bytes


def q_media_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    media = with_media_columns(docs)

    emb = extract_embeddings(media)
    exploded = emb.select("doc_id", F.posexplode("embedding").alias("bucket", "val"))
    # BYTES, not characters: the encoder histograms the UTF-8 payload,
    # so the recovery scale must be octet_length — F.length (chars)
    # would desync the two on any non-ASCII document.
    lens = docs.select("doc_id", F.octet_length("text").cast("double").alias("byte_len"))
    hist = (
        exploded.withColumn("s", F.sum("val").over(Window.partitionBy("doc_id")))
        .join(F.broadcast(lens), "doc_id")
        .withColumn(
            "cnt",
            F.when(F.col("s") > 0, F.round(F.col("val") * F.col("byte_len") / F.col("s")))
            .otherwise(0)
            .cast("bigint"),
        )
        .where(F.col("cnt") > 0)
        .select(
            F.lit("hist").alias("section"),
            F.col("doc_id").alias("k1"),
            F.col("bucket").cast("bigint").alias("k2"),
            F.col("cnt").alias("n"),
            F.lit(0.0).alias("v"),
        )
    )

    resized = resize_media(media, RESIZE_W, RESIZE_H).select(
        F.lit("resize").alias("section"),
        F.col("doc_id").alias("k1"),
        F.octet_length("payload").cast("bigint").alias("k2"),
        # First payload BYTE as an integer (hex round-trip): casting the
        # binary to string and taking ascii() would decode UTF-8 — and
        # the 256-byte truncation can split a multi-byte character,
        # making that cast undefined on non-ASCII payloads.
        F.expr("conv(hex(substring(payload, 1, 1)), 16, 10)")
        .cast("bigint")
        .alias("n"),
        F.lit(0.0).alias("v"),
    )

    events = load_table(spark, sf_dir, "events")
    clicks = events.where(F.col("event_type") == "click").select("user_id", "event_id")
    cg = cogroup_align(events.select("user_id", "value"), clicks).select(
        F.lit("cogroup").alias("section"),
        F.col("user_id").alias("k1"),
        F.col("n_feature_rows").alias("k2"),
        F.col("n_events").alias("n"),
        F.round(F.col("sum_value") + 1e-6, 2).alias("v"),
    )
    return hist.unionByName(resized).unionByName(cg)


ORACLES["media_bridge"] = f"""
    -- Byte-level twin of the engine: every section reads the UTF-8
    -- payload bytes via hex() nibbles, never characters, so non-ASCII
    -- documents hash identically on both sides. Byte i's high nibble
    -- (= byte // 16, the EMB_DIM=16 bucket) sits at hex position 2i-1.
    WITH bytes AS (
        SELECT doc_id,
               strpos('0123456789ABCDEF', substr(hex(encode(text)), 2 * i - 1, 1))
                   - 1 AS bucket
        FROM (SELECT doc_id, text,
                     unnest(range(1, octet_length(encode(text)) + 1)) AS i
              FROM documents) t
    )
    SELECT 'hist' AS section, doc_id AS k1, CAST(bucket AS BIGINT) AS k2,
           count(*) AS n, 0.0 AS v
    FROM bytes GROUP BY doc_id, bucket
    UNION ALL
    SELECT 'resize', doc_id, {RESIZE_W * RESIZE_H // 8},
           CASE WHEN octet_length(encode(text)) = 0 THEN 0
                ELSE (strpos('0123456789ABCDEF', substr(hex(encode(text)), 1, 1)) - 1)
                     * 16
                     + strpos('0123456789ABCDEF', substr(hex(encode(text)), 2, 1)) - 1
           END,
           0.0
    FROM documents
    UNION ALL
    SELECT 'cogroup', user_id,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT),
           count(*), round(1e-6 + sum(value), 2)
    FROM events GROUP BY user_id
"""

QUERIES["media_bridge"] = q_media_bridge
