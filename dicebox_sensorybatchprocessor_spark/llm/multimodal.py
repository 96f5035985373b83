"""§2.9 multimodal / binary-column operators (SURVEY.md north star; the
reference's R3 base64→bytes decode path generalized).

Media are opaque BinaryType columns + typed metadata; decode/feature
steps are Arrow-batched mapInPandas over bytes. The real codec libraries
(PIL/ffmpeg/…) are absent from this container, so the decode kernels are
deterministic stand-ins derived from the content hash — clearly marked —
while the Spark-side plumbing (schemas, binary columns, UDF signatures,
1→N frame expansion, batch iteration) is real and oracle-checked.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dicebox_sensorybatchprocessor_spark.io import load
from dicebox_sensorybatchprocessor_spark.registry import register


def decode_image(data: bytes) -> tuple[int, int, float]:
    """STUB image decode — deterministic fake derived from md5(data).

    A production build replaces this body with a real decoder (PIL etc.);
    the Spark plumbing around it is unchanged. Returns (width, height,
    mean_luma)."""
    h = hashlib.md5(data).digest()
    width = 1 + h[0] % 64
    height = 1 + h[1] % 64
    mean_luma = round(h[2] / 255.0, 6)
    return width, height, mean_luma


@register(
    "mm_binary",
    oracle="""
    SELECT doc_id,
           base64(encode(text)) AS b64,
           CAST(octet_length(from_base64(base64(encode(text)))) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    """,
)
def mm_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column ingest (reference R3): text → bytes → base64 →
    bytes round-trip, byte length, content hash. The same wire path a
    sensory message's image payload takes (SURVEY.md §1.1)."""
    d = load(spark, sf_dir, "documents")
    bin_col = F.col("text").cast("binary")
    # Spark's base64 is MIME-flavored (CRLF every 76 chars); strip to the
    # canonical unwrapped form DuckDB produces.
    b64 = F.regexp_replace(F.base64(bin_col), "[\\r\\n]", "")
    return d.select(
        "doc_id",
        b64.alias("b64"),
        F.length(F.unbase64(b64)).cast("bigint").alias("n_bytes"),
        F.md5("text").alias("content_md5"),
    )


@register(
    "mm_image_meta",
    oracle="""
    SELECT doc_id,
           1 + ('0x' || substr(md5(text), 1, 2))::BIGINT % 64 AS width,
           1 + ('0x' || substr(md5(text), 3, 2))::BIGINT % 64 AS height,
           (1 + ('0x' || substr(md5(text), 1, 2))::BIGINT % 64)
           * (1 + ('0x' || substr(md5(text), 3, 2))::BIGINT % 64) AS n_pixels,
           round(('0x' || substr(md5(text), 5, 2))::BIGINT / 255.0, 6) AS mean_luma
    FROM documents
    """,
)
def mm_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode + feature-extract plumbing: binary column → mapInPandas
    decode kernel → typed metadata. The kernel is the decode_image STUB
    (hash-derived), which makes the whole pipeline — including the Python
    side — oracle-checkable in SQL."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            meta = [decode_image(b) for b in batch["img"]]
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "n_pixels": [m[0] * m[1] for m in meta],
                    "mean_luma": [m[2] for m in meta],
                }
            )

    d = load(spark, sf_dir, "documents")
    imgs = d.select("doc_id", F.col("text").cast("binary").alias("img"))
    return imgs.mapInPandas(
        decode, "doc_id long, width long, height long, n_pixels long, mean_luma double"
    )


@register(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id, g.i AS frame_no,
           md5(text || '-' || CAST(g.i AS VARCHAR)) AS frame_key
    FROM documents, generate_series(1, 3) g(i)
    WHERE g.i <= 1 + n_chars % 3
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: one binary blob → N frame rows
    (1→N mapInPandas expansion, frame count data-dependent). Frame bytes
    are stand-in keys (hash of blob + frame index); a real build extracts
    actual frames at this exact seam."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out_id, out_no, out_key = [], [], []
            for doc_id, text, n_chars in zip(
                batch["doc_id"], batch["text"], batch["n_chars"]
            ):
                for i in range(1, 2 + int(n_chars) % 3):
                    out_id.append(doc_id)
                    out_no.append(i)
                    out_key.append(hashlib.md5(f"{text}-{i}".encode()).hexdigest())
            yield pd.DataFrame({"doc_id": out_id, "frame_no": out_no, "frame_key": out_key})

    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", "text", "n_chars").mapInPandas(
        frames, "doc_id long, frame_no long, frame_key string"
    )


def decode_audio(data: bytes) -> tuple[int, int]:
    """STUB audio decode — deterministic fake derived from md5(data).

    A production build replaces this body with a real decoder (soundfile/
    ffmpeg); the Spark plumbing around it is unchanged. Returns
    (sample_rate, n_windows)."""
    h = hashlib.md5(data).digest()
    sample_rate = 8000 * (1 + h[0] % 3)  # 8/16/24 kHz
    n_windows = 1 + h[1] % 4
    return sample_rate, n_windows


@register(
    "mm_audio_feature",
    oracle="""
    SELECT doc_id,
           8000 * (1 + ('0x' || substr(md5(text), 1, 2))::BIGINT % 3) AS sample_rate,
           g.i AS window_no,
           round(('0x' || substr(md5(text || '-w' || CAST(g.i AS VARCHAR)), 1, 4))::BIGINT
                 / 65535.0, 6) AS energy
    FROM documents, generate_series(1, 4) g(i)
    WHERE g.i <= 1 + ('0x' || substr(md5(text), 3, 2))::BIGINT % 4
    """,
)
def mm_audio_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature-extraction plumbing — completes the image/video/audio
    triple: one binary blob → per-window feature rows (the windowed-
    energy/MFCC shape), a data-dependent 1→N mapInPandas expansion whose
    window count and per-window energy come from the decode_audio STUB +
    a hash-derived energy kernel, so the entire pipeline including the
    Python side is oracle-checkable in SQL. A real build swaps the two
    kernels for a codec + FFT at this exact seam; batch iteration,
    Arrow transfer, output schema, and the blob→rows fan-out are real.
    Scale shape: map-only (zero shuffle) — feature extraction is
    embarrassingly parallel and the expansion factor is bounded by the
    window count, so output partitioning follows input partitioning."""

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out_id, out_sr, out_no, out_en = [], [], [], []
            for doc_id, blob in zip(batch["doc_id"], batch["audio"]):
                sample_rate, n_windows = decode_audio(blob)
                text = blob.decode("utf-8")
                for i in range(1, n_windows + 1):
                    out_id.append(doc_id)
                    out_sr.append(sample_rate)
                    out_no.append(i)
                    h4 = hashlib.md5(f"{text}-w{i}".encode()).hexdigest()[:4]
                    out_en.append(round(int(h4, 16) / 65535.0, 6))
            yield pd.DataFrame(
                {
                    "doc_id": out_id,
                    "sample_rate": out_sr,
                    "window_no": out_no,
                    "energy": out_en,
                }
            )

    d = load(spark, sf_dir, "documents")
    audio = d.select("doc_id", F.col("text").cast("binary").alias("audio"))
    return audio.mapInPandas(
        features, "doc_id long, sample_rate long, window_no long, energy double"
    )


@register(
    "mm_image_resize",
    oracle="""
    SELECT doc_id,
           1 + ('0x' || substr(md5(text), 1, 2))::BIGINT % 64 AS src_width,
           1 + ('0x' || substr(md5(text), 3, 2))::BIGINT % 64 AS src_height,
           least(1 + ('0x' || substr(md5(text), 1, 2))::BIGINT % 64, 32) AS dst_width,
           least(1 + ('0x' || substr(md5(text), 3, 2))::BIGINT % 64, 32) AS dst_height,
           md5(text || '|resize|'
               || CAST(least(1 + ('0x' || substr(md5(text), 1, 2))::BIGINT % 64, 32) AS VARCHAR)
               || 'x'
               || CAST(least(1 + ('0x' || substr(md5(text), 3, 2))::BIGINT % 64, 32) AS VARCHAR))
             AS resized_key,
           least(1 + ('0x' || substr(md5(text), 1, 2))::BIGINT % 64, 32)
             * least(1 + ('0x' || substr(md5(text), 3, 2))::BIGINT % 64, 32) <= 600
             AS fits_budget
    FROM documents
    """,
)
def mm_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize plumbing — the remaining enumerated multimodal verb
    (decode ✓ feature-extract ✓ frame-sample ✓ resize): binary blob →
    decode dims (decode_image STUB) → clamp to a 32×32 edge limit →
    re-encode key for the resized payload. The resized bytes are a
    hash-derived stand-in key (a real build swaps in an interpolation
    kernel + encoder at this exact seam); dims math, the 600-max-pixel
    budget flag (chosen so the fixture exercises both branches), and the mapInPandas batch path are real. Map-only —
    at 100 TB resize is the canonical embarrassingly-parallel
    preprocessing step, and shuffling raw bytes to do it would dominate
    the kernel cost, so output partitioning must follow input
    partitioning (zero Exchange, same contract as mm_audio_feature)."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = {
                "doc_id": [], "src_width": [], "src_height": [],
                "dst_width": [], "dst_height": [], "resized_key": [],
                "fits_budget": [],
            }
            for doc_id, blob in zip(batch["doc_id"], batch["img"]):
                w, h, _ = decode_image(blob)
                dw, dh = min(w, 32), min(h, 32)
                text = blob.decode("utf-8")
                key = hashlib.md5(f"{text}|resize|{dw}x{dh}".encode()).hexdigest()
                rows["doc_id"].append(doc_id)
                rows["src_width"].append(w)
                rows["src_height"].append(h)
                rows["dst_width"].append(dw)
                rows["dst_height"].append(dh)
                rows["resized_key"].append(key)
                rows["fits_budget"].append(dw * dh <= 600)
            yield pd.DataFrame(rows)

    d = load(spark, sf_dir, "documents")
    imgs = d.select("doc_id", F.col("text").cast("binary").alias("img"))
    return imgs.mapInPandas(
        resize,
        "doc_id long, src_width long, src_height long, dst_width long,"
        " dst_height long, resized_key string, fits_budget boolean",
    )
