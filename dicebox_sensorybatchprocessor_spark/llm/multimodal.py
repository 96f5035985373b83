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
from dicebox_sensorybatchprocessor_spark.utils import fan_out_scan


def decode_image(data: bytes) -> tuple[int, int, float]:
    """STUB image decode — deterministic fake derived from md5(data).

    The DEFAULT decoder hook: keeps the registered mm_* twins
    SQL-oracle-checkable. A production build passes a real decoder to
    image_meta_df/image_resize_df instead (llm/png_codec.py:decode_png
    is the shipped pure-stdlib example — same (bytes) -> (width, height,
    mean_luma) contract, raises on corrupt bytes). Returns (width,
    height, mean_luma)."""
    h = hashlib.md5(data).digest()
    width = 1 + h[0] % 64
    height = 1 + h[1] % 64
    mean_luma = round(h[2] / 255.0, 6)
    return width, height, mean_luma


def stub_resize(data: bytes, dst_width: int, dst_height: int) -> bytes:
    """STUB resize kernel — the DEFAULT resizer hook: the resized payload
    is the md5 key of (content, dst dims), utf-8 hex bytes, so the
    registered twin's resized_key is oracle-checkable in SQL. A
    production build passes llm/png_codec.py:resize_png (or a
    PIL-backed kernel) instead — same (bytes, w, h) -> bytes contract."""
    text = data.decode("utf-8")
    return hashlib.md5(f"{text}|resize|{dst_width}x{dst_height}".encode()).hexdigest().encode()


def image_meta_df(
    df: DataFrame,
    img_col: str = "img",
    id_col: str = "doc_id",
    decoder=decode_image,
) -> DataFrame:
    """Image decode + feature-extract over a user's binary column:
    Arrow-batched mapInPandas applies ``decoder`` (bytes -> (width,
    height, mean_luma)) per blob. Rows whose bytes FAIL to decode come
    back with null metadata and ``decode_error`` set — route them to a
    dead-letter sink (``filter(col('decode_error').isNotNull())`` or
    api.quarantine_stream) instead of killing the job; one corrupt blob
    in a 100 TB corpus must cost one row, not one stage retry. The
    decoder is closure-captured, so a driver-supplied real codec
    serializes to executors with the plan. Map-only: zero shuffle,
    output partitioning follows input partitioning."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, ws, hs, lumas, errs = [], [], [], [], []
            for rid, blob in zip(batch[id_col], batch[img_col]):
                try:
                    w, h, luma = decoder(bytes(blob))
                    err = None
                except Exception as exc:  # corrupt bytes -> quarantine row
                    w = h = luma = None
                    err = f"{type(exc).__name__}: {exc}"
                ids.append(rid)
                ws.append(w)
                hs.append(h)
                lumas.append(luma)
                errs.append(err)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "width": pd.array(ws, dtype="Int64"),
                    "height": pd.array(hs, dtype="Int64"),
                    "n_pixels": pd.array(
                        [None if w is None else w * h for w, h in zip(ws, hs)],
                        dtype="Int64",
                    ),
                    "mean_luma": pd.array(lumas, dtype="Float64"),
                    "decode_error": errs,
                }
            )

    return df.select(id_col, img_col).mapInPandas(
        kernel,
        f"{id_col} long, width long, height long, n_pixels long,"
        " mean_luma double, decode_error string",
    )


def image_resize_df(
    df: DataFrame,
    img_col: str = "img",
    id_col: str = "doc_id",
    max_edge: int = 32,
    decoder=decode_image,
    resizer=stub_resize,
) -> DataFrame:
    """Image resize over a user's binary column: ``decoder`` reads source
    dims, edges clamp to ``max_edge``, ``resizer`` (bytes, dst_w, dst_h)
    -> bytes produces the resized payload. Failures in either kernel
    produce a ``decode_error`` quarantine row (null metadata, null
    payload) — same contract as image_meta_df. Map-only; shuffling raw
    bytes to resize them would dominate the kernel cost at scale, so
    output partitioning must follow input partitioning."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = {
                id_col: [], "src_width": [], "src_height": [],
                "dst_width": [], "dst_height": [], "resized": [], "errs": [],
            }
            for rid, blob in zip(batch[id_col], batch[img_col]):
                try:
                    w, h, _ = decoder(bytes(blob))
                    dw, dh = min(w, max_edge), min(h, max_edge)
                    payload = resizer(bytes(blob), dw, dh)
                    err = None
                except Exception as exc:
                    w = h = dw = dh = payload = None
                    err = f"{type(exc).__name__}: {exc}"
                rows[id_col].append(rid)
                rows["src_width"].append(w)
                rows["src_height"].append(h)
                rows["dst_width"].append(dw)
                rows["dst_height"].append(dh)
                rows["resized"].append(payload)
                rows["errs"].append(err)
            yield pd.DataFrame(
                {
                    id_col: rows[id_col],
                    "src_width": pd.array(rows["src_width"], dtype="Int64"),
                    "src_height": pd.array(rows["src_height"], dtype="Int64"),
                    "dst_width": pd.array(rows["dst_width"], dtype="Int64"),
                    "dst_height": pd.array(rows["dst_height"], dtype="Int64"),
                    "resized": rows["resized"],
                    "decode_error": rows["errs"],
                }
            )

    return df.select(id_col, img_col).mapInPandas(
        kernel,
        f"{id_col} long, src_width long, src_height long, dst_width long,"
        " dst_height long, resized binary, decode_error string",
    )


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
    decode kernel → typed metadata. Thin wrapper over image_meta_df with
    the decode_image STUB (hash-derived) as the decoder hook, which makes
    the whole pipeline — including the Python side — oracle-checkable in
    SQL; the stub never fails, so the quarantine column is dropped here
    (tests/test_multimodal_codec.py exercises the real-codec + corrupt-
    bytes path through the same seam)."""
    d = load(spark, sf_dir, "documents")
    imgs = d.select("doc_id", F.col("text").cast("binary").alias("img"))
    return image_meta_df(imgs, img_col="img", id_col="doc_id").select(
        "doc_id", "width", "height", "n_pixels", "mean_luma"
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


def stub_audio_features(data: bytes) -> tuple[int, list[float]]:
    """DEFAULT audio-feature hook: decode_audio's hash-derived
    (sample_rate, window count) plus a hash-derived energy per window —
    keeps the registered mm_audio_feature twin SQL-oracle-checkable. A
    production build passes llm.png_codec-style real kernels instead
    (llm/wav_codec.py:decode_wav is the shipped example — same
    (bytes) -> (sample_rate, [energy, ...]) contract, raises on corrupt
    bytes)."""
    sample_rate, n_windows = decode_audio(data)
    text = data.decode("utf-8")
    energies = [
        round(
            int(hashlib.md5(f"{text}-w{i}".encode()).hexdigest()[:4], 16) / 65535.0,
            6,
        )
        for i in range(1, n_windows + 1)
    ]
    return sample_rate, energies


def audio_features_df(
    df: DataFrame,
    audio_col: str = "audio",
    id_col: str = "doc_id",
    decoder=stub_audio_features,
) -> DataFrame:
    """Windowed audio features over a user's binary column: ``decoder``
    (bytes -> (sample_rate, [energy per window])) drives a 1→N
    mapInPandas expansion — the windowed-energy/MFCC shape. Blobs that
    fail to decode come back as ONE quarantine row (null features,
    decode_error set) rather than a stage failure — same contract as
    image_meta_df. Map-only: the expansion factor is bounded by the
    window count, output partitioning follows input partitioning, zero
    shuffle."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, srs, nos, ens, errs = [], [], [], [], []
            for rid, blob in zip(batch[id_col], batch[audio_col]):
                try:
                    sample_rate, energies = decoder(bytes(blob))
                    for i, e in enumerate(energies, start=1):
                        ids.append(rid)
                        srs.append(sample_rate)
                        nos.append(i)
                        ens.append(e)
                        errs.append(None)
                except Exception as exc:
                    ids.append(rid)
                    srs.append(None)
                    nos.append(None)
                    ens.append(None)
                    errs.append(f"{type(exc).__name__}: {exc}")
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "sample_rate": pd.array(srs, dtype="Int64"),
                    "window_no": pd.array(nos, dtype="Int64"),
                    "energy": pd.array(ens, dtype="Float64"),
                    "decode_error": errs,
                }
            )

    return df.select(id_col, audio_col).mapInPandas(
        kernel,
        f"{id_col} long, sample_rate long, window_no long, energy double,"
        " decode_error string",
    )


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
    energy/MFCC shape), a data-dependent 1→N mapInPandas expansion. Thin
    wrapper over audio_features_df with the stub_audio_features hook
    (hash-derived sample rate / window count / energies), so the entire
    pipeline including the Python side is oracle-checkable in SQL; the
    stub never fails, so the quarantine column is dropped here. A real
    build passes wav_codec.decode_wav (or an ffmpeg-backed kernel) at
    the same seam — tests/test_multimodal_codec.py proves it with real
    RIFF/WAVE bytes including a corrupt-blob quarantine row. Scale
    shape: map-only (zero shuffle) — feature extraction is
    embarrassingly parallel and the expansion factor is bounded by the
    window count, so output partitioning follows input partitioning."""
    d = load(spark, sf_dir, "documents")
    audio = d.select("doc_id", F.col("text").cast("binary").alias("audio"))
    return audio_features_df(audio, audio_col="audio", id_col="doc_id").select(
        "doc_id", "sample_rate", "window_no", "energy"
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
    decode dims → clamp to a 32×32 edge limit → resized payload. Thin
    wrapper over image_resize_df with the STUB hooks (decode_image /
    stub_resize), whose payload is the md5 key of (content, dst dims) —
    oracle-checkable in SQL; a real build passes png_codec.resize_png at
    the same seam (tests/test_multimodal_codec.py proves it). The
    600-max-pixel budget flag (chosen so the fixture exercises both
    branches) is computed JVM-side. Map-only — at 100 TB resize is the
    canonical embarrassingly-parallel preprocessing step, and shuffling
    raw bytes to do it would dominate the kernel cost, so output
    partitioning must follow input partitioning (zero Exchange, same
    contract as mm_audio_feature)."""
    d = load(spark, sf_dir, "documents")
    imgs = d.select("doc_id", F.col("text").cast("binary").alias("img"))
    return image_resize_df(imgs, img_col="img", id_col="doc_id", max_edge=32).select(
        "doc_id",
        "src_width",
        "src_height",
        "dst_width",
        "dst_height",
        F.col("resized").cast("string").alias("resized_key"),
        ((F.col("dst_width") * F.col("dst_height")) <= 600).alias("fits_budget"),
    )


@register(
    "mm_ppm_resize_real",
    oracle="""
    SELECT doc_id,
           CAST(1 + n_chars % 13 AS BIGINT) AS src_width,
           CAST(1 + doc_id % 11 AS BIGINT) AS src_height,
           CAST(least(1 + n_chars % 13, 8) AS BIGINT) AS dst_width,
           CAST(least(1 + doc_id % 11, 8) AS BIGINT) AS dst_height,
           round((doc_id % 256) / 255.0, 6) AS mean_luma
    FROM documents
    """,
)
def mm_ppm_resize_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-kernel image leg, value-checked end to end (r12, VERDICT r11
    #5): per document a deterministic CONSTANT grayscale PGM is encoded
    (width = 1+n_chars%13, height = 1+doc_id%11, pixel = doc_id%256 —
    wire bytes via llm/ppm_codec.encode_ppm), box-filter-resampled to an
    8-px edge clamp with resize_ppm, and the RESIZED payload re-decoded
    with decode_ppm. Because an area-average of a constant image is
    exactly that constant, the decoded mean_luma must equal
    (doc_id%256)/255 — real pixel arithmetic whose result DuckDB
    recomputes value-for-value, unlike the registered stub twins whose
    payloads are hash keys (mm_image_resize) — and the decoded dst dims
    must equal the clamp arithmetic. The whole synth → encode → resize
    → decode chain runs inside ONE Arrow-batched mapInPandas: map-only,
    zero Exchange, the same 100 TB contract as the other mm_* legs."""
    from dicebox_sensorybatchprocessor_spark.llm.ppm_codec import (
        decode_ppm,
        encode_ppm,
        resize_ppm,
    )

    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {
                "doc_id": [], "src_width": [], "src_height": [],
                "dst_width": [], "dst_height": [], "mean_luma": [],
            }
            for rid, n_chars in zip(batch["doc_id"], batch["n_chars"]):
                w, h, val = 1 + int(n_chars) % 13, 1 + int(rid) % 11, int(rid) % 256
                blob = encode_ppm(w, h, 1, bytes([val] * (w * h)))
                resized = resize_ppm(blob, min(w, 8), min(h, 8))
                dw, dh, luma = decode_ppm(resized)
                out["doc_id"].append(rid)
                out["src_width"].append(w)
                out["src_height"].append(h)
                out["dst_width"].append(dw)
                out["dst_height"].append(dh)
                out["mean_luma"].append(luma)
            yield pd.DataFrame(out)

    return d.mapInPandas(
        kernel,
        "doc_id long, src_width long, src_height long, dst_width long,"
        " dst_height long, mean_luma double",
    )


@register(
    "mm_mulaw_energy_real",
    oracle="""
    SELECT doc_id,
           CAST(8000 AS BIGINT) AS sample_rate,
           g.i AS window_no,
           0.0 AS energy
    FROM documents, generate_series(1, 3) g(i)
    WHERE g.i <= 1 + doc_id % 3
    """,
)
def mm_mulaw_energy_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-kernel audio leg, value-checked end to end (r12, VERDICT r11
    #5): per document a deterministic SILENT µ-law WAV is encoded
    (8 kHz, exactly 256·(1+doc_id%3) samples — wire bytes via
    llm/wav_codec.encode_mulaw_wav, RIFF format tag 7) and decoded with
    decode_mulaw_wav (manual RIFF walk + G.711 segment expansion +
    windowed RMS at window=256). G.711 encodes true silence losslessly
    (compress(0) → 0xFF → expand → 0), so every window's RMS energy is
    exactly 0.0 and the window COUNT is the sample arithmetic DuckDB
    recomputes — the energy path exercised with real sample math in the
    driver gate, complementing the stub twin (mm_audio_feature) whose
    energies are hash-derived. One mapInPandas with 1→N window
    expansion: map-only, zero Exchange."""
    from dicebox_sensorybatchprocessor_spark.llm.wav_codec import (
        decode_mulaw_wav,
        encode_mulaw_wav,
    )

    # fan out (r15): 5000 pure-Python codec round-trips on a one-split
    # scan would all land on a single Arrow worker (guide §2.5)
    d = fan_out_scan(load(spark, sf_dir, "documents")).select("doc_id")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, rates, nos, ens = [], [], [], []
            for rid in batch["doc_id"]:
                n = 256 * (1 + int(rid) % 3)
                blob = encode_mulaw_wav(8000, [0.0] * n)
                rate, energies = decode_mulaw_wav(blob, window=256)
                for i, e in enumerate(energies, start=1):
                    ids.append(rid)
                    rates.append(rate)
                    nos.append(i)
                    ens.append(e)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "sample_rate": rates,
                    "window_no": nos,
                    "energy": ens,
                }
            )

    return d.mapInPandas(
        kernel,
        "doc_id long, sample_rate long, window_no long, energy double",
    )
