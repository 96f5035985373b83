"""Real WAV codec for the multimodal audio seam — the audio analog of
llm/png_codec.py.

``audio_features_df`` runs its kernel through a pluggable ``decoder``
hook; the hash-derived stub stays the default (SQL-oracle-checkable
registered twin), and this pure-stdlib (``wave`` + ``struct``) PCM
decoder proves the hook's contract against the real RIFF/WAVE wire
format: variable sample rates, 8/16-bit widths, mono/stereo layouts,
and corrupt bytes raising — the quarantine path.

Scale note: like the PNG codec, the per-sample Python loop is the
proof of the seam, not the production kernel — at 100 TB you plug a
numpy/ffmpeg-backed function into the SAME hook. The hook is
closure-captured into mapInPandas, so a driver-registered real decoder
serializes to executors with the plan.
"""

from __future__ import annotations

import io
import math
import struct
import wave

_WINDOW = 1024  # samples per energy window


def decode_wav(data: bytes, window: int = _WINDOW) -> tuple[int, list[float]]:
    """(sample_rate, per-window RMS energies in [0, 1]) for a PCM WAV
    blob. Samples normalize to [-1, 1] (8-bit unsigned, 16-bit signed
    little-endian); stereo averages to mono; the trailing partial
    window is kept. Raises ``ValueError`` on non-WAV or unsupported
    encodings. Drop-in for llm.multimodal.stub_audio_features."""
    try:
        with wave.open(io.BytesIO(bytes(data))) as wav:
            sample_rate = wav.getframerate()
            n_channels = wav.getnchannels()
            sampwidth = wav.getsampwidth()
            raw = wav.readframes(wav.getnframes())
    except (wave.Error, EOFError) as exc:
        raise ValueError(f"not a decodable WAV: {exc}") from exc
    if sampwidth == 2:
        ints = struct.unpack(f"<{len(raw) // 2}h", raw)
        samples = [x / 32768.0 for x in ints]
    elif sampwidth == 1:
        samples = [(x - 128) / 128.0 for x in raw]
    else:
        raise ValueError(f"unsupported sample width {sampwidth}")
    if n_channels > 1:  # average to mono
        samples = [
            sum(samples[i : i + n_channels]) / n_channels
            for i in range(0, len(samples) - n_channels + 1, n_channels)
        ]
    if not samples:
        raise ValueError("WAV contains no samples")
    energies = []
    for off in range(0, len(samples), window):
        chunk = samples[off : off + window]
        energies.append(
            round(math.sqrt(sum(x * x for x in chunk) / len(chunk)), 6)
        )
    return sample_rate, energies


def encode_wav(
    sample_rate: int, samples: list[float], n_channels: int = 1
) -> bytes:
    """Minimal 16-bit PCM encoder (inverse of decode_wav's supported
    subset) — samples in [-1, 1], interleaved if multi-channel."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wav:
        wav.setnchannels(n_channels)
        wav.setsampwidth(2)
        wav.setframerate(sample_rate)
        ints = [max(-32768, min(32767, int(x * 32768.0))) for x in samples]
        wav.writeframes(struct.pack(f"<{len(ints)}h", *ints))
    return buf.getvalue()
