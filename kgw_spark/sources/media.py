"""Deterministic synthetic media corpus (images / audio / video).

The testdata has no binary media table, so the multimodal operators are
driven from a synthesized one: payloads are a pure function of
``media_id`` (LCG byte stream for pixels, quantized sine for audio), so
the same table materializes on any engine — it is a SHARED INPUT in the
oracle sense (like the simhash signature table), while the feature
*computation* is verified against an independent reference
(functions/media_reference.py).
"""

from __future__ import annotations

import numpy as np

from kgw_spark.operators.multimodal import encode_ppm, encode_wav

_MASK = (1 << 64) - 1
_MUL = 6364136223846793005
_INC = 1442695040888963407

AUDIO_RATE = 800
AUDIO_SECONDS = 1


def lcg_bytes(seed: int, n: int) -> bytes:
    """Deterministic byte stream from a 64-bit LCG."""
    x = (seed * _MUL + _INC) & _MASK
    out = bytearray()
    while len(out) < n:
        x = (x * _MUL + _INC) & _MASK
        out.extend(x.to_bytes(8, "big"))
    return bytes(out[:n])


def image_payload(media_id: int, w: int = 16, h: int = 12) -> bytes:
    raster = np.frombuffer(lcg_bytes(media_id, w * h * 3), dtype=np.uint8)
    return encode_ppm(raster.reshape(h, w, 3))


def audio_payload(media_id: int) -> bytes:
    freq = 50.0 * (1 + media_id % 7)
    amp = 0.2 + 0.1 * (media_id % 5)
    n = AUDIO_RATE * AUDIO_SECONDS
    t = np.arange(n) / AUDIO_RATE
    return encode_wav(amp * np.sin(2 * np.pi * freq * t), AUDIO_RATE)


def video_payload(media_id: int, frames: int = 3, w: int = 8, h: int = 6) -> bytes:
    out = b""
    for k in range(frames):
        raster = np.frombuffer(
            lcg_bytes(media_id * 1000 + k, w * h * 3), dtype=np.uint8
        )
        out += encode_ppm(raster.reshape(h, w, 3))
    return out


def synthetic_media_rows(n_each: int = 8) -> list[tuple]:
    """Rows matching multimodal.MEDIA_SCHEMA: ``n_each`` of every kind.
    ids: images 0.., audio 100.., video 200..."""
    rows = []
    for i in range(n_each):
        rows.append((i, "image", "image/x-portable-pixmap", image_payload(i), None))
        rows.append((100 + i, "audio", "audio/wav", audio_payload(100 + i), None))
        rows.append((200 + i, "video", "video/x-ppm-stream", video_payload(200 + i), None))
    return rows
