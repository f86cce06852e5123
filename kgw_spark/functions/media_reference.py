"""Independent reference implementation of the multimodal feature
contract (operators/multimodal.extract_features) — the driver-side
oracle for the ``media_features`` query.

Independence from the distributed path:

- PPM parsing is a from-scratch header/raster walk (no decode_ppm);
- image means/stds come from EXACT integer pixel sums (sum, sum of
  squares) instead of numpy's two-pass float statistics;
- the luminance histogram is an explicit integer bin count;
- spectral band energies use a direct O(n²) matrix DFT instead of
  np.fft's FFT algorithm (different floating-point evaluation order).

Agreement is compared after the operator's own float32 output
quantization plus ROUND(·, 6) — the fp-noise margin between two honest
implementations (≤1e-12 relative) vanishes at float32's ~6e-8 ulp.
``_round6`` replicates Spark's BigDecimal HALF_UP rounding.
"""

from __future__ import annotations

import io
import math
import wave

import numpy as np

from kgw_spark.functions.ann_reference import _round6
from kgw_spark.operators.multimodal import FEATURE_DIM, _N_AUDIO_BANDS, _N_LUMA_BINS


def _parse_ppm(payload: bytes):
    """(w, h, flat pixel ints) — independent P6 parser."""
    assert payload[:2] == b"P6"
    fields = []
    i = 2
    while len(fields) < 3:
        c = payload[i : i + 1]
        if c == b"#":
            i = payload.index(b"\n", i) + 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while not payload[j : j + 1].isspace():
                j += 1
            fields.append(int(payload[i:j]))
            i = j
    w, h, maxval = fields
    assert maxval == 255
    raster = payload[i + 1 : i + 1 + w * h * 3]
    return w, h, list(raster)


def ref_image_feature(payload: bytes) -> list[float]:
    w, h, px = _parse_ppm(payload)
    npix = w * h
    feats = []
    # channel means then stds, from exact integer sums
    sums = [0, 0, 0]
    sqs = [0, 0, 0]
    for idx, v in enumerate(px):
        c = idx % 3
        sums[c] += v
        sqs[c] += v * v
    for c in range(3):
        feats.append((sums[c] / npix) / 255.0)
    stds = []
    for c in range(3):
        mean = sums[c] / npix
        var = sqs[c] / npix - mean * mean
        stds.append(math.sqrt(max(var, 0.0)) / 255.0)
    feats.extend(stds)
    # 8-bin luminance histogram: luma = per-pixel channel mean
    bins = [0] * _N_LUMA_BINS
    for p in range(npix):
        luma = (px[3 * p] + px[3 * p + 1] + px[3 * p + 2]) / 3.0
        bins[min(int(luma / (256.0 / _N_LUMA_BINS)), _N_LUMA_BINS - 1)] += 1
    feats.extend(b / npix for b in bins)
    feats.extend([w / (w + h), h / (w + h)])
    return feats


def _decode_wav_ref(payload: bytes):
    with wave.open(io.BytesIO(payload), "rb") as wv:
        rate = wv.getframerate()
        n_ch = wv.getnchannels()
        width = wv.getsampwidth()
        raw = wv.readframes(wv.getnframes())
    assert width == 2 and n_ch == 1
    x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    return x, rate


def ref_audio_feature(payload: bytes) -> list[float]:
    x, rate = _decode_wav_ref(payload)
    n = len(x)
    if n == 0:
        return [0.0] * FEATURE_DIM
    rms = math.sqrt(sum(float(v) * float(v) for v in x) / n)
    peak = max(abs(float(v)) for v in x)
    zcr = (
        sum(
            1
            for a, b in zip(x[:-1], x[1:])
            if (a < 0 or (a == 0 and math.copysign(1, a) < 0))
            != (b < 0 or (b == 0 and math.copysign(1, b) < 0))
        )
        / (n - 1)
        if n > 1
        else 0.0
    )
    dur = min(n / rate / 10.0, 1.0)
    # direct matrix DFT (not FFT): X[k] = sum_n x[n] e^{-2pi i k n / N}
    k = np.arange(n // 2 + 1)
    ang = -2.0 * np.pi * np.outer(k, np.arange(n)) / n
    X = (np.cos(ang) + 1j * np.sin(ang)) @ x
    power = np.abs(X) ** 2
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    nyquist = rate / 2.0
    band = np.minimum(
        (freqs / (nyquist / _N_AUDIO_BANDS)).astype(int), _N_AUDIO_BANDS - 1
    )
    total = float(power.sum())
    bands = (
        [float(power[band == b].sum() / total) for b in range(_N_AUDIO_BANDS)]
        if total > 0
        else [0.0] * _N_AUDIO_BANDS
    )
    return [rms, peak, zcr, dur] + bands


def _split_frames(payload: bytes) -> list[bytes]:
    frames = []
    pos = 0
    while pos < len(payload):
        w, h, _px = _parse_ppm(payload[pos:])
        header_end = payload.index(b"255\n", pos) + 4
        end = header_end + w * h * 3
        frames.append(payload[pos:end])
        pos = end
    return frames


def ref_video_feature(payload: bytes) -> list[float]:
    per_frame = [ref_image_feature(f) for f in _split_frames(payload)]
    nf = len(per_frame)
    return [sum(col) / nf for col in zip(*per_frame)]


def ref_media_features(rows: list[tuple]) -> list[tuple]:
    """Expected (media_id, kind, dim, value) rows for extract_features
    over MEDIA_SCHEMA rows, after the operator's float32 quantization
    and the query's ROUND(·, 6)."""
    out = []
    for media_id, kind, _mime, payload, _meta in rows:
        feat = {
            "image": ref_image_feature,
            "audio": ref_audio_feature,
            "video": ref_video_feature,
        }[kind](bytes(payload))
        for dim, v in enumerate(feat):
            out.append((media_id, kind, dim, _round6(float(np.float32(v)))))
    return out
