"""Pure-Python/numpy WAV (RIFF/WAVE) decoder — the audio leg of the
multimodal decoder contract (companions: functions/png.py,
functions/jpeg.py). The reference treats non-text payloads as opaque
attachments; here audio becomes a REAL decoded waveform so the Arrow
feature stage computes genuine signal statistics instead of byte
histograms.

Scope: canonical RIFF/WAVE container; integer PCM at 8 (unsigned),
16/24/32-bit (signed little-endian); IEEE float32/float64; and
WAVE_FORMAT_EXTENSIBLE wrapping any of those. Compressed formats
(ADPCM, a-law/mu-law, MP3-in-WAV) raise ValueError with a specific
message — the same documented-boundary pattern as progressive JPEG.

Raises ValueError on ANY invalid input (bad magic, truncated chunks,
data not divisible by the frame size, absurd geometry) so the feature
adapter can flag corrupt rows instead of crashing the executor batch.
Allocation is bounded by the declared data-chunk size BEFORE any array
is built (the PNG decompression-bomb lesson applies even without
compression: a crafted chunk size must not drive the allocation).

Validated in tests/test_ops.py against CPython's test-suite audio
fixtures (Lib/test/audiodata/pluck-pcm{8,16,24,32}.wav — the SAME
recording encoded at four depths by a real encoder, giving cross-depth
ground truth exactly like the JPEG codec's cross-format checks) and
against the stdlib `wave` module as an independent container parser.
"""

from __future__ import annotations

import struct

import numpy as np

# wFormatTag values we decode (anything else is a documented boundary)
_FMT_PCM = 0x0001
_FMT_FLOAT = 0x0003
_FMT_EXTENSIBLE = 0xFFFE

# Max data-chunk bytes we will allocate for (~100 MB ≈ 9.5 min of
# 44.1 kHz stereo 16-bit): beyond fixture/corpus-row scale, and a cap on
# what a crafted header can make the executor allocate.
_MAX_DATA_BYTES = 100 * 1024 * 1024


def _chunks(payload: bytes):
    """Yield (chunk_id, start, size) for every top-level RIFF sub-chunk,
    validating declared sizes against the physical payload."""
    if len(payload) < 12:
        raise ValueError("not a WAV: too short for a RIFF header")
    if payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE magic")
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        start = pos + 8
        if start + size > len(payload):
            raise ValueError(f"truncated WAV chunk {cid!r}")
        yield cid, start, size
        pos = start + size + (size & 1)  # chunks are word-aligned
    if pos != len(payload) and pos + 8 > len(payload) and pos < len(payload):
        # trailing garbage shorter than a chunk header
        raise ValueError("trailing bytes after last WAV chunk")


def wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """bytes -> (samples, sample_rate).

    samples is float64 of shape (n_frames, n_channels) scaled to
    [-1, 1] (integer full-scale maps to ±1; float data passes through).
    Raises ValueError on ANY invalid or unsupported input.
    """
    fmt = None
    data = None
    for cid, start, size in _chunks(payload):
        if cid == b"fmt " and fmt is None:
            if size < 16:
                raise ValueError("WAV fmt chunk too small")
            tag, n_ch, rate, _byte_rate, block_align, bits = struct.unpack_from(
                "<HHIIHH", payload, start
            )
            if tag == _FMT_EXTENSIBLE:
                # cbSize(2) + validBits(2) + channelMask(4) + GUID(16):
                # the real format tag is the GUID's first two bytes
                if size < 40:
                    raise ValueError("WAV extensible fmt chunk too small")
                (tag,) = struct.unpack_from("<H", payload, start + 24)
            fmt = (tag, n_ch, rate, block_align, bits)
        elif cid == b"data" and data is None:
            data = payload[start : start + size]
    if fmt is None:
        raise ValueError("WAV missing fmt chunk")
    if data is None:
        raise ValueError("WAV missing data chunk")
    tag, n_ch, rate, block_align, bits = fmt
    if tag not in (_FMT_PCM, _FMT_FLOAT):
        raise ValueError(f"unsupported WAV format tag 0x{tag:04x} (compressed?)")
    if n_ch < 1 or n_ch > 64:
        raise ValueError(f"unsupported WAV channel count {n_ch}")
    if rate < 1 or rate > 1_000_000:
        raise ValueError(f"unsupported WAV sample rate {rate}")
    if tag == _FMT_PCM and bits not in (8, 16, 24, 32):
        raise ValueError(f"unsupported PCM bit depth {bits}")
    if tag == _FMT_FLOAT and bits not in (32, 64):
        raise ValueError(f"unsupported float bit depth {bits}")
    frame_size = n_ch * (bits // 8)
    if block_align != frame_size:
        raise ValueError(
            f"WAV block align {block_align} != channels*depth {frame_size}"
        )
    if len(data) == 0 or len(data) % frame_size:
        raise ValueError("WAV data size not a whole number of frames")
    if len(data) > _MAX_DATA_BYTES:
        raise ValueError("WAV data chunk exceeds the decoder allocation cap")

    if tag == _FMT_FLOAT:
        out = np.frombuffer(data, dtype="<f4" if bits == 32 else "<f8").astype(
            np.float64
        )
    elif bits == 8:
        out = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif bits == 16:
        out = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 32:
        out = np.frombuffer(data, dtype="<i4").astype(np.float64) / 2147483648.0
    else:  # 24-bit: assemble 3-byte little-endian frames, then sign-extend
        b = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3).astype(np.int64)
        val = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        val = (val ^ 0x800000) - 0x800000
        out = val.astype(np.float64) / 8388608.0
    return out.reshape(-1, n_ch), rate


_N_BANDS = 12


def audio_features(samples: np.ndarray, rate: int) -> list[float]:
    """The 23-dim audio feature layout (mirrors raster_features' shape):
    [duration_sec, sample_rate, n_channels, n_frames, rms, peak,
    zero_crossing_rate, spectral_centroid_hz, spectral_bandwidth_hz,
    rolloff85_hz, dominant_freq_hz, band12...] where band12 is the
    energy profile over 12 log-spaced frequency bands (20 Hz..Nyquist),
    normalized to sum 1. All values finite; silence yields zeros for
    the spectral block instead of NaNs."""
    n, n_ch = samples.shape
    mono = samples.mean(axis=1)
    rms = float(np.sqrt(np.mean(mono**2)))
    peak = float(np.abs(samples).max()) if n else 0.0
    signs = np.signbit(mono)
    zcr = float(np.count_nonzero(signs[1:] != signs[:-1]) / max(n - 1, 1))

    mag = np.abs(np.fft.rfft(mono))
    freqs = np.fft.rfftfreq(n, 1.0 / rate)
    mag[0] = 0.0  # DC offset is not signal content
    total = float(mag.sum())
    if total > 0.0:
        centroid = float((freqs * mag).sum() / total)
        bandwidth = float(np.sqrt(((freqs - centroid) ** 2 * mag).sum() / total))
        rolloff = float(freqs[int(np.searchsorted(np.cumsum(mag), 0.85 * total))])
        dominant = float(freqs[int(mag.argmax())])
    else:
        centroid = bandwidth = rolloff = dominant = 0.0

    nyquist = rate / 2.0
    edges = np.geomspace(20.0, max(nyquist, 20.0 + 1e-6), _N_BANDS + 1)
    power = mag**2
    band_e = np.array(
        [
            float(power[(freqs >= lo) & (freqs < hi)].sum())
            for lo, hi in zip(edges[:-1], edges[1:])
        ]
    )
    e_total = band_e.sum()
    bands = (band_e / e_total) if e_total > 0 else np.zeros(_N_BANDS)

    return [
        float(n / rate), float(rate), float(n_ch), float(n),
        rms, peak, zcr, centroid, bandwidth, rolloff, dominant,
        *[float(v) for v in bands],
    ]


def wav_feature_decoder(payload: bytes, meta) -> list[float]:
    """Decoder-contract adapter: real signal statistics from the decoded
    waveform. Non-WAV payloads raise (→ ok=False rows)."""
    samples, rate = wav_decode(payload)
    return audio_features(samples, rate)
