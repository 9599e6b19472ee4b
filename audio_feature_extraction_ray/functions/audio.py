"""Pure-numpy audio DSP kernels — the REAL recast of the reference's core
extractors (STFTExtractor / MelSpectrogramExtractor / frame scalar family,
design.md:451-910, tasks.md:713-735), built only on public formulas:

- PCM WAV decode via the stdlib `wave` module (no codec libraries needed for
  RIFF/PCM payloads — 16/8/32-bit PCM covered; other encodings raise).
- Hann-windowed STFT magnitude (np.fft.rfft over strided frames).
- HTK mel filterbank (mel = 2595 * log10(1 + f/700)) + log-mel energies.
- Frame scalar family: RMS energy, zero-crossing rate, spectral centroid.

Everything is deterministic, vectorized over all frames at once, and
unit-tested against closed-form signals (pure tones, DC, silence). No Ray
imports — identical code runs inside actor-pool stages and in tests.
"""

from __future__ import annotations

import io
import wave

import numpy as np


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes -> (mono float32 samples in [-1, 1], sample_rate).

    Stdlib-only decode: supports 8-bit unsigned, 16-bit and 32-bit signed
    PCM; multi-channel is averaged to mono. Raises ValueError on non-PCM
    (compressed) payloads."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        sr = w.getframerate()
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM sample width {width}")
    if n_ch > 1:
        x = x[: (x.size // n_ch) * n_ch].reshape(-1, n_ch).mean(axis=1)
    return x.astype(np.float32), sr


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """float samples in [-1, 1] -> 16-bit PCM WAV bytes (fixture builder +
    round-trip tests)."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm16 = np.round(pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm16.tobytes())
    return buf.getvalue()


def frame_signal(x: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """(n_frames, n_fft) strided frame view; pads the tail with zeros so at
    least one frame always exists (the reference's window-edge policy)."""
    if x.size < n_fft:
        x = np.pad(x, (0, n_fft - x.size))
    n = 1 + (x.size - n_fft) // hop
    return np.lib.stride_tricks.sliding_window_view(x, n_fft)[:: hop][:n]


def stft_magnitude(x: np.ndarray, n_fft: int = 1024, hop: int = 256) -> np.ndarray:
    """Hann-windowed STFT magnitude, (n_frames, n_fft//2 + 1). The webtext
    fixed-width invariant's origin: n_freq_bins == n_fft//2 + 1."""
    frames = frame_signal(x.astype(np.float64), n_fft, hop)
    window = np.hanning(n_fft)
    return np.abs(np.fft.rfft(frames * window, axis=1))


def hz_to_mel(f: np.ndarray | float) -> np.ndarray:
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz(m: np.ndarray | float) -> np.ndarray:
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(sr: int, n_fft: int, n_mels: int) -> np.ndarray:
    """(n_mels, n_fft//2 + 1) triangular HTK-mel filterbank."""
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2.0), n_mels + 2))
    fb = np.zeros((n_mels, n_bins))
    for m in range(n_mels):
        lo, ctr, hi = mel_pts[m], mel_pts[m + 1], mel_pts[m + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-12)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-12)
        fb[m] = np.maximum(0.0, np.minimum(up, down))
    return fb


def log_mel_spectrogram(
    x: np.ndarray, sr: int, n_fft: int = 1024, hop: int = 256, n_mels: int = 32
) -> np.ndarray:
    """(n_frames, n_mels) log10 mel-power spectrogram (floored at 1e-10)."""
    mag = stft_magnitude(x, n_fft, hop)
    fb = mel_filterbank(sr, n_fft, n_mels)
    power = mag**2
    return np.log10(np.maximum(power @ fb.T, 1e-10))


def frame_rms(x: np.ndarray, n_fft: int = 1024, hop: int = 256) -> np.ndarray:
    frames = frame_signal(x.astype(np.float64), n_fft, hop)
    return np.sqrt((frames**2).mean(axis=1))


def frame_zcr(x: np.ndarray, n_fft: int = 1024, hop: int = 256) -> np.ndarray:
    """Zero-crossing rate per frame (sign changes / frame length)."""
    frames = frame_signal(x.astype(np.float64), n_fft, hop)
    signs = np.signbit(frames)
    return (signs[:, 1:] != signs[:, :-1]).mean(axis=1)


def spectral_centroid(x: np.ndarray, sr: int, n_fft: int = 1024, hop: int = 256) -> np.ndarray:
    """Per-frame spectral centroid in Hz (0 for silent frames)."""
    mag = stft_magnitude(x, n_fft, hop)
    freqs = np.linspace(0.0, sr / 2.0, mag.shape[1])
    denom = mag.sum(axis=1)
    out = np.zeros(mag.shape[0])
    nz = denom > 0
    out[nz] = (mag[nz] * freqs).sum(axis=1) / denom[nz]
    return out


# ---------------------------------------------------------------------------
# IMA ADPCM (WAV format tag 0x11): a REAL compressed audio codec decoded
# with zero external dependencies (public spec: IMA "Recommended Practices
# for Enhancing Digital Audio Compatibility", the same tables every
# implementation uses). Decode is vectorized ACROSS blocks — blocks are
# independent, so the per-sample state recurrence runs in lockstep over all
# blocks at once (one numpy step per sample position, not per sample).

_IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)
_IMA_STEP_TABLE = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
        41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
        190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
        724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
        6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
        16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int32,
)


def _parse_riff_fmt(payload: bytes):
    """Minimal RIFF walker: returns (fmt_tag, n_channels, sample_rate,
    block_align, data_bytes). Raises ValueError on malformed RIFF."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("RIFF missing fmt/data chunk")
    tag, n_ch, sr, _brate, balign, _bits = fmt
    return tag, n_ch, sr, balign, data


def decode_wav_adpcm(payload: bytes) -> tuple[np.ndarray, int]:
    """IMA-ADPCM WAV bytes -> (mono float32 samples in [-1, 1], rate).
    Mono only (the fixture contract); each block decodes independently, so
    the sample loop runs once per sample POSITION with every block advanced
    in lockstep (vectorized state update)."""
    tag, n_ch, sr, balign, data = _parse_riff_fmt(payload)
    if tag != 0x11:
        raise ValueError(f"not IMA-ADPCM (fmt tag {tag:#x})")
    if n_ch != 1:
        raise ValueError("only mono IMA-ADPCM supported")
    nblocks = len(data) // balign
    blocks = np.frombuffer(data[: nblocks * balign], dtype=np.uint8).reshape(
        nblocks, balign
    )
    pred = blocks[:, :2].copy().view("<i2").astype(np.int32).ravel()
    idx = np.clip(blocks[:, 2].astype(np.int32), 0, 88)
    nib_bytes = blocks[:, 4:]
    # nibble order: low first, then high
    nibs = np.empty((nblocks, nib_bytes.shape[1] * 2), dtype=np.int32)
    nibs[:, 0::2] = nib_bytes & 0x0F
    nibs[:, 1::2] = nib_bytes >> 4
    n_per_block = 1 + nibs.shape[1]
    out = np.empty((nblocks, n_per_block), dtype=np.int32)
    out[:, 0] = pred
    for t in range(nibs.shape[1]):  # lockstep over blocks
        delta = nibs[:, t]
        step = _IMA_STEP_TABLE[idx]
        diff = step >> 3
        diff += np.where(delta & 4, step, 0)
        diff += np.where(delta & 2, step >> 1, 0)
        diff += np.where(delta & 1, step >> 2, 0)
        pred = np.where(delta & 8, pred - diff, pred + diff)
        np.clip(pred, -32768, 32767, out=pred)
        idx = np.clip(idx + _IMA_INDEX_TABLE[delta & 7], 0, 88)
        out[:, t + 1] = pred
    x = out.astype(np.float32).ravel() / 32768.0
    return x, sr


def encode_wav_adpcm(
    samples: np.ndarray, sample_rate: int, samples_per_block: int = 505
) -> bytes:
    """Reference IMA-ADPCM encoder (fixture builder + round-trip tests;
    sequential by nature — encode is test-scale only)."""
    import struct

    pcm = np.round(np.clip(np.asarray(samples, np.float64), -1, 1) * 32767).astype(
        np.int32
    )
    nib_per_block = samples_per_block - 1
    if nib_per_block % 2:
        raise ValueError("samples_per_block must be odd (header + even nibbles)")
    balign = 4 + nib_per_block // 2
    blocks = []
    pos = 0
    idx = 0  # step index persists across blocks; each header records it
    while pos < pcm.size:
        chunk = pcm[pos : pos + samples_per_block]
        if chunk.size < samples_per_block:
            chunk = np.pad(chunk, (0, samples_per_block - chunk.size))
        pred = int(chunk[0])
        head_idx = idx
        nibs = []
        for s in chunk[1:]:
            step = int(_IMA_STEP_TABLE[idx])
            diff = int(s) - pred
            nib = 0
            if diff < 0:
                nib = 8
                diff = -diff
            if diff >= step:
                nib |= 4
                diff -= step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nib |= 1
            # decoder-mirror update
            d = step >> 3
            if nib & 4:
                d += step
            if nib & 2:
                d += step >> 1
            if nib & 1:
                d += step >> 2
            pred = pred - d if nib & 8 else pred + d
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + int(_IMA_INDEX_TABLE[nib & 7])))
            nibs.append(nib)
        packed = bytes(
            (nibs[i] & 0x0F) | ((nibs[i + 1] & 0x0F) << 4) for i in range(0, len(nibs), 2)
        )
        blocks.append(struct.pack("<hBB", int(chunk[0]), head_idx, 0) + packed)
        pos += samples_per_block
    data = b"".join(blocks)
    brate = sample_rate * balign // samples_per_block
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, sample_rate, brate, balign, 4, 2, samples_per_block)
    riff = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
