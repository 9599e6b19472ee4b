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
