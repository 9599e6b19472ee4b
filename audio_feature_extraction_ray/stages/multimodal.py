"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode / feature-extract / resize / frame-sample as actor-pool map_batches
stages.

This is the direct descendant of the reference's audio path
(AudioFileLoader/AudioPreprocessor/STFTExtractor, design.md:451-910): a heavy
decoder loaded ONCE per actor, small batches because payload rows are wide,
fixed-width feature vectors out.

Round 2: all three kinds have a REAL no-external-codec path —
- audio: stdlib `wave` PCM decode -> numpy Hann-STFT/HTK-log-mel + frame
  scalars (functions/audio.py), mirroring the reference's STFT/mel chain;
- image: pure-numpy 24-bit BMP codec AND a stdlib-zlib PNG codec (all five
  row filters, gray/RGB/RGBA) -> resize / scalar features / 64-bit average
  perceptual hash (functions/image.py) — PNG makes a real COMPRESSED format
  native;
- video: the declared "RAWV" raw container (length-prefixed BMP frames) AND
  real ANIMATED GIF (stdlib LZW, multi-frame) -> frame sampling, per-frame
  hashes, inter-frame motion energy.
Remaining compressed formats (mp3/flac, jpeg, h264) genuinely require
soundfile/PIL/ffmpeg and raise with the dependency named; `FakeDecoder`
keeps that plumbing testable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.audio import (
    _parse_riff_fmt,
    decode_wav,
    decode_wav_adpcm,
    encode_wav,
    frame_rms,
    frame_zcr,
    log_mel_spectrogram,
    spectral_centroid,
)

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # "audio" | "image" | "video"
        ("payload", pa.binary()),  # opaque encoded bytes
        ("sample_rate", pa.int32()),  # typed metadata (audio)
        ("n_channels", pa.int32()),
    ]
)

N_MEL_FAKE = 16  # width of the fake per-window feature vector


class RealDecoder:
    """Real decode path. Audio: PCM WAV (RIFF) payloads decode with the
    stdlib `wave` module — genuinely real, no codec libraries. Compressed
    audio falls back to `soundfile` when importable; otherwise raises with
    the dependency named. Image/video require PIL/ffmpeg (absent here)."""

    def __init__(self, kind: str = "audio"):
        self.kind = kind
        try:  # optional compressed-audio path
            import soundfile  # type: ignore

            self._soundfile = soundfile
        except ImportError:
            self._soundfile = None

    def __call__(self, payload: bytes) -> np.ndarray:
        if self.kind == "audio":
            if payload[:4] == b"RIFF":
                # module-level import, not call-time: this runs on workers,
                # where a call-time relative import fails if the driver's
                # package dir isn't on the worker's sys.path.
                if _parse_riff_fmt(payload)[0] == 0x11:  # IMA-ADPCM: native
                    return decode_wav_adpcm(payload)[0]
                return decode_wav(payload)[0]
            if self._soundfile is not None:  # pragma: no cover (lib absent here)
                import io

                data, _ = self._soundfile.read(io.BytesIO(payload), dtype="float32")
                return data if data.ndim == 1 else data.mean(axis=1)
            raise NotImplementedError(
                "decoding compressed audio requires the 'soundfile' codec "
                "library (not installed); PCM WAV payloads decode natively"
            )
        if self.kind == "image":
            # BMP and (stdlib-zlib) PNG decode natively; decode_image raises a
            # named NotImplementedError for jpeg. Flat luma in [-1, 1): the
            # common "waveform" contract the windowed feature stage expects
            # from every decoder kind.
            return (to_gray(decode_image(payload)).ravel() / 128.0 - 1.0).astype(
                np.float32
            )
        raise NotImplementedError(
            f"decoding {self.kind!r} payloads requires the ffmpeg codec "
            "libraries, which are not installed in this environment; "
            "use FakeDecoder for plumbing tests"
        )


class FakeDecoder:
    """Deterministic stand-in decode: payload bytes -> float32 'waveform' in
    [-1, 1) (byte values scaled), so every downstream stage sees realistic
    shapes without codec deps."""

    def __init__(self, kind: str = "audio"):
        self.kind = kind

    def __call__(self, payload: bytes) -> np.ndarray:
        b = np.frombuffer(payload, dtype=np.uint8)
        return (b.astype(np.float32) - 128.0) / 128.0


class MediaFeatureExtractor:
    """Actor-pool stage: decode once-per-row, window the samples, emit a
    fixed-width per-window feature matrix (the reference's windowed-frame
    extraction shape: window n_fft, stride hop, design.md:533-555).

    Use: ds.map_batches(MediaFeatureExtractor, fn_constructor_kwargs=...,
         concurrency=N, batch_size=small, batch_format="pyarrow",
         num_cpus=1). Decoder is constructed ONCE per actor."""

    def __init__(self, decoder: str = "fake", window: int = 256, hop: int = 128):
        self.decoder = FakeDecoder() if decoder == "fake" else RealDecoder()
        self.window = window
        self.hop = hop
        # fixed projection basis, seeded -> deterministic across actors
        rng = np.random.default_rng(123)
        self.basis = rng.standard_normal((window, N_MEL_FAKE)).astype(np.float32)

    def __call__(self, tbl: pa.Table) -> pa.Table:
        ids, kinds, nwin, feats = [], [], [], []
        for mid, kind, payload in zip(
            tbl.column("media_id").to_pylist(),
            tbl.column("kind").to_pylist(),
            tbl.column("payload").to_pylist(),
        ):
            x = self.decoder(payload)
            w, h = self.window, self.hop
            if x.size < w:
                x = np.pad(x, (0, w - x.size))
            n = 1 + (x.size - w) // h
            frames = np.lib.stride_tricks.sliding_window_view(x, w)[::h][:n]
            f = np.abs(frames @ self.basis)  # (n, N_MEL_FAKE) fake "mel" energies
            ids.append(mid)
            kinds.append(kind)
            nwin.append(n)
            feats.append(f.mean(axis=0).astype(np.float64))  # per-record summary vector
        mat = np.stack(feats) if feats else np.zeros((0, N_MEL_FAKE))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "n_windows": pa.array(nwin, pa.int64()),
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.ravel(), pa.float64()), N_MEL_FAKE
                ),
            }
        )


def extract_media_features(
    ds: ray.data.Dataset, decoder: str = "fake", concurrency: int = 4, batch_size: int = 64
) -> ray.data.Dataset:
    """Wide binary rows -> SMALL batches, actor pool sized explicitly."""
    return ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


N_MELS = 32
AUDIO_FEATURE_ORDER = [f"logmel_{i}" for i in range(N_MELS)] + [
    "rms_mean",
    "rms_max",
    "zcr_mean",
    "centroid_mean_hz",
    "duration_s",
]


class AudioFeatureExtractor:
    """REAL audio feature extraction as an actor-pool stage: stdlib WAV
    decode -> Hann STFT -> HTK log-mel + frame scalar family (RMS, ZCR,
    spectral centroid), summarized per record into a fixed-width vector
    (AUDIO_FEATURE_ORDER; the n_freq_bins == n_fft//2+1 invariant's home).

    The mel filterbank is built ONCE per actor per sample rate (the
    setup-in-__init__ actor idiom); per-row decode is inherent, everything
    after it is vectorized over all frames at once."""

    def __init__(self, n_fft: int = 1024, hop: int = 256, n_mels: int = N_MELS):
        self.n_fft = n_fft
        self.hop = hop
        self.n_mels = n_mels

    def __call__(self, tbl: pa.Table) -> pa.Table:
        width = len(AUDIO_FEATURE_ORDER)
        ids, nwin = [], []
        rows = []
        for mid, payload in zip(
            tbl.column("media_id").to_pylist(), tbl.column("payload").to_pylist()
        ):
            x, sr = decode_wav(payload)
            mel = log_mel_spectrogram(x, sr, self.n_fft, self.hop, self.n_mels)
            rms = frame_rms(x, self.n_fft, self.hop)
            zcr = frame_zcr(x, self.n_fft, self.hop)
            cen = spectral_centroid(x, sr, self.n_fft, self.hop)
            vec = np.concatenate(
                [
                    mel.mean(axis=0),
                    [rms.mean(), rms.max(), zcr.mean(), cen.mean(), x.size / sr],
                ]
            )
            ids.append(mid)
            nwin.append(mel.shape[0])
            rows.append(vec)
        mat = np.stack(rows) if rows else np.zeros((0, width))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "n_windows": pa.array(nwin, pa.int64()),
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.ravel(), pa.float64()), width
                ),
            }
        )


def extract_audio_features(
    ds: ray.data.Dataset,
    n_fft: int = 1024,
    hop: int = 256,
    concurrency: int = 4,
    batch_size: int = 32,
) -> ray.data.Dataset:
    """Real WAV -> log-mel/scalars pipeline (actor pool, small batches —
    payload rows are wide)."""
    return ds.map_batches(
        AudioFeatureExtractor,
        fn_constructor_kwargs={"n_fft": n_fft, "hop": hop},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def synthetic_wav_table(n: int = 32, seed: int = 11, sr: int = 8000) -> pa.Table:
    """Deterministic REAL-WAV fixture: each row is an encoded PCM WAV of a
    tone + noise mix with known frequency content (used to assert the mel
    peak lands in the right band)."""
    rng = np.random.default_rng(seed)
    payloads = []
    freqs = []
    for i in range(n):
        dur = float(rng.uniform(0.2, 0.6))
        f0 = float(rng.uniform(100.0, sr / 2 * 0.8))
        t = np.arange(int(dur * sr)) / sr
        x = 0.7 * np.sin(2 * np.pi * f0 * t) + 0.01 * rng.standard_normal(t.size)
        payloads.append(encode_wav(x, sr))
        freqs.append(f0)
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "kind": pa.array(["audio"] * n, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "sample_rate": pa.array([sr] * n, pa.int32()),
            "n_channels": pa.array([1] * n, pa.int32()),
            "tone_hz": pa.array(freqs, pa.float64()),
        }
    )


def media_audio_features(sf_dir: str) -> ray.data.Dataset:
    """Driver-contract query (rows-only: DSP is not SQL-expressible; the mel
    / scalar kernels are pinned against closed-form signals in pytest):
    REAL PCM-WAV decode + log-mel + frame scalars over the deterministic
    synthetic WAV fixture. sf_dir only scales the fixture size."""
    n = 64 if "0.1" in sf_dir else 32
    ds = ray.data.from_arrow(synthetic_wav_table(n))
    return extract_audio_features(ds, concurrency=4, batch_size=8)


def synthetic_media_table(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic media fixture (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(rng.integers(512, 4096)), dtype=np.uint8).tobytes() for _ in range(n)]
    kinds = [["audio", "image", "video"][i % 3] for i in range(n)]
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "sample_rate": pa.array([22050] * n, pa.int32()),
            "n_channels": pa.array([1] * n, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


# ---------------------------------------------------------------------------
# REAL image path: 24-bit BMP payloads decode with the pure-numpy codec in
# functions/image.py (no library needed — BMP is a 54-byte header plus raw
# BGR rows), PNG payloads with the stdlib-zlib codec, then resize /
# features / perceptual hash, all in one actor stage. jpeg still requires
# PIL and raises with the dependency named — same honesty contract as
# compressed audio.

from ..functions.image import (  # noqa: E402  (grouped with the image stage)
    IMAGE_FEATURE_ORDER,
    ahash64,
    decode_bmp,
    decode_gif_frames,
    decode_image,
    encode_bmp,
    encode_gif,
    encode_gif_animated,
    encode_png,
    image_features,
    resize_nearest,
    to_gray,
)


class ImageFeatureExtractor:
    """Actor-pool stage: BMP decode -> thumbnail resize -> scalar features +
    64-bit average perceptual hash (the image near-dup fingerprint)."""

    def __init__(self, thumb: int = 32):
        self.thumb = thumb

    def __call__(self, tbl: pa.Table) -> pa.Table:
        width = len(IMAGE_FEATURE_ORDER)
        ids, hashes, rows, hs, ws = [], [], [], [], []
        for mid, payload in zip(
            tbl.column("media_id").to_pylist(), tbl.column("payload").to_pylist()
        ):
            img = decode_image(payload)
            hs.append(img.shape[0])
            ws.append(img.shape[1])
            small = resize_nearest(img, self.thumb, self.thumb)
            feats = image_features(small)
            rows.append(np.array([feats[k] for k in IMAGE_FEATURE_ORDER]))
            hashes.append(np.int64(np.uint64(ahash64(img))))
            ids.append(mid)
        mat = np.stack(rows) if rows else np.zeros((0, width))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "height": pa.array(hs, pa.int64()),
                "width": pa.array(ws, pa.int64()),
                "ahash64": pa.array(hashes, pa.int64()),
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.ravel(), pa.float64()), width
                ),
            }
        )


def extract_image_features(
    ds: ray.data.Dataset, concurrency: int = 4, batch_size: int = 16
) -> ray.data.Dataset:
    return ds.map_batches(
        ImageFeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def synthetic_image_table(n: int = 24, seed: int = 7) -> pa.Table:
    """Deterministic real-image fixture: gradients, solids, and noise
    patterns with known statistics, rotating BMP / PNG payloads (with GIF
    for the palette-safe solid frames) so all three native codecs are
    exercised; the planted
    duplicate pair (rows 0 and n-1) stores the SAME pixels in DIFFERENT
    formats, so a matching perceptual hash proves format-independent
    decode, not byte equality."""
    rng = np.random.default_rng(seed)
    payloads = []
    imgs = []
    for i in range(n - 1):
        h = int(rng.integers(16, 64))
        w = int(rng.integers(16, 64))
        kind = i % 3
        if kind == 0:  # horizontal gradient
            row = np.linspace(0, 255, w, dtype=np.uint8)
            img = np.repeat(row[None, :, None], h, axis=0).repeat(3, axis=2)
        elif kind == 1:  # solid color
            img = np.full((h, w, 3), rng.integers(0, 256, 3, dtype=np.uint8)[None, None, :])
        else:  # noise
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        img = np.ascontiguousarray(img, dtype=np.uint8)
        imgs.append(img)
        if kind == 1:  # solid color: <=256 distinct colors, GIF-safe
            payloads.append(encode_gif(img))
        else:
            payloads.append(encode_bmp(img) if i % 2 == 0 else encode_png(img))
    # planted pixel-duplicate of row 0 in the OTHER format (row 0 is BMP)
    payloads.append(encode_png(imgs[0]))
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "kind": pa.array(["image"] * n, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "sample_rate": pa.array([0] * n, pa.int32()),
            "n_channels": pa.array([3] * n, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def media_image_features(sf_dir: str) -> ray.data.Dataset:
    """Driver-contract query (rows-only: pixel DSP is not SQL-expressible;
    the codec round-trip and feature closed-forms are pinned in pytest):
    real BMP + PNG decode (format-sniffed) + thumbnail features +
    perceptual hash over the deterministic mixed-format image fixture."""
    n = 48 if "0.1" in sf_dir else 24
    ds = ray.data.from_arrow(synthetic_image_table(n))
    return extract_image_features(ds, concurrency=4, batch_size=8)


# ---------------------------------------------------------------------------
# video frame-sampling: a DECLARED raw container ("RAWV": u32 frame count,
# then length-prefixed 24-bit BMP frames). Real codecs (h264 etc.) require
# ffmpeg and stay stubbed; this container exercises the real frame-sample
# plumbing — parse, decode every k-th frame, per-frame perceptual hash,
# inter-frame motion energy — with genuinely decoded pixels.

import struct as _struct  # noqa: E402


def encode_rawv(frames: list[np.ndarray]) -> bytes:
    parts = [b"RAWV", _struct.pack("<I", len(frames))]
    for f in frames:
        b = encode_bmp(np.ascontiguousarray(f, dtype=np.uint8))
        parts.append(_struct.pack("<I", len(b)))
        parts.append(b)
    return b"".join(parts)


def iter_rawv_frames(payload: bytes):
    if payload[:4] != b"RAWV":
        raise ValueError("not a RAWV payload")
    (n,) = _struct.unpack_from("<I", payload, 4)
    off = 8
    for _ in range(n):
        (ln,) = _struct.unpack_from("<I", payload, off)
        off += 4
        yield decode_bmp(payload[off : off + ln])
        off += ln


def iter_video_frames(payload: bytes):
    """Format-sniffed frame iterator: RAWV container or ANIMATED GIF (real
    LZW-compressed multi-frame format, stdlib decode)."""
    if payload[:4] == b"RAWV":
        yield from iter_rawv_frames(payload)
        return
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        # module-level import: this runs INSIDE workers, where a lazy relative
        # import would fail when the driver's cwd is outside the repo (the
        # package ships pickle-by-value, not via sys.path).
        yield from decode_gif_frames(payload)
        return
    raise ValueError("video payload is neither RAWV nor animated GIF")


class VideoFrameSampler:
    """Actor-pool stage: sample every k-th frame of a RAWV payload, emit
    per-record frame count, sampled count, first/last frame hashes, and
    mean inter-sample motion energy (mean |luma diff|)."""

    def __init__(self, every_k: int = 2):
        self.every_k = every_k

    def __call__(self, tbl: pa.Table) -> pa.Table:
        ids, nf, ns, h0, h1, motion = [], [], [], [], [], []
        for mid, payload in zip(
            tbl.column("media_id").to_pylist(), tbl.column("payload").to_pylist()
        ):
            frames = list(iter_video_frames(payload))
            sampled = frames[:: self.every_k]
            lumas = [to_gray(f) for f in sampled]
            diffs = [
                np.abs(a - b).mean() for a, b in zip(lumas[1:], lumas[:-1]) if a.shape == b.shape
            ]
            ids.append(mid)
            nf.append(len(frames))
            ns.append(len(sampled))
            h0.append(np.int64(np.uint64(ahash64(sampled[0]))))
            h1.append(np.int64(np.uint64(ahash64(sampled[-1]))))
            motion.append(float(np.mean(diffs)) if diffs else 0.0)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "n_frames": pa.array(nf, pa.int64()),
                "n_sampled": pa.array(ns, pa.int64()),
                "ahash_first": pa.array(h0, pa.int64()),
                "ahash_last": pa.array(h1, pa.int64()),
                "motion_energy": pa.array(motion, pa.float64()),
            }
        )


def synthetic_rawv_table(n: int = 12, seed: int = 9) -> pa.Table:
    """Deterministic video fixture: each clip is a horizontally scrolling
    gradient (nonzero motion); clip 0 is a STATIC clip (zero motion).
    Payload formats rotate RAWV / RAWV / animated GIF so both the raw
    container and a real compressed multi-frame format are exercised."""
    rng = np.random.default_rng(seed)
    payloads = []
    for i in range(n):
        h, w = 24, 32
        nfr = int(rng.integers(4, 10))
        base = np.linspace(0, 255, w, dtype=np.uint8)
        frames = []
        for t in range(nfr):
            shift = 0 if i == 0 else 3 * t
            row = np.roll(base, shift)
            frames.append(np.repeat(row[None, :, None], h, axis=0).repeat(3, axis=2))
        if i % 3 == 2:  # every third clip ships as a REAL animated GIF
            payloads.append(encode_gif_animated(frames))
        else:
            payloads.append(encode_rawv(frames))
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "kind": pa.array(["video"] * n, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "sample_rate": pa.array([0] * n, pa.int32()),
            "n_channels": pa.array([3] * n, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def media_video_frames(sf_dir: str) -> ray.data.Dataset:
    """Driver-contract query (rows-only): frame sampling + motion energy
    over the deterministic RAWV fixture; clip 0's zero motion and the
    scrolling clips' nonzero motion are pinned in pytest."""
    n = 24 if "0.1" in sf_dir else 12
    ds = ray.data.from_arrow(synthetic_rawv_table(n))
    return ds.map_batches(
        VideoFrameSampler,
        batch_format="pyarrow",
        batch_size=4,
        concurrency=4,
        num_cpus=1,
    )


# ---------------------------------------------------------------------------
# VOICE-ACTIVITY DETECTION — the speech-data curation gate: energy-gated
# frame classification (voiced iff frame RMS > VAD_REL x the record's peak
# frame RMS, with an absolute silence floor) merged into contiguous voiced
# segments. Per record: voiced frame count/ratio, segment count, longest
# segment — the stats that drive clip filtering and segmentation before ASR
# feature extraction. Same actor-pool shape as AudioFeatureExtractor
# (decode per row is inherent; everything after is vectorized over frames).

VAD_REL = 0.25       # relative energy gate vs the record's peak frame RMS
VAD_ABS_FLOOR = 1e-4  # absolute floor: all-silence records stay all-silence


class AudioVadExtractor:
    def __init__(self, n_fft: int = 256, hop: int = 128):
        self.n_fft = n_fft
        self.hop = hop

    def __call__(self, tbl: pa.Table) -> pa.Table:
        ids, nf, nv, nseg, longest, ratio = [], [], [], [], [], []
        for mid, payload in zip(
            tbl.column("media_id").to_pylist(), tbl.column("payload").to_pylist()
        ):
            x, _sr = decode_wav(payload)
            rms = frame_rms(x, self.n_fft, self.hop)
            thr = max(VAD_ABS_FLOOR, VAD_REL * float(rms.max())) if rms.size else VAD_ABS_FLOOR
            voiced = rms > thr
            # contiguous voiced runs
            edges = np.diff(voiced.astype(np.int8))
            starts = np.flatnonzero(edges == 1) + 1
            if voiced.size and voiced[0]:
                starts = np.r_[0, starts]
            stops = np.flatnonzero(edges == -1) + 1
            if voiced.size and voiced[-1]:
                stops = np.r_[stops, voiced.size]
            runs = stops - starts
            ids.append(mid)
            nf.append(int(voiced.size))
            nv.append(int(voiced.sum()))
            nseg.append(int(runs.size))
            longest.append(int(runs.max()) if runs.size else 0)
            ratio.append(float(voiced.mean()) if voiced.size else 0.0)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "n_frames": pa.array(nf, pa.int64()),
                "n_voiced": pa.array(nv, pa.int64()),
                "n_segments": pa.array(nseg, pa.int64()),
                "longest_segment": pa.array(longest, pa.int64()),
                "voiced_ratio": pa.array(ratio, pa.float64()),
            }
        )


def synthetic_burst_wav_table(n: int = 24, seed: int = 13, sr: int = 8000) -> pa.Table:
    """Deterministic burst fixture: each row holds a KNOWN number of tone
    bursts separated by true silence (so VAD segment counts are assertable)."""
    rng = np.random.default_rng(seed)
    payloads, n_bursts = [], []
    for i in range(n):
        k = int(rng.integers(1, 5))
        parts = [np.zeros(int(0.1 * sr))]
        for _ in range(k):
            dur = float(rng.uniform(0.08, 0.2))
            f0 = float(rng.uniform(200.0, 2000.0))
            t = np.arange(int(dur * sr)) / sr
            parts.append(0.8 * np.sin(2 * np.pi * f0 * t))
            parts.append(np.zeros(int(rng.uniform(0.1, 0.2) * sr)))
        payloads.append(encode_wav(np.concatenate(parts), sr))
        n_bursts.append(k)
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "kind": pa.array(["audio"] * n, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "sample_rate": pa.array([sr] * n, pa.int32()),
            "n_channels": pa.array([1] * n, pa.int32()),
            "n_bursts": pa.array(n_bursts, pa.int64()),
        }
    )


def extract_audio_vad(
    ds: ray.data.Dataset,
    n_fft: int = 256,
    hop: int = 128,
    concurrency: int = 4,
    batch_size: int = 16,
) -> ray.data.Dataset:
    return ds.map_batches(
        AudioVadExtractor,
        fn_constructor_kwargs={"n_fft": n_fft, "hop": hop},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def media_audio_vad(sf_dir: str) -> ray.data.Dataset:
    """Driver-contract query (rows-only: DSP is not SQL-expressible; segment
    semantics pinned against planted burst counts in pytest)."""
    n = 48 if "0.1" in sf_dir else 24
    ds = ray.data.from_arrow(synthetic_burst_wav_table(n))
    return extract_audio_vad(ds)


# ---------------------------------------------------------------------------
# IMAGE NEAR-DUP PAIRS — perceptual-hash dedup, the image-side analog of
# simhash_pairs_docs: decode (actor pool) -> 64-bit average hash -> the
# SAME banded-Hamming machinery (stages/dedup.hamming_pairs: 4x16-bit
# bands, popcount filter, pair-keyed distinct). Catches re-encoded /
# format-shifted copies byte-level dedup misses — the synthetic fixture's
# planted pair stores identical pixels as BMP vs PNG.

IMAGE_DUP_MAX_HAMMING = 3  # within the 4-band collision GUARANTEE


def media_image_dups(sf_dir: str) -> ray.data.Dataset:
    """Driver-contract query (rows-only: pixel decode + perceptual hashing
    is not SQL-expressible; the planted cross-format duplicate and the
    banding guarantee are pinned in pytest)."""
    from .dedup import hamming_pairs

    n = 48 if "0.1" in sf_dir else 24
    ds = ray.data.from_arrow(synthetic_image_table(n))
    feats = extract_image_features(ds, concurrency=4, batch_size=8)
    sigs = feats.map_batches(
        lambda t: t.select(["media_id", "ahash64"]), batch_format="pyarrow"
    )
    return hamming_pairs(
        sigs,
        id_col="media_id",
        sig_col="ahash64",
        max_hamming=IMAGE_DUP_MAX_HAMMING,
    )
