"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode / feature-extract / resize / frame-sample as actor-pool map_batches
stages.

This is the direct descendant of the reference's audio path
(AudioFileLoader/AudioPreprocessor/STFTExtractor, design.md:451-910): a heavy
decoder loaded ONCE per actor, small batches because payload rows are wide,
fixed-width feature vectors out.

The actual codec libraries (soundfile/PIL/ffmpeg) are NOT in this container,
so the decode step is STUBBED: `RealDecoder` raises NotImplementedError with
the exact dependency it needs, and `FakeDecoder` produces a deterministic
decode (byte-histogram "samples") so the Ray-side plumbing — schema, actor
signature, batch sizing, output layout — is real and tested end-to-end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

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
    """Placeholder for the real codec path (soundfile/PIL). Not available in
    this environment — any use raises immediately with the dependency name."""

    def __init__(self, kind: str = "audio"):
        self.kind = kind

    def __call__(self, payload: bytes) -> np.ndarray:
        raise NotImplementedError(
            f"decoding {self.kind!r} payloads requires the 'soundfile'/'PIL' "
            "codec libraries, which are not installed in this environment; "
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
