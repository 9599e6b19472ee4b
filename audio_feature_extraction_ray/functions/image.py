"""Pure-numpy image codec + kernels: 24-bit uncompressed BMP encode/decode,
resize, scalar features, and a 64-bit average perceptual hash.

BMP (BITMAPINFOHEADER, 24bpp, bottom-up, BI_RGB) needs no codec library —
it is a 54-byte header plus raw BGR rows padded to 4 bytes — so the image
decode path of the multimodal stage is REAL in this container, the same way
the audio path is real via stdlib WAV. (Reference analog: the decode step of
AudioFileLoader, design.md:451-475, recast for the image kind.)
"""

from __future__ import annotations

import struct

import numpy as np

_BMP_HEADER = 54


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit BMP bytes (BGR rows, bottom-up,
    4-byte row padding)."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_bmp expects (h, w, 3) uint8 RGB")
    h, w, _ = img.shape
    row_raw = w * 3
    pad = (-row_raw) % 4
    stride = row_raw + pad
    size = _BMP_HEADER + stride * h
    bgr = img[::-1, :, ::-1]  # bottom-up rows, RGB -> BGR
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_raw] = bgr.reshape(h, row_raw)
    return (
        struct.pack("<2sIHHI", b"BM", size, 0, 0, _BMP_HEADER)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 2835, 2835, 0, 0)
        + rows.tobytes()
    )


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> (h, w, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h_signed = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported (bpp={bpp})")
    h = abs(h_signed)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_off)
    bgr = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if h_signed > 0:  # bottom-up storage
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()  # BGR -> RGB


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize via integer index maps (pure numpy)."""
    h, w = img.shape[:2]
    ri = (np.arange(out_h) * h) // out_h
    ci = (np.arange(out_w) * w) // out_w
    return img[ri[:, None], ci[None, :]]


def to_gray(img: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 -> float64 luma (ITU-R 601 weights)."""
    f = img.astype(np.float64)
    return 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]


def ahash64(img: np.ndarray) -> int:
    """64-bit average hash: 8x8 nearest-resampled luma thresholded at its
    mean — the classic perceptual near-dup fingerprint for images."""
    g = to_gray(resize_nearest(img, 8, 8))
    bits = (g > g.mean()).ravel()
    return int(np.packbits(bits).view(">u8")[0])


def image_features(img: np.ndarray) -> dict[str, float]:
    """Deterministic scalar features: per-channel means, luma std, edge
    energy (mean absolute finite difference), aspect ratio."""
    f = img.astype(np.float64)
    g = to_gray(img)
    gx = np.abs(np.diff(g, axis=1)).mean() if img.shape[1] > 1 else 0.0
    gy = np.abs(np.diff(g, axis=0)).mean() if img.shape[0] > 1 else 0.0
    return {
        "mean_r": float(f[:, :, 0].mean()),
        "mean_g": float(f[:, :, 1].mean()),
        "mean_b": float(f[:, :, 2].mean()),
        "luma_std": float(g.std()),
        "edge_energy": float(gx + gy),
        "aspect": float(img.shape[1] / img.shape[0]),
    }


IMAGE_FEATURE_ORDER = ["mean_r", "mean_g", "mean_b", "luma_std", "edge_energy", "aspect"]
