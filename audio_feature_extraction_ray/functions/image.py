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


# ---------------------------------------------------------------------------
# PNG codec (stdlib zlib only). PNG is the one COMPRESSED image format that
# needs no codec library: chunks are (len, tag, data, crc32) and IDAT is a
# zlib stream of per-row filtered scanlines — both fully covered by struct +
# zlib + numpy. This makes the image decode path cover a real compressed
# format honestly (reference analog: the compressed-format decode step of
# AudioFileLoader, design.md:451-475, recast for the image kind; jpeg still
# requires libjpeg and stays a named NotImplementedError).

import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, level: int = 6) -> bytes:
    """(h, w, 3) uint8 RGB -> PNG bytes (8-bit truecolor, filter 0 rows,
    one IDAT chunk). Minimal but spec-conformant: any PNG reader opens it."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_png expects (h, w, 3) uint8 RGB")
    h, w, _ = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.zeros((h, 1 + w * 3), dtype=np.uint8)  # filter byte 0 per row
    raw[:, 1:] = img.reshape(h, w * 3)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw.tobytes(), level))
        + _png_chunk(b"IEND", b"")
    )


def _defilter(scan: np.ndarray, h: int, w: int, ch: int) -> np.ndarray:
    """Reverse PNG row filters. scan is (h, 1 + w*ch) uint8 (filter byte +
    filtered bytes per row). Filters 0 (None) / 1 (Sub) / 2 (Up) are
    vectorized whole-row (Sub is a per-lane cumsum mod 256); 3 (Average) and
    4 (Paeth) carry a left-pixel dependency and walk the row in ch-wide
    numpy steps — fine for the thumbnail-scale payloads this stage handles."""
    out = np.zeros((h, w * ch), dtype=np.uint8)
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        ft = int(scan[y, 0])
        row = scan[y, 1:].copy()
        if ft == 0:
            pass
        elif ft == 1:  # Sub: recon[x] = row[x] + recon[x-ch]
            row = (np.cumsum(row.reshape(w, ch), axis=0, dtype=np.uint64) & 0xFF).astype(
                np.uint8
            ).reshape(w * ch)
        elif ft == 2:  # Up
            row += prev
        elif ft == 3:  # Average
            for x in range(w):
                s, e = x * ch, (x + 1) * ch
                left = row[s - ch : s].astype(np.uint16) if x else np.zeros(ch, np.uint16)
                up = prev[s:e].astype(np.uint16)
                row[s:e] += ((left + up) >> 1).astype(np.uint8)
        elif ft == 4:  # Paeth
            for x in range(w):
                s, e = x * ch, (x + 1) * ch
                a = row[s - ch : s].astype(np.int16) if x else np.zeros(ch, np.int16)
                b = prev[s:e].astype(np.int16)
                c = (
                    out[y - 1, s - ch : s].astype(np.int16)
                    if (x and y)
                    else np.zeros(ch, np.int16)
                )
                p = a + b - c
                pa_, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where((pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, b, c))
                row[s:e] += pred.astype(np.uint8)
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = row
        prev = row
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8 RGB. Supports 8-bit depth, color types
    0 (gray, broadcast to RGB), 2 (RGB), 6 (RGBA, alpha dropped), all five
    row filters, non-interlaced, multi-IDAT. Raises ValueError on anything
    else (16-bit, palette, interlace) naming the unsupported feature."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, ihdr = 8, [], None
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
        pos += 12 + ln  # len + tag + data + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunks")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth}, interlace={interlace}); "
            "only 8-bit non-interlaced supported"
        )
    ch = {0: 1, 2: 3, 6: 4}.get(color)
    if ch is None:
        raise ValueError(f"unsupported PNG color type {color} (palette needs PLTE)")
    raw = zlib.decompress(b"".join(idat))
    stride = 1 + w * ch
    if len(raw) != h * stride:
        raise ValueError("PNG scanline size mismatch")
    scan = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    px = _defilter(scan, h, w, ch).reshape(h, w, ch)
    if color == 0:
        return np.repeat(px, 3, axis=2)
    if color == 6:
        return px[:, :, :3].copy()
    return px


def decode_image(payload: bytes) -> np.ndarray:
    """Sniff the payload magic and decode: BMP or PNG -> (h, w, 3) uint8
    RGB. The format-dispatch entry every image stage should use."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == PNG_SIG:
        return decode_png(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(payload)
    raise NotImplementedError(
        "image payload is not BMP/PNG/GIF; jpeg decode requires PIL/libjpeg "
        "(not installed)"
    )


# ---------------------------------------------------------------------------
# GIF (87a/89a) decode — pure stdlib/numpy LZW, first frame, global or local
# color table, interlace supported. The third real compressed image format
# (after BMP and stdlib-zlib PNG) decodable with zero native deps. The LZW
# dictionary loop is per-CODE Python (inherent to LZW's sequential dict
# growth); payload sizes in media pipelines are bounded by the decode stage's
# batch sizing, and each output pixel run is copied vectorized.

GIF_SIGS = (b"GIF87a", b"GIF89a")


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    # bit reader: little-endian, variable width
    bits = np.unpackbits(
        np.frombuffer(data, dtype=np.uint8)[:, None], axis=1, bitorder="little"
    ).ravel()
    pos = 0
    width = min_code_size + 1
    # dict: prefix chains as (prev_code, last_byte); roots are (-1, i)
    max_entries = 4096
    prev_arr = np.full(max_entries, -1, dtype=np.int32)
    last_arr = np.zeros(max_entries, dtype=np.uint8)
    for i in range(clear):
        last_arr[i] = i
    next_code = eoi + 1
    out = np.empty(n_pixels + 4096, dtype=np.uint8)
    n_out = 0
    prev_code = -1

    def read_code() -> int:
        nonlocal pos
        if pos + width > bits.size:
            return eoi
        v = int(bits[pos : pos + width] @ (1 << np.arange(width, dtype=np.int64)))
        pos += width
        return v

    def expand(code: int) -> np.ndarray:
        chain = []
        c = code
        while c >= 0:
            chain.append(last_arr[c])
            c = prev_arr[c]
        return np.array(chain[::-1], dtype=np.uint8)

    while n_out < n_pixels:
        code = read_code()
        if code == clear:
            next_code = eoi + 1
            width = min_code_size + 1
            prev_code = -1
            continue
        if code == eoi:
            break
        if prev_code < 0:
            seq = expand(code)
        elif code < next_code:
            seq = expand(code)
            if next_code < max_entries:
                prev_arr[next_code] = prev_code
                last_arr[next_code] = seq[0]
                next_code += 1
        else:  # the KwKwK case: code == next_code
            pseq = expand(prev_code)
            seq = np.concatenate([pseq, pseq[:1]])
            if next_code < max_entries:
                prev_arr[next_code] = prev_code
                last_arr[next_code] = seq[0]
                next_code += 1
        out[n_out : n_out + seq.size] = seq
        n_out += seq.size
        prev_code = code
        if next_code >= (1 << width) and width < 12:
            width += 1
    return out[:n_pixels]


def _iter_gif_frames(payload: bytes):
    """Yield (h, w, 3) uint8 RGB frames of a (possibly animated) GIF.
    Frames are decoded standalone (full-frame replacement; disposal modes
    beyond that are out of scope for the fixture formats)."""
    if payload[:6] not in GIF_SIGS:
        raise ValueError("not a GIF payload")
    flags = payload[10]
    off = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload[off : off + 3 * n], dtype=np.uint8).reshape(n, 3)
        off += 3 * n
    while off < len(payload):
        b = payload[off]
        if b == 0x21:  # extension: label + sub-blocks
            off += 2
            while payload[off] != 0:
                off += 1 + payload[off]
            off += 1
        elif b == 0x2C:  # image descriptor
            w = int.from_bytes(payload[off + 5 : off + 7], "little")
            h = int.from_bytes(payload[off + 7 : off + 9], "little")
            iflags = payload[off + 9]
            off += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                ct = np.frombuffer(payload[off : off + 3 * n], dtype=np.uint8).reshape(n, 3)
                off += 3 * n
            if ct is None:
                raise ValueError("GIF frame has no color table")
            min_code = payload[off]
            off += 1
            chunks = []
            while payload[off] != 0:
                ln = payload[off]
                chunks.append(payload[off + 1 : off + 1 + ln])
                off += 1 + ln
            off += 1
            idx = _lzw_decode(b"".join(chunks), min_code, w * h)
            img = ct[np.minimum(idx.astype(np.int64), ct.shape[0] - 1)].reshape(h, w, 3)
            if iflags & 0x40:  # interlaced: 4-pass row order
                order = np.concatenate(
                    [np.arange(0, h, 8), np.arange(4, h, 8),
                     np.arange(2, h, 4), np.arange(1, h, 2)]
                )
                out = np.empty_like(img)
                out[order] = img
                img = out
            yield np.ascontiguousarray(img)
        elif b == 0x3B:  # trailer
            return
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")


def decode_gif(payload: bytes) -> np.ndarray:
    """First image frame of a GIF -> (h, w, 3) uint8 RGB."""
    for frame in _iter_gif_frames(payload):
        return frame
    raise ValueError("GIF has no image frame")


def decode_gif_frames(payload: bytes) -> list[np.ndarray]:
    """All frames of an animated GIF (full-frame replacement semantics)."""
    return list(_iter_gif_frames(payload))


def _gif_lzw_literal_stream(inv: np.ndarray) -> bytes:
    """UNCOMPRESSED-style LZW: clear code before every literal so codes
    never grow past min_code_size+1 — valid LZW, trivially correct,
    test-sized payloads only. Returns the packed 9-bit code stream."""
    clear, eoi = 256, 257
    codes: list[int] = []
    for v in inv:
        codes.append(clear)
        codes.append(int(v))
    codes.append(eoi)
    bits = np.zeros(len(codes) * 9, dtype=np.uint8)
    for i, c in enumerate(codes):
        for j in range(9):
            bits[i * 9 + j] = (c >> j) & 1
    return np.packbits(bits, bitorder="little").tobytes()


def _gif_quantize(img: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    flat = img.reshape(-1, 3)
    colors, inv = np.unique(flat, axis=0, return_inverse=True)
    if colors.shape[0] > 256:
        raise ValueError("GIF encode supports <=256 distinct colors")
    pal = np.zeros((256, 3), dtype=np.uint8)
    pal[: colors.shape[0]] = colors
    return pal, inv


def _gif_frame_block(img: np.ndarray, local_ct: bool) -> bytes:
    """Image-descriptor block (optionally with a 256-entry local color
    table) + LZW data sub-blocks for one frame."""
    h, w = img.shape[:2]
    pal, inv = _gif_quantize(img)
    out = bytearray(
        b"\x2c" + b"\x00" * 4 + w.to_bytes(2, "little") + h.to_bytes(2, "little")
    )
    out += bytes([0x80 | 0x07]) if local_ct else b"\x00"
    if local_ct:
        out += pal.tobytes()
    data = _gif_lzw_literal_stream(inv)
    out += bytes([8])  # min code size
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00"
    return bytes(out)


def encode_gif(img: np.ndarray) -> bytes:
    """Minimal single-frame GIF89a encoder (exact <=256-color palette;
    used by tests/fixtures to round-trip the decoder)."""
    h, w = img.shape[:2]
    pal, _ = _gif_quantize(img)
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | 0x07, 0, 0])  # GCT present, 256 entries
    out += pal.tobytes()
    # frame reuses the GLOBAL table (same palette, local_ct=False)
    out += _gif_frame_block(img, local_ct=False)
    out += b"\x3b"
    return bytes(out)


def encode_gif_animated(frames: list[np.ndarray]) -> bytes:
    """Animated GIF89a: one image block per frame, each with its own local
    color table (full-frame replacement — matches decode_gif_frames)."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x07, 0, 0])  # no global color table
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share the screen size")
        out += _gif_frame_block(np.ascontiguousarray(f, dtype=np.uint8), local_ct=True)
    out += b"\x3b"
    return bytes(out)
