"""Real audio DSP path: stdlib WAV codec + numpy STFT/mel/scalar kernels
(functions/audio.py) and the actor-pool extraction stage
(stages/multimodal.AudioFeatureExtractor) — validated against closed-form
signals (pure tones, DC, silence)."""

import numpy as np
import pytest
import ray.data

from audio_feature_extraction_ray.functions.audio import (
    decode_wav,
    encode_wav,
    frame_rms,
    frame_zcr,
    log_mel_spectrogram,
    mel_filterbank,
    spectral_centroid,
    stft_magnitude,
)

SR = 8000


def _tone(f0: float, dur: float = 0.5, sr: int = SR) -> np.ndarray:
    t = np.arange(int(dur * sr)) / sr
    return 0.7 * np.sin(2 * np.pi * f0 * t)


def test_wav_roundtrip_16bit():
    x = _tone(440.0)
    y, sr = decode_wav(encode_wav(x, SR))
    assert sr == SR and y.size == x.size
    np.testing.assert_allclose(y, x, atol=1.5 / 32768)


def test_wav_stereo_and_widths():
    import io
    import wave

    # stereo 16-bit: decode averages to mono
    l = _tone(440.0, 0.1)
    r = _tone(880.0, 0.1)
    inter = np.empty(l.size * 2)
    inter[0::2], inter[1::2] = l, r
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes(np.round(np.clip(inter, -1, 1) * 32767).astype("<i2").tobytes())
    y, sr = decode_wav(buf.getvalue())
    np.testing.assert_allclose(y, (l + r) / 2, atol=2 / 32768)
    # unsupported width raises
    bad = io.BytesIO()
    with wave.open(bad, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(3)
        w.setframerate(SR)
        w.writeframes(b"\x00\x00\x00" * 64)
    with pytest.raises(ValueError, match="width"):
        decode_wav(bad.getvalue())


def test_stft_tone_peak_bin():
    f0 = 1000.0
    mag = stft_magnitude(_tone(f0), n_fft=1024, hop=256)
    peak_bin = mag.mean(axis=0).argmax()
    expect = round(f0 * 1024 / SR)
    assert abs(peak_bin - expect) <= 1


def test_mel_filterbank_shape_and_coverage():
    fb = mel_filterbank(SR, 1024, 32)
    assert fb.shape == (32, 513)
    # every interior fft bin is covered by at least one filter
    assert (fb[:, 1:-1].sum(axis=0) > 0).all()


def test_logmel_peak_tracks_tone_frequency():
    from audio_feature_extraction_ray.functions.audio import hz_to_mel, mel_to_hz

    mel_pts = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(SR / 2.0), 32 + 2))
    centers = mel_pts[1:-1]
    for f0 in (300.0, 1200.0, 3000.0):
        mel = log_mel_spectrogram(_tone(f0), SR, n_fft=1024, hop=256, n_mels=32)
        band = mel.mean(axis=0).argmax()
        assert abs(centers[band] - f0) < (SR / 2) * 0.12, (f0, centers[band])


def test_frame_scalars_closed_form():
    f0 = 500.0
    x = _tone(f0, 1.0)
    rms = frame_rms(x, 1024, 256)
    # sine RMS = A / sqrt(2)
    np.testing.assert_allclose(rms[1:-2], 0.7 / np.sqrt(2), rtol=0.05)
    zcr = frame_zcr(x, 1024, 256)
    # tone crosses zero 2*f0 times/s -> per-sample rate 2*f0/SR
    np.testing.assert_allclose(zcr[1:-2], 2 * f0 / SR, rtol=0.05)
    cen = spectral_centroid(x, SR, 1024, 256)
    assert abs(cen[1:-2].mean() - f0) < 100.0
    # silence: zero RMS, zero centroid
    s = np.zeros(4096)
    assert frame_rms(s, 1024, 256).max() == 0.0
    assert spectral_centroid(s, SR, 1024, 256).max() == 0.0


def test_real_decoder_wav_path():
    from audio_feature_extraction_ray.stages.multimodal import RealDecoder

    x = _tone(440.0, 0.2)
    y = RealDecoder("audio")(encode_wav(x, SR))
    np.testing.assert_allclose(y, x, atol=1.5 / 32768)


def test_audio_pipeline_end_to_end(ray_session):
    from audio_feature_extraction_ray.functions.audio import hz_to_mel, mel_to_hz
    from audio_feature_extraction_ray.stages.multimodal import (
        AUDIO_FEATURE_ORDER,
        N_MELS,
        extract_audio_features,
        synthetic_wav_table,
    )

    tbl = synthetic_wav_table(24, sr=SR)
    out = extract_audio_features(
        ray.data.from_arrow(tbl), concurrency=2, batch_size=8
    ).to_pandas()
    assert len(out) == 24
    assert all(len(f) == len(AUDIO_FEATURE_ORDER) for f in out["features"])
    assert (out["n_windows"] > 0).all()
    # the mel peak must land near each row's known tone frequency
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(SR / 2.0), N_MELS + 2))
    centers = mel_pts[1:-1]
    tones = dict(zip(tbl.column("media_id").to_pylist(), tbl.column("tone_hz").to_pylist()))
    for _, row in out.iterrows():
        band = int(np.argmax(row["features"][:N_MELS]))
        assert abs(centers[band] - tones[row["media_id"]]) < (SR / 2) * 0.15
    # determinism
    out2 = extract_audio_features(ray.data.from_arrow(tbl)).to_pandas()
    a = np.stack(out.sort_values("media_id")["features"].to_numpy())
    b = np.stack(out2.sort_values("media_id")["features"].to_numpy())
    np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------------------
# image codec + feature tests (functions/image.py — the BMP twin of the
# stdlib-WAV audio path)


def test_bmp_roundtrip():
    from audio_feature_extraction_ray.functions.image import decode_bmp, encode_bmp

    rng = np.random.default_rng(3)
    for h, w in [(1, 1), (5, 3), (16, 17), (33, 64)]:  # odd widths hit row padding
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        out = decode_bmp(encode_bmp(img))
        np.testing.assert_array_equal(out, img)


def test_image_features_closed_form():
    from audio_feature_extraction_ray.functions.image import image_features

    solid = np.full((10, 20, 3), 100, dtype=np.uint8)
    f = image_features(solid)
    assert f["mean_r"] == f["mean_g"] == f["mean_b"] == 100.0
    assert f["luma_std"] == 0.0 and f["edge_energy"] == 0.0
    assert f["aspect"] == 2.0
    grad = np.repeat(np.arange(0, 250, 10, dtype=np.uint8)[None, :, None], 8, axis=0).repeat(3, axis=2)
    g = image_features(grad)
    assert g["edge_energy"] > 0 and abs(g["mean_r"] - 120.0) < 1e-9


def test_ahash_dup_detection():
    from audio_feature_extraction_ray.functions.image import ahash64

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    assert ahash64(img) == ahash64(img.copy())
    assert ahash64(img) != ahash64(255 - img)  # inverted image -> different hash


def test_png_roundtrip():
    from audio_feature_extraction_ray.functions.image import decode_png, encode_png

    rng = np.random.default_rng(5)
    for h, w in [(1, 1), (1, 7), (5, 1), (16, 17), (33, 64)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        np.testing.assert_array_equal(decode_png(encode_png(img)), img)


def _png_filter_forward(img, ftypes, ch):
    """Spec-derived FORWARD filter (RFC 2083 §6.2-6.6), written
    independently of the decoder's inverse, byte arithmetic mod 256."""
    h, w = img.shape[0], img.shape[1]
    raw = img.reshape(h, w * ch).astype(np.int32)
    scan = np.zeros((h, 1 + w * ch), dtype=np.uint8)
    for y in range(h):
        ft = ftypes[y % len(ftypes)]
        scan[y, 0] = ft
        prev = raw[y - 1] if y else np.zeros(w * ch, np.int32)
        for i in range(w * ch):
            a = raw[y, i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if (i >= ch and y) else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                pp = a + b - c
                pa_, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
            scan[y, 1 + i] = (raw[y, i] - pred) % 256
    return scan


def test_png_decode_all_filters_and_color_types():
    """Hand-build PNGs using an independent spec-derived forward filter for
    every filter type x color type {gray, RGB, RGBA}; decode must invert."""
    import struct
    import zlib

    from audio_feature_extraction_ray.functions.image import (
        PNG_SIG,
        _png_chunk,
        decode_png,
    )

    rng = np.random.default_rng(6)
    for color, ch in [(0, 1), (2, 3), (6, 4)]:
        for ftypes in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            h, w = 9, 7
            img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
            scan = _png_filter_forward(img, ftypes, ch)
            payload = (
                PNG_SIG
                + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
                + _png_chunk(b"IDAT", zlib.compress(scan.tobytes()))
                + _png_chunk(b"IEND", b"")
            )
            out = decode_png(payload)
            if color == 0:
                np.testing.assert_array_equal(out, np.repeat(img, 3, axis=2), err_msg=str(ftypes))
            elif color == 2:
                np.testing.assert_array_equal(out, img, err_msg=str(ftypes))
            else:
                np.testing.assert_array_equal(out, img[:, :, :3], err_msg=str(ftypes))


def test_png_multi_idat_and_errors():
    import struct
    import zlib

    from audio_feature_extraction_ray.functions.image import (
        PNG_SIG,
        _png_chunk,
        decode_image,
        decode_png,
        encode_png,
    )
    import pytest as _pytest

    img = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(5, 4, 3)
    # split the IDAT stream across two chunks — decoders must concatenate
    scan = np.zeros((5, 1 + 4 * 3), dtype=np.uint8)
    scan[:, 1:] = img.reshape(5, 12)
    z = zlib.compress(scan.tobytes())
    payload = (
        PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 5, 8, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", z[:7])
        + _png_chunk(b"IDAT", z[7:])
        + _png_chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(decode_png(payload), img)
    # 16-bit depth / palette / interlace / non-image magic fail loudly
    bad_depth = (
        PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 5, 16, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", z)
        + _png_chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError, match="depth"):
        decode_png(bad_depth)
    with _pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"BM" + b"\x00" * 60)
    with _pytest.raises(NotImplementedError, match="PIL"):
        decode_image(b"\xff\xd8\xff" + b"\x00" * 20)  # jpeg magic
    # sniffing dispatch: PNG payload routes through decode_png
    np.testing.assert_array_equal(decode_image(encode_png(img)), img)


def test_cross_format_perceptual_hash():
    """The planted duplicate stores identical pixels as BMP and PNG; equal
    ahash64 proves decode is format-independent."""
    from audio_feature_extraction_ray.functions.image import (
        ahash64,
        decode_image,
        encode_bmp,
        encode_png,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (30, 41, 3), dtype=np.uint8)
    assert ahash64(decode_image(encode_bmp(img))) == ahash64(decode_image(encode_png(img)))


def test_media_image_features_pipeline(ray_session):
    from audio_feature_extraction_ray.stages.multimodal import media_image_features

    df = media_image_features("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 24
    # planted duplicate: first and last rows share the perceptual hash
    h = df.set_index("media_id")["ahash64"]
    assert h[0] == h[23]
    assert df["features"].iloc[0].shape == (6,)


def test_rawv_roundtrip_and_motion(ray_session):
    from audio_feature_extraction_ray.stages.multimodal import (
        iter_rawv_frames,
        media_video_frames,
        synthetic_rawv_table,
    )

    tbl = synthetic_rawv_table(4)
    frames = list(iter_rawv_frames(tbl.column("payload").to_pylist()[1]))
    assert frames[0].shape == (24, 32, 3)
    df = media_video_frames("/root/testdata/sf0.001").to_pandas().set_index("media_id")
    assert len(df) == 12
    assert df.loc[0, "motion_energy"] == 0.0          # static clip
    assert (df.drop(index=0)["motion_energy"] > 0).all()  # scrolling clips
    assert df.loc[0, "ahash_first"] == df.loc[0, "ahash_last"]
    assert (df["n_sampled"] == (df["n_frames"] + 1) // 2).all()


def _lzw_compress_ref(indices, min_code_size):
    """Classic LZW encoder (dict growth + width bumps + KwKwK-producing
    streams) — reference for exercising the decoder's dictionary paths."""
    import numpy as np

    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    out_bits = []

    def emit(c):
        out_bits.extend((c >> j) & 1 for j in range(width))

    emit(clear)
    seq = ()
    # width bumps immediately after the table add that follows an emission —
    # the same point in the code stream where the decoder's add happens
    for v in map(int, indices):
        cand = seq + (v,)
        if cand in table:
            seq = cand
        else:
            emit(table[seq])
            if next_code < 4096:
                table[cand] = next_code
                next_code += 1
                if next_code > (1 << width) and width < 12:
                    width += 1
            seq = (v,)
    if seq:
        emit(table[seq])
    emit(eoi)
    bits = np.array(out_bits, dtype=np.uint8)
    return np.packbits(bits, bitorder="little").tobytes()


def test_gif_codec_roundtrip_and_real_lzw():
    import numpy as np

    from audio_feature_extraction_ray.functions.image import (
        _lzw_decode,
        decode_gif,
        decode_image,
        encode_gif,
    )

    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, (64, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 64, (31, 19))]
    assert np.array_equal(decode_image(encode_gif(img)), img)

    # decoder vs a REAL dictionary-building LZW stream (repetitive data
    # grows the dict and triggers the KwKwK case)
    for data in [
        np.zeros(500, dtype=np.uint8),                      # KwKwK immediately
        np.tile(np.arange(8, dtype=np.uint8), 100),          # periodic
        rng.integers(0, 16, 1000).astype(np.uint8),          # random small alphabet
        np.repeat(rng.integers(0, 4, 50), rng.integers(1, 30, 50)).astype(np.uint8),
    ]:
        comp = _lzw_compress_ref(data, 8)
        got = _lzw_decode(comp, 8, data.size)
        assert np.array_equal(got, data), (data[:10], got[:10])

    # interlaced frame: hand-build descriptor with the interlace flag
    g = np.arange(0, 240, 10, dtype=np.uint8)[:, None] * np.ones((1, 5), np.uint8)
    img2 = np.stack([g] * 3, axis=-1)
    b = bytearray(encode_gif(img2))
    # image descriptor starts after 13-byte header + 768-byte GCT
    desc = 13 + 768
    assert b[desc] == 0x2C
    h, w = img2.shape[:2]
    # set interlace bit and REORDER rows so the interlaced read restores img2
    order = np.concatenate(
        [np.arange(0, h, 8), np.arange(4, h, 8), np.arange(2, h, 4), np.arange(1, h, 2)]
    )
    from audio_feature_extraction_ray.functions.image import encode_gif as _eg

    b2 = bytearray(_eg(img2[order]))
    b2[desc + 9] |= 0x40
    out = decode_gif(bytes(b2))
    assert np.array_equal(out, img2)


def test_ima_adpcm_roundtrip_and_reference_decode():
    """IMA-ADPCM: (a) vectorized lockstep decoder bit-equals a scalar
    reference decoder; (b) encode->decode round-trip SNR on a tone exceeds
    20 dB (4:1 compression); (c) compression is really 4:1-ish."""
    import numpy as np

    from audio_feature_extraction_ray.functions.audio import (
        _IMA_INDEX_TABLE,
        _IMA_STEP_TABLE,
        decode_wav_adpcm,
        encode_wav_adpcm,
    )

    sr = 8000
    t = np.arange(sr * 2) / sr
    x = (0.6 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 97 * t)).astype(
        np.float64
    )
    payload = encode_wav_adpcm(x, sr)
    y, sr2 = decode_wav_adpcm(payload)
    assert sr2 == sr
    n = min(x.size, y.size)
    err = y[:n] - x[:n].astype(np.float32)
    snr = 10 * np.log10(float((x[:n] ** 2).sum()) / float((err**2).sum()))
    assert snr > 20, snr
    assert len(payload) < 0.3 * (2 * n)  # ~4:1 vs 16-bit PCM

    # scalar reference decoder, bit-for-bit
    import struct

    def ref_decode(data: bytes, balign: int) -> list[int]:
        out = []
        for off in range(0, len(data) - balign + 1, balign):
            blk = data[off : off + balign]
            pred = struct.unpack("<h", blk[:2])[0]
            idx = min(88, max(0, blk[2]))
            out.append(pred)
            for byte in blk[4:]:
                for nib in (byte & 0x0F, byte >> 4):
                    step = int(_IMA_STEP_TABLE[idx])
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
                    out.append(pred)
        return out

    from audio_feature_extraction_ray.functions.audio import _parse_riff_fmt

    tag, n_ch, _sr, balign, data = _parse_riff_fmt(payload)
    assert tag == 0x11 and n_ch == 1
    ref = np.array(ref_decode(data, balign), dtype=np.int32)
    got = np.round(y * 32768.0).astype(np.int32)
    assert np.array_equal(got, ref)


def test_media_decoder_handles_adpcm_payload():
    import numpy as np

    from audio_feature_extraction_ray.functions.audio import encode_wav_adpcm
    from audio_feature_extraction_ray.stages.multimodal import RealDecoder as MediaDecoder

    sr = 8000
    x = 0.5 * np.sin(2 * np.pi * 330 * np.arange(sr) / sr)
    wav = MediaDecoder("audio")(encode_wav_adpcm(x, sr))
    assert wav.dtype == np.float32 and wav.size >= sr
    # the decoded tone keeps its energy (not silence, not garbage)
    assert 0.2 < float(np.sqrt((wav[:sr] ** 2).mean())) < 0.5
