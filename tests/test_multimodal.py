"""Multimodal plumbing: schema fidelity, batch iteration, UDTF explosion."""

from __future__ import annotations

from telescope_data_pipeline_spark.operators.multimodal import (
    extract_image_features,
    make_fake_media,
    sample_frames,
)


def test_image_features_shape_and_determinism(spark):
    media = make_fake_media(spark, n=32)
    feats = extract_image_features(media)
    rows = {r.media_id: r for r in feats.collect()}
    n_images = media.filter("modality = 'image'").count()
    assert len(rows) == n_images  # only the image rows
    for r in rows.values():
        assert len(r.feature) == 8
        assert abs(sum(r.feature) - 1.0) < 1e-5  # normalized histogram
        assert 0 <= r.mean_intensity <= 255
    # Deterministic: same payload -> same features on a second run.
    again = {r.media_id: r for r in extract_image_features(media).collect()}
    assert all(rows[k].feature == again[k].feature for k in rows)


def test_frame_sampler_explodes_rows(spark):
    media = make_fake_media(spark, n=32)
    frames = sample_frames(media, every_s=1.0)
    out = frames.collect()
    assert out
    by_media: dict[int, list] = {}
    durations = {r.media_id: r.duration_s
                 for r in media.filter("modality = 'video'").collect()}
    for r in out:
        assert r.media_id in durations  # only video rows
        by_media.setdefault(r.media_id, []).append(r)
    for mid, rs in by_media.items():
        assert len(rs) == max(int(durations[mid]), 1)
        assert sorted(r.frame_idx for r in rs) == list(range(len(rs)))


def test_audio_features_windows_and_determinism(spark):
    from telescope_data_pipeline_spark.operators.multimodal import (
        _AUDIO_SR,
        extract_audio_features,
        make_fake_media,
    )

    media = make_fake_media(spark, n=12)
    rows = extract_audio_features(media, window_s=0.5).collect()
    assert rows
    by_media: dict[int, list] = {}
    for r in rows:
        assert 0.0 <= r.zcr <= 1.0 and r.rms > 0
        by_media.setdefault(r.media_id, []).append(r)
    durs = {r.media_id: r.duration_s
            for r in media.filter("modality = 'audio'").collect()}
    assert set(by_media) == set(durs)
    for mid, rs in by_media.items():
        import math

        expect = max(math.ceil(durs[mid] * _AUDIO_SR / (0.5 * _AUDIO_SR)), 1)
        assert len(rs) == expect, (mid, len(rs), expect)
    # determinism: same fixture -> identical features
    again = extract_audio_features(make_fake_media(spark, n=12),
                                   window_s=0.5).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_real_image_codec_path():
    """Skipped unless PIL is installed: decode_image must take the real
    path for a valid encoded image and return its actual pixels."""
    import pytest

    from telescope_data_pipeline_spark.operators import multimodal as mm

    if mm._pil_image is None:
        pytest.skip("PIL not installed: stub path covered elsewhere")
    import io

    import numpy as np

    im = mm._pil_image.new("L", (4, 3))
    im.putdata(list(range(12)))
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    arr = mm.decode_image(buf.getvalue())
    assert arr.shape == (3, 4)
    assert np.array_equal(arr.ravel(), np.arange(12, dtype=np.float32))


def test_real_audio_codec_path():
    """Skipped unless soundfile is installed: decode_audio must return
    the real PCM and sample rate for a valid WAV payload."""
    import pytest

    from telescope_data_pipeline_spark.operators import multimodal as mm

    if mm._soundfile is None:
        pytest.skip("soundfile not installed: stub path covered elsewhere")
    import io

    import numpy as np

    sr = 8000
    wave = np.sin(2 * np.pi * 440 * np.arange(sr) / sr).astype(np.float32)
    buf = io.BytesIO()
    mm._soundfile.write(buf, wave, sr, format="WAV", subtype="FLOAT")
    decoded, got_sr = mm.decode_audio(buf.getvalue(), duration_s=1.0)
    assert got_sr == sr
    assert np.allclose(decoded, wave, atol=1e-6)


def test_invalid_payload_falls_back_to_stub():
    """Synthetic (non-decodable) payloads must produce the deterministic
    stub output in EVERY environment — with or without real codecs."""
    import numpy as np

    from telescope_data_pipeline_spark.operators import multimodal as mm

    payload = bytes(range(64))
    assert np.array_equal(mm.decode_image(payload),
                          mm._decode_image_stub(payload))
    wave, sr = mm.decode_audio(payload, duration_s=2.0)
    assert sr == mm._AUDIO_SR
    assert np.array_equal(wave, mm._decode_audio_stub(payload, 2.0))


def test_resize_images_shape_and_determinism(spark):
    """Every image resamples to exactly height*width pixels; values come
    from the source raster (nearest-neighbor: subset of source values);
    repeat runs are identical."""
    from telescope_data_pipeline_spark.operators.multimodal import (
        decode_image,
        make_fake_media,
        resize_images,
    )

    media = make_fake_media(spark)
    out = resize_images(media, width=8, height=8).collect()
    n_images = media.filter("modality = 'image'").count()
    assert len(out) == n_images and n_images > 0
    srcs = {r.media_id: decode_image(r.payload) for r in
            media.filter("modality = 'image'").collect()}
    for r in out:
        assert r.width == 8 and r.height == 8
        assert len(r.pixels) == 64
        src_vals = set(srcs[r.media_id].reshape(-1).tolist())
        assert set(r.pixels) <= src_vals  # nearest-neighbor picks, no blend
    again = resize_images(media, width=8, height=8).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_resize_upscale_and_downscale(spark):
    """Resizing works in both directions: 4x4 target from any source,
    and a target larger than the source repeats source pixels."""
    from telescope_data_pipeline_spark.operators.multimodal import (
        make_fake_media,
        resize_images,
    )

    media = make_fake_media(spark)
    small = resize_images(media, width=4, height=4).collect()
    assert all(len(r.pixels) == 16 for r in small)
    big = resize_images(media, width=96, height=96).collect()
    assert all(len(r.pixels) == 96 * 96 for r in big)


def test_image_near_duplicates_finds_planted_copies(spark):
    """Perceptual-hash dedup: payloads sharing the stub decoder's seed
    bytes decode to IDENTICAL rasters (hamming 0 — the re-encoded-copy
    stand-in), unrelated images have near-random 64-bit hashes and must
    NOT pair at radius 6."""
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        image_near_duplicates,
        perceptual_hashes,
    )
    from telescope_data_pipeline_spark.schemas import MEDIA

    rng = np.random.default_rng(11)
    rows = []
    for i in range(20):
        payload = bytes(rng.integers(0, 256, size=64, dtype=np.uint8).tolist())
        rows.append((i, "image", payload, "image/png", 256, 256, None, {}))
    # planted near-dups: same first 8 bytes (the stub decoder's seed) as
    # media 0 and 5, different tails — a re-encode changes bytes, not look
    rows.append((100, "image", rows[0][2][:8] + b"\x01" * 56,
                 "image/png", 256, 256, None, {}))
    rows.append((101, "image", rows[5][2][:8] + b"\x02" * 56,
                 "image/png", 256, 256, None, {}))
    rows.append((200, "audio", b"\x00" * 64, "audio/wav", None, None, 3.0, {}))
    media = spark.createDataFrame(rows, schema=MEDIA)

    fps = {r.media_id: r.fp for r in perceptual_hashes(media).collect()}
    assert len(fps) == 22  # audio row filtered out
    assert fps[0] == fps[100] and fps[5] == fps[101]

    pairs = {(r.media_id_a, r.media_id_b): r.hamming
             for r in image_near_duplicates(media, max_hamming=6).collect()}
    assert pairs.get((0, 100)) == 0
    assert pairs.get((5, 101)) == 0
    assert set(pairs) == {(0, 100), (5, 101)}, pairs


def _make_bmp(pixels, bpp=24, top_down=False, pad_garbage=b"\xaa"):
    """Hand-rolled BMP encoder for test fixtures (BITMAPINFOHEADER,
    BI_RGB). pixels: HxW list of (r, g, b)."""
    import struct

    h, w = len(pixels), len(pixels[0])
    row_data = w * (bpp // 8)
    pad = (-row_data) % 4
    palette = b"".join(bytes([i, i, i, 0]) for i in range(256)) \
        if bpp == 8 else b""
    off = 14 + 40 + len(palette)
    rows = pixels if top_down else pixels[::-1]
    body = b""
    for row in rows:
        for px in row:
            if bpp == 24:
                r, g, b = px
                body += bytes([b, g, r])            # BGR on disk
            else:
                body += bytes([px])                  # palette index
        body += pad_garbage * pad
    height = -h if top_down else h
    header = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, height, 1, bpp, 0,
                      len(body), 2835, 2835, 256 if bpp == 8 else 0, 0)
    return header + dib + palette + body


def test_bmp_decode_24bit_known_pixels():
    from telescope_data_pipeline_spark.operators.multimodal import (
        decode_image,
    )

    # 2x3, distinct colors; bottom-up on disk, decode restores top-down
    img = decode_image(_make_bmp([[(255, 0, 0), (0, 255, 0), (0, 0, 255)],
                                  [(0, 0, 0), (255, 255, 255), (10, 20, 30)]]))
    assert img.shape == (2, 3)
    assert abs(img[0, 0] - 255 * 0.299) < 1e-4      # pure red, row 0 first
    assert abs(img[0, 1] - 255 * 0.587) < 1e-4
    assert abs(img[0, 2] - 255 * 0.114) < 1e-4
    assert img[1, 0] == 0.0 and abs(img[1, 1] - 255.0) < 1e-4


def test_bmp_decode_8bit_palette_and_topdown():
    from telescope_data_pipeline_spark.operators.multimodal import (
        decode_image,
    )

    img = decode_image(_make_bmp([[7, 8], [200, 0]], bpp=8, top_down=True))
    assert img.shape == (2, 2)
    # grayscale palette: luma of (i,i,i) is i
    assert abs(img[0, 0] - 7) < 1e-4 and abs(img[1, 0] - 200) < 1e-4


def test_bmp_row_padding_ignored():
    from telescope_data_pipeline_spark.operators.multimodal import (
        decode_image,
    )

    # width 3 at 24bpp -> 9 data bytes + 3 pad bytes of garbage per row
    a = decode_image(_make_bmp([[(1, 2, 3)] * 3] * 2, pad_garbage=b"\xff"))
    b = decode_image(_make_bmp([[(1, 2, 3)] * 3] * 2, pad_garbage=b"\x00"))
    assert (a == b).all()


def test_bmp_unsupported_variants_fail_loudly():
    import struct

    import pytest

    from telescope_data_pipeline_spark.operators.multimodal import (
        CodecUnavailable,
        decode_image,
    )

    good = _make_bmp([[(1, 2, 3)]])
    rle = good[:30] + struct.pack("<I", 1) + good[34:]  # compression=BI_RLE8
    with pytest.raises(CodecUnavailable):
        decode_image(rle)
    with pytest.raises(CodecUnavailable):
        decode_image(good[:20])  # truncated pixel array


def test_bm_prefix_without_dib_goes_to_stub():
    """A synthetic payload that happens to start with 'BM' but has no
    valid DIB size must take the stub, not the BMP decoder."""
    from telescope_data_pipeline_spark.operators.multimodal import (
        decode_image,
    )

    img = decode_image(b"BM" + bytes(range(60)))
    assert img.shape == (16, 16)  # stub signature shape


def test_bmp_flows_through_feature_pipeline(spark):
    """Real BMP payloads ride the Spark feature kernel end-to-end."""
    import pandas as pd

    from telescope_data_pipeline_spark.operators.multimodal import (
        extract_image_features,
    )
    from telescope_data_pipeline_spark.schemas import MEDIA

    bmp = _make_bmp([[(i * 8 % 256, 0, 0) for i in range(8)]
                     for _ in range(8)])
    pdf = pd.DataFrame({
        "media_id": [1], "modality": ["image"], "payload": [bmp],
        "mime": ["image/bmp"], "width": [8], "height": [8],
        "duration_s": [None], "meta": [None],
    })
    media = spark.createDataFrame(pdf, MEDIA)
    rows = extract_image_features(media).collect()
    assert len(rows) == 1
    expect_mean = sum((i * 8 % 256) * 0.299 for i in range(8)) / 8
    assert abs(rows[0].mean_intensity - expect_mean) < 1e-3


def _make_wav(samples, sr=8000, bits=16, n_ch=1, codec=1,
              extra_chunk=False):
    """Hand-rolled RIFF/WAVE encoder for test fixtures."""
    import struct

    import numpy as np

    a = np.asarray(samples, dtype=np.float64)
    if n_ch > 1:
        a = np.repeat(a[:, None], n_ch, axis=1).ravel()
    if codec == 3:
        bits = 32
        data = a.astype("<f4").tobytes()
    elif bits == 16:
        data = (a * 32767).astype("<i2").tobytes()
    elif bits == 32:
        data = (a * 2147483647).astype("<i4").tobytes()
    else:
        data = ((a * 127) + 128).astype(np.uint8).tobytes()
    fmt = struct.pack("<HHIIHH", codec, n_ch, sr,
                      sr * n_ch * bits // 8, n_ch * bits // 8, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk:  # a LIST chunk before data (odd size -> pad byte)
        chunks += b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_wav_decode_16bit_roundtrip():
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        decode_audio,
    )

    t = np.arange(800) / 8000.0
    ref = 0.5 * np.sin(2 * np.pi * 440 * t)
    wave, sr = decode_audio(_make_wav(ref), duration_s=0.1)
    assert sr == 8000 and len(wave) == 800
    assert float(np.abs(wave - ref).max()) < 1e-3  # 16-bit quantization


def test_wav_decode_float_stereo_and_chunk_walk():
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        decode_audio,
    )

    ref = np.linspace(-1, 1, 100)
    wave, sr = decode_audio(
        _make_wav(ref, sr=44100, codec=3, n_ch=2, extra_chunk=True),
        duration_s=None)
    assert sr == 44100 and len(wave) == 100
    assert float(np.abs(wave - ref).max()) < 1e-6  # float32 exactness


def test_wav_compressed_codec_fails_loudly():
    import pytest

    from telescope_data_pipeline_spark.operators.multimodal import (
        CodecUnavailable,
        decode_audio,
    )

    with pytest.raises(CodecUnavailable):
        decode_audio(_make_wav([0.0] * 10, codec=2), 0.1)  # ADPCM


# ---------------------------------------------------------------------------
# PNG decoder (pure Python, stdlib zlib — no PIL in this environment,
# which is exactly the condition the decoder exists for)
# ---------------------------------------------------------------------------

def _png_from_scanlines(w, h, ctype, scanlines):
    """Assemble a PNG from pre-filtered scanlines (filter byte + data)."""
    import struct
    import zlib

    from telescope_data_pipeline_spark.operators.multimodal import _png_chunk

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"".join(scanlines)))
            + _png_chunk(b"IEND", b""))


def test_png_decode_gray_rgb_rgba_known_pixels():
    """Filter-0 scanlines for color types 0/2/6: decoded grayscale must
    equal the exact ITU-R 601 luma of the planted pixels."""
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        _decode_png,
    )

    rng = np.random.default_rng(3)
    # gray
    g = rng.integers(0, 256, size=(4, 5), dtype=np.uint8)
    png = _png_from_scanlines(5, 4, 0, [b"\x00" + bytes(g[r])
                                        for r in range(4)])
    assert np.array_equal(_decode_png(png), g.astype(np.float32))
    # RGB and RGBA
    for ctype, ch in ((2, 3), (6, 4)):
        px = rng.integers(0, 256, size=(3, 4, ch), dtype=np.uint8)
        png = _png_from_scanlines(
            4, 3, ctype, [b"\x00" + bytes(px[r].ravel()) for r in range(3)])
        want = (px[..., 0] * 0.299 + px[..., 1] * 0.587
                + px[..., 2] * 0.114).astype(np.float32)
        got = _decode_png(png)
        assert got.shape == (3, 4)
        assert np.allclose(got, want)


def test_png_decode_all_filter_types():
    """Forward-filter known pixels with Sub/Up/Average/Paeth per the
    spec, then assert the decoder reconstructs the originals exactly."""
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        _decode_png,
    )

    rng = np.random.default_rng(11)
    w, h = 6, 5
    px = rng.integers(0, 256, size=(h, w), dtype=np.int32)  # gray, bpp=1

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    lines = []
    for y, f in zip(range(h), (0, 1, 2, 3, 4)):
        row = bytearray([f])
        for x in range(w):
            cur = int(px[y, x])
            a = int(px[y, x - 1]) if x else 0
            b = int(px[y - 1, x]) if y else 0
            c = int(px[y - 1, x - 1]) if x and y else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) >> 1,
                    4: paeth(a, b, c)}[f]
            row.append((cur - pred) & 0xFF)
        lines.append(bytes(row))
    got = _decode_png(_png_from_scanlines(w, h, 0, lines))
    assert np.array_equal(got, px.astype(np.float32))


def test_png_palette_and_unsupported_variants():
    """Palette PNGs decode through PLTE lookup; 16-bit depth and Adam7
    interlace fail LOUDLY (CodecUnavailable), never fall to the stub."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from telescope_data_pipeline_spark.operators.multimodal import (
        CodecUnavailable,
        _decode_png,
        _png_chunk,
    )

    # palette: 3 colors, 2x3 image
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(idx[r]) for r in range(2))
    png = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"PLTE", pal.tobytes())
           + _png_chunk(b"IDAT", zlib.compress(raw))
           + _png_chunk(b"IEND", b""))
    want = (pal[idx][..., 0] * 0.299 + pal[idx][..., 1] * 0.587
            + pal[idx][..., 2] * 0.114).astype(np.float32)
    assert np.allclose(_decode_png(png), want)

    for depth in (1, 2, 4):  # sub-byte depths still fail loudly
        bad_ihdr = struct.pack(">IIBBBBB", 2, 2, depth, 0, 0, 0, 0)
        bad = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", bad_ihdr)
               + _png_chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
               + _png_chunk(b"IEND", b""))
        with pytest.raises(CodecUnavailable, match="bit depth"):
            _decode_png(bad)
    # 16-bit palette is not a legal PNG combination
    bad_ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0)
    bad = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", bad_ihdr)
           + _png_chunk(b"PLTE", bytes(6))
           + _png_chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
           + _png_chunk(b"IEND", b""))
    with pytest.raises(CodecUnavailable, match="palette"):
        _decode_png(bad)


def _png_encode(px, ctype, depth=8, interlace=0):
    """Minimal PNG encoder for tests: filter-0 scanlines, optional
    16-bit samples (big-endian) and Adam7 interlacing — the layouts the
    round-10 decoder additions must reconstruct exactly."""
    import struct
    import zlib

    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import _png_chunk

    px = np.asarray(px)
    if px.ndim == 2:
        px = px[..., None]
    h, w, _ch = px.shape
    dt = ">u2" if depth == 16 else "u1"

    def scan(sub):
        return b"".join(b"\x00" + sub[y].astype(dt).tobytes()
                        for y in range(sub.shape[0]))

    if interlace:
        raw = b"".join(
            scan(px[ys::ystep, xs::xstep])
            for xs, ys, xstep, ystep in ((0, 0, 8, 8), (4, 0, 8, 8),
                                         (0, 4, 4, 8), (2, 0, 4, 4),
                                         (0, 2, 2, 4), (1, 0, 2, 2),
                                         (0, 1, 1, 2))
            if px[ys::ystep, xs::xstep].size)
    else:
        raw = scan(px)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b""))


def test_png_16bit_gray_and_rgb():
    """16-bit samples decode with the exact 1/257 rescale: full-scale
    white lands on 255.0, and RGB goes through the same ITU-R 601 luma
    as the 8-bit path."""
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        _decode_png,
    )

    rng = np.random.default_rng(7)
    g = rng.integers(0, 65536, size=(5, 4), dtype=np.uint16)
    g[0, 0], g[0, 1] = 65535, 0
    got = _decode_png(_png_encode(g, ctype=0, depth=16))
    assert np.allclose(got, (g / 257.0).astype(np.float32))
    assert got[0, 0] == 255.0 and got[0, 1] == 0.0

    rgb = rng.integers(0, 65536, size=(3, 6, 3), dtype=np.uint16)
    got = _decode_png(_png_encode(rgb, ctype=2, depth=16))
    f = (rgb / 257.0).astype(np.float32)
    want = f[..., 0] * 0.299 + f[..., 1] * 0.587 + f[..., 2] * 0.114
    assert np.allclose(got, want, atol=1e-3)


def test_png_adam7_matches_sequential():
    """An Adam7-interlaced PNG must decode to EXACTLY the same pixels
    as the sequential encoding of the same image — per-pass scanline
    reconstruction and sub-image reassembly are invisible to the
    caller. Sizes cover all seven passes including partial ones."""
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        _decode_png,
    )

    rng = np.random.default_rng(13)
    for (h, w) in ((16, 16), (9, 11), (3, 5), (1, 1), (2, 10)):
        g = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        seq = _decode_png(_png_encode(g, ctype=0, interlace=0))
        i7 = _decode_png(_png_encode(g, ctype=0, interlace=1))
        assert np.array_equal(seq, i7), (h, w)
    # RGBA and 16-bit gray through the interlaced path too
    rgba = rng.integers(0, 256, size=(10, 7, 4), dtype=np.uint8)
    assert np.array_equal(_decode_png(_png_encode(rgba, 6, 8, 0)),
                          _decode_png(_png_encode(rgba, 6, 8, 1)))
    g16 = rng.integers(0, 65536, size=(12, 9), dtype=np.uint16)
    assert np.array_equal(_decode_png(_png_encode(g16, 0, 16, 0)),
                          _decode_png(_png_encode(g16, 0, 16, 1)))


def test_png_corrupt_input_raises_typed_codec_error():
    """Corrupt PNGs must fail with CodecUnavailable — same typed
    contract as the JPEG path (round-7 ADVICE item): a damaged IDAT
    must not leak raw zlib.error, and a palette index beyond PLTE must
    not leak IndexError."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from telescope_data_pipeline_spark.operators.multimodal import (
        CodecUnavailable,
        _decode_png,
        _png_chunk,
    )

    # damaged IDAT: valid chunk framing, garbage deflate stream
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    bad_idat = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
                + _png_chunk(b"IDAT", b"\x99garbage-not-deflate")
                + _png_chunk(b"IEND", b""))
    with pytest.raises(CodecUnavailable, match="corrupt PNG"):
        _decode_png(bad_idat)

    # palette index 5 with a 2-entry PLTE
    pal = np.array([[255, 0, 0], [0, 255, 0]], dtype=np.uint8)
    idx_raw = b"\x00" + bytes([0, 5]) + b"\x00" + bytes([1, 0])
    ihdr3 = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    bad_pal = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr3)
               + _png_chunk(b"PLTE", pal.tobytes())
               + _png_chunk(b"IDAT", zlib.compress(idx_raw))
               + _png_chunk(b"IEND", b""))
    with pytest.raises(CodecUnavailable, match="corrupt PNG"):
        _decode_png(bad_pal)

    # PNG cut mid-IHDR: struct.unpack on the short header raises
    # struct.error, which the typed wrapper must also translate
    # (round-8 ADVICE item)
    full = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr))
    cut_mid_ihdr = full[:8 + 8 + 3]  # signature + len/type + 3 IHDR bytes
    with pytest.raises(CodecUnavailable, match="corrupt PNG"):
        _decode_png(cut_mid_ihdr)


def test_png_near_duplicates_planted_copy_no_pil(spark):
    """End-to-end without PIL: a re-encoded PNG copy of a BMP image
    (same pixels, different container) must surface as a perceptual-
    hash near-duplicate pair — the image-dedup promise on the formats
    a real crawl contains."""
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        _decode_bmp,
        _tiny_bmp,
        image_near_duplicates,
    )
    from telescope_data_pipeline_spark.schemas import MEDIA

    rng = np.random.default_rng(23)
    bmp = _tiny_bmp(rng, side=16)
    gray = _decode_bmp(bmp).astype(np.uint8)  # exact pixels
    png = _png_from_scanlines(
        16, 16, 0, [b"\x00" + bytes(gray[r]) for r in range(16)])
    distractor_rng = np.random.default_rng(99)
    rows = [
        (0, "image", bmp, "image/bmp", 16, 16, None, {"src": "a"}),
        (1, "image", png, "image/png", 16, 16, None, {"src": "b"}),
        (2, "image", _tiny_bmp(distractor_rng, side=16), "image/bmp",
         16, 16, None, {"src": "c"}),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA)
    pairs = {(r.media_id_a, r.media_id_b)
             for r in image_near_duplicates(media, max_hamming=6).collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


# ---------------------------------------------------------------------------
# Baseline JPEG: hand-rolled encoder fixture + pure-Python decode
# ---------------------------------------------------------------------------

def _jpeg_category(v):
    """JPEG magnitude category: bit length of |v| (0 for 0)."""
    return 0 if v == 0 else int(abs(v)).bit_length()


class _JpegBitWriter:
    def __init__(self):
        self.buf, self.acc, self.n = bytearray(), 0, 0

    def write(self, val, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.acc = (self.acc << pad) | ((1 << pad) - 1)
            self.buf.append(self.acc)
            if self.acc == 0xFF:
                self.buf.append(0x00)
            self.acc, self.n = 0, 0


def _jpeg_canonical_table(symbols):
    """One-length canonical Huffman table over the used symbol set:
    every symbol gets an L-bit code with L chosen so the all-ones code
    stays unused (n <= 2^L - 1). Returns (counts16, ordered_symbols,
    {sym: (code, L)})."""
    syms = sorted(set(symbols))
    L = max(2, (len(syms) + 1).bit_length())
    counts = [0] * 16
    counts[L - 1] = len(syms)
    codes = {s: (i << 0, L) for i, s in enumerate(syms)}
    return bytes(counts), bytes(syms), codes


def _make_jpeg(img, subsample=(1, 1), restart_interval=0, sos_perm=None):
    """Hand-rolled baseline JPEG encoder for test fixtures: all-ones
    quant table (near-lossless), one shared DC and AC Huffman table
    built from the image's own symbols (the decoder reads tables from
    DHT, so custom tables exercise the same path as Annex K's),
    optional 4:2:0/4:2:2 luma sampling and restart intervals."""
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        _JPEG_DCT,
        _JPEG_ZZ,
    )

    a = np.asarray(img, np.float64)
    h, w = a.shape[:2]
    if a.ndim == 2:
        planes = [a]
        comps = [(1, 1, 1)]
    else:
        r, g, b = a[..., 0], a[..., 1], a[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        sh, sv = subsample
        # box-average subsample chroma to ceil(h/sv) x ceil(w/sh)
        def sub(p):
            ph = -(-h // sv) * sv
            pw = -(-w // sh) * sw if False else -(-w // sh) * sh
            pad = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
            return pad.reshape(ph // sv, sv, pw // sh, sh).mean(axis=(1, 3))
        planes = [y, sub(cb), sub(cr)]
        comps = [(1, sh, sv), (2, 1, 1), (3, 1, 1)]

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    def padded(p, ch, cv):
        th, tw = mcuy * 8 * cv, mcux * 8 * ch
        return np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])),
                      mode="edge")
    planes = [padded(p, c[1], c[2]) for p, c in zip(planes, comps)]

    # pass 1: per-MCU zigzag coefficient blocks (quant = all ones)
    blocks = []  # (comp_idx, [64 ints])
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for ci, (cid, ch, cv) in enumerate(comps):
            for by in range(cv):
                for bx in range(ch):
                    y0, x0 = (my * cv + by) * 8, (mx * ch + bx) * 8
                    blk = planes[ci][y0:y0 + 8, x0:x0 + 8] - 128.0
                    co = _JPEG_DCT @ blk @ _JPEG_DCT.T
                    zz = [int(round(co[r, c])) for (r, c) in _JPEG_ZZ]
                    blocks.append((ci, zz))

    # symbol collection (with restart-aware DC predictors)
    n_comp_blocks = sum(c[1] * c[2] for c in comps)
    dc_syms, ac_syms = [], []
    preds = [0] * len(comps)
    for bi, (ci, zz) in enumerate(blocks):
        if restart_interval and bi % (restart_interval * n_comp_blocks) == 0 \
                and bi:
            preds = [0] * len(comps)
        diff = zz[0] - preds[ci]
        preds[ci] = zz[0]
        dc_syms.append(_jpeg_category(diff))
        k = 1
        while k < 64:
            run = 0
            while k < 64 and zz[k] == 0:
                run, k = run + 1, k + 1
            if k == 64:
                ac_syms.append(0x00)  # EOB
                break
            while run >= 16:
                ac_syms.append(0xF0)
                run -= 16
            ac_syms.append((run << 4) | _jpeg_category(zz[k]))
            k += 1
        else:
            pass
    dc_counts, dc_vals, dc_codes = _jpeg_canonical_table(dc_syms)
    ac_counts, ac_vals, ac_codes = _jpeg_canonical_table(ac_syms)

    # pass 2: emit entropy-coded bits
    def put_coef(bw, codes, sym, v):
        code, ln = codes[sym]
        bw.write(code, ln)
        s = sym & 15
        if s:
            bw.write(v if v > 0 else v + (1 << s) - 1, s)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" + b"\x01" * 64
    nc = len(comps)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([nc])
    for cid, ch, cv in comps:
        sof += bytes([cid, (ch << 4) | cv, 0])
    out += b"\xff\xc0" + (2 + len(sof)).to_bytes(2, "big") + sof
    for cls, counts, vals in ((0, dc_counts, dc_vals),
                              (1, ac_counts, ac_vals)):
        seg = bytes([cls << 4]) + counts + vals
        out += b"\xff\xc4" + (2 + len(seg)).to_bytes(2, "big") + seg
    if restart_interval:
        out += b"\xff\xdd" + (4).to_bytes(2, "big") \
            + restart_interval.to_bytes(2, "big")
    sos = bytes([nc])
    for ci in (sos_perm if sos_perm is not None else range(nc)):
        sos += bytes([comps[ci][0], 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + (2 + len(sos)).to_bytes(2, "big") + sos

    bw = _JpegBitWriter()
    preds = [0] * len(comps)
    rst = 0
    per_mcu = n_comp_blocks
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            out += bw.buf
            bw = _JpegBitWriter()
            out += bytes([0xFF, 0xD0 + rst % 8])
            rst += 1
            preds = [0] * len(comps)
        chunk = blocks[m * per_mcu:(m + 1) * per_mcu]
        if sos_perm is not None:  # MCU interleave follows SOS scan order
            by_ci = {}
            for ci, zz in chunk:
                by_ci.setdefault(ci, []).append((ci, zz))
            chunk = [blk for ci in sos_perm for blk in by_ci[ci]]
        for ci, zz in chunk:
            diff = zz[0] - preds[ci]
            preds[ci] = zz[0]
            put_coef(bw, dc_codes, _jpeg_category(diff), diff)
            k = 1
            while k < 64:
                run = 0
                while k < 64 and zz[k] == 0:
                    run, k = run + 1, k + 1
                if k == 64:
                    code, ln = ac_codes[0x00]
                    bw.write(code, ln)
                    break
                while run >= 16:
                    code, ln = ac_codes[0xF0]
                    bw.write(code, ln)
                    run -= 16
                put_coef(bw, ac_codes, (run << 4) | _jpeg_category(zz[k]),
                         zz[k])
                k += 1
    bw.flush()
    out += bw.buf + b"\xff\xd9"
    return bytes(out)


def test_jpeg_decode_grayscale_roundtrip():
    """All-ones quant: decode(encode(X)) must match X within the FDCT
    rounding budget (< 2 gray levels), including non-multiple-of-8
    dimensions (edge blocks crop, never wrap)."""
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        decode_image,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(17, 24)).astype(np.float64)
    payload = _make_jpeg(img)
    assert payload[:3] == b"\xff\xd8\xff"
    dec = decode_image(payload)
    assert dec.shape == (17, 24) and dec.dtype == np.float32
    assert float(np.abs(dec - img).max()) < 2.0


def test_jpeg_decode_420_color_with_restarts():
    """4:2:0 RGB with a restart interval: the decoded gray must match
    the ITU-R 601 luma of the source (chroma subsampling never touches
    Y), and the restart path must resync DC predictors."""
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        decode_image,
    )

    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, size=(21, 19, 3)).astype(np.float64)
    payload = _make_jpeg(rgb, subsample=(2, 2), restart_interval=2)
    dec = decode_image(payload)
    luma = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    assert dec.shape == (21, 19)
    assert float(np.abs(dec - np.clip(luma, 0, 255)).max()) < 2.5


def test_jpeg_sos_scan_order_differs_from_sof():
    """A legal baseline JPEG may list SOS components in a different
    order than SOF; MCUs interleave in SCAN order (T.81 A.2.3), so a
    frame-order decode would desync the bitstream and corrupt luma.
    Encode Cr,Cb,Y scan order and require the exact same Y plane as
    the canonical ordering (round-7 ADVICE item)."""
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        decode_image,
    )

    rng = np.random.default_rng(13)
    rgb = rng.integers(0, 256, size=(16, 16, 3)).astype(np.float64)
    canonical = decode_image(_make_jpeg(rgb))
    permuted = decode_image(_make_jpeg(rgb, sos_perm=(2, 1, 0)))
    assert np.array_equal(canonical, permuted)


def test_jpeg_fill_bytes_before_markers():
    """0xFF fill bytes before a marker are legal (T.81 B.1.1.2) both in
    the header stream and in the entropy-coded segment; the decoder
    must skip them, not raise (round-7 ADVICE item)."""
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        decode_image,
    )

    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, size=(16, 16)).astype(np.float64)
    good = _make_jpeg(img)
    # fill bytes after SOI (before DQT) and before the trailing EOI
    assert good.endswith(b"\xff\xd9")
    stuffed = (good[:2] + b"\xff\xff" + good[2:-2] + b"\xff" + b"\xff\xd9")
    assert np.array_equal(decode_image(good), decode_image(stuffed))


def test_jpeg_unsupported_variants_fail_loudly():
    """Arithmetic-coded (SOF10), malformed pseudo-progressive, and
    truncated scans must raise CodecUnavailable — never fall through
    to the stub. (SOF2 itself decodes since round 10; relabeling a
    BASELINE stream as SOF2 yields an illegal progressive scan header
    — Ss=0 with Se=63 — which must still fail loudly.)"""
    import numpy as np
    import pytest

    from telescope_data_pipeline_spark.operators.multimodal import (
        CodecUnavailable,
        decode_image,
    )

    img = np.full((8, 8), 128.0)
    good = _make_jpeg(img)
    arithmetic = good.replace(b"\xff\xc0", b"\xff\xca", 1)
    with pytest.raises(CodecUnavailable, match="SOF10"):
        decode_image(arithmetic)
    fake_progressive = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(CodecUnavailable, match="DC scan with Se"):
        decode_image(fake_progressive)
    with pytest.raises(CodecUnavailable):
        decode_image(good[:40])  # no SOS reached


def test_jpeg_cross_codec_near_duplicate(spark):
    """A JPEG re-encode of a BMP image must surface as a perceptual-
    hash near-duplicate pair — closing the crawl-formats loop
    (BMP/PNG/JPEG all decode pure-Python, all join the same banded
    dedup)."""
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        _decode_bmp,
        _tiny_bmp,
        image_near_duplicates,
    )
    from telescope_data_pipeline_spark.schemas import MEDIA

    rng = np.random.default_rng(23)
    bmp = _tiny_bmp(rng, side=16)
    gray = _decode_bmp(bmp).astype(np.float64)
    jpg = _make_jpeg(gray)
    distractor = _tiny_bmp(np.random.default_rng(99), side=16)
    rows = [
        (0, "image", bmp, "image/bmp", 16, 16, None, {"src": "a"}),
        (1, "image", jpg, "image/jpeg", 16, 16, None, {"src": "b"}),
        (2, "image", distractor, "image/bmp", 16, 16, None, {"src": "c"}),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA)
    pairs = {(r.media_id_a, r.media_id_b)
             for r in image_near_duplicates(media, max_hamming=6).collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


# ---------------------------------------------------------------------------
# Progressive JPEG (SOF2): hand-rolled multi-scan encoder fixture +
# pure-Python successive-approximation decode (round-9 VERDICT item 4)
# ---------------------------------------------------------------------------

def _prog_bits_of(v, n):
    return [(v >> i) & 1 for i in range(n - 1, -1, -1)]


def _make_jpeg_progressive(img, al_dc=1, al_ac=1, split=20):
    """Hand-rolled progressive JPEG encoder (T.81 Annex G) for test
    fixtures: all-ones quant, 1x1 sampling, six scans — interleaved DC
    first (Al=al_dc) + DC refinement, then per spectral band an AC
    first pass (Al=al_ac) and an AC refinement, luma before chroma.
    Exercises EOB runs across blocks, ZRL in both AC passes, and
    interleaved correction bits."""
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        _JPEG_DCT,
        _JPEG_ZZ,
    )

    a = np.asarray(img, np.float64)
    h, w = a.shape[:2]
    if a.ndim == 2:
        planes = [a]
        comps = [(1, 1, 1)]
    else:
        r, g, b = a[..., 0], a[..., 1], a[..., 2]
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
                  128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b]
        comps = [(1, 1, 1), (2, 1, 1), (3, 1, 1)]
    mcux, mcuy = -(-w // 8), -(-h // 8)

    def padded(p):
        return np.pad(p, ((0, mcuy * 8 - p.shape[0]),
                          (0, mcux * 8 - p.shape[1])), mode="edge")
    planes = [padded(p) for p in planes]

    # zigzag integer coefficient blocks per component, row-major
    zz_blocks = []  # [ci][block_index] -> [64 ints]
    for ci in range(len(comps)):
        blocks = []
        for m in range(mcux * mcuy):
            my, mx = divmod(m, mcux)
            blk = planes[ci][my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] - 128.0
            co = _JPEG_DCT @ blk @ _JPEG_DCT.T
            blocks.append([int(round(co[r, c])) for (r, c) in _JPEG_ZZ])
        zz_blocks.append(blocks)

    def emit_scan(out, scan_comps, ss, se, ah, al, ops, dc_scan):
        """ops: list of (huff_symbol_or_None, extra_bits, corr_bits);
        symbol None = raw-bits-only op (DC refinement)."""
        use_huff = any(sym is not None for sym, _e, _c in ops)
        if use_huff:
            syms = [sym for sym, _e, _c in ops if sym is not None]
            counts, vals, codes = _jpeg_canonical_table(syms)
            cls = 0 if dc_scan else 1
            seg = bytes([cls << 4]) + counts + vals
            out += b"\xff\xc4" + (2 + len(seg)).to_bytes(2, "big") + seg
        else:
            codes = {}
        sos = bytes([len(scan_comps)])
        for cid in scan_comps:
            sos += bytes([cid, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + (2 + len(sos)).to_bytes(2, "big") + sos
        bw = _JpegBitWriter()
        for sym, extra, corr in ops:
            if sym is not None:
                code, ln = codes[sym]
                bw.write(code, ln)
            for bit in extra:
                bw.write(bit, 1)
            for bit in corr:
                bw.write(bit, 1)
        bw.flush()
        out += bw.buf
        return out

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" + b"\x01" * 64
    nc = len(comps)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([nc])
    for cid, chh, cvv in comps:
        sof += bytes([cid, (chh << 4) | cvv, 0])
    out += b"\xff\xc2" + (2 + len(sof)).to_bytes(2, "big") + sof

    # ---- scan 1: DC first, interleaved, Ah=0, Al=al_dc ----
    ops = []
    preds = [0] * nc
    for m in range(mcux * mcuy):
        for ci in range(nc):
            v = zz_blocks[ci][m][0] >> al_dc  # arithmetic point transform
            diff = v - preds[ci]
            preds[ci] = v
            s = _jpeg_category(diff)
            extra = _prog_bits_of(diff if diff > 0
                                  else diff + (1 << s) - 1, s) if s else []
            ops.append((s, extra, []))
    out = emit_scan(out, [c[0] for c in comps], 0, 0, 0, al_dc, ops, True)

    # ---- scan 2..: DC refinement bits, Ah=al_dc..1 ----
    for alr in range(al_dc - 1, -1, -1):
        ops = [(None, [(zz_blocks[ci][m][0] >> alr) & 1], [])
               for m in range(mcux * mcuy) for ci in range(nc)]
        out = emit_scan(out, [c[0] for c in comps], 0, 0, alr + 1, alr,
                        ops, True)

    # ---- AC scans per component, two spectral bands ----
    bands = [(1, split), (split + 1, 63)]
    for ci in range(nc):
        for ss, se in bands:
            # first pass at al_ac
            ops, eobrun, eob_extra = [], 0, None
            def flush_eob():
                nonlocal eobrun
                if eobrun:
                    rb = eobrun.bit_length() - 1
                    ops.append(((rb << 4) | 0,
                                _prog_bits_of(eobrun - (1 << rb), rb), []))
                    eobrun = 0
            for m in range(mcux * mcuy):
                band = zz_blocks[ci][m][ss:se + 1]
                shifted = [(1 if v > 0 else -1) * (abs(v) >> al_ac)
                           for v in band]
                if not any(shifted):
                    eobrun += 1
                    continue
                flush_eob()
                run = 0
                last_nz = max(i for i, v in enumerate(shifted) if v)
                for i, v in enumerate(shifted):
                    if i > last_nz:
                        break
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        ops.append((0xF0, [], []))
                        run -= 16
                    s = _jpeg_category(v)
                    ops.append(((run << 4) | s,
                                _prog_bits_of(v if v > 0
                                              else v + (1 << s) - 1, s), []))
                    run = 0
                if last_nz < len(shifted) - 1:
                    eobrun += 1
            flush_eob()
            out = emit_scan(out, [comps[ci][0]], ss, se, 0, al_ac, ops,
                            False)
    for ci in range(nc):
        for ss, se in bands:
            for alr in range(al_ac - 1, -1, -1):
                ops = _prog_ac_refine_ops(zz_blocks[ci], mcux * mcuy,
                                          ss, se, alr)
                out = emit_scan(out, [comps[ci][0]], ss, se, alr + 1, alr,
                                ops, False)
    out += b"\xff\xd9"
    return bytes(out)


def _prog_ac_refine_ops(blocks, n_blocks, ss, se, al):
    """AC refinement scan ops (T.81 G.1.2.3 encoder): newly nonzero
    coefficients (|v|>>al == 1) emit (run,1)+sign; crossed
    nonzero-history coefficients append correction bits; trailing
    bands join an EOB run whose correction bits follow the EOBn."""
    ops = []
    eobrun = 0
    eob_corr = []

    def flush_eob():
        nonlocal eobrun, eob_corr
        if eobrun or eob_corr:
            if eobrun == 0:
                raise AssertionError("corr bits without EOB run")
            rb = eobrun.bit_length() - 1
            ops.append(((rb << 4) | 0,
                        _prog_bits_of(eobrun - (1 << rb), rb),
                        list(eob_corr)))
            eobrun = 0
            eob_corr = []

    for m in range(n_blocks):
        band = blocks[m][ss:se + 1]
        temp = [abs(v) >> al for v in band]
        newnz = [i for i, t in enumerate(temp) if t == 1]
        if not newnz:
            if any(t > 1 or t == 1 for t in temp) or True:
                # whole band joins the EOB run; history coeffs (t>1)
                # contribute correction bits in position order
                eobrun += 1
                eob_corr.extend(t & 1 for t in temp if t > 1)
            continue
        flush_eob()
        events = []  # 'z' or ('h', bit), in position order
        last = newnz[-1]
        for i, t in enumerate(temp):
            if i > last:
                break
            if t == 0:
                events.append("z")
            elif t > 1:
                events.append(("h", t & 1))
            else:  # t == 1: newly nonzero -> flush events into ZRLs
                zcount = sum(1 for e in events if e == "z")
                j = 0
                while zcount >= 16:
                    consumed, bits = 0, []
                    while consumed < 16:
                        ev = events[j]
                        j += 1
                        if ev == "z":
                            consumed += 1
                        else:
                            bits.append(ev[1])
                    ops.append((0xF0, [], bits))
                    zcount -= 16
                rest_bits = [ev[1] for ev in events[j:] if ev != "z"]
                sign = [1 if band[i] > 0 else 0]
                ops.append(((zcount << 4) | 1, sign, rest_bits))
                events = []
        if last < len(temp) - 1:
            eobrun += 1
            eob_corr.extend(t & 1 for t in temp[last + 1:] if t > 1)
    flush_eob()
    return ops


def test_jpeg_progressive_roundtrip_grayscale():
    """decode(progressive_encode(X)) must match X within the FDCT
    rounding budget, including non-multiple-of-8 dimensions and a
    flat region wide enough to force multi-block EOB runs."""
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        decode_image,
    )

    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, size=(17, 24)).astype(np.float64)
    img[:, 8:16] = 77.0  # flat blocks -> empty AC bands -> EOB runs
    payload = _make_jpeg_progressive(img)
    assert payload[:4] == b"\xff\xd8\xff\xdb"
    assert b"\xff\xc2" in payload
    dec = decode_image(payload)
    assert dec.shape == (17, 24) and dec.dtype == np.float32
    assert float(np.abs(dec - img).max()) < 2.0


def test_jpeg_progressive_matches_baseline_pixels():
    """The same image encoded baseline and progressive must decode to
    (near-)identical Y planes — scan structure is lossless
    reorganization of the same coefficients. Swept over several seeds
    and successive-approximation depths to cover ZRL-in-refinement
    and deep correction-bit interleaving."""
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        decode_image,
    )

    for seed, al_dc, al_ac, split in ((41, 1, 1, 20), (43, 2, 2, 5),
                                      (47, 0, 1, 33), (53, 1, 0, 10)):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(16, 16)).astype(np.float64)
        base = decode_image(_make_jpeg(img))
        prog = decode_image(_make_jpeg_progressive(
            img, al_dc=al_dc, al_ac=al_ac, split=split))
        assert float(np.abs(base - prog).max()) < 1e-3, (seed, al_dc, al_ac)


def test_jpeg_progressive_color_luma_only():
    """Color progressive: chroma AC scans are skipped wholesale, yet
    the Y plane must equal the ITU-R 601 luma of the source."""
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        decode_image,
    )

    rng = np.random.default_rng(59)
    rgb = rng.integers(0, 256, size=(19, 13, 3)).astype(np.float64)
    dec = decode_image(_make_jpeg_progressive(rgb))
    luma = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    assert dec.shape == (19, 13)
    assert float(np.abs(dec - np.clip(luma, 0, 255)).max()) < 2.5


def test_jpeg_progressive_baseline_near_duplicate(spark):
    """The VERDICT's acceptance check: a baseline/progressive encoding
    pair of the same image must land as a perceptual-hash near-dup in
    the banded image dedup, while an unrelated image stays out."""
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        image_near_duplicates,
    )
    from telescope_data_pipeline_spark.schemas import MEDIA

    rng = np.random.default_rng(61)
    img = rng.integers(0, 256, size=(16, 16)).astype(np.float64)
    base = _make_jpeg(img)
    prog = _make_jpeg_progressive(img)
    other = _make_jpeg(
        np.random.default_rng(97).integers(0, 256, (16, 16)).astype(float))
    rows = [
        (0, "image", base, "image/jpeg", 16, 16, None, {"enc": "baseline"}),
        (1, "image", prog, "image/jpeg", 16, 16, None, {"enc": "progressive"}),
        (2, "image", other, "image/jpeg", 16, 16, None, {"enc": "baseline"}),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA)
    pairs = {(r.media_id_a, r.media_id_b)
             for r in image_near_duplicates(media, max_hamming=6).collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


# ---------------------------------------------------------------------------
# GIF decoder (pure Python LZW — no PIL in this environment)
# ---------------------------------------------------------------------------

def _gif_lzw_encode(indices, min_code_size):
    """Reference GIF LZW encoder for tests: real dictionary growth,
    code-width bumps, 4095-entry cap with CLEAR reset."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc = bits = 0

    def emit(code, size):
        nonlocal acc, bits
        acc |= code << bits
        bits += size
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    w = b""
    for px in bytes(indices):
        wk = w + bytes([px])
        if wk in table:
            w = wk
            continue
        emit(table[w], code_size)
        table[wk] = next_code
        next_code += 1
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code >= 4096:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        w = bytes([px])
    if w:
        emit(table[w], code_size)
    emit(end, code_size)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_encode(idx, pal, interlace=False, animated_extra=False,
                frame_box=None):
    """Assemble a GIF89a from palette indices: optional interlace row
    reorder, optional graphic-control extension + a junk second frame
    (animation — only the FIRST frame must decode), optional sub-
    rectangle frame placement."""
    import struct

    import numpy as np

    h, w = idx.shape
    sw, sh = (frame_box[2], frame_box[3]) if frame_box else (w, h)
    n = len(pal)
    size_bits = max((n - 1).bit_length(), 1) - 1
    gct = np.zeros((2 << size_bits, 3), np.uint8)
    gct[:n] = pal
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | size_bits, 0, 0)
    out += gct.tobytes()
    if animated_extra:  # NETSCAPE loop extension: must be skipped
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control
    rows = idx
    ipacked = 0
    if interlace:
        import numpy as np

        order = np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                                np.arange(2, h, 4), np.arange(1, h, 2)])
        rows = idx[order]
        ipacked |= 0x40
    left, top = (frame_box[0], frame_box[1]) if frame_box else (0, 0)
    out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, ipacked)
    min_code = max(size_bits + 1, 2)
    out.append(min_code)
    data = _gif_lzw_encode(rows.ravel(), min_code)
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    if animated_extra:  # second frame: same box, all-zero pixels
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(min_code)
        data2 = _gif_lzw_encode(bytes(w * h), min_code)
        for i in range(0, len(data2), 255):
            chunk = data2[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


def _luma(pal, idx):
    import numpy as np

    rgb = pal[idx].astype(np.float32)
    return rgb[..., 0] * 0.299 + rgb[..., 1] * 0.587 + rgb[..., 2] * 0.114


def test_gif_roundtrip_with_dictionary_growth():
    """A 64x48 random 32-color GIF forces real LZW dictionary growth
    and at least one code-width bump; decode must reproduce the exact
    palette luma."""
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        _decode_gif,
        decode_image,
    )

    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, size=(32, 3), dtype=np.uint8)
    idx = rng.integers(0, 32, size=(48, 64), dtype=np.uint8)
    gif = _gif_encode(idx, pal)
    got = _decode_gif(gif)
    assert got.shape == (48, 64)
    assert np.allclose(got, _luma(pal, idx))
    # dispatch routes by magic, no PIL involved
    assert np.allclose(decode_image(gif), _luma(pal, idx))


def test_gif_interlaced_and_animated_first_frame():
    """Interlaced row order must be undone exactly; extensions and the
    second animation frame are skipped — the FIRST frame decodes."""
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        _decode_gif,
    )

    rng = np.random.default_rng(6)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(13, 9), dtype=np.uint8)  # odd height
    assert np.allclose(_decode_gif(_gif_encode(idx, pal, interlace=True)),
                       _luma(pal, idx))
    assert np.allclose(
        _decode_gif(_gif_encode(idx, pal, animated_extra=True)),
        _luma(pal, idx))


def test_gif_subframe_composes_on_background():
    """A first frame smaller than the logical screen lands at its
    (left, top) offset on a background-color canvas."""
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        _decode_gif,
    )

    pal = np.array([[10, 10, 10], [200, 50, 0], [0, 200, 50],
                    [50, 0, 200]], dtype=np.uint8)
    idx = np.array([[1, 2], [3, 1]], dtype=np.uint8)
    gif = _gif_encode(idx, pal, frame_box=(3, 1, 8, 6))
    got = _decode_gif(gif)
    assert got.shape == (6, 8)
    want = np.full((6, 8), _luma(pal, np.array(0)), np.float32)
    want[1:3, 3:5] = _luma(pal, idx)
    assert np.allclose(got, want)


def test_gif_corrupt_raises_typed_codec_error():
    """Truncated LZW data, out-of-range codes, and missing image
    descriptors all surface as CodecUnavailable — never raw errors."""
    import numpy as np
    import pytest

    from telescope_data_pipeline_spark.operators.multimodal import (
        CodecUnavailable,
        _decode_gif,
    )

    rng = np.random.default_rng(7)
    pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    idx = rng.integers(0, 8, size=(10, 10), dtype=np.uint8)
    good = _gif_encode(idx, pal)
    with pytest.raises(CodecUnavailable):
        _decode_gif(good[:40])  # cut mid-stream
    with pytest.raises(CodecUnavailable, match="no image"):
        _decode_gif(b"GIF89a" + good[6:13] + good[13:13 + 3 * 8] + b"\x3b")
    # an invalid LZW minimum code size is structural corruption (a
    # random data-byte flip may still decode: GIF carries no checksum)
    bad_min = bytearray(good)
    # layout: 13-byte header, 24-byte GCT, 0x2C + 9-byte descriptor,
    # THEN the LZW min-code byte
    bad_min[13 + 3 * 8 + 10] = 13
    with pytest.raises(CodecUnavailable, match="min code"):
        _decode_gif(bytes(bad_min))


# ---------------------------------------------------------------------------
# TIFF decoder (pure Python — no PIL in this environment)
# ---------------------------------------------------------------------------

def _tiff_lzw_encode(data):
    """Reference TIFF LZW encoder: MSB-first packing, early change."""
    out = bytearray()
    acc = bits = 0

    def emit(code, size):
        nonlocal acc, bits
        acc = (acc << size) | code
        bits += size
        while bits >= 8:
            out.append((acc >> (bits - 8)) & 0xFF)
            bits -= 8
            acc &= (1 << bits) - 1

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    code_size = 9
    emit(256, code_size)  # Clear
    w = b""
    for px in bytes(data):
        wk = w + bytes([px])
        if wk in table:
            w = wk
            continue
        emit(table[w], code_size)
        table[wk] = next_code
        next_code += 1
        if next_code == (1 << code_size) - 1 and code_size < 12:
            code_size += 1  # early change
        if next_code >= 4094:
            emit(256, code_size)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            code_size = 9
        w = bytes([px])
    if w:
        emit(table[w], code_size)
    emit(257, code_size)  # EOI
    if bits:
        out.append((acc << (8 - bits)) & 0xFF)
    return bytes(out)


def _packbits_encode(data):
    """Literal-only PackBits (runs of <=128 literals) — valid stream."""
    out = bytearray()
    for i in range(0, len(data), 128):
        chunk = data[i:i + 128]
        out.append(len(chunk) - 1)
        out += chunk
    return bytes(out)


def _tiff_encode(arr, eo="<", comp=1, photo=None, predictor=1,
                 palette=None, rows_per_strip=None):
    """Minimal TIFF writer: strip layout, gray/RGB/palette, None /
    LZW / PackBits compression, optional horizontal differencing."""
    import struct

    import numpy as np

    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[..., None]
    h, w, spp = arr.shape
    if photo is None:
        photo = 2 if spp == 3 else 1
    rps = rows_per_strip or h
    src = arr
    if predictor == 2:
        d = arr.astype(np.int16)
        d[:, 1:] -= arr[:, :-1].astype(np.int16)
        src = (d & 0xFF).astype(np.uint8)
    strips = []
    for y0 in range(0, h, rps):
        raw = src[y0:y0 + rps].tobytes()
        if comp == 5:
            strips.append(_tiff_lzw_encode(raw))
        elif comp == 32773:
            strips.append(_packbits_encode(raw))
        else:
            strips.append(raw)

    entries = {256: (4, [w]), 257: (4, [h]), 258: (3, [8] * spp),
               259: (3, [comp]), 262: (3, [photo]), 277: (3, [spp]),
               278: (4, [rps]), 317: (3, [predictor])}
    if palette is not None:
        cmap = (palette.astype(np.uint32) * 65535 // 255).astype(np.uint16)
        entries[320] = (3, list(cmap[:, 0]) + list(cmap[:, 1])
                        + list(cmap[:, 2]))
    # layout: 8-byte header, IFD, overflow values, strip data
    n = len(entries) + 2  # + StripOffsets + StripByteCounts
    ifd_off = 8
    overflow_off = ifd_off + 2 + 12 * n + 4
    overflow = bytearray()
    tsize = {1: 1, 3: 2, 4: 4}
    tfmt = {1: "B", 3: "H", 4: "I"}

    def render(typ, vals):
        nonlocal overflow
        raw = struct.pack(eo + str(len(vals)) + tfmt[typ], *vals)
        if len(raw) <= 4:
            return raw.ljust(4, b"\x00")
        off = overflow_off + len(overflow)
        overflow += raw + (b"\x00" if len(raw) & 1 else b"")
        return struct.pack(eo + "I", off)

    # strip tables (offsets filled after overflow is sized)
    entries[279] = (4, [len(s) for s in strips])
    body = b""
    placeholder = {}
    items = sorted(entries.items())
    rendered = []
    for tag, (typ, vals) in items:
        rendered.append((tag, typ, vals, render(typ, vals)))
    # now strip data goes after overflow; compute offsets
    data_off = overflow_off + len(overflow)
    offs = []
    for s in strips:
        offs.append(data_off)
        data_off += len(s) + (len(s) & 1)
    off_raw = struct.pack(eo + str(len(offs)) + "I", *offs)
    if len(off_raw) <= 4:
        off_field = off_raw.ljust(4, b"\x00")
    else:
        off_field = struct.pack(eo + "I", overflow_off + len(overflow))
        overflow += off_raw
        # strips shift by len(off_raw): recompute
        data_off = overflow_off + len(overflow)
        offs = []
        for s in strips:
            offs.append(data_off)
            data_off += len(s) + (len(s) & 1)
        overflow[-len(off_raw):] = struct.pack(
            eo + str(len(offs)) + "I", *offs)
    rendered.append((273, 4, offs, off_field))
    rendered.sort()
    out = bytearray()
    out += (b"II*\x00" if eo == "<" else b"MM\x00*")
    out += struct.pack(eo + "I", ifd_off)
    out += struct.pack(eo + "H", len(rendered))
    for tag, typ, vals, field in rendered:
        out += struct.pack(eo + "HHI", tag, typ, len(vals)) + field
    out += struct.pack(eo + "I", 0)  # no next IFD
    out += overflow
    for s in strips:
        out += s + (b"\x00" if len(s) & 1 else b"")
    return bytes(out)


def test_tiff_gray_both_endians_and_polarities():
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        _decode_tiff,
        decode_image,
    )

    rng = np.random.default_rng(8)
    g = rng.integers(0, 256, size=(7, 9), dtype=np.uint8)
    for eo in ("<", ">"):
        got = _decode_tiff(_tiff_encode(g, eo=eo))
        assert np.array_equal(got, g.astype(np.float32)), eo
    # WhiteIsZero inverts
    inv = _decode_tiff(_tiff_encode(g, photo=0))
    assert np.array_equal(inv, 255.0 - g.astype(np.float32))
    # magic dispatch
    assert np.array_equal(decode_image(_tiff_encode(g, eo=">")),
                          g.astype(np.float32))


def test_tiff_lzw_packbits_predictor_strips():
    """LZW (early change) and PackBits strips with multiple
    rows-per-strip decode exactly; the horizontal-differencing
    predictor round-trips under LZW."""
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        _decode_tiff,
    )

    rng = np.random.default_rng(9)
    g = rng.integers(0, 256, size=(20, 33), dtype=np.uint8)
    for comp in (5, 32773):
        got = _decode_tiff(_tiff_encode(g, comp=comp, rows_per_strip=6))
        assert np.array_equal(got, g.astype(np.float32)), comp
    rgb = rng.integers(0, 256, size=(11, 8, 3), dtype=np.uint8)
    want = (rgb[..., 0] * 0.299 + rgb[..., 1] * 0.587
            + rgb[..., 2] * 0.114).astype(np.float32)
    got = _decode_tiff(_tiff_encode(rgb, comp=5, predictor=2))
    assert np.allclose(got, want)


def test_tiff_palette_and_corrupt():
    import numpy as np
    import pytest

    from telescope_data_pipeline_spark.operators.multimodal import (
        CodecUnavailable,
        _decode_tiff,
    )

    rng = np.random.default_rng(10)
    pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, size=(6, 5), dtype=np.uint8)
    got = _decode_tiff(_tiff_encode(idx, photo=3, palette=pal))
    # ColorMap quantizes through 16-bit: allow 1-lsb wobble
    pal16 = (pal.astype(np.uint32) * 65535 // 255).astype(np.float32)
    rgbf = pal16[idx] / 65535.0 * 255.0
    want = rgbf[..., 0] * 0.299 + rgbf[..., 1] * 0.587 + rgbf[..., 2] * 0.114
    assert np.allclose(got, want, atol=0.51)

    good = _tiff_encode(idx, photo=3, palette=pal)
    with pytest.raises(CodecUnavailable):
        _decode_tiff(good[:60])
    g = rng.integers(0, 256, size=(4, 4), dtype=np.uint8)
    jpeg_in_tiff = _tiff_encode(g)  # then flip compression tag to 7
    import struct as _s

    ba = bytearray(jpeg_in_tiff)
    n = _s.unpack("<H", ba[8:10])[0]
    for i in range(n):
        off = 10 + 12 * i
        if _s.unpack("<H", ba[off:off + 2])[0] == 259:
            ba[off + 8:off + 10] = _s.pack("<H", 7)
    with pytest.raises(CodecUnavailable, match="compression"):
        _decode_tiff(bytes(ba))


# ---------------------------------------------------------------------------
# AIFF decoder (pure Python PCM — no soundfile in this environment)
# ---------------------------------------------------------------------------

def _f80(rate):
    """Encode an integer sample rate as 80-bit IEEE extended."""
    nbits = rate.bit_length()
    exp = 16383 + nbits - 1
    mant = rate << (64 - nbits)
    return exp.to_bytes(2, "big") + mant.to_bytes(8, "big")


def _aiff_encode(samples, sr, bits=16, n_ch=1, form=b"AIFF",
                 codec=b"NONE"):
    import numpy as np

    n_frames = len(samples) // n_ch
    if bits == 16:
        data = np.asarray(samples).astype(
            "<i2" if codec == b"sowt" else ">i2").tobytes()
    elif bits == 8:
        data = np.asarray(samples).astype(np.int8).tobytes()
    else:
        data = np.asarray(samples).astype(">i4").tobytes()
    comm = (n_ch.to_bytes(2, "big") + n_frames.to_bytes(4, "big")
            + bits.to_bytes(2, "big") + _f80(sr))
    if form == b"AIFC":
        comm += codec + b"\x04none" + b"\x00"  # pstring pad
    ssnd = (0).to_bytes(4, "big") + (0).to_bytes(4, "big") + data

    def chunk(cid, body):
        pad = b"\x00" if len(body) & 1 else b""
        return cid + len(body).to_bytes(4, "big") + body + pad

    inner = form + chunk(b"COMM", comm) + chunk(b"SSND", ssnd)
    return b"FORM" + len(inner).to_bytes(4, "big") + inner


def test_aiff_pcm_roundtrip_and_dispatch():
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        _decode_aiff_pcm,
        decode_audio,
    )

    rng = np.random.default_rng(12)
    pcm = rng.integers(-32768, 32768, size=400, dtype=np.int64)
    wave, sr = _decode_aiff_pcm(_aiff_encode(pcm, 44100))
    assert sr == 44100
    assert np.allclose(wave, pcm.astype(np.float32) / 32768.0)
    # stereo downmix
    wave2, _ = _decode_aiff_pcm(_aiff_encode(pcm, 22050, n_ch=2))
    pairs = pcm.reshape(-1, 2).astype(np.float32) / 32768.0
    assert np.allclose(wave2, pairs.mean(axis=1))
    # 8-bit signed
    pcm8 = rng.integers(-128, 128, size=64, dtype=np.int64)
    wave8, sr8 = _decode_aiff_pcm(_aiff_encode(pcm8, 8000, bits=8))
    assert sr8 == 8000
    assert np.allclose(wave8, pcm8.astype(np.float32) / 128.0)
    # dispatch routes FORM/AIFF to the built-in decoder (no soundfile)
    w, s = decode_audio(_aiff_encode(pcm, 16000), duration_s=1.0)
    assert s == 16000 and len(w) == 400


def test_aifc_sowt_and_unsupported_codec():
    import numpy as np
    import pytest

    from telescope_data_pipeline_spark.operators.multimodal import (
        CodecUnavailable,
        _decode_aiff_pcm,
    )

    rng = np.random.default_rng(13)
    pcm = rng.integers(-32768, 32768, size=100, dtype=np.int64)
    wave, sr = _decode_aiff_pcm(
        _aiff_encode(pcm, 48000, form=b"AIFC", codec=b"sowt"))
    assert sr == 48000
    assert np.allclose(wave, pcm.astype(np.float32) / 32768.0)
    with pytest.raises(CodecUnavailable, match="compression"):
        _decode_aiff_pcm(_aiff_encode(pcm, 48000, form=b"AIFC",
                                      codec=b"ima4"))
    with pytest.raises(CodecUnavailable, match="COMM"):
        _decode_aiff_pcm(b"FORM" + (4).to_bytes(4, "big") + b"AIFF")


# ---------------------------------------------------------------------------
# FLAC decoder (pure Python — no soundfile in this environment)
# ---------------------------------------------------------------------------

class _FlacWriter:
    """MSB-first bit writer for building test FLAC streams."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.bits = 0

    def w(self, v, n):
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.bits += n
        while self.bits >= 8:
            self.out.append((self.acc >> (self.bits - 8)) & 0xFF)
            self.bits -= 8
            self.acc &= (1 << self.bits) - 1

    def align(self):
        if self.bits:
            self.w(0, 8 - self.bits)


def _flac_streaminfo(sr, n_ch, bps, total):
    w = _FlacWriter()
    w.w(1, 1)  # last metadata block
    w.w(0, 7)  # STREAMINFO
    w.w(34, 24)
    w.w(16, 16)  # min blocksize
    w.w(65535, 16)  # max blocksize
    w.w(0, 24)
    w.w(0, 24)
    w.w(sr, 20)
    w.w(n_ch - 1, 3)
    w.w(bps - 1, 5)
    w.w(total, 36)
    for _ in range(16):
        w.w(0, 8)  # md5 unset
    return bytes(w.out)


def _flac_write_subframe(w, samples, bps, kind="verbatim", rice_k=4):
    w.w(0, 1)  # padding
    if kind == "constant":
        w.w(0, 6)
        w.w(0, 1)  # no wasted bits
        w.w(samples[0], bps)
        return
    if kind == "verbatim":
        w.w(1, 6)
        w.w(0, 1)
        for s in samples:
            w.w(s, bps)
        return
    order = int(kind[-1])  # fixed0 / fixed1 / fixed2
    w.w(8 + order, 6)
    w.w(0, 1)
    for s in samples[:order]:
        w.w(s, bps)
    coefs = {0: [], 1: [1], 2: [2, -1]}[order]
    w.w(0, 2)  # rice method 0 (4-bit params)
    w.w(0, 4)  # partition order 0
    w.w(rice_k, 4)
    for i in range(order, len(samples)):
        pred = sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
        r = samples[i] - pred
        u = (r << 1) ^ (r >> 63) if r >= 0 else ((-r) << 1) - 1
        q, rem = u >> rice_k, u & ((1 << rice_k) - 1)
        assert q < 2000, "pick a larger rice_k for this test signal"
        for _ in range(q):
            w.w(0, 1)
        w.w(1, 1)
        w.w(rem, rice_k)


def _flac_encode(channels, sr, bps, kinds=None, ch_code=None,
                 blocksize=None):
    """Build a FLAC stream: one or more frames of equal blocksize,
    independent channels by default, or a stereo-decorrelated frame
    when ch_code is 8/9/10 (channels then holds the two SUBFRAME
    signals, e.g. (mid, side))."""
    n_ch = len(channels)
    total = len(channels[0])
    bs = blocksize or total
    head = b"fLaC" + _flac_streaminfo(sr, 2 if ch_code else n_ch, bps,
                                      total)
    w = _FlacWriter()
    frame_no = 0
    for start in range(0, total, bs):
        n = min(bs, total - start)
        w.w(0x3FFE, 14)
        w.w(0, 1)
        w.w(0, 1)  # fixed blocksize strategy
        w.w(7, 4)  # 16-bit custom blocksize follows
        w.w(0, 4)  # sample rate from STREAMINFO
        w.w(ch_code if ch_code else n_ch - 1, 4)
        w.w(0, 3)  # sample size from STREAMINFO
        w.w(0, 1)
        w.w(frame_no, 8)  # UTF-8 single byte (frame_no < 128)
        frame_no += 1
        w.w(n - 1, 16)
        w.w(0, 8)  # crc8 (decoder parses past)
        for ci, ch in enumerate(channels):
            sub_bps = bps
            if ch_code == 8 and ci == 1:
                sub_bps = bps + 1  # side
            elif ch_code == 9 and ci == 0:
                sub_bps = bps + 1
            elif ch_code == 10 and ci == 1:
                sub_bps = bps + 1
            kind = (kinds or ["verbatim"] * n_ch)[ci]
            _flac_write_subframe(w, ch[start:start + n], sub_bps, kind)
        w.align()
        w.w(0, 16)  # crc16
    return head + bytes(w.out)


def test_flac_fixed_rice_and_verbatim_mono():
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        _decode_flac,
    )

    rng = np.random.default_rng(14)
    # smooth signal so FIXED-order-2 residuals stay small
    t = np.arange(600)
    sig = (1200 * np.sin(t / 25.0)).astype(np.int64).tolist()
    for kind in ("verbatim", "fixed0", "fixed1", "fixed2"):
        flac = _flac_encode([sig], sr=8000, bps=16, kinds=[kind],
                            blocksize=200)  # 3 frames
        wave, sr = _decode_flac(flac)
        assert sr == 8000
        assert np.allclose(wave, np.array(sig) / 32768.0, atol=1e-7), kind


def test_flac_stereo_independent_and_constant():
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        _decode_flac,
        decode_audio,
    )

    rng = np.random.default_rng(15)
    left = rng.integers(-2000, 2000, size=300, dtype=np.int64).tolist()
    right = [7] * 300  # constant subframe
    flac = _flac_encode([left, right], sr=16000, bps=16,
                        kinds=["verbatim", "constant"])
    wave, sr = _decode_flac(flac)
    want = (np.array(left) + 7) / 2.0 / 32768.0
    assert sr == 16000
    assert np.allclose(wave, want, atol=1e-7)
    # magic dispatch, no soundfile
    w2, s2 = decode_audio(flac, duration_s=1.0)
    assert s2 == 16000 and np.allclose(w2, wave)


def test_flac_mid_side_reconstruction():
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        _decode_flac,
    )

    rng = np.random.default_rng(16)
    left = rng.integers(-3000, 3000, size=256, dtype=np.int64)
    right = rng.integers(-3000, 3000, size=256, dtype=np.int64)
    mid = ((left + right) >> 1).tolist()
    side = (left - right).tolist()
    flac = _flac_encode([mid, side], sr=22050, bps=16, ch_code=10)
    wave, sr = _decode_flac(flac)
    want = (left + right) / 2.0 / 32768.0
    assert sr == 22050
    assert np.allclose(wave, want, atol=1e-7)
    # left/side and right/side too
    flac_ls = _flac_encode([left.tolist(), side], sr=22050, bps=16,
                           ch_code=8)
    w_ls, _ = _decode_flac(flac_ls)
    assert np.allclose(w_ls, want, atol=1e-7)
    flac_rs = _flac_encode([side, right.tolist()], sr=22050, bps=16,
                           ch_code=9)
    w_rs, _ = _decode_flac(flac_rs)
    assert np.allclose(w_rs, want, atol=1e-7)


def test_flac_corrupt_raises_typed_codec_error():
    import numpy as np
    import pytest

    from telescope_data_pipeline_spark.operators.multimodal import (
        CodecUnavailable,
        _decode_flac,
    )

    sig = list(range(-50, 50))
    good = _flac_encode([sig], sr=8000, bps=16)
    with pytest.raises(CodecUnavailable):
        _decode_flac(good[:50])  # truncated mid-frame
    with pytest.raises(CodecUnavailable, match="STREAMINFO"):
        _decode_flac(b"fLaC" + b"\x81\x00\x00\x02\x00\x00")
    broken = bytearray(good)
    broken[4 + 4 + 34] ^= 0xFF  # first frame sync byte
    with pytest.raises(CodecUnavailable, match="sync"):
        _decode_flac(bytes(broken))


# ---------------------------------------------------------------------------
# Container prober (MP4 boxes / Matroska EBML — structure, no decode)
# ---------------------------------------------------------------------------

def _box(typ, payload):
    return (8 + len(payload)).to_bytes(4, "big") + typ + payload


def _tiny_mp4(dur_ticks=90000, timescale=30000, w=640, h=360):
    """Minimal ISO BMFF: ftyp + moov(mvhd + video trak + audio trak)."""
    mvhd = (b"\x00" + b"\x00" * 3 + b"\x00" * 8
            + timescale.to_bytes(4, "big") + dur_ticks.to_bytes(4, "big")
            + b"\x00" * 80)
    tkhd_v = (b"\x00" + b"\x00" * 3 + b"\x00" * 72
              + (w << 16).to_bytes(4, "big") + (h << 16).to_bytes(4, "big"))
    stsd_v = (b"\x00" * 4 + (1).to_bytes(4, "big")
              + _box(b"avc1", b"\x00" * 8))
    hdlr_v = b"\x00" * 8 + b"vide" + b"\x00" * 12
    trak_v = _box(b"trak", _box(b"tkhd", tkhd_v) + _box(b"mdia",
                  _box(b"hdlr", hdlr_v) + _box(b"minf", _box(b"stbl",
                       _box(b"stsd", stsd_v)))))
    hdlr_a = b"\x00" * 8 + b"soun" + b"\x00" * 12
    stsd_a = (b"\x00" * 4 + (1).to_bytes(4, "big")
              + _box(b"mp4a", b"\x00" * 8))
    trak_a = _box(b"trak", _box(b"tkhd", b"\x00" * 84) + _box(b"mdia",
                  _box(b"hdlr", hdlr_a) + _box(b"minf", _box(b"stbl",
                       _box(b"stsd", stsd_a)))))
    moov = _box(b"moov", _box(b"mvhd", mvhd) + trak_v + trak_a)
    return _box(b"ftyp", b"isom" + b"\x00" * 8) + moov


def _ebml(eid_bytes, payload):
    n = len(payload)
    assert n < 0x7F
    return eid_bytes + bytes([0x80 | n]) + payload


def _tiny_mkv(dur_ticks=2500.0, w=1280, h=720):
    import struct as _s

    header = _ebml(b"\x1a\x45\xdf\xa3",
                   _ebml(b"\x42\x82", b"matroska"))
    info = _ebml(b"\x15\x49\xa9\x66",
                 _ebml(b"\x2a\xd7\xb1", (1000000).to_bytes(3, "big"))
                 + _ebml(b"\x44\x89", _s.pack(">d", dur_ticks)))
    video = _ebml(b"\xe0", _ebml(b"\xb0", w.to_bytes(2, "big"))
                  + _ebml(b"\xba", h.to_bytes(2, "big")))
    tr_v = _ebml(b"\xae", _ebml(b"\x83", b"\x01")
                 + _ebml(b"\x86", b"V_VP9") + video)
    tr_a = _ebml(b"\xae", _ebml(b"\x83", b"\x02")
                 + _ebml(b"\x86", b"A_OPUS"))
    tracks = _ebml(b"\x16\x54\xae\x6b", tr_v + tr_a)
    segment = _ebml(b"\x18\x53\x80\x67", info + tracks)
    return header + segment


def test_probe_media_mp4_and_matroska(spark):
    from telescope_data_pipeline_spark.operators.multimodal import (
        probe_media,
    )
    from telescope_data_pipeline_spark.schemas import MEDIA

    rows = [
        (1, "video", bytearray(_tiny_mp4()), "video/mp4", None, None,
         None, None),
        (2, "video", bytearray(_tiny_mkv()), "video/webm", None, None,
         None, None),
        (3, "video", bytearray(b"\x00" * 64), None, None, None, 7.5,
         None),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA)
    got = {r["media_id"]: r for r in probe_media(media).collect()}
    mp4 = got[1]
    assert mp4["container"] == "mp4" and mp4["brand"] == "isom"
    assert mp4["duration_s"] == 3.0         # 90000 / 30000
    assert mp4["n_tracks"] == 2
    assert mp4["video_codec"] == "avc1" and mp4["audio_codec"] == "mp4a"
    assert (mp4["width"], mp4["height"]) == (640, 360)
    mkv = got[2]
    assert mkv["container"] == "matroska" and mkv["brand"] == "matroska"
    assert mkv["duration_s"] == 2.5         # 2500 ticks * 1ms
    assert mkv["n_tracks"] == 2
    assert mkv["video_codec"] == "V_VP9" and mkv["audio_codec"] == "A_OPUS"
    assert (mkv["width"], mkv["height"]) == (1280, 720)
    unk = got[3]
    assert unk["container"] == "unknown" and unk["duration_s"] == 7.5


def test_probe_media_truncated_containers_never_crash(spark):
    """A RECOGNIZED container cut mid-box/mid-element probes to NULL
    fields — triage never crashes on damage."""
    from telescope_data_pipeline_spark.operators.multimodal import (
        probe_media,
    )
    from telescope_data_pipeline_spark.schemas import MEDIA

    rows = [
        (1, "video", bytearray(_tiny_mp4()[:40]), None, None, None,
         None, None),
        (2, "video", bytearray(_tiny_mkv()[:10]), None, None, None,
         None, None),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA)
    got = {r["media_id"]: r for r in probe_media(media).collect()}
    assert got[1]["container"] == "mp4"       # ftyp parsed, moov gone
    assert got[1]["duration_s"] is None
    assert got[2]["container"] == "matroska"
    assert got[2]["n_tracks"] == 0


# ---------------------------------------------------------------------------
# WebP / VP8L goldens (round-10 VERDICT item 4): a reference VP8L
# encoder lives here in the tests (the GIF/TIFF/FLAC pattern) and
# round-trips through the pure-Python decoder — literals, all four
# transforms, LZ77 (1-D and 2-D distances), color cache, meta prefix
# groups, and the container walks (plain, VP8X, ANMF).
# ---------------------------------------------------------------------------


class _Vp8lW:
    """LSB-first bit writer (the VP8L packing order)."""

    def __init__(self):
        self.bits: list[int] = []

    def w(self, val: int, n: int) -> None:
        for i in range(n):
            self.bits.append((val >> i) & 1)

    def code(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):  # prefix codes walk MSB-first
            self.bits.append((code >> i) & 1)

    def tobytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


def _canon_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, len), canonical DEFLATE numbering."""
    out, code, prev = {}, 0, 0
    for ln, sym in sorted((ln, sym) for sym, ln in lengths.items() if ln):
        code <<= (ln - prev)
        out[sym] = (code, ln)
        code += 1
        prev = ln
    return out


def _complete_lengths(symbols: list[int]) -> dict[int, int]:
    """Complete prefix-code lengths for n equally-weighted symbols:
    (2^k - n) symbols at k-1 bits, the rest at k (Kraft sum exactly 1)."""
    n = len(symbols)
    if n == 1:
        return {symbols[0]: 0}  # 0-bit single-symbol code
    k = (n - 1).bit_length()
    short = (1 << k) - n
    return {s: (k - 1 if i < short else k)
            for i, s in enumerate(sorted(symbols))}


_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12,
             13, 14, 15)


def _w_prefix_code(bw: _Vp8lW, lengths: list[int]) -> None:
    """Write a 'normal' (code-length-coded) prefix code for the given
    per-symbol lengths (zeros allowed anywhere)."""
    # CL symbol stream: literals for nonzero lengths, 17/18 for runs
    stream: list[tuple[int, int, int]] = []  # (cl_sym, extra_val, extra_bits)
    i = 0
    while i < len(lengths):
        if lengths[i] == 0:
            run = 0
            while i < len(lengths) and lengths[i] == 0:
                run += 1
                i += 1
            while run:
                if run >= 11:
                    chunk = min(run, 138)
                    stream.append((18, chunk - 11, 7))
                elif run >= 3:
                    chunk = run
                    stream.append((17, chunk - 3, 3))
                else:
                    chunk = 1
                    stream.append((0, 0, 0))
                run -= chunk
        else:
            stream.append((lengths[i], 0, 0))
            i += 1
    used = sorted({s for s, _, _ in stream})
    cl_lens = _complete_lengths(used)
    if len(used) == 1:  # a 0-bit CL code would be degenerate; pad
        cl_lens = {used[0]: 1, (18 if used[0] != 18 else 17): 1}
    cl_codes = _canon_codes(cl_lens)
    num_cl = max(_CL_ORDER.index(s) for s in cl_lens) + 1
    num_cl = max(num_cl, 4)
    bw.w(0, 1)  # not simple
    bw.w(num_cl - 4, 4)
    for i in range(num_cl):
        bw.w(cl_lens.get(_CL_ORDER[i], 0), 3)
    bw.w(0, 1)  # no explicit max_symbol
    for sym, extra_val, extra_bits in stream:
        c, ln = cl_codes[sym]
        bw.code(c, ln)
        if extra_bits:
            bw.w(extra_val, extra_bits)


def _w_simple(bw: _Vp8lW, symbols: list[int]) -> None:
    bw.w(1, 1)
    bw.w(len(symbols) - 1, 1)
    if symbols[0] > 1:
        bw.w(1, 1)
        bw.w(symbols[0], 8)
    else:
        bw.w(0, 1)
        bw.w(symbols[0], 1)
    if len(symbols) == 2:
        bw.w(symbols[1], 8)


def _w_tree(bw: _Vp8lW, lengths: dict[int, int], alphabet: int):
    """Write whichever header form fits; return symbol->(code,len)."""
    nz = sorted(s for s, ln in lengths.items() if ln or len(lengths) == 1)
    if len(nz) <= 2 and all(s <= 255 for s in nz):
        _w_simple(bw, nz)
        if len(nz) == 1:
            return {nz[0]: (0, 0)}
        return {nz[0]: (0, 1), nz[1]: (1, 1)}
    arr = [0] * alphabet
    for s, ln in lengths.items():
        arr[s] = ln
    _w_prefix_code(bw, arr)
    return _canon_codes(lengths)


def _vp8l_wrap(data: bytes, vp8x: bool = False, anmf: bool = False) -> bytes:
    chunk = b"VP8L" + len(data).to_bytes(4, "little") + data
    if len(data) & 1:
        chunk += b"\x00"
    if anmf:
        chunk = (b"ANMF" + (16 + len(chunk)).to_bytes(4, "little")
                 + bytes(16) + chunk)
    if vp8x or anmf:
        chunk = b"VP8X" + (10).to_bytes(4, "little") + bytes(10) + chunk
    body = b"WEBP" + chunk
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _vp8l_header(bw: _Vp8lW, w: int, h: int) -> None:
    bw.w(0x2F, 8)
    bw.w(w - 1, 14)
    bw.w(h - 1, 14)
    bw.w(0, 1)  # alpha hint
    bw.w(0, 3)  # version


def _w_literal_image(bw: _Vp8lW, argb_rows, cache_bits: int = 0,
                     level0: bool = False) -> None:
    """Entropy-coded image body (no transforms bit — caller handles):
    cache info + (level 0 only) meta-prefix bit + one prefix group +
    all pixels as literals."""
    px = [tuple(int(v) for v in p) for row in argb_rows for p in row]
    if cache_bits:
        bw.w(1, 1)
        bw.w(cache_bits, 4)
    else:
        bw.w(0, 1)
    if level0:
        bw.w(0, 1)  # no meta prefix image
    greens = sorted({p[2] for p in px})
    reds = sorted({p[1] for p in px})
    blues = sorted({p[3] for p in px})
    alphas = sorted({p[0] for p in px})
    galpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    gc = _w_tree(bw, _complete_lengths(greens), galpha)
    rc = _w_tree(bw, _complete_lengths(reds), 256)
    bc = _w_tree(bw, _complete_lengths(blues), 256)
    ac = _w_tree(bw, _complete_lengths(alphas), 256)
    _w_tree(bw, {0: 0}, 40)  # distance: unused single
    for a, r, g, b in px:
        bw.code(*gc[g])
        bw.code(*rc[r])
        bw.code(*bc[b])
        bw.code(*ac[a])


def _encode_vp8l_literal(rgb, cache_bits: int = 0) -> bytes:
    """Reference encoder: plain literals, no transforms."""
    h, w = rgb.shape[:2]
    bw = _Vp8lW()
    _vp8l_header(bw, w, h)
    bw.w(0, 1)  # no transforms
    rows = [[(255, int(p[0]), int(p[1]), int(p[2])) for p in row]
            for row in rgb]
    _w_literal_image(bw, rows, cache_bits, level0=True)
    return _vp8l_wrap(bw.tobytes())


def _webp_luma(rgb):
    import numpy as np

    f = rgb.astype(np.float32)
    return f[..., 0] * 0.299 + f[..., 1] * 0.587 + f[..., 2] * 0.114


def test_vp8l_literal_roundtrip():
    """Random RGB through the literal reference encoder: exact luma."""
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        decode_image,
    )

    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, size=(13, 17, 3), dtype=np.uint8)
    got = decode_image(_encode_vp8l_literal(rgb))
    assert got.shape == (13, 17)
    assert np.allclose(got, _webp_luma(rgb))


def test_vp8l_subtract_green_transform():
    """SUBTRACT_GREEN: residuals store r-g / b-g; inverse adds green
    back. Gray pixels (r=g=b) make the residual channels single-symbol."""
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        decode_image,
    )

    rng = np.random.default_rng(7)
    v = rng.integers(0, 256, size=(9, 11), dtype=np.uint8)
    h, w = v.shape
    bw = _Vp8lW()
    _vp8l_header(bw, w, h)
    bw.w(1, 1)
    bw.w(2, 2)  # transform: subtract green
    bw.w(0, 1)  # no more transforms
    rows = [[(255, 0, int(g), 0) for g in row] for row in v]
    _w_literal_image(bw, rows, level0=True)
    got = decode_image(_vp8l_wrap(bw.tobytes()))
    rgb = np.stack([v, v, v], axis=-1)
    assert np.allclose(got, _webp_luma(rgb))


def test_vp8l_palette_with_pixel_bundling():
    """COLOR_INDEXING with n<=4 colors: 2-bit packed indices (4 per
    byte), delta-coded palette, odd width tail."""
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        decode_image,
    )

    rng = np.random.default_rng(3)
    pal = np.array([[250, 10, 30], [0, 200, 90], [17, 18, 19]], np.uint8)
    idx = rng.integers(0, 3, size=(6, 10), dtype=np.uint8)
    h, w = idx.shape
    width_bits = 2  # n=3 <= 4
    packed_w = (w + 3) // 4
    bw = _Vp8lW()
    _vp8l_header(bw, w, h)
    bw.w(1, 1)
    bw.w(3, 2)  # color indexing (its data follows immediately)
    bw.w(len(pal) - 1, 8)
    # palette as a 1 x n entropy image, DELTA coded componentwise
    deltas = []
    prev = (0, 0, 0, 0)
    for r, g, b in pal:
        cur = (255, int(r), int(g), int(b))
        deltas.append(tuple((cur[c] - prev[c]) & 255 for c in range(4)))
        prev = cur
    _w_literal_image(bw, [deltas])
    bw.w(0, 1)  # no more transforms
    # main image at packed width: greens hold 4 2-bit indices, LSB first
    packed = []
    for y in range(h):
        prow = []
        for xp in range(packed_w):
            byte = 0
            for k in range(4):
                x = xp * 4 + k
                if x < w:
                    byte |= int(idx[y, x]) << (2 * k)
            prow.append((255, 0, byte, 0))
        packed.append(prow)
    _w_literal_image(bw, packed, level0=True)
    got = decode_image(_vp8l_wrap(bw.tobytes()))
    assert got.shape == (h, w)
    assert np.allclose(got, _webp_luma(pal[idx]))


def test_vp8l_lz77_row_copy_2d_distance():
    """LZ77 with the 2-D distance map: dist_code 1 = (0,1) = one row
    up. First row literal, the rest one long copy."""
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        decode_image,
    )

    rng = np.random.default_rng(23)
    row = rng.integers(0, 256, size=16, dtype=np.uint8)
    h, w = 7, 16
    length = (h - 1) * w  # 96 pixels: prefix code 12, 5 extra bits
    # length prefix: val 96 -> code 12 covers 65..96 (offset 64,
    # extra 5): 96 = 64 + 31 + 1
    bw = _Vp8lW()
    _vp8l_header(bw, w, h)
    bw.w(0, 1)  # no transforms
    bw.w(0, 1)  # no cache
    bw.w(0, 1)  # no meta prefix image
    greens = sorted({int(g) for g in row})
    glens = _complete_lengths(greens + [256 + 12])
    gc = _w_tree(bw, glens, 280)
    rc = _w_tree(bw, _complete_lengths(sorted({int(g) for g in row})), 256)
    bc = _w_tree(bw, _complete_lengths(sorted({int(g) for g in row})), 256)
    ac = _w_tree(bw, {255: 0}, 256)
    dc = _w_tree(bw, {0: 0}, 40)  # dist prefix code 0 -> dist_code 1
    for g in row:  # first row: gray literals
        bw.code(*gc[int(g)])
        bw.code(*rc[int(g)])
        bw.code(*bc[int(g)])
        bw.code(*ac[255])
    bw.code(*gc[256 + 12])
    bw.w(31, 5)  # length extra bits
    bw.code(*dc[0])  # dist prefix code 0 -> plane code 1 -> (0,1)
    got = decode_image(_vp8l_wrap(bw.tobytes()))
    want = np.tile(row.astype(np.float32), (h, 1))
    assert np.allclose(got, want)


def test_vp8l_color_cache_reference():
    """Color cache: second pixel comes from the cache slot the first
    literal populated (the 0x1e35a7bd multiplicative hash)."""
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        decode_image,
    )

    a, r, g, b = 255, 77, 150, 9
    cache_bits = 5
    argb = (a << 24) | (r << 16) | (g << 8) | b
    idx = (0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - cache_bits)
    bw = _Vp8lW()
    _vp8l_header(bw, 2, 1)
    bw.w(0, 1)  # no transforms
    bw.w(1, 1)
    bw.w(cache_bits, 4)
    bw.w(0, 1)  # no meta prefix image
    galpha = 280 + (1 << cache_bits)
    gc = _w_tree(bw, _complete_lengths([g, 280 + idx]), galpha)
    rc = _w_tree(bw, {r: 0}, 256)
    bc = _w_tree(bw, {b: 0}, 256)
    ac = _w_tree(bw, {a: 0}, 256)
    _w_tree(bw, {0: 0}, 40)
    bw.code(*gc[g])
    bw.code(*rc[r])
    bw.code(*bc[b])
    bw.code(*ac[a])
    bw.code(*gc[280 + idx])  # cache hit for the same pixel
    got = decode_image(_vp8l_wrap(bw.tobytes()))
    want = np.full((1, 2), r * 0.299 + g * 0.587 + b * 0.114, np.float32)
    assert np.allclose(got, want)


import pytest


@pytest.mark.parametrize("mode", list(range(14)))
def test_vp8l_predictor_modes_uniform(mode):
    """PREDICTOR transform, every mode, over a uniform image: one tile
    covers the image (bits=4), the 1x1 mode sub-image selects the
    predictor, residuals are zero except where the edge rules (black /
    L / T) and mode 0 bite."""
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        decode_image,
    )

    v, h, w = 77, 12, 14
    bw = _Vp8lW()
    _vp8l_header(bw, w, h)
    bw.w(1, 1)
    bw.w(0, 2)  # predictor transform
    bw.w(4 - 2, 3)  # tile bits 4: 16x16 tile covers 14x12
    # 1x1 mode sub-image: green = mode, everything else single-symbol
    _w_literal_image(bw, [[(0, 0, mode, 0)]])
    bw.w(0, 1)  # no more transforms
    # residuals: (0,0) predicts black -> (0, v, v, v); row 0 uses L,
    # col 0 uses T -> 0; interior uses the tile mode: 0 for all modes
    # except mode 0 (black) where it is (0, v, v, v)
    res = [[(0, 0, 0, 0)] * w for _ in range(h)]
    res[0][0] = (0, v, v, v)
    if mode == 0:
        for y in range(1, h):
            for x in range(1, w):
                res[y][x] = (0, v, v, v)
    _w_literal_image(bw, res, level0=True)
    got = decode_image(_vp8l_wrap(bw.tobytes()))
    assert got.shape == (h, w)
    assert np.allclose(got, np.full((h, w), float(v), np.float32))


def test_vp8l_predictor_clamp_add_subtract_nonuniform():
    """Mode 12 (ClampAddSubtractFull) with a non-trivial 2x2: the
    bottom-right pixel's prediction is clamp(L + T - TL) per channel."""
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        decode_image,
    )

    img = np.array([[[10, 20, 30], [40, 60, 80]],
                    [[5, 15, 25], [36, 56, 76]]], np.uint8)
    # residuals per the decoder's own edge rules + mode 12 interior
    r00 = (0, 10, 20, 30)                      # pred black
    r01 = (0, 30, 40, 50)                      # L
    r10 = (0, (5 - 10) & 255, (15 - 20) & 255, (25 - 30) & 255)  # T
    # interior pred: clamp(L+T-TL) = (35, 55, 75); pixel (36,56,76)
    r11 = (0, 1, 1, 1)
    bw = _Vp8lW()
    _vp8l_header(bw, 2, 2)
    bw.w(1, 1)
    bw.w(0, 2)
    bw.w(0, 3)  # tile bits 2
    _w_literal_image(bw, [[(0, 0, 12, 0)]])
    bw.w(0, 1)
    _w_literal_image(bw, [[r00, r01], [r10, r11]], level0=True)
    got = decode_image(_vp8l_wrap(bw.tobytes()))
    assert np.allclose(got, _webp_luma(img))


def test_vp8l_color_transform():
    """COLOR transform: one tile, fixed-point cross-channel deltas
    ((int8 t * int8 c) >> 5) re-added by the inverse."""
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        decode_image,
    )

    g2r, g2b, r2b = 40, 250, 17  # transform element bytes
    def s8(x):
        return x - 256 if x >= 128 else x
    def delta(t, c):
        return (s8(t) * s8(c)) >> 5
    # stored residual pixel; expected after inverse
    a, rs, g, bs = 255, 100, 200, 50
    red = (rs + delta(g2r, g)) & 255
    blue = (bs + delta(g2b, g) + delta(r2b, red)) & 255
    bw = _Vp8lW()
    _vp8l_header(bw, 1, 1)
    bw.w(1, 1)
    bw.w(1, 2)  # color transform
    bw.w(0, 3)  # tile bits 2
    # transform pixel channels: (a, red=r2b, green=g2b, blue=g2r)
    _w_literal_image(bw, [[(0, r2b, g2b, g2r)]])
    bw.w(0, 1)
    _w_literal_image(bw, [[(a, rs, g, bs)]], level0=True)
    got = decode_image(_vp8l_wrap(bw.tobytes()))
    want = red * 0.299 + g * 0.587 + blue * 0.114
    assert np.allclose(got, np.array([[want]], np.float32))


def test_vp8l_meta_prefix_groups():
    """Meta prefix image: two 16px-wide tiles select two different
    prefix-code groups (single-symbol trees with different greens)."""
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        decode_image,
    )

    w, h, va, vb = 20, 3, 50, 220
    bw = _Vp8lW()
    _vp8l_header(bw, w, h)
    bw.w(0, 1)  # no transforms
    bw.w(0, 1)  # no cache
    bw.w(1, 1)  # meta prefix image present
    bw.w(4 - 2, 3)  # meta tile bits 4 -> tiles of 16: meta image 2x1
    # meta sub-image: group index lives in (red << 8) | green
    _w_literal_image(bw, [[(0, 0, 0, 0), (0, 0, 1, 0)]])
    for v in (va, vb):  # group 0 (left tile), group 1 (right tile)
        _w_tree(bw, {v: 0}, 280)
        _w_tree(bw, {v: 0}, 256)
        _w_tree(bw, {v: 0}, 256)
        _w_tree(bw, {255: 0}, 256)
        _w_tree(bw, {0: 0}, 40)
    # all trees are 0-bit: the pixel stream itself is empty
    got = decode_image(_vp8l_wrap(bw.tobytes()))
    want = np.full((h, w), float(va), np.float32)
    want[:, 16:] = float(vb)
    assert np.allclose(got, want)


def test_vp8l_vp8x_and_anmf_containers():
    """The RIFF walk finds the VP8L bitstream behind a VP8X header and
    inside the first ANMF animation frame."""
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        decode_image,
    )

    rng = np.random.default_rng(4)
    rgb = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    plain = _encode_vp8l_literal(rgb)
    vp8l_data = plain[20:]  # strip RIFF+WEBP+chunk header: re-wrap
    # recover the raw VP8L payload via the repo's own walker
    from telescope_data_pipeline_spark.operators.multimodal import (
        _webp_find_vp8l,
    )

    raw = _webp_find_vp8l(plain)
    for kw in ({"vp8x": True}, {"anmf": True}):
        wrapped = _vp8l_wrap(raw, **kw)
        assert np.allclose(decode_image(wrapped), _webp_luma(rgb))


def test_vp8l_corrupt_and_lossy_raise_typed():
    """Truncated VP8L and lossy VP8 payloads raise CodecUnavailable
    (typed, loud), never fall through to the stub."""
    import numpy as np
    import pytest as _pytest

    from telescope_data_pipeline_spark.operators.multimodal import (
        CodecUnavailable,
        _pil_image,
        decode_image,
    )

    rng = np.random.default_rng(2)
    rgb = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    good = _encode_vp8l_literal(rgb)
    with _pytest.raises(CodecUnavailable):
        decode_image(good[:40])  # truncated mid-bitstream
    if _pil_image is None:  # lossy VP8: no pure-Python path
        body = b"WEBP" + b"VP8 " + (4).to_bytes(4, "little") + b"\x00" * 4
        lossy = b"RIFF" + len(body).to_bytes(4, "little") + body
        with _pytest.raises(CodecUnavailable):
            decode_image(lossy)


def test_vp8l_distance_map_golden_120_entries():
    """Pin the full 120-entry LZ77 2-D distance map (round-11 ADVICE
    item 4: only dist_code 1 was exercised by the LZ77 round-trip).

    Two independent anchors, neither derived from the closed form under
    test:

    1. The first 100 entries of libwebp's ``kCodeToPlane`` LUT
       (dec/vp8l_dec.c, mirrored verbatim in RFC 9649) — pinned as
       literal bytes and decoded with the spec rule
       ``(x, y) = (8 - (code & 0xF), code >> 4)``.
    2. The spec's defining structural properties, asserted over ALL
       120 entries: the map is exactly a permutation of the 120
       scan-order-preceding neighbors (dy 0: dx 1..8; dy 1..7:
       dx -7..8), ordered by non-decreasing Euclidean distance.

    Together with anchor 1 — whose 100 entries exercise 34 equal-
    distance tie groups and fix the tie order (|dx| ascending,
    positive dx before negative) — the tail's only remaining freedom
    is tie order inside its last few distance groups, which the same
    pinned rule determines.
    """
    from telescope_data_pipeline_spark.operators.multimodal import (
        _VP8L_DIST_MAP,
    )

    k_code_to_plane_head = bytes([
        0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29, 0x16, 0x1a,
        0x26, 0x2a, 0x38, 0x05, 0x37, 0x39, 0x15, 0x1b, 0x36, 0x3a,
        0x25, 0x2b, 0x48, 0x04, 0x47, 0x49, 0x14, 0x1c, 0x35, 0x3b,
        0x46, 0x4a, 0x24, 0x2c, 0x58, 0x45, 0x4b, 0x34, 0x3c, 0x03,
        0x57, 0x59, 0x13, 0x1d, 0x56, 0x5a, 0x23, 0x2d, 0x44, 0x4c,
        0x55, 0x5b, 0x33, 0x3d, 0x68, 0x02, 0x67, 0x69, 0x12, 0x1e,
        0x66, 0x6a, 0x22, 0x2e, 0x54, 0x5c, 0x43, 0x4d, 0x65, 0x6b,
        0x32, 0x3e, 0x78, 0x01, 0x77, 0x79, 0x53, 0x5d, 0x11, 0x1f,
        0x64, 0x6c, 0x42, 0x4e, 0x76, 0x7a, 0x21, 0x2f, 0x75, 0x7b,
        0x31, 0x3f, 0x63, 0x6d, 0x52, 0x5e, 0x00, 0x74, 0x7c, 0x41,
    ])
    decoded_head = [(8 - (c & 0xF), c >> 4) for c in k_code_to_plane_head]
    assert list(_VP8L_DIST_MAP[:100]) == decoded_head

    # structural spec properties over the full table
    assert len(_VP8L_DIST_MAP) == 120
    neighbors = {(dx, 0) for dx in range(1, 9)} | {
        (dx, dy) for dy in range(1, 8) for dx in range(-7, 9)}
    assert set(_VP8L_DIST_MAP) == neighbors  # permutation, no dup/miss
    d2 = [dx * dx + dy * dy for dx, dy in _VP8L_DIST_MAP]
    assert all(a <= b for a, b in zip(d2, d2[1:]))  # distance-ordered
    # tie order inside every equal-distance group follows the rule the
    # 100 pinned entries fix: |dx| ascending, then positive dx first
    for (adx, ady), (bdx, bdy) in zip(_VP8L_DIST_MAP, _VP8L_DIST_MAP[1:]):
        if adx * adx + ady * ady == bdx * bdx + bdy * bdy:
            assert (abs(adx), adx < 0) < (abs(bdx), bdx < 0)


def _vp8l_chunk_raw(rgb) -> bytes:
    """Raw VP8L chunk (fourcc + size + data, padded) for one frame,
    via the literal reference encoder pieces."""
    h, w = rgb.shape[:2]
    bw = _Vp8lW()
    _vp8l_header(bw, w, h)
    bw.w(0, 1)  # no transforms
    rows = [[(255, int(p[0]), int(p[1]), int(p[2])) for p in row]
            for row in rgb]
    _w_literal_image(bw, rows, 0, level0=True)
    data = bw.tobytes()
    chunk = b"VP8L" + len(data).to_bytes(4, "little") + data
    if len(data) & 1:
        chunk += b"\x00"
    return chunk


def _animated_webp(frames, loop_count=3, background=0xFF112233) -> bytes:
    """Compose a spec-shaped animated WebP: VP8X (animation flag) +
    ANIM + one ANMF per (rgb, x, y, duration_ms, flags) frame."""
    body = b""
    vp8x = bytearray(10)
    vp8x[0] = 0x02  # animation flag
    body += b"VP8X" + (10).to_bytes(4, "little") + bytes(vp8x)
    body += (b"ANIM" + (6).to_bytes(4, "little")
             + background.to_bytes(4, "little")
             + loop_count.to_bytes(2, "little"))
    for rgb, x, y, dur, flags in frames:
        h, w = rgb.shape[:2]
        sub = _vp8l_chunk_raw(rgb)
        params = ((x // 2).to_bytes(3, "little")
                  + (y // 2).to_bytes(3, "little")
                  + (w - 1).to_bytes(3, "little")
                  + (h - 1).to_bytes(3, "little")
                  + dur.to_bytes(3, "little") + bytes([flags]))
        body += b"ANMF" + (16 + len(sub)).to_bytes(4, "little") + params + sub
    payload = b"WEBP" + body
    return b"RIFF" + len(payload).to_bytes(4, "little") + payload


def test_webp_animation_frame_extraction():
    """Animated WebP: every ANMF frame decodes through the existing
    VP8L path with exact pixel recovery, and the frame geometry,
    duration, dispose/blend flags, loop count, and background color
    all come back from the container fields."""
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        decode_webp_frames,
    )

    rng = np.random.default_rng(21)
    rgb0 = rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
    rgb1 = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    blob = _animated_webp([(rgb0, 0, 0, 40, 0x00),
                           (rgb1, 2, 4, 120, 0x03)],
                          loop_count=7, background=0xAABBCCDD)
    out = decode_webp_frames(blob)
    assert out["loop_count"] == 7
    assert out["background_argb"] == 0xAABBCCDD
    f0, f1 = out["frames"]
    assert (f0["width"], f0["height"], f0["x"], f0["y"]) == (8, 6, 0, 0)
    assert f0["duration_ms"] == 40
    assert not f0["dispose_to_background"] and not f0["no_blend"]
    assert np.allclose(f0["pixels"], _webp_luma(rgb0))
    assert (f1["width"], f1["height"], f1["x"], f1["y"]) == (4, 4, 2, 4)
    assert f1["duration_ms"] == 120
    assert f1["dispose_to_background"] and f1["no_blend"]
    assert np.allclose(f1["pixels"], _webp_luma(rgb1))


def test_webp_animation_rejects_still_and_corrupt():
    """A still WebP (no ANMF) and a frame with a truncated bitstream
    both raise typed CodecUnavailable — the whole-payload drop rule."""
    import numpy as np
    import pytest

    from telescope_data_pipeline_spark.operators.multimodal import (
        CodecUnavailable,
        decode_webp_frames,
    )

    rng = np.random.default_rng(22)
    rgb = rng.integers(0, 256, size=(5, 5, 3), dtype=np.uint8)
    with pytest.raises(CodecUnavailable):
        decode_webp_frames(_encode_vp8l_literal(rgb))  # still image

    blob = bytearray(_animated_webp([(rgb, 0, 0, 10, 0)]))
    # truncate the VP8L data inside the ANMF: shrink container size
    with pytest.raises(CodecUnavailable):
        decode_webp_frames(bytes(blob[:-6]))


def _animated_gif(frames, loop_count=2):
    """Compose a multi-frame GIF89a: global palette from frame 0's
    palette, NETSCAPE loop extension, a Graphic Control Extension per
    frame (delay centiseconds, disposal, optional transparency), and
    per-frame local palettes where supplied."""
    import struct

    import numpy as np

    pal0 = frames[0][1]
    n = len(pal0)
    size_bits = max((n - 1).bit_length(), 1) - 1
    gct = np.zeros((2 << size_bits, 3), np.uint8)
    gct[:n] = pal0
    h0, w0 = frames[0][0].shape
    sw = max(f[2] + f[0].shape[1] for f in frames)
    sh = max(f[3] + f[0].shape[0] for f in frames)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | size_bits, 0, 0)
    out += gct.tobytes()
    out += (b"\x21\xff\x0bNETSCAPE2.0\x03\x01"
            + loop_count.to_bytes(2, "little") + b"\x00")
    for idx, pal, left, top, delay, disposal, trans in frames:
        h, w = idx.shape
        gp = (disposal << 2) | (1 if trans is not None else 0)
        out += (b"\x21\xf9\x04" + bytes([gp])
                + delay.to_bytes(2, "little")
                + bytes([trans or 0]) + b"\x00")
        local = not np.array_equal(pal, pal0)
        ipacked = 0
        if local:
            lb = max((len(pal) - 1).bit_length(), 1) - 1
            lct = np.zeros((2 << lb, 3), np.uint8)
            lct[:len(pal)] = pal
            ipacked = 0x80 | lb
        out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, ipacked)
        if local:
            out += lct.tobytes()
        min_code = max((max((len(pal) - 1).bit_length(), 1) - 1) + 1, 2)
        out.append(min_code)
        data = _gif_lzw_encode(idx.ravel(), min_code)
        for i in range(0, len(data), 255):
            chunk = data[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


def test_gif_animation_frame_extraction():
    """Animated GIF: every frame decodes with its own palette and
    geometry; GCE delay/disposal/transparency and the NETSCAPE loop
    count come back from the container."""
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        decode_gif_frames,
    )

    rng = np.random.default_rng(31)
    pal0 = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    pal1 = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx0 = rng.integers(0, 8, size=(6, 9), dtype=np.uint8)
    idx1 = rng.integers(0, 4, size=(3, 4), dtype=np.uint8)
    blob = _animated_gif([
        (idx0, pal0, 0, 0, 5, 0, None),
        (idx1, pal1, 2, 1, 12, 2, 3),
    ], loop_count=4)
    out = decode_gif_frames(blob)
    assert out["loop_count"] == 4
    assert (out["canvas_width"], out["canvas_height"]) == (9, 6)
    f0, f1 = out["frames"]
    assert (f0["width"], f0["height"], f0["x"], f0["y"]) == (9, 6, 0, 0)
    assert (f0["delay_cs"], f0["disposal"],
            f0["transparent_index"]) == (5, 0, None)
    assert np.allclose(f0["pixels"], _luma(pal0, idx0))
    assert (f1["width"], f1["height"], f1["x"], f1["y"]) == (4, 3, 2, 1)
    assert (f1["delay_cs"], f1["disposal"], f1["transparent_index"]) \
        == (12, 2, 3)
    assert np.allclose(f1["pixels"], _luma(pal1, idx1))

    # still decoder keeps its first-frame contract on the same blob
    from telescope_data_pipeline_spark.operators.multimodal import (
        _decode_gif,
    )
    assert np.allclose(_decode_gif(blob), _luma(pal0, idx0))


def test_animation_frames_operator_distributed(spark):
    """The Arrow-batched animation extractor yields one row per frame
    of each genuinely animated payload (GIF centiseconds normalized to
    ms), and silently skips stills, garbage, and NULLs — whole-payload
    drop inside the executor kernel."""
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        animation_frames,
    )

    rng = np.random.default_rng(41)
    pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    idx0 = rng.integers(0, 8, size=(5, 7), dtype=np.uint8)
    idx1 = rng.integers(0, 8, size=(5, 7), dtype=np.uint8)
    gif = _animated_gif([(idx0, pal, 0, 0, 5, 0, None),
                         (idx1, pal, 0, 0, 8, 1, None)], loop_count=2)
    rgb = rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
    webp = _animated_webp([(rgb, 0, 0, 40, 0)], loop_count=9)
    still = _encode_vp8l_literal(rgb)
    media = spark.createDataFrame(
        [(1, bytearray(gif)), (2, bytearray(webp)),
         (3, bytearray(still)), (4, bytearray(b"garbage")), (5, None)],
        "media_id long, payload binary")
    rows = {(r.media_id, r.frame_idx): r
            for r in animation_frames(media).collect()}
    assert set(rows) == {(1, 0), (1, 1), (2, 0)}
    g0, g1, w0 = rows[(1, 0)], rows[(1, 1)], rows[(2, 0)]
    assert g0.container == "gif" and g0.duration_ms == 50.0
    assert g1.duration_ms == 80.0 and g1.loop_count == 2
    assert abs(g0.mean_px - float(_luma(pal, idx0).mean())) < 1e-4
    assert w0.container == "webp" and w0.duration_ms == 40.0
    assert w0.loop_count == 9 and (w0.width, w0.height) == (8, 6)
    assert abs(w0.mean_px - float(_webp_luma(rgb).mean())) < 1e-4


def test_animation_decoders_fuzz_exception_surface():
    """Property fuzz over the animation decoders: arbitrary bytes (and
    mutated valid containers) must either decode or raise typed
    CodecUnavailable — never any other exception, never a hang. The
    distributed animation_frames kernel catches ONLY CodecUnavailable,
    so a leaked exception type would kill the executor task. Also pins
    the decode-bomb guard: a GIF header claiming a gigapixel frame is
    rejected before allocation."""
    import struct

    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from telescope_data_pipeline_spark.operators.multimodal import (
        CodecUnavailable,
        decode_gif_frames,
        decode_webp_frames,
    )

    @given(st.binary(max_size=200))
    @settings(max_examples=200, deadline=None)
    def fuzz_raw(data):
        for fn, magic in ((decode_gif_frames, b"GIF89a"),
                          (decode_webp_frames, b"RIFF\x20\x00\x00\x00WEBP")):
            try:
                fn(magic + data)
            except CodecUnavailable:
                pass

    fuzz_raw()

    rng = np.random.default_rng(51)
    pal = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, size=(4, 4), dtype=np.uint8)
    gif = _animated_gif([(idx, pal, 0, 0, 5, 0, None)])
    rgb = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    webp = _animated_webp([(rgb, 0, 0, 10, 0)])

    @given(st.integers(6, 200), st.integers(0, 255))
    @settings(max_examples=200, deadline=None)
    def fuzz_mutate(pos, val):
        for blob, fn in ((gif, decode_gif_frames),
                         (webp, decode_webp_frames)):
            mutated = bytearray(blob)
            mutated[pos % len(mutated)] = val
            try:
                fn(bytes(mutated))
            except CodecUnavailable:
                pass

    fuzz_mutate()

    # decode-bomb guard: gigapixel frame dims rejected, not allocated
    bomb = bytearray(_animated_gif([(idx, pal, 0, 0, 5, 0, None)]))
    at = bytes(bomb).index(b"\x2c")  # image descriptor
    bomb[at + 5:at + 9] = struct.pack("<HH", 65535, 65535)
    import pytest

    with pytest.raises(CodecUnavailable):
        decode_gif_frames(bytes(bomb))


def test_decode_bomb_guards_reject_header_claimed_gigapixels():
    """A few header bytes must not allocate gigabytes in an executor:
    PNG zlib bombs stop at the bounded inflate, and PNG/TIFF headers
    claiming gigapixel rasters raise typed CodecUnavailable before any
    allocation (the animation/GIF guard is pinned in the fuzz test)."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from telescope_data_pipeline_spark.operators.multimodal import (
        CodecUnavailable,
        _png_chunk,
        decode_image,
    )

    # PNG decompression bomb: 4x4 gray header, IDAT inflating to 10 MB
    ihdr = _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0))
    bomb = _png_chunk(b"IDAT", zlib.compress(b"\x00" * 10_000_000))
    iend = _png_chunk(b"IEND", b"")
    with pytest.raises(CodecUnavailable, match="inflate output exceeds"):
        decode_image(b"\x89PNG\r\n\x1a\n" + ihdr + bomb + iend)

    # PNG header claiming a gigapixel raster
    big = _png_chunk(b"IHDR",
                     struct.pack(">IIBBBBB", 100_000, 100_000, 8, 0, 0, 0, 0))
    idat = _png_chunk(b"IDAT", zlib.compress(b"\x00"))
    with pytest.raises(CodecUnavailable, match="over decode cap"):
        decode_image(b"\x89PNG\r\n\x1a\n" + big + idat + iend)

    # TIFF tags claiming a gigapixel raster (entries are LONG-typed)
    tif = bytearray(_tiff_encode(np.zeros((4, 4), np.uint8)))
    for tag in (256, 257):
        at = bytes(tif).index(struct.pack("<HHI", tag, 4, 1))
        tif[at + 8:at + 12] = struct.pack("<I", 100_000)
    with pytest.raises(CodecUnavailable, match="over decode cap"):
        decode_image(bytes(tif))


def test_decode_image_fuzz_exception_surface():
    """Property fuzz over the WHOLE still-image dispatch: mutated valid
    files of every built-in format (BMP, PNG, JPEG-ish via PNG16, GIF,
    TIFF, WebP/VP8L) and raw garbage behind each magic must decode or
    raise typed CodecUnavailable — the q_media_* kernels catch only
    that type."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from telescope_data_pipeline_spark.operators.multimodal import (
        CodecUnavailable,
        decode_image,
    )

    rng = np.random.default_rng(61)
    gray = rng.integers(0, 256, size=(6, 7), dtype=np.uint8)
    rgbs = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    idx = rng.integers(0, 8, size=(6, 6), dtype=np.uint8)
    blobs = [
        _png_encode(gray, ctype=0),
        _png_encode(rgbs, ctype=2, depth=16),
        _gif_encode(idx, pal),
        _tiff_encode(np.asarray(rgbs)),
        _encode_vp8l_literal(rgbs),
    ]

    @given(st.integers(0, len(blobs) - 1), st.integers(0, 4095),
           st.integers(0, 255))
    @settings(max_examples=400, deadline=None)
    def fuzz_mutate(which, pos, val):
        blob = bytearray(blobs[which])
        blob[pos % len(blob)] = val
        try:
            decode_image(bytes(blob))
        except CodecUnavailable:
            pass

    fuzz_mutate()

    magics = [b"BM", b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff\xe0",
              b"GIF89a", b"II*\x00", b"RIFF\x20\x00\x00\x00WEBP"]

    @given(st.integers(0, len(magics) - 1), st.binary(max_size=120))
    @settings(max_examples=300, deadline=None)
    def fuzz_raw(which, tail):
        try:
            decode_image(magics[which] + tail)
        except CodecUnavailable:
            pass

    fuzz_raw()


# ---------------------------------------------------------------------------
# Netpbm (P1-P6) decode goldens
# ---------------------------------------------------------------------------


def test_pnm_ascii_graymap_known_pixels():
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import _decode_pnm

    pnm = b"P2\n# a comment\n3 2\n100\n0 50 100\n25 75 10\n"
    got = _decode_pnm(pnm)
    want = np.array([[0, 50, 100], [25, 75, 10]], np.float32) * 2.55
    assert got.shape == (2, 3)
    assert np.allclose(got, want, atol=1e-4)


def test_pnm_ascii_pixmap_luma():
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import _decode_pnm

    # one red, one green, one blue pixel at maxval 255
    pnm = b"P3 3 1 255  255 0 0  0 255 0  0 0 255\n"
    got = _decode_pnm(pnm)
    want = np.array([[255 * 0.299, 255 * 0.587, 255 * 0.114]], np.float32)
    assert np.allclose(got, want, atol=1e-3)


def test_pnm_bitmaps_one_is_black_and_unseparated_bits():
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import _decode_pnm

    # P1 with NO separators between bits (legal per spec)
    p1 = b"P1\n4 2\n0110\n1001\n"
    got = _decode_pnm(p1)
    want = (1.0 - np.array([[0, 1, 1, 0], [1, 0, 0, 1]], np.float32)) * 255
    assert np.array_equal(got, want)
    # P4 raw: same raster packed MSB-first (0110 -> 0x60, 1001 -> 0x90)
    p4 = b"P4\n4 2\n" + bytes([0x60, 0x90])
    assert np.array_equal(_decode_pnm(p4), want)


def test_pnm_raw_gray_8_and_16_bit():
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import _decode_pnm

    p5 = b"P5 3 1 255 " + bytes([0, 128, 255])
    assert np.allclose(_decode_pnm(p5), [[0, 128, 255]], atol=1e-4)
    # 16-bit big-endian, maxval 65535 scales to 0..255
    p5w = b"P5 2 1 65535 " + (0).to_bytes(2, "big") + (65535).to_bytes(2, "big")
    got = _decode_pnm(p5w)
    assert np.allclose(got, [[0, 255]], atol=1e-4)


def test_pnm_raw_pixmap_and_malformed_fail_loudly():
    import numpy as np
    import pytest

    from telescope_data_pipeline_spark.operators.multimodal import (
        CodecUnavailable,
        _decode_pnm,
        decode_image,
    )

    p6 = b"P6 2 1 255 " + bytes([255, 0, 0, 0, 255, 0])
    got = _decode_pnm(p6)
    want = np.array([[255 * 0.299, 255 * 0.587]], np.float32)
    assert np.allclose(got, want, atol=1e-3)
    # dispatch integration: P6 payload routes to the PNM decoder
    assert np.allclose(decode_image(p6), want, atol=1e-3)
    for bad in (b"P5 3 1 255 " + bytes([1, 2]),        # truncated raw
                b"P2 2 1 255 7\n",                     # truncated ASCII
                b"P2 2 1\n",                           # header cut short
                b"P5 2 1 0 \x00\x00",                  # maxval 0
                b"P2 99999999999 1 255 1\n",           # >10-digit dim
                b"P2 1 1 255 zz\n"):                   # non-numeric sample
        with pytest.raises(CodecUnavailable):
            _decode_pnm(bad)


# ---------------------------------------------------------------------------
# ICO/CUR (favicon) decode goldens
# ---------------------------------------------------------------------------


def _ico_wrap(entries):
    """entries: list of (w, h, payload). Returns an ICO container."""
    import struct

    hdr = struct.pack("<HHH", 0, 1, len(entries))
    off = 6 + 16 * len(entries)
    dirs, blobs = b"", b""
    for w, h, pl in entries:
        dirs += struct.pack("<BBBBHHII", w % 256, h % 256, 0, 0, 1, 32,
                            len(pl), off)
        blobs += pl
        off += len(pl)
    return hdr + dirs + blobs


def _ico_dib24(rgb):
    """Build a headerless V3 DIB (doubled height, 24-bit, AND mask)."""
    import struct

    import numpy as np

    rgb = np.asarray(rgb, np.uint8)
    h, w, _ = rgb.shape
    hdr = struct.pack("<IiiHHIIiiII", 40, w, 2 * h, 1, 24, 0, 0, 0, 0, 0, 0)
    row_pad = (-(w * 3)) % 4
    body = b""
    for r in range(h - 1, -1, -1):  # bottom-up
        row = rgb[r][:, ::-1].tobytes()  # RGB -> BGR
        body += row + b"\x00" * row_pad
    mask_row = b"\x00" * (((w + 31) // 32) * 4)
    return hdr + body + mask_row * h


def test_ico_dib_and_png_entries_decode():
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        _decode_ico,
        _decode_png,
        decode_image,
    )

    rng = np.random.default_rng(17)
    rgb = rng.integers(0, 256, size=(4, 5, 3), dtype=np.uint8)
    ico = _ico_wrap([(5, 4, _ico_dib24(rgb))])
    got = _decode_ico(ico)
    want = (rgb[..., 0] * 0.299 + rgb[..., 1] * 0.587
            + rgb[..., 2] * 0.114).astype(np.float32)
    assert got.shape == (4, 5)
    assert np.allclose(got, want, atol=1e-3)
    # dispatch integration
    assert np.allclose(decode_image(ico), want, atol=1e-3)

    # PNG-in-ICO decodes through the existing PNG path
    gray = rng.integers(0, 256, size=(6, 6), dtype=np.uint8)
    png = _png_encode(gray, ctype=0)
    ico2 = _ico_wrap([(6, 6, png)])
    assert np.array_equal(_decode_ico(ico2), _decode_png(png))


def test_ico_picks_largest_entry_and_rejects_corrupt():
    import numpy as np
    import pytest

    from telescope_data_pipeline_spark.operators.multimodal import (
        CodecUnavailable,
        _decode_ico,
    )

    rng = np.random.default_rng(23)
    small = rng.integers(0, 256, size=(2, 2, 3), dtype=np.uint8)
    big = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    ico = _ico_wrap([(2, 2, _ico_dib24(small)), (8, 8, _ico_dib24(big))])
    got = _decode_ico(ico)
    assert got.shape == (8, 8)
    want = (big[..., 0] * 0.299 + big[..., 1] * 0.587
            + big[..., 2] * 0.114).astype(np.float32)
    assert np.allclose(got, want, atol=1e-3)

    for bad in (b"\x00\x00\x01\x00\x01\x00" + b"\x00" * 10,   # dir truncated
                _ico_wrap([(4, 4, b"\xde\xad\xbe\xef" * 4)]),  # bogus entry
                ):
        with pytest.raises(CodecUnavailable):
            _decode_ico(bad)


def test_pnm_ico_fuzz_exception_surface():
    """Same contract as the other decoders: mutated valid PNM/ICO files
    and raw garbage behind the magics must decode or raise typed
    CodecUnavailable — nothing else may escape into the kernels."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from telescope_data_pipeline_spark.operators.multimodal import (
        CodecUnavailable,
        decode_image,
    )

    rng = np.random.default_rng(29)
    rgb = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    blobs = [
        b"P2\n3 2\n255\n0 50 100 25 75 10\n",
        b"P4\n4 2\n" + bytes([0x60, 0x90]),
        b"P6 2 1 255 " + bytes([255, 0, 0, 0, 255, 0]),
        _ico_wrap([(6, 5, _ico_dib24(rgb))]),
    ]

    @given(st.integers(0, len(blobs) - 1), st.integers(0, 4095),
           st.integers(0, 255))
    @settings(max_examples=300, deadline=None)
    def fuzz_mutate(which, pos, val):
        blob = bytearray(blobs[which])
        blob[pos % len(blob)] = val
        try:
            decode_image(bytes(blob))
        except CodecUnavailable:
            pass

    fuzz_mutate()

    magics = [b"P1\n", b"P3 ", b"P5\t", b"P6\n",
              b"\x00\x00\x01\x00\x02\x00", b"\x00\x00\x02\x00\x01\x00"]

    @given(st.integers(0, len(magics) - 1), st.binary(max_size=120))
    @settings(max_examples=300, deadline=None)
    def fuzz_raw(which, tail):
        try:
            decode_image(magics[which] + tail)
        except CodecUnavailable:
            pass

    fuzz_raw()


def test_pnm_ico_flow_through_feature_pipeline(spark):
    """include_pnm_ico=True plants real P6 and ICO payloads in the
    fixture's stub slot; the distributed feature extractor must decode
    them through the magic-byte dispatch with means equal to a direct
    local decode (same guarantee the BMP/PNG/WebP slots have)."""
    import numpy as np

    from telescope_data_pipeline_spark.operators.multimodal import (
        decode_image,
        extract_image_features,
        make_fake_media,
    )

    media = make_fake_media(spark, n=64, include_pnm_ico=True)
    payloads = {r.media_id: bytes(r.payload)
                for r in media.filter("modality = 'image'").collect()}
    planted = {mid: p for mid, p in payloads.items()
               if p[:2] in (b"P6",) or p[:4] == b"\x00\x00\x01\x00"}
    assert planted, "fixture did not plant any PNM/ICO payloads"
    feats = {r.media_id: r for r in
             extract_image_features(media).collect()}
    for mid, p in planted.items():
        want = float(np.mean(decode_image(p)))
        assert abs(feats[mid].mean_intensity - want) < 1e-4, mid


def test_exif_golden_fields():
    """The planted EXIF JPEG round-trips every field exactly."""
    from telescope_data_pipeline_spark.operators.multimodal import (
        _extract_exif,
        _tiny_exif_jpeg,
    )

    info = _extract_exif(_tiny_exif_jpeg())
    assert info == {
        "has_exif": True, "orientation": 6, "make": "ACME",
        "model": "StarCam 9",
        "datetime_original": "2024:01:15 12:34:56",
        "exposure_time": 0.004, "f_number": 2.8, "iso": 400,
        "focal_length": 50.0, "px_width": 1024, "px_height": 768,
        "has_gps": False,
    }
    # big-endian TIFF body parses identically (bare-TIFF entry path
    # exercised via the little-endian block reserialized as payload)
    tiff = _tiny_exif_jpeg()
    start = tiff.index(b"II*\x00")
    bare = _extract_exif(tiff[start:])
    assert bare["orientation"] == 6 and bare["iso"] == 400


def test_exif_never_fatal_on_garbage():
    """Triage contract: mutated / truncated / foreign payloads yield
    the all-NULL row — no exception of any kind escapes."""
    import random

    from telescope_data_pipeline_spark.operators.multimodal import (
        _extract_exif,
        _tiny_exif_jpeg,
    )

    rng = random.Random(11)
    p = _tiny_exif_jpeg()
    for _ in range(3000):
        b = bytearray(p)
        for _ in range(rng.randrange(1, 8)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        out = _extract_exif(bytes(b[:rng.randrange(1, len(b) + 1)]))
        assert isinstance(out, dict) and "orientation" in out
    for junk in (b"", b"\xff", b"II*\x00", b"RIFF????WEBP",
                 b"\xff\xd8\xff\xe1\x00\x04Ex"):
        assert _extract_exif(junk)["has_exif"] is False


def test_exif_metadata_distributed(spark):
    """q_media_exif: the planted JPEG rows carry the golden fields;
    every other payload row is the all-NULL passthrough."""
    from telescope_data_pipeline_spark.queries import get

    rows = get("q_media_exif").fn(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) > 0
    hits = [r for r in rows if r.has_exif]
    assert hits, "planted EXIF JPEG missing from fixture"
    for r in hits:
        assert (r.orientation, r.make, r.iso) == (6, "ACME", 400)
        assert r.has_gps is False
    for r in rows:
        if not r.has_exif:
            assert r.orientation is None and r.make is None


# ---------------------------------------------------------------------------
# Real-video frame sampling: ffmpeg/PyAV-gated dispatch (round-12 VERDICT
# item 7). Neither backend is installed in this container, so the helpers
# are unit-tested driver-side with a fake ffmpeg executable / fake av
# module, and the Spark-side dispatch with an injected backend callable
# (cloudpickled into the kernel — monkeypatched module globals never reach
# the Python worker processes).
# ---------------------------------------------------------------------------


def test_encode_png_gray_roundtrips_through_own_decoder():
    import numpy as np

    from telescope_data_pipeline_spark.operators import multimodal as mm

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(9, 13), dtype=np.uint8)
    back = mm._decode_png(mm.encode_png_gray(arr))
    assert back.shape == (9, 13)
    assert np.array_equal(back.astype(np.uint8), arr)


def test_split_png_stream_walks_chunks_not_signatures():
    import numpy as np

    from telescope_data_pipeline_spark.operators import multimodal as mm

    # A frame whose IDAT happens to CONTAIN the PNG signature bytes —
    # naive signature splitting would cut the file in half.
    sig = b"\x89PNG\r\n\x1a\n"
    import struct
    import zlib
    tricky_raw = b"\x00" + sig  # filter byte + 8 "pixels" = the signature
    ihdr = struct.pack(">IIBBBBB", 8, 1, 8, 0, 0, 0, 0)

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    tricky = (sig + chunk(b"IHDR", ihdr)
              + chunk(b"IDAT", zlib.compress(tricky_raw, 0))  # stored: raw
              + chunk(b"IEND", b""))
    assert sig in tricky[8:]  # the trap is actually planted
    plain = mm.encode_png_gray(np.arange(6, dtype=np.uint8).reshape(2, 3))
    frames = mm._split_png_stream(tricky + plain + tricky)
    assert frames == [tricky, plain, tricky]

    import pytest
    with pytest.raises(mm.CodecUnavailable):
        mm._split_png_stream(plain + b"JUNK")
    with pytest.raises(mm.CodecUnavailable):
        mm._split_png_stream(plain[:-4])  # truncated final chunk


def test_video_frames_ffmpeg_with_fake_binary(tmp_path, monkeypatch):
    import numpy as np

    from telescope_data_pipeline_spark.operators import multimodal as mm

    png1 = mm.encode_png_gray(np.zeros((2, 2), np.uint8))
    png2 = mm.encode_png_gray(np.full((2, 2), 9, np.uint8))
    blob = tmp_path / "frames.bin"
    blob.write_bytes(png1 + png2)
    script = tmp_path / "ffmpeg"
    script.write_text(f"#!/bin/sh\ncat {blob}\n")
    script.chmod(0o755)
    monkeypatch.setattr(mm, "_FFMPEG_BIN", str(script))
    frames = mm._video_frames_ffmpeg(
        b"\x00\x00\x00\x18ftypisom" + b"\x00" * 16, 2.0)
    assert [(t, f) for t, f in frames] == [(0.0, png1), (2.0, png2)]


def test_video_frames_ffmpeg_failures_are_codec_unavailable(
        tmp_path, monkeypatch):
    import pytest

    from telescope_data_pipeline_spark.operators import multimodal as mm

    monkeypatch.setattr(mm, "_FFMPEG_BIN", None)
    with pytest.raises(mm.CodecUnavailable):
        mm._video_frames_ffmpeg(b"x", 1.0)

    bad = tmp_path / "ffmpeg"
    bad.write_text("#!/bin/sh\necho 'no decoder' >&2\nexit 1\n")
    bad.chmod(0o755)
    monkeypatch.setattr(mm, "_FFMPEG_BIN", str(bad))
    with pytest.raises(mm.CodecUnavailable):
        mm._video_frames_ffmpeg(b"x", 1.0)

    junk = tmp_path / "ffmpeg2"
    junk.write_text("#!/bin/sh\necho not-a-png\n")
    junk.chmod(0o755)
    monkeypatch.setattr(mm, "_FFMPEG_BIN", str(junk))
    with pytest.raises(mm.CodecUnavailable):
        mm._video_frames_ffmpeg(b"x", 1.0)


class _FakeAvFrame:
    def __init__(self, t, val):
        import numpy as np
        self.time = t
        self._arr = np.full((3, 5), val, dtype=np.uint8)

    def to_ndarray(self, format):
        assert format == "gray"
        return self._arr


class _FakeAvContainer:
    def __init__(self, frames, stream_type="video"):
        import types
        self.streams = [types.SimpleNamespace(type=stream_type)]
        self._frames = frames

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def decode(self, stream):
        return iter(self._frames)


class _FakeAv:
    def __init__(self, frames, stream_type="video"):
        self._frames = frames
        self._stream_type = stream_type

    def open(self, fh):
        return _FakeAvContainer(self._frames, self._stream_type)


def test_video_frames_pyav_samples_at_interval(monkeypatch):
    from telescope_data_pipeline_spark.operators import multimodal as mm

    # 25 fps worth of frames over 3 s; every_s=1.0 keeps t=0,1,2,3.
    frames = [_FakeAvFrame(i * 0.25, i) for i in range(13)]
    monkeypatch.setattr(mm, "_pyav", _FakeAv(frames))
    got = mm._video_frames_pyav(b"\x1a\x45\xdf\xa3", 1.0)
    assert [t for t, _ in got] == [0.0, 1.0, 2.0, 3.0]
    assert all(mm._decode_png(png).shape == (3, 5) for _, png in got)


def test_video_frames_pyav_failures_are_codec_unavailable(monkeypatch):
    import pytest

    from telescope_data_pipeline_spark.operators import multimodal as mm

    monkeypatch.setattr(mm, "_pyav", None)
    with pytest.raises(mm.CodecUnavailable):
        mm._video_frames_pyav(b"x", 1.0)

    monkeypatch.setattr(mm, "_pyav", _FakeAv([], stream_type="audio"))
    with pytest.raises(mm.CodecUnavailable):  # no video stream
        mm._video_frames_pyav(b"x", 1.0)

    class _Boom:
        def open(self, fh):
            raise ValueError("moov atom not found")

    monkeypatch.setattr(mm, "_pyav", _Boom())
    with pytest.raises(mm.CodecUnavailable):  # foreign error wrapped
        mm._video_frames_pyav(b"x", 1.0)


def test_video_backend_probe_order(monkeypatch):
    from telescope_data_pipeline_spark.operators import multimodal as mm

    monkeypatch.setattr(mm, "_pyav", object())
    monkeypatch.setattr(mm, "_FFMPEG_BIN", "/usr/bin/ffmpeg")
    assert mm._video_backend() is mm._video_frames_pyav  # PyAV first
    monkeypatch.setattr(mm, "_pyav", None)
    assert mm._video_backend() is mm._video_frames_ffmpeg
    monkeypatch.setattr(mm, "_FFMPEG_BIN", None)
    assert mm._video_backend() is None  # this container's state


def test_sample_frames_real_backend_dispatch(spark):
    """Injected backend (stand-in for PyAV/ffmpeg) handles exactly the
    rows with real container magics; synthetic payloads keep the stub."""
    import numpy as np

    from telescope_data_pipeline_spark.operators import multimodal as mm

    frame_png = mm.encode_png_gray(np.full((4, 6), 200, np.uint8))

    def fake_backend(payload, every_s):
        assert mm._is_video_container(payload)  # gate ran before us
        return [(0.0, frame_png), (every_s, frame_png)]

    media = make_fake_media(spark, n=32)
    rows = sample_frames(media, every_s=1.0,
                         backend=fake_backend).collect()
    payloads = {r.media_id: bytes(r.payload)
                for r in media.filter("modality = 'video'").collect()}
    real_ids = {mid for mid, b in payloads.items()
                if mm._is_video_container(b)}
    assert real_ids  # the fixture plants real MP4/Matroska containers
    assert set(payloads) - real_ids  # ... and synthetic ones
    by_media: dict[int, list] = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
    assert set(by_media) == set(payloads)
    for mid, rs in by_media.items():
        rs.sort(key=lambda r: r.frame_idx)
        if mid in real_ids:
            assert [r.t_offset_s for r in rs] == [0.0, 1.0]
            arr = mm._decode_png(bytes(rs[0].frame_bytes))
            assert arr.shape == (4, 6) and float(arr.max()) == 200.0
        else:
            assert all(len(bytes(r.frame_bytes)) <= 16 for r in rs)


def test_sample_frames_backend_failure_falls_back_to_stub(spark):
    """A backend that cannot decode (corrupt payload, missing codec in
    the local build) degrades to the stub rows — byte-identical to the
    no-backend output, so goldens pinned on the stub stay valid."""
    from telescope_data_pipeline_spark.operators import multimodal as mm

    def broken(payload, every_s):
        raise mm.CodecUnavailable("cannot decode")

    media = make_fake_media(spark, n=32)

    def canon(df):
        return sorted((r.media_id, r.frame_idx, r.t_offset_s,
                       bytes(r.frame_bytes)) for r in df.collect())

    assert canon(sample_frames(media, every_s=1.0, backend=broken)) \
        == canon(sample_frames(media, every_s=1.0))
