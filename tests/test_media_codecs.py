"""Pure stdlib/numpy media codecs: roundtrips, PNG filter coverage,
deterministic feature kernels. No Spark session needed."""

import struct
import zlib

import numpy as np
import pytest

from pyspark_codesearch.operators.media_codecs import (
    MediaDecodeError,
    audio_features,
    decode_image,
    decode_png,
    decode_ppm,
    decode_wav,
    encode_png,
    encode_ppm,
    encode_wav,
    image_features,
)


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def test_wav_roundtrip(rng):
    x = 0.6 * np.sin(np.linspace(0, 30 * np.pi, 3000)) + rng.normal(0, 0.01, 3000)
    sr, y = decode_wav(encode_wav(x, 16000))
    assert sr == 16000 and y.shape == (3000,)
    assert float(np.abs(y - np.clip(x, -1, 1)).max()) < 1e-3


def test_ppm_pgm_roundtrip(rng):
    img = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    g = rng.integers(0, 256, (20, 21), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(g))[:, :, 0], g)


def test_ppm_header_comments():
    img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    raw = b"P6\n# a comment\n2 2\n# another\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(raw), img)


@pytest.mark.parametrize("shape", [(25, 31), (25, 31, 3), (25, 31, 4)])
def test_png_roundtrip(rng, shape):
    im = rng.integers(0, 256, shape, dtype=np.uint8)
    dec = decode_png(encode_png(im))
    ref = im[:, :, None] if im.ndim == 2 else im
    assert np.array_equal(dec, ref)


def _png_with_filters(img: np.ndarray, ftypes: list[int]) -> bytes:
    """Hand-build a PNG whose scanlines use the given filter types —
    exercises the decoder's sub/up/average/paeth inverses (our encoder
    only emits filter 0)."""
    h, w, c = img.shape
    color = {1: 0, 3: 2, 4: 6}[c]

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        line = img[y].reshape(-1).astype(np.int32)
        f = ftypes[y % len(ftypes)]
        filt = np.empty_like(line)
        for x in range(line.size):
            a = int(line[x - c]) if x >= c else 0
            b = int(prev[x])
            cc = int(prev[x - c]) if x >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            filt[x] = (line[x] - pred) & 0xFF
        raw += bytes([f]) + filt.astype(np.uint8).tobytes()
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftypes", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_filter_types_decode(rng, ftypes):
    img = rng.integers(0, 256, (12, 9, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(_png_with_filters(img, ftypes)), img)


def test_dispatch_and_errors(rng):
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    assert decode_image(encode_png(img)).shape == (8, 8, 3)
    assert decode_image(encode_ppm(img)).shape == (8, 8, 3)
    with pytest.raises(MediaDecodeError):
        decode_image(b"\x00\x01\x02 not media")
    with pytest.raises(MediaDecodeError):
        decode_wav(b"RIFFgarbage")
    with pytest.raises(MediaDecodeError):
        decode_ppm(b"P6\n4 4\n255\nshort")


def test_feature_kernels_deterministic(rng):
    img = rng.integers(0, 256, (30, 40, 3), dtype=np.uint8)
    f1, f2 = image_features(img), image_features(img)
    assert f1.shape == (16,) and np.array_equal(f1, f2)
    assert float(f1.min()) >= 0.0 and float(f1.max()) <= 1.0
    # uniform image -> all cells equal its gray level
    flat = np.full((16, 16, 3), 128, dtype=np.uint8)
    assert np.allclose(image_features(flat), 128 / 255.0, atol=1e-7)
    sr, x = decode_wav(encode_wav(np.sin(np.linspace(0, 20 * np.pi, 2000)), 8000))
    a1, a2 = audio_features(sr, x), audio_features(sr, x)
    assert a1.shape == (16,) and np.array_equal(a1, a2)
    assert a1[0] == pytest.approx(2000 / 8000)  # duration
    assert 0.6 < a1[1] < 0.75                   # sine RMS ~ 1/sqrt(2)
    assert audio_features(8000, np.array([])).tolist() == [0.0] * 16


# ---------------------------------------------------------------- GIF
def test_gif_roundtrip_small(rng):
    from pyspark_codesearch.operators.media_codecs import decode_gif, encode_gif

    frames = rng.integers(0, 256, (3, 17, 23), dtype=np.uint8)
    dec = decode_gif(encode_gif(frames))
    assert dec.shape == (3, 17, 23, 3)
    # grayscale palette: every channel equals the original index
    for c in range(3):
        assert np.array_equal(dec[:, :, :, c], frames)


def test_gif_lzw_dict_growth_and_reset(rng):
    """A frame large enough that the LZW dictionary grows past several
    code-size bumps AND hits the 4096 reset (CLEAR re-emitted)."""
    from pyspark_codesearch.operators.media_codecs import _lzw_decode, _lzw_encode

    # highly repetitive -> long dictionary chains; 200k pixels >> 4096 codes
    data = (bytes(range(256)) * 300) + b"\x07" * 120_000
    assert _lzw_decode(_lzw_encode(data, 8), 8) == data
    # also at a small min code size (4-bit palette path)
    small = bytes(v % 16 for v in rng.integers(0, 16, 50_000))
    assert _lzw_decode(_lzw_encode(small, 4), 4) == small


def test_gif_single_frame_and_2d_input(rng):
    from pyspark_codesearch.operators.media_codecs import decode_gif, encode_gif

    img = rng.integers(0, 256, (9, 11), dtype=np.uint8)
    dec = decode_gif(encode_gif(img))
    assert dec.shape == (1, 9, 11, 3)
    assert np.array_equal(dec[0, :, :, 0], img)


def test_gif_partial_frame_composites():
    """A partial second frame pastes onto the previous canvas
    (do-not-dispose semantics)."""
    from pyspark_codesearch.operators.media_codecs import decode_gif, encode_gif
    import struct as _s

    base = np.full((8, 8), 100, dtype=np.uint8)
    patch = np.full((2, 3), 200, dtype=np.uint8)
    payload = bytearray(encode_gif(base))
    assert payload[-1] == 0x3B
    del payload[-1]
    # hand-append a partial-frame image descriptor at (left=2, top=3)
    from pyspark_codesearch.operators.media_codecs import _lzw_encode

    payload += b"\x2C" + _s.pack("<HHHH", 2, 3, 3, 2) + b"\x00" + bytes([8])
    comp = _lzw_encode(patch.tobytes(), 8)
    payload.append(len(comp)); payload += comp; payload.append(0)
    payload.append(0x3B)
    dec = decode_gif(bytes(payload))
    assert dec.shape == (2, 8, 8, 3)
    assert (dec[0, :, :, 0] == 100).all()
    expect = base.copy()
    expect[3:5, 2:5] = 200
    assert np.array_equal(dec[1, :, :, 0], expect)


def test_gif_errors(rng):
    from pyspark_codesearch.operators.media_codecs import decode_gif, encode_gif

    with pytest.raises(MediaDecodeError):
        decode_gif(b"NOTAGIF" + bytes(40))
    good = encode_gif(rng.integers(0, 256, (2, 10, 10), dtype=np.uint8))
    with pytest.raises(MediaDecodeError):
        decode_gif(good[: len(good) // 2])  # truncated
    # flip the interlace bit of the first image descriptor
    bad = bytearray(good)
    idx = bad.index(0x2C, 13 + 768)
    bad[idx + 9] |= 0x40
    with pytest.raises(MediaDecodeError):
        decode_gif(bytes(bad))


def test_video_features_deterministic(rng):
    from pyspark_codesearch.operators.media_codecs import (
        decode_gif,
        encode_gif,
        video_features,
    )

    frames = rng.integers(0, 256, (4, 15, 15), dtype=np.uint8)
    f1 = video_features(decode_gif(encode_gif(frames)))
    f2 = video_features(decode_gif(encode_gif(frames)))
    assert f1.shape == (16,) and f1.dtype == np.float32
    assert np.array_equal(f1, f2)
    assert f1[0] == 4.0  # n_frames
    assert 0.0 <= f1[1] <= 1.0 and f1[3] > 0.0  # luma mean, motion
    # single-frame video: zero motion
    single = video_features(frames[:1][:, :, :, None].repeat(3, axis=3))
    assert single[0] == 1.0 and single[3] == 0.0


def test_gif_local_palette_and_transparency():
    """Self-review r5 fixes: (a) a frame's indices expand through ITS OWN
    palette even when a later frame carries a tiny local color table;
    (b) GCE-transparent pixels preserve the canvas (delta-frame GIFs)."""
    from pyspark_codesearch.operators.media_codecs import (
        _lzw_encode,
        decode_gif,
        encode_gif,
    )
    import struct as _s

    base = np.full((4, 4), 200, dtype=np.uint8)  # index 200 in global gray pal
    payload = bytearray(encode_gif(base))
    del payload[-1]  # trailer

    # frame 2: full-frame, 4-entry LOCAL palette (min_code_size 2),
    # GCE transparency on index 0 -> only index-1 pixels (red) overwrite
    idx = np.zeros((4, 4), dtype=np.uint8)
    idx[0, :] = 1
    payload += bytes([0x21, 0xF9, 0x04, 0x01]) + _s.pack("<H", 4) + bytes([0x00, 0x00])
    payload += b"\x2C" + _s.pack("<HHHH", 0, 0, 4, 4) + bytes([0x80 | 0x01])  # local table, 4 entries
    payload += bytes([0, 0, 0, 255, 0, 0, 0, 0, 0, 0, 0, 0])  # pal: black, red, pad, pad
    payload.append(2)  # LZW min code size for 4-entry palette
    comp = _lzw_encode(idx.tobytes(), 2)
    payload.append(len(comp)); payload += comp; payload.append(0)
    payload.append(0x3B)

    dec = decode_gif(bytes(payload))
    assert dec.shape == (2, 4, 4, 3)
    # frame 1: global grayscale palette -> gray 200 everywhere
    assert (dec[0] == 200).all()
    # frame 2: row 0 red from the LOCAL palette, rows 1-3 preserved gray
    assert (dec[1, 0] == [255, 0, 0]).all()
    assert (dec[1, 1:] == 200).all()


def test_gif_index_outside_local_palette_rejected():
    from pyspark_codesearch.operators.media_codecs import (
        _lzw_encode,
        decode_gif,
    )
    import struct as _s

    payload = bytearray(b"GIF89a") + _s.pack("<HHBBB", 2, 2, 0x00, 0, 0)  # no GCT
    payload += b"\x2C" + _s.pack("<HHHH", 0, 0, 2, 2) + bytes([0x80])  # local, 2 entries
    payload += bytes([0, 0, 0, 255, 255, 255])
    payload.append(2)
    comp = _lzw_encode(bytes([0, 1, 3, 0]), 2)  # index 3 > palette size 2
    payload.append(len(comp)); payload += comp; payload.append(0)
    payload.append(0x3B)
    with pytest.raises(MediaDecodeError):
        decode_gif(bytes(payload))


# ------------------------------------------------- round-6 hardening
def test_lzw_bomb_bounded():
    """A crafted LZW stream expanding far past the declared pixel count
    aborts with MediaDecodeError instead of exhausting memory (ADVICE r5:
    classic LZW bomb — decode used to run to completion before the w*h
    truncation)."""
    from pyspark_codesearch.operators.media_codecs import _lzw_decode, _lzw_encode

    big = bytes(200_000)  # expands to 200k bytes from a few hundred
    comp = _lzw_encode(big, 8)
    assert _lzw_decode(comp, 8, max_out=200_000) == big  # legit size passes
    with pytest.raises(MediaDecodeError):
        _lzw_decode(comp, 8, max_out=1_000)  # declared 1k pixels -> bomb


def test_gif_lzw_oversize_frame_rejected():
    """decode_gif passes w*h into the LZW bound: a 2x2 frame whose stream
    expands to 100k pixels is rejected at the codec layer."""
    import struct as _s

    from pyspark_codesearch.operators.media_codecs import (
        _lzw_encode,
        decode_gif,
    )

    payload = bytearray(b"GIF89a") + _s.pack("<HHBBB", 2, 2, 0xF7, 0, 0)
    payload += bytes(v for i in range(256) for v in (i, i, i))
    payload += b"\x2C" + _s.pack("<HHHH", 0, 0, 2, 2) + b"\x00" + bytes([8])
    comp = _lzw_encode(bytes(100_000), 8)
    for i in range(0, len(comp), 255):
        chunk = comp[i : i + 255]
        payload.append(len(chunk)); payload += chunk
    payload.append(0); payload.append(0x3B)
    with pytest.raises(MediaDecodeError):
        decode_gif(bytes(payload))


def test_gif_transparent_index_outside_palette_ok():
    """ADVICE r5: optimizers emit GCE transparent indices past the color
    table (transparent pixels never consult the palette) — opaque-only
    bounds check accepts them; an OPAQUE out-of-range index still fails."""
    import struct as _s

    from pyspark_codesearch.operators.media_codecs import (
        _lzw_encode,
        decode_gif,
    )

    def frame2(idx_bytes, transp):
        payload = bytearray(b"GIF89a") + _s.pack("<HHBBB", 2, 2, 0x00, 0, 0)
        payload += bytes([0x21, 0xF9, 0x04, 0x01, 0, 0, transp, 0x00])
        payload += b"\x2C" + _s.pack("<HHHH", 0, 0, 2, 2) + bytes([0x80])  # local, 2 entries
        payload += bytes([10, 20, 30, 200, 100, 50])
        payload.append(2)
        comp = _lzw_encode(idx_bytes, 2)
        payload.append(len(comp)); payload += comp; payload.append(0)
        payload.append(0x3B)
        return bytes(payload)

    # transparent index 3 lies OUTSIDE the 2-entry palette: decodes fine,
    # transparent pixels keep the (zero) canvas
    dec = decode_gif(frame2(bytes([0, 1, 3, 1]), transp=3))
    assert dec.shape == (1, 2, 2, 3)
    assert (dec[0, 0, 0] == [10, 20, 30]).all()
    assert (dec[0, 1, 0] == [0, 0, 0]).all()  # transparent -> canvas
    # an opaque out-of-range index is still a decode error
    with pytest.raises(MediaDecodeError):
        decode_gif(frame2(bytes([0, 1, 3, 1]), transp=2))


def test_png_palette_roundtrip(rng):
    """Color type 3 (PLTE) decodes: indices expand to palette RGB."""
    from pyspark_codesearch.operators.media_codecs import (
        decode_image,
        encode_png_palette,
    )

    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (9, 13), dtype=np.uint8)
    dec = decode_png(encode_png_palette(idx, pal))
    assert dec.shape == (9, 13, 3)
    assert np.array_equal(dec, pal[idx])
    assert decode_image(encode_png_palette(idx, pal)).shape == (9, 13, 3)
    # index past the palette is a decode error
    with pytest.raises(MediaDecodeError):
        decode_png(encode_png_palette(np.full((2, 2), 16, dtype=np.uint8), pal))


def test_gif_disposal_restore_to_background():
    """Disposal method 2: the frame rect restores to the background
    color before the next image composites (previously ignored)."""
    import struct as _s

    from pyspark_codesearch.operators.media_codecs import (
        _lzw_encode,
        decode_gif,
        encode_gif,
    )

    base = np.full((6, 6), 200, dtype=np.uint8)
    # disposal=2 on every frame; bg index 0 -> gray 0 (grayscale GCT)
    payload = bytearray(encode_gif(base, disposal=2))
    del payload[-1]
    # second image: partial 2x2 patch at (1,1), do-not-dispose GCE
    patch = np.full((2, 2), 90, dtype=np.uint8)
    payload += bytes([0x21, 0xF9, 0x04, 0x00, 0, 0, 0x00, 0x00])
    payload += b"\x2C" + _s.pack("<HHHH", 1, 1, 2, 2) + b"\x00" + bytes([8])
    comp = _lzw_encode(patch.tobytes(), 8)
    payload.append(len(comp)); payload += comp; payload.append(0)
    payload.append(0x3B)

    dec = decode_gif(bytes(payload))
    assert dec.shape == (2, 6, 6, 3)
    assert (dec[0] == 200).all()  # frame 1 rendered before disposal
    # frame 2: canvas was restored to bg (0), only the patch is 90
    expect = np.zeros((6, 6), dtype=np.uint8)
    expect[1:3, 1:3] = 90
    assert np.array_equal(dec[1, :, :, 0], expect)
    # without disposal, frame 2 would composite onto gray 200
    payload_nd = bytearray(encode_gif(base, disposal=0))
    del payload_nd[-1]
    payload_nd += bytes([0x21, 0xF9, 0x04, 0x00, 0, 0, 0x00, 0x00])
    payload_nd += b"\x2C" + _s.pack("<HHHH", 1, 1, 2, 2) + b"\x00" + bytes([8])
    payload_nd.append(len(comp)); payload_nd += comp; payload_nd.append(0)
    payload_nd.append(0x3B)
    dec_nd = decode_gif(bytes(payload_nd))
    assert (dec_nd[1, 0, :, 0] == 200).all()


def test_gif_disposal_restore_to_previous():
    """Disposal method 3: the frame rect reverts to its PRE-composite
    contents before the next image (previously treated as
    do-not-dispose)."""
    import struct as _s

    from pyspark_codesearch.operators.media_codecs import (
        _lzw_encode,
        decode_gif,
        encode_gif,
    )

    def image(left, top, arr, disposal):
        comp = _lzw_encode(arr.tobytes(), 8)
        out = bytearray([0x21, 0xF9, 0x04, (disposal & 0x07) << 2, 0, 0, 0x00, 0x00])
        out += b"\x2C" + _s.pack("<HHHH", left, top, arr.shape[1], arr.shape[0])
        out += b"\x00" + bytes([8])
        out.append(len(comp)); out += comp; out.append(0)
        return out

    base = np.full((6, 6), 200, dtype=np.uint8)
    payload = bytearray(encode_gif(base, disposal=0))
    del payload[-1]  # strip trailer; append more images
    # image 2: 2x2 patch of 90 at (1,1), disposal=3 -> restores after
    payload += image(1, 1, np.full((2, 2), 90, dtype=np.uint8), 3)
    # image 3: 2x2 patch of 50 at (3,3), do-not-dispose
    payload += image(3, 3, np.full((2, 2), 50, dtype=np.uint8), 0)
    payload.append(0x3B)

    dec = decode_gif(bytes(payload))
    assert dec.shape == (3, 6, 6, 3)
    assert (dec[0] == 200).all()
    # frame 2 shows the patch composited
    expect2 = np.full((6, 6), 200, dtype=np.uint8)
    expect2[1:3, 1:3] = 90
    assert np.array_equal(dec[1, :, :, 0], expect2)
    # frame 3: the (1,1) patch REVERTED to 200 (restore-to-previous),
    # only the (3,3) patch shows — disposal-as-0 would leave 90 behind
    expect3 = np.full((6, 6), 200, dtype=np.uint8)
    expect3[3:5, 3:5] = 50
    assert np.array_equal(dec[2, :, :, 0], expect3)
