"""JPEG codec (functions/jpeg.py): baseline and progressive encode->decode
roundtrips across subsampling modes and restart intervals, exact
baseline-vs-progressive parity, spec-level byte checks, and the honest
gates (arithmetic/lossless)."""

import struct

import numpy as np
import pytest

from registry_address_matcher_ray.functions import codecs
from registry_address_matcher_ray.functions.jpeg import decode_jpeg, encode_jpeg


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([
        xx * 255 // max(w - 1, 1),
        yy * 255 // max(h - 1, 1),
        (xx + yy) * 255 // max(w + h - 2, 1),
    ], axis=-1).astype(np.uint8)


@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("ri", [0, 3])
def test_roundtrip_smooth_image(sub, ri):
    img = _gradient(40, 56)
    data = encode_jpeg(img, quality=90, subsampling=sub, restart_interval=ri)
    dec = decode_jpeg(data)
    assert dec.shape == img.shape and dec.dtype == np.uint8
    err = np.abs(dec.astype(int) - img.astype(int))
    # 4:2:0 box-averages chroma; smooth gradients stay within a few LSBs
    assert err.max() <= (3 if sub == "444" else 8)
    assert err.mean() < 2.0


def test_roundtrip_nonmultiple_of_8_and_gray():
    img = _gradient(13, 21)  # forces edge padding in both axes
    dec = decode_jpeg(encode_jpeg(img, quality=92))
    assert dec.shape == (13, 21, 3)
    # chroma quantization at q92 allows a few LSBs of error
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 6

    g = (np.mgrid[0:24, 0:24][0] * 10).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(g, quality=95))
    assert d.shape == (24, 24, 3)
    assert (d[..., 0] == d[..., 1]).all() and (d[..., 0] == d[..., 2]).all()
    assert np.abs(d[..., 0].astype(int) - g.astype(int)).max() <= 1


def test_constant_block_is_near_exact():
    # constant image = DC-only blocks; quantization noise is at most 1 LSB
    c = np.full((16, 24, 3), 77, np.uint8)
    d = decode_jpeg(encode_jpeg(c, quality=50))
    assert np.abs(d.astype(int) - c.astype(int)).max() <= 1


def test_noise_roundtrip_exercises_entropy_paths():
    # dense AC coefficients (ZRL, long runs, high categories) at q=95
    rng = np.random.RandomState(11)
    nz = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(nz, quality=95))
    assert d.shape == nz.shape
    # lossy, but must be recognizably the same image
    assert np.abs(d.astype(int) - nz.astype(int)).mean() < 10.0


def test_restart_markers_present_and_parsed():
    img = _gradient(32, 32)
    data = encode_jpeg(img, quality=85, restart_interval=1)
    assert b"\xff\xdd" in data                  # DRI segment
    assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))  # RSTn
    base = decode_jpeg(encode_jpeg(img, quality=85))
    with_rst = decode_jpeg(data)
    # restart markers change framing only, not reconstructed pixels
    assert (base == with_rst).all()


def test_malformed_inputs_raise():
    img = _gradient(16, 16)
    data = bytearray(encode_jpeg(img))
    # a baseline stream relabeled SOF2 is NOT valid progressive (its scan
    # header has Se=63 with Ss=0) — must be a loud error, not garbage pixels
    i = bytes(data).index(b"\xff\xc0")
    data[i + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(data))
    # lossless SOF3 stays gated
    data[i + 1] = 0xC3
    with pytest.raises(ValueError, match="lossless"):
        decode_jpeg(bytes(data))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")


@pytest.mark.parametrize("sub", ["444", "420"])
def test_progressive_decodes_identical_to_baseline(sub):
    """Both encoder modes emit the same quantized coefficients, so the
    reconstructions must match byte-for-byte — this pins every progressive
    path: DC init/refine, AC init (ZRL, EOB), AC refine (correction bits,
    new ±1 coefficients, EOB-run regions)."""
    rng = np.random.RandomState(5)
    for img in (_gradient(40, 56),
                rng.randint(0, 256, (33, 29, 3)).astype(np.uint8),
                np.full((16, 16, 3), 200, np.uint8)):
        base = decode_jpeg(encode_jpeg(img, quality=92, subsampling=sub))
        prog = decode_jpeg(encode_jpeg(img, quality=92, subsampling=sub,
                                       progressive=True))
        assert (base == prog).all()


def test_progressive_gray_and_marker():
    g = (np.mgrid[0:24, 0:24][0] * 10).astype(np.uint8)
    data = encode_jpeg(g, quality=95, progressive=True)
    assert b"\xff\xc2" in data and b"\xff\xc0" not in data[2:4]
    assert data.count(b"\xff\xda") >= 4          # multi-scan script
    assert (decode_jpeg(data) == decode_jpeg(encode_jpeg(g, quality=95))).all()


def test_sof_dimensions_and_sampling_bytes():
    # spec-level check of the emitted SOF0 segment, independent of decode
    img = _gradient(40, 56)
    data = encode_jpeg(img, subsampling="420")
    i = data.index(b"\xff\xc0")
    prec, h, w, nc = struct.unpack(">BHHB", data[i + 4:i + 10])
    assert (prec, h, w, nc) == (8, 40, 56, 3)
    assert data[i + 11] == 0x22                 # Y sampling 2x2
    assert data[i + 14] == 0x11                 # Cb 1x1


def test_decode_image_dispatches_jpeg():
    img = _gradient(16, 16)
    dec = codecs.decode_image(encode_jpeg(img, quality=92))
    assert dec.shape == (16, 16, 3)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 4


def test_headers_without_scan_raise():
    # SOI + tables + SOF but no SOS: must raise, not decode to flat gray
    img = _gradient(16, 16)
    data = encode_jpeg(img)
    cut = data.index(b"\xff\xda")
    with pytest.raises(ValueError, match="no SOS"):
        decode_jpeg(data[:cut] + b"\xff\xd9")


def test_ff_fill_bytes_before_marker_tolerated():
    """T.81 B.1.1.2 allows 0xFF padding before any marker code; pixel output
    must be unchanged when fill bytes are injected between segments."""
    import numpy as np

    from registry_address_matcher_ray.functions.jpeg import (
        decode_jpeg, encode_jpeg,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    payload = encode_jpeg(img, quality=90)
    # inject fill bytes before the first DQT marker (0xFF 0xDB)
    i = payload.index(b"\xff\xdb")
    padded = payload[:i] + b"\xff\xff\xff" + payload[i:]
    assert np.array_equal(decode_jpeg(padded), decode_jpeg(payload))


def test_dri_parallel_decode_pixel_identical():
    """Baseline scans with restart intervals decode segment-parallel on a
    fork pool; output must be bit-identical to the serial path, including
    4:2:0 subsampling and a trailing short segment."""
    import numpy as np

    from registry_address_matcher_ray.functions.jpeg import (
        decode_jpeg, encode_jpeg,
    )

    rng = np.random.default_rng(13)
    for shape, sub, ri in [((96, 80, 3), "444", 7), ((64, 48, 3), "420", 4)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        payload = encode_jpeg(img, quality=80, subsampling=sub,
                              restart_interval=ri)
        serial = decode_jpeg(payload)
        for w in (2, 3):
            assert np.array_equal(serial, decode_jpeg(payload, dri_workers=w))
    # no restarts -> the parallel knob is a no-op, still identical
    img = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
    payload = encode_jpeg(img, quality=80)
    assert np.array_equal(decode_jpeg(payload),
                          decode_jpeg(payload, dri_workers=4))


def test_dri_parallel_truncated_stream_raises_like_serial():
    """A DRI stream missing restart segments must raise identically with
    and without dri_workers — the knob must never turn a hard error into
    silently gray pixels."""
    import numpy as np
    import pytest

    from registry_address_matcher_ray.functions.jpeg import (
        decode_jpeg, encode_jpeg,
    )

    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    payload = bytearray(encode_jpeg(img, quality=80, restart_interval=4))
    # drop the last restart segment: truncate at the final RST marker
    last_rst = max(payload.rfind(bytes([0xFF, 0xD0 + i])) for i in range(8))
    truncated = bytes(payload[:last_rst]) + b"\xff\xd9"
    with pytest.raises(ValueError, match="restart segment"):
        decode_jpeg(truncated)
    with pytest.raises(ValueError, match="restart segment"):
        decode_jpeg(truncated, dri_workers=3)
