"""FLAC codec: lossless roundtrips through the fixture encoder, hand-built
streams for decoder paths the encoder never emits (LPC, mid/side, escape
partitions, wasted bits), and the actor-pool audio stage on FLAC payloads."""
import numpy as np
import pytest

from registry_address_matcher_ray.functions import flac
from registry_address_matcher_ray.functions.flac import (
    _Bits, _BitsW, _crc8, _crc16, _utf8_number,
)


def _signal(n=6000, seed=5):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (3000 * np.sin(t / 30) + rng.normal(0, 200, n)).astype(np.int16)


def test_mono_stereo_constant_roundtrip_lossless():
    mono = _signal()
    enc = flac.encode_flac(mono, 16000, block_size=1024)
    pcm, rate, bits = flac.decode_flac_pcm(enc)
    assert (rate, bits) == (16000, 16)
    assert np.array_equal(pcm[:, 0], mono.astype(np.int32))
    assert len(enc) < 2 * len(mono)  # actually compresses

    st = np.stack([mono, (mono // 2 + 100).astype(np.int16)], axis=1)
    pcm2, rate2, _ = flac.decode_flac_pcm(flac.encode_flac(st, 44100, 512))
    assert rate2 == 44100 and np.array_equal(pcm2, st.astype(np.int32))

    c = np.full(3000, -12345, np.int16)
    c[2900:] = 77  # short tail frame + CONSTANT short-circuit
    pcm3, _, _ = flac.decode_flac_pcm(flac.encode_flac(c, 8000, 1000))
    assert np.array_equal(pcm3[:, 0], c.astype(np.int32))


def test_decode_flac_float_contract():
    mono = _signal(2000)
    f, r = flac.decode_flac(flac.encode_flac(mono, 16000))
    assert f.dtype == np.float32 and r == 16000
    assert np.allclose(f, mono / 32768.0, atol=1e-6)


def _stream(subframes_fn, n, chans, ch_code, rate=16000, bps=16):
    """Hand-build a one-frame FLAC stream; subframes_fn(_BitsW) writes the
    subframe bits."""
    out = bytearray(b"fLaC")
    si = _BitsW()
    si.write(n, 16), si.write(n, 16), si.write(0, 24), si.write(0, 24)
    si.write(rate, 20), si.write(chans - 1, 3), si.write(bps - 1, 5)
    si.write(n, 36)
    si.align()
    body = bytes(si.buf) + b"\x00" * 16
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    hw = _BitsW()
    hw.write(0x3FFE, 14), hw.write(0, 1), hw.write(0, 1)
    hw.write(7, 4), hw.write(0, 4), hw.write(ch_code, 4), hw.write(4, 3)
    hw.write(0, 1)
    hw.align()
    head = bytes(hw.buf) + _utf8_number(0) + (n - 1).to_bytes(2, "big")
    head += bytes([_crc8(head)])
    fw = _BitsW()
    subframes_fn(fw)
    fw.align()
    frame = head + bytes(fw.buf)
    return bytes(out + frame + _crc16(frame).to_bytes(2, "big"))


def _write_verbatim(fw, vals, bps=16):
    fw.write(0, 1), fw.write(1, 6), fw.write(0, 1)
    for v in vals:
        fw.write(int(v), bps)


def test_lpc_subframe_decodes():
    """Order-2 LPC with a nonzero shift, residuals rice-coded by the
    fixture writer's own path."""
    n = 64
    rng = np.random.default_rng(7)
    x = np.cumsum(rng.integers(-20, 21, n)).astype(np.int64)
    coef, shift = [5, -2], 2
    res = [int(x[i]) - ((coef[0] * int(x[i - 1])
                         + coef[1] * int(x[i - 2])) >> shift)
           for i in range(2, n)]

    def _sub(fw):
        fw.write(0, 1)
        fw.write(0b100001, 6)        # LPC order 2 (1xxxxx, xxxxx=1)
        fw.write(0, 1)               # no wasted bits
        fw.write(int(x[0]), 16), fw.write(int(x[1]), 16)
        fw.write(4 - 1, 4)           # precision 4 bits
        fw.write(shift, 5)
        fw.write(coef[0], 4), fw.write(coef[1], 4)
        # residual: method 0, porder 0, fixed param 6
        fw.write(0, 2), fw.write(0, 4), fw.write(6, 4)
        for r in res:
            zz = (abs(r) << 1) - (r < 0)
            fw.write(0, zz >> 6), fw.write(1, 1), fw.write(zz, 6)

    pcm, _, _ = flac.decode_flac_pcm(_stream(_sub, n, 1, 0))
    assert np.array_equal(pcm[:, 0], x.astype(np.int32))


@pytest.mark.parametrize("ch_code", [8, 9, 10])
def test_stereo_decorrelation_modes(ch_code):
    n = 16
    left = np.arange(100, 100 + n, dtype=np.int64)
    right = left - np.arange(n) % 5
    side = left - right
    if ch_code == 8:    # left/side
        c0, b0, c1, b1 = left, 16, side, 17
    elif ch_code == 9:  # side/right
        c0, b0, c1, b1 = side, 17, right, 16
    else:               # mid/side
        mid = (left + right) >> 1
        c0, b0, c1, b1 = mid, 16, side, 17

    pcm, _, _ = flac.decode_flac_pcm(_stream(
        lambda fw: (_write_verbatim(fw, c0, b0),
                    _write_verbatim(fw, c1, b1)),
        n, 2, ch_code))
    assert np.array_equal(pcm[:, 0], left.astype(np.int32))
    assert np.array_equal(pcm[:, 1], right.astype(np.int32))


def test_escape_partition_and_wasted_bits():
    n = 8
    x = np.array([4, 8, 12, 400000 << 2, -(123456 << 2), 16, 20, 24],
                 dtype=np.int64)
    # wasted bits: every value divisible by 4 -> wasted=2, stored >> 2
    stored = x >> 2

    def _sub(fw):
        fw.write(0, 1)
        fw.write(0b001000, 6)   # FIXED order 0 (pure residual)
        fw.write(1, 1)          # wasted-bits flag
        fw.write(0, 1), fw.write(1, 1)  # unary 1 zero -> wasted = 2
        # residual: method 0, porder 0, ESCAPE param (0b1111), 22 raw bits
        fw.write(0, 2), fw.write(0, 4), fw.write(0xF, 4), fw.write(22, 5)
        for v in stored:
            fw.write(int(v), 22)

    pcm, _, _ = flac.decode_flac_pcm(_stream(_sub, n, 1, 0, bps=16))
    assert np.array_equal(pcm[:, 0], x.astype(np.int32))


def test_error_paths():
    with pytest.raises(ValueError, match="fLaC magic"):
        flac.decode_flac_pcm(b"RIFFxxxx")
    enc = flac.encode_flac(_signal(500), 16000)
    with pytest.raises(ValueError):
        flac.decode_flac_pcm(enc[:60])  # truncated mid-frame
    with pytest.raises(ValueError, match="16-bit"):
        flac.encode_flac(np.array([70000], dtype=np.int64))


def test_audio_stage_decodes_flac(ray_session):
    """AudioFeatureActor's real path runs FLAC payloads through the same
    dispatch as WAV, with matching features for identical signals."""
    import ray.data

    from registry_address_matcher_ray.functions import codecs
    from registry_address_matcher_ray.stages import multimodal as MM

    t = MM.synth_decodable_media(4, "flac", seed=3)
    ds = ray.data.from_arrow(t)
    out = MM.audio_features(ds, codec="real").to_pandas()
    assert len(out) == 4 and all(len(f) == 128 for f in out["audio_features"])

    # same samples via WAV and FLAC -> identical features
    sig = _signal(4000)
    fw = codecs.decode_audio(codecs.encode_wav(sig, 16000))
    ff = codecs.decode_audio(flac.encode_flac(sig, 16000))
    assert fw[1] == ff[1] and np.allclose(fw[0], ff[0], atol=1e-6)


from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=3000),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    stereo=st.booleans(),
    block=st.sampled_from([64, 256, 1000, 4096]),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_flac_roundtrip_property(n, seed, stereo, block, rate):
    """Any int16 signal (noise, steps, silence mixes) survives
    encode->decode losslessly at any block size."""
    rng = np.random.default_rng(seed)
    kind = seed % 4
    if kind == 0:
        s = rng.integers(-32768, 32768, n, dtype=np.int16)
    elif kind == 1:
        s = np.full(n, int(rng.integers(-32768, 32768)), np.int16)
    elif kind == 2:
        s = (np.cumsum(rng.integers(-50, 51, n))
             .clip(-32768, 32767).astype(np.int16))
    else:
        t = np.arange(n)
        s = (10000 * np.sin(t / max(1, int(rng.integers(2, 60))))
             ).astype(np.int16)
    if stereo:
        s = np.stack([s, s[::-1].copy()], axis=1)
    enc = flac.encode_flac(s, rate, block_size=block)
    pcm, got_rate, bits = flac.decode_flac_pcm(enc)
    assert got_rate == rate and bits == 16
    want = s if s.ndim == 2 else s[:, None]
    assert np.array_equal(pcm, want.astype(np.int32))
