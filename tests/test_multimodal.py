"""Multimodal stage plumbing: schemas, actor signatures, determinism, stub gating."""

import pyarrow as pa
import pytest
import ray.data

from registry_address_matcher_ray.stages import multimodal as M


@pytest.fixture(scope="module")
def image_ds(ray_session):
    return ray.data.from_arrow(M.synth_media(50, "image", seed=1))


def test_decode_images_schema_and_determinism(image_ds, ray_session):
    out1 = M.decode_images(image_ds, dim=16).to_pandas().sort_values("media_id")
    out2 = M.decode_images(image_ds, dim=16).to_pandas().sort_values("media_id")
    assert len(out1) == 50
    assert all(len(f) == 16 for f in out1["features"])
    # deterministic across runs (the per-payload invariant for the stub codec)
    for a, b in zip(out1["features"], out2["features"]):
        assert (a == b).all()
    # original metadata passes through
    assert {"media_id", "media_type", "payload", "width", "height"} <= set(out1.columns)


def test_resize_rewrites_metadata(image_ds, ray_session):
    out = M.resize_images(image_ds, target=(224, 224)).to_pandas()
    assert (out["width"] == 224).all() and (out["height"] == 224).all()
    assert out["resized_digest"].map(len).eq(32).all()


def test_audio_features(ray_session):
    ds = ray.data.from_arrow(M.synth_media(30, "audio", seed=2))
    out = M.audio_features(ds).to_pandas()
    assert len(out) == 30
    assert all(len(f) == 16 * 8 for f in out["audio_features"])


def test_frame_sampling_one_to_many(ray_session):
    tbl = M.synth_media(20, "video", seed=3)
    ds = ray.data.from_arrow(tbl)
    out = M.sample_frames(ds, every_ms=5000, max_frames=4).to_pandas()
    # every video emits >=1 and <=max_frames rows
    counts = out.groupby("media_id").size()
    assert len(counts) == 20
    assert counts.between(1, 4).all()
    expected = {
        mid: min(4, max(1, -(-int(d) // 5000)))
        for mid, d in zip(tbl.column("media_id").to_pylist(),
                          tbl.column("duration_ms").to_pylist())
    }
    assert counts.to_dict() == expected


def test_real_codec_constructs(ray_session):
    # image/audio/video real codecs all construct: images/audio are fully
    # library-free; video handles MJPEG-AVI and raises per-payload for MP4
    M.ImageDecodeActor(codec="real")
    M.FrameSampleActor(codec="real")
    with pytest.raises(ValueError):
        M.ImageDecodeActor(codec="bogus")


# ------------------------------------------------------- real (library-free) codecs


def test_codec_ppm_roundtrip():
    import numpy as np

    from registry_address_matcher_ray.functions import codecs

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(13, 7, 3), dtype=np.uint8)
    assert np.array_equal(codecs.decode_image(codecs.encode_ppm(img)), img)


def test_codec_bmp_roundtrip_padded_rows():
    import numpy as np

    from registry_address_matcher_ray.functions import codecs

    rng = np.random.default_rng(5)
    for w in (5, 6, 7, 8):  # exercise every 4-byte row-padding case
        img = rng.integers(0, 256, size=(9, w, 3), dtype=np.uint8)
        assert np.array_equal(codecs.decode_image(codecs.encode_bmp(img)), img)


def test_codec_wav_roundtrip():
    import numpy as np

    from registry_address_matcher_ray.functions import codecs

    samples = (np.sin(np.arange(4000) / 30.0) * 25000).astype(np.int16)
    dec, rate = codecs.decode_wav(codecs.encode_wav(samples, 22050))
    assert rate == 22050
    assert np.allclose(dec * 32768.0, samples, atol=0.51)


def test_codec_rejects_unknown_and_truncated_formats():
    import pytest

    from registry_address_matcher_ray.functions import codecs

    with pytest.raises(ValueError, match="unsupported image format"):
        codecs.decode_image(b"GIF89a not supported")
    # JPEG now dispatches to functions/jpeg.py; malformed bytes still raise
    with pytest.raises(ValueError):
        codecs.decode_image(b"\xff\xd8\xff\xe0 jpeg-ish")


def test_real_image_decode_features(ray_session):
    import numpy as np
    import ray.data

    from registry_address_matcher_ray.stages import multimodal as M
    from registry_address_matcher_ray.functions import codecs

    tbl = M.synth_decodable_media(12, "ppm", seed=7)
    ds = ray.data.from_arrow(tbl).repartition(3)
    out = M.decode_images(ds, codec="real", dim=64).to_pandas()
    assert len(out) == 12
    # features are REAL functions of the pixels: recompute one row exactly
    row = out.iloc[0]
    img = codecs.decode_image(tbl.column("payload")[0].as_py())
    f = np.asarray(row["features"], dtype=np.float32)
    assert f.shape == (64,)
    assert f[0] == np.float32(img.shape[1] / 4096.0)
    assert f[1] == np.float32(img.shape[0] / 4096.0)
    assert abs(f[2] - img[:, :, 0].astype(np.float32).mean() / 255.0) < 1e-6


def test_real_resize_roundtrip(ray_session):
    import numpy as np
    import ray.data

    from registry_address_matcher_ray.stages import multimodal as M
    from registry_address_matcher_ray.functions import codecs

    tbl = M.synth_decodable_media(6, "bmp", seed=11)
    out = M.resize_images(ray.data.from_arrow(tbl), codec="real",
                          target=(16, 12)).to_pandas()
    for _, r in out.iterrows():
        img = codecs.decode_image(r["resized_payload"])
        assert img.shape == (12, 16, 3)
    # resized pixels equal a direct nearest-neighbor resize of the source
    src = codecs.decode_image(tbl.column("payload")[0].as_py())
    got0 = codecs.decode_image(
        out[out["media_id"] == tbl.column("media_id")[0].as_py()]
        .iloc[0]["resized_payload"])
    assert np.array_equal(got0, codecs.resize_nearest(src, 16, 12))


def test_real_audio_features(ray_session):
    import numpy as np
    import ray.data

    from registry_address_matcher_ray.stages import multimodal as M

    tbl = M.synth_decodable_media(8, "wav", seed=13)
    out = M.audio_features(ray.data.from_arrow(tbl), codec="real").to_pandas()
    assert len(out) == 8
    feats = np.stack([np.asarray(f) for f in out["audio_features"]])
    assert feats.shape == (8, 128)
    # a pure sine has energy: features must be nonzero and differ across rows
    assert (feats.sum(axis=1) > 0).all()
    assert len({tuple(np.round(f, 4)) for f in feats}) == 8


def test_real_video_mjpeg_avi_end_to_end(ray_session):
    """codec='real' genuinely decodes MJPEG-AVI frames: the digest is over
    DECODED pixels, so re-encoding the same frames at a different quality
    keeps the grid but changes digests only if pixels changed."""
    import hashlib

    import numpy as np
    import ray.data

    from registry_address_matcher_ray.functions.avi import encode_mjpeg_avi
    from registry_address_matcher_ray.stages import multimodal as M

    tbl = M.synth_decodable_media(6, "avi", seed=9)
    out = M.sample_frames(ray.data.from_arrow(tbl), codec="real",
                          every_ms=400, max_frames=4).to_pandas()
    assert len(out) > 0
    assert set(out["media_id"]) == set(tbl.column("media_id").to_pylist())
    # digest must equal sha256 of the decoded frame pixels (recompute one)
    from registry_address_matcher_ray.functions.avi import decode_mjpeg_avi

    first = tbl.column("media_id").to_pylist()[0]
    usec, frames = decode_mjpeg_avi(tbl.column("payload").to_pylist()[0])
    row = out[out["media_id"] == first].iloc[0]
    fi = min(int(row["frame_ts_ms"]) * 1000 // usec, len(frames) - 1)
    assert row["frame_digest"] == hashlib.sha256(frames[fi].tobytes()).digest()


def test_real_video_mp4_raises_per_payload(ray_session):
    import pyarrow as pa
    import pytest

    from registry_address_matcher_ray.stages import multimodal as M

    actor = M.FrameSampleActor(codec="real")  # construction OK now
    batch = pa.table({
        "media_id": ["m0"], "media_type": ["video/mp4"],
        "payload": [b"\x00\x00\x00\x18ftypisom" + b"\x00" * 16],
        "duration_ms": pa.array([1000], pa.int32()),
    })
    with pytest.raises(ValueError, match="libav"):
        actor(batch)


def test_png_roundtrip_all_filters():
    """encode_png -> decode_png is pixel-exact for every scanline filter
    type (0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth) and odd shapes."""
    import numpy as np

    from registry_address_matcher_ray.functions import codecs

    rng = np.random.default_rng(21)
    for ft in range(5):
        for (h, w) in [(1, 1), (2, 3), (13, 7), (48, 31)]:
            img = rng.integers(0, 256, (h, w, 3), np.uint8)
            enc = codecs.encode_png(img, filter_type=ft)
            assert (codecs.decode_png(enc) == img).all()
            assert (codecs.decode_image(enc) == img).all()


def test_png_color_types_and_gates():
    """Gray / palette / RGBA / gray+alpha decode to the documented RGB
    projection; 16-bit, interlaced and CRC-corrupt files raise."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from registry_address_matcher_ray.functions import codecs

    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

    def mk(ctype, raw_rows, extra=b"", depth=8, interlace=0):
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, ctype, 0, 0, interlace)
        raw = b"".join(b"\x00" + r for r in raw_rows)
        return (sig + chunk(b"IHDR", ihdr) + extra
                + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))

    g = np.array([[0, 128], [255, 7]], np.uint8)
    d = codecs.decode_png(mk(0, [g[0].tobytes(), g[1].tobytes()]))
    assert (d[:, :, 0] == g).all() and (d[:, :, 2] == g).all()

    pal = np.array([[10, 20, 30], [200, 100, 50], [0, 0, 255]], np.uint8)
    idx = np.array([[0, 1], [2, 1]], np.uint8)
    d = codecs.decode_png(mk(3, [idx[0].tobytes(), idx[1].tobytes()],
                             extra=chunk(b"PLTE", pal.tobytes())))
    assert (d == pal[idx]).all()

    rgba = np.arange(16, dtype=np.uint8).reshape(2, 2, 4)
    d = codecs.decode_png(mk(6, [rgba[0].tobytes(), rgba[1].tobytes()]))
    assert (d == rgba[:, :, :3]).all()

    ga = np.arange(8, dtype=np.uint8).reshape(2, 2, 2)
    d = codecs.decode_png(mk(4, [ga[0].tobytes(), ga[1].tobytes()]))
    assert (d[:, :, 0] == ga[:, :, 0]).all()

    with pytest.raises(ValueError, match="bit depth"):
        codecs.decode_png(mk(2, [b"\x00" * 12, b"\x00" * 12], depth=16))
    with pytest.raises(ValueError, match="interlace"):
        codecs.decode_png(mk(2, [b"\x00" * 6, b"\x00" * 6], interlace=1))
    bad = bytearray(codecs.encode_png(np.zeros((2, 2, 3), np.uint8)))
    bad[-5] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        codecs.decode_png(bytes(bad))


def test_real_decode_stage_handles_png(ray_session):
    """The actor-pool decode stage consumes PNG payloads (all 5 filters via
    the synth cycle) and features are pixel-exact functions of the image."""
    import numpy as np
    import ray.data

    from registry_address_matcher_ray.functions import codecs
    from registry_address_matcher_ray.stages import multimodal as M

    tbl = M.synth_decodable_media(10, "png", seed=17)
    out = (M.decode_images(ray.data.from_arrow(tbl), codec="real", dim=64)
           .to_pandas().set_index("media_id"))
    assert len(out) == 10
    for i in range(10):
        mid = tbl.column("media_id")[i].as_py()
        img = codecs.decode_png(tbl.column("payload")[i].as_py())
        f = np.asarray(out.loc[mid, "features"], dtype=np.float32)
        assert f[0] == np.float32(img.shape[1] / 4096.0)
        assert abs(f[2] - img[:, :, 0].astype(np.float32).mean() / 255.0) \
            < 1e-6


def test_real_video_zero_frame_avi_yields_no_rows(ray_session):
    import struct

    import pyarrow as pa

    from registry_address_matcher_ray.stages import multimodal as M

    # well-formed RIFF/AVI with an empty movi LIST: no frames to sample
    movi = b"LIST" + struct.pack("<I", 4) + b"movi"
    body = b"AVI " + movi
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    actor = M.FrameSampleActor(codec="real")
    out = actor(pa.table({
        "media_id": ["v0"], "media_type": ["video/x-msvideo"],
        "payload": [payload], "duration_ms": pa.array([0], pa.int32()),
    }))
    assert out.num_rows == 0


def test_avi_fps_zero_rejected():
    import numpy as np
    import pytest

    from registry_address_matcher_ray.functions.avi import encode_mjpeg_avi

    with pytest.raises(ValueError, match="fps"):
        encode_mjpeg_avi([np.zeros((8, 8, 3), np.uint8)], fps=0)


def test_decode_images_dri_parallel_stage(ray_session):
    """The actor-pool decode stage with dri_workers produces identical
    features to the serial stage on a DRI-bearing fixture."""
    import ray.data

    from registry_address_matcher_ray.stages import multimodal as MM

    t = MM.synth_decodable_media(4, "jpeg_dri", seed=9)
    ds = ray.data.from_arrow(t)
    ser = (MM.decode_images(ds, codec="real", dim=16)
           .to_pandas().sort_values("media_id").reset_index(drop=True))
    par = (MM.decode_images(ds, codec="real", dim=16, dri_workers=2)
           .to_pandas().sort_values("media_id").reset_index(drop=True))
    import numpy as np

    assert list(ser["media_id"]) == list(par["media_id"])
    for a, b in zip(ser["features"], par["features"]):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_avg_pool_properties():
    import numpy as np

    from registry_address_matcher_ray.stages.multimodal import _avg_pool

    # constant image -> constant grid at any size (incl. upsample path)
    for shape in ((40, 56), (5, 3)):
        g = _avg_pool(np.full(shape, 7.0, np.float32), 9, 8)
        assert g.shape == (8, 9)
        assert np.allclose(g, 7.0)
    # mean is preserved when the grid divides the image evenly
    rng = np.random.default_rng(0)
    img = rng.random((16, 18)).astype(np.float32)
    g = _avg_pool(img, 9, 8)
    assert abs(g.mean() - img.mean()) < 1e-6


def test_image_hashes_real_and_fake(ray_session):
    import numpy as np

    from registry_address_matcher_ray.functions import codecs

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(32, 48, 3)).astype(np.uint8)
    tbl = pa.table({
        "media_id": ["a", "b"],
        "payload": pa.array([codecs.encode_ppm(img),
                             codecs.encode_bmp(img)], pa.binary()),
    })
    out = (M.image_hashes(ray.data.from_arrow(tbl), codec="real")
           .to_pandas().sort_values("media_id"))
    # identical pixels through different containers -> identical hashes
    assert out["dhash64"].iloc[0] == out["dhash64"].iloc[1]
    assert out["ahash64"].iloc[0] == out["ahash64"].iloc[1]
    # fake codec: deterministic payload-derived plumbing path
    f1 = M.image_hashes(ray.data.from_arrow(tbl), codec="fake").to_pandas()
    f2 = M.image_hashes(ray.data.from_arrow(tbl), codec="fake").to_pandas()
    assert list(f1["dhash64"]) == list(f2["dhash64"])


def test_image_neardup_planted(ray_session):
    import numpy as np

    from registry_address_matcher_ray.functions import codecs

    rng = np.random.default_rng(5)
    rows = []
    for i in range(8):
        img = rng.integers(0, 256, size=(40, 56, 3)).astype(np.uint8)
        rows.append((f"orig-{i}", codecs.encode_ppm(img)))
        # near-dup = brightness jitter re-encoded in a DIFFERENT container
        jit = np.clip(img.astype(np.int16)
                      + rng.integers(-2, 3, img.shape), 0, 255
                      ).astype(np.uint8)
        rows.append((f"dup-{i}", codecs.encode_bmp(jit)))
    tbl = pa.table({"media_id": [r[0] for r in rows],
                    "payload": pa.array([r[1] for r in rows], pa.binary())})
    ds = ray.data.from_arrow(tbl).repartition(4)
    out = M.image_neardup(ds, codec="real", hamming_threshold=6)
    pairs = out["pairs"].to_pandas()
    got = {tuple(sorted((a, b))) for a, b in zip(pairs.id_a, pairs.id_b)}
    want = {tuple(sorted((f"orig-{i}", f"dup-{i}"))) for i in range(8)}
    assert got == want                       # full recall, no false pairs
    assert (pairs["hamming"] <= 6).all()
    assert out["clusters"].count() == 16     # 8 clusters x 2 members
    # partition invariance of the pair set
    out2 = M.image_neardup(ray.data.from_arrow(tbl).repartition(7),
                           codec="real", hamming_threshold=6)
    p2 = out2["pairs"].to_pandas()
    assert {tuple(sorted((a, b)))
            for a, b in zip(p2.id_a, p2.id_b)} == want


def test_image_neardup_threshold_bound(ray_session):
    tbl = pa.table({"media_id": ["x"], "payload": pa.array([b""], pa.binary())})
    with pytest.raises(ValueError, match="hamming_threshold"):
        M.image_neardup(ray.data.from_arrow(tbl), hamming_threshold=8)


def _broadband_clip(rng, n=8000, segs=8):
    """Non-stationary broadband test audio: each eighth gets its own
    spectral envelope (stationary clips would make all 8 time segments
    statistically identical and collapse the fingerprint's information)."""
    import numpy as np

    out = np.zeros(n)
    sl = n // segs
    for s in range(segs):
        spec = np.fft.rfft(rng.normal(0, 1, sl))
        freqs = np.linspace(0, 1, len(spec))
        env = np.exp(-((freqs - rng.uniform(0.05, 0.7)) ** 2)
                     / (2 * rng.uniform(0.03, 0.25) ** 2))
        seg = np.fft.irfft(spec * env, sl)
        out[s * sl:(s + 1) * sl] = seg / max(np.abs(seg).max(), 1e-9)
    return 0.4 * out


def test_audio_hash_volume_invariance_and_separation():
    import numpy as np

    from registry_address_matcher_ray.functions import codecs
    from registry_address_matcher_ray.functions.textfns import hamming64

    rng = np.random.default_rng(7)
    actor = M.AudioHashActor(codec="real")

    def wav(sig):
        return codecs.encode_wav(
            (np.clip(sig, -1, 1) * 32000).astype(np.int16), 16000)

    base = _broadband_clip(rng)
    h = actor._hash(wav(base))
    # volume scaling: near-identical fingerprint (int16 quantization only)
    assert hamming64(h, actor._hash(wav(0.5 * base))) <= 2
    # light noise + re-encode: small distance
    dup = 0.6 * base + rng.normal(0, 0.002, base.shape)
    assert hamming64(h, actor._hash(wav(dup))) <= 6
    # a different clip: far
    other = actor._hash(wav(_broadband_clip(rng)))
    assert hamming64(h, other) > 8
    # empty audio -> 0 sentinel
    assert actor._hash(wav(np.zeros(16))) == 0


def test_audio_neardup_planted(ray_session):
    import numpy as np

    from registry_address_matcher_ray.functions import codecs
    from registry_address_matcher_ray.functions.flac import encode_flac

    rng = np.random.default_rng(4)
    rows = []
    for i in range(8):
        base = _broadband_clip(rng)
        rows.append((f"orig-{i}", codecs.encode_wav(
            (np.clip(base, -1, 1) * 32000).astype(np.int16), 16000)))
        # near-dup: volume-scaled + lightly noised, re-encoded as FLAC
        dup = 0.6 * base + rng.normal(0, 0.002, base.shape)
        rows.append((f"dup-{i}", encode_flac(
            (np.clip(dup, -1, 1) * 32000).astype(np.int16), 16000)))
    tbl = pa.table({"media_id": [r[0] for r in rows],
                    "payload": pa.array([r[1] for r in rows], pa.binary())})
    out = M.audio_neardup(ray.data.from_arrow(tbl).repartition(4),
                          codec="real", hamming_threshold=6)
    pairs = out["pairs"].to_pandas()
    got = {tuple(sorted((a, b))) for a, b in zip(pairs.id_a, pairs.id_b)}
    want = {tuple(sorted((f"orig-{i}", f"dup-{i}"))) for i in range(8)}
    assert got == want
    assert out["clusters"].count() == 16


def _scene_frames(rng, k=12, h=48, w=64):
    """Structured video frames: smooth random field + a moving bright bar
    (pure-noise frames would make adjacent dHash cells near-ties)."""
    import numpy as np

    low = rng.integers(30, 226, size=(h // 8, w // 8, 3)).astype(np.float32)
    base = np.kron(low, np.ones((8, 8, 1))).astype(np.int16)
    frames = []
    for t in range(k):
        f = base + rng.integers(-4, 5, base.shape)
        f[:, (t * 4) % w:(t * 4) % w + 6] += 70
        frames.append(np.clip(f, 0, 255).astype(np.uint8))
    return frames


def test_video_hash_majority_and_sentinel():
    import numpy as np

    from registry_address_matcher_ray.functions.avi import encode_mjpeg_avi
    from registry_address_matcher_ray.functions.textfns import hamming64

    rng = np.random.default_rng(2)
    fr = _scene_frames(rng)
    actor = M.VideoHashActor(codec="real")
    h1 = actor._hash(encode_mjpeg_avi(fr, fps=10, quality=85))
    # re-encode at a lower quality: majority voting absorbs per-frame flips
    h2 = actor._hash(encode_mjpeg_avi(fr, fps=10, quality=60))
    assert hamming64(h1, h2) <= 4
    # a different scene is far
    h3 = actor._hash(encode_mjpeg_avi(_scene_frames(rng), fps=10))
    assert hamming64(h1, h3) > 8
    # deterministic across calls
    assert h1 == actor._hash(encode_mjpeg_avi(fr, fps=10, quality=85))


def test_video_neardup_planted(ray_session):
    import numpy as np

    from registry_address_matcher_ray.functions.avi import encode_mjpeg_avi

    rng = np.random.default_rng(6)
    rows = []
    for i in range(5):
        fr = _scene_frames(rng)
        rows.append((f"orig-{i}", encode_mjpeg_avi(fr, fps=10, quality=85)))
        # dup: light per-pixel jitter re-encoded at a different quality
        fr2 = [np.clip(f.astype(np.int16) + rng.integers(-2, 3, f.shape),
                       0, 255).astype(np.uint8) for f in fr]
        rows.append((f"dup-{i}", encode_mjpeg_avi(fr2, fps=10, quality=70)))
    tbl = pa.table({"media_id": [r[0] for r in rows],
                    "payload": pa.array([r[1] for r in rows], pa.binary())})
    out = M.video_neardup(ray.data.from_arrow(tbl).repartition(3),
                          codec="real", hamming_threshold=6)
    pairs = out["pairs"].to_pandas()
    got = {tuple(sorted((a, b))) for a, b in zip(pairs.id_a, pairs.id_b)}
    assert got == {tuple(sorted((f"orig-{i}", f"dup-{i}")))
                   for i in range(5)}
    assert out["clusters"].count() == 10
