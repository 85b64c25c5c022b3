"""Multimodal (image/audio/video) stages: opaque ``binary`` payload columns with
typed metadata, processed by actor-pool ``map_batches`` stages.

The reference is text-only, but a 100 TB training-data pipeline carries media
payloads. Design contract here:

- payloads are opaque ``pa.binary()`` columns plus typed metadata columns
  (``media_type:string``, ``width/height:int32``, ``duration_ms:int32`` …) — blocks
  stay Arrow end-to-end, the object store handles the bytes;
- every stage is a callable CLASS on an actor pool: codec/model setup happens once
  per actor in ``__init__``, per-batch work in ``__call__``;
- batch sizes are SMALL (default 32) because each row may carry megabytes — batch
  bytes × concurrency must fit worker heaps;
- ``codec="fake"`` (default) derives deterministic pseudo-pixels / pseudo-samples
  from a SHA-256 of the payload (stable across runs and parallelism — testable
  plumbing for formats whose codecs aren't in this container);
- ``codec="real"`` GENUINELY decodes the library-free formats via
  ``functions/codecs.py`` — PPM(P6)/24-bit-BMP/8-bit-PNG pixels (PNG via
  stdlib zlib + numpy scanline unfiltering, all 5 filter types), JPEG
  (baseline SOF0 AND progressive SOF2, 4:4:4/4:2:2/4:2:0, restart
  markers — ``functions/jpeg.py``; arithmetic/lossless still raise) and
  PCM16 WAV samples — and computes real
  features (channel stats + grayscale grid; framed FFT band energies).
  Video frame sampling genuinely decodes MJPEG-AVI containers
  (``functions/avi.py``); MP4 and non-MJPEG codecs raise ``ValueError``
  per payload — marking exactly where libav plugs in.
"""

from __future__ import annotations

import hashlib
from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

IMAGE_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("media_type", pa.string()),      # e.g. "image/jpeg"
    ("payload", pa.binary()),
    ("width", pa.int32()),
    ("height", pa.int32()),
])

AUDIO_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("media_type", pa.string()),      # e.g. "audio/wav"
    ("payload", pa.binary()),
    ("sample_rate", pa.int32()),
    ("duration_ms", pa.int32()),
])

VIDEO_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("media_type", pa.string()),      # e.g. "video/mp4"
    ("payload", pa.binary()),
    ("duration_ms", pa.int32()),
    ("fps", pa.float32()),
])


def _fake_floats(payload: bytes, n: int, tag: bytes) -> np.ndarray:
    """Deterministic pseudo-signal from payload bytes (stub for a real codec)."""
    out = np.empty(n, dtype=np.float32)
    filled = 0
    counter = 0
    seed = hashlib.sha256(tag + payload).digest()
    while filled < n:
        block = hashlib.sha256(seed + counter.to_bytes(4, "big")).digest()
        vals = np.frombuffer(block, dtype=np.uint8).astype(np.float32) / 255.0
        take = min(len(vals), n - filled)
        out[filled:filled + take] = vals[:take]
        filled += take
        counter += 1
    return out


class _MediaActor:
    """Base: validates codec availability once per actor (the __init__ contract)."""

    #: set False in subclasses whose real path needs an external library
    _REAL_SUPPORTED = True

    def __init__(self, codec: str = "fake"):
        if codec == "real" and not self._REAL_SUPPORTED:
            raise NotImplementedError(
                "real video container codecs (libav) are not available in "
                "this environment; plug the decoder in here"
            )
        if codec not in ("fake", "real"):
            raise ValueError(f"unknown codec {codec!r}")
        self.codec = codec


class ImageDecodeActor(_MediaActor):
    """payload -> fixed-size feature embedding (decode + feature-extract stub).

    Output adds ``features: list<float32>[dim]``; real implementation would decode
    pixels and run a vision encoder loaded once in ``__init__``.
    """

    def __init__(self, codec: str = "fake", dim: int = 64,
                 dri_workers: int | None = None):
        super().__init__(codec)
        if codec == "real" and dim < 9:
            raise ValueError("real feature vector needs dim >= 9")
        self.dim = dim
        #: >1 fans baseline-JPEG restart segments across a per-actor fork
        #: pool (functions/jpeg.py): size the map_batches ``num_cpus`` to
        #: match so the actor uses exactly the CPUs it reserved
        self.dri_workers = dri_workers
        if codec == "real":
            n = dim - 8
            gh = max(1, int(n ** 0.5))
            while n % gh:
                gh -= 1
            self._grid = (n // gh, gh)  # (gw, gh)

    def _real_features(self, payload: bytes) -> np.ndarray:
        from ..functions import codecs

        img = codecs.decode_image(payload, dri_workers=self.dri_workers)
        h, w = img.shape[:2]
        f = img.astype(np.float32)
        stats = np.array(
            [w / 4096.0, h / 4096.0,
             *(f[:, :, c].mean() / 255.0 for c in range(3)),
             *(f[:, :, c].std() / 255.0 for c in range(3))], np.float32)
        gray = f.mean(axis=2)
        gw, gh = self._grid
        grid = codecs.resize_nearest(gray, gw, gh).ravel() / 255.0
        return np.concatenate([stats, grid.astype(np.float32)])

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        kern = (self._real_features if self.codec == "real"
                else lambda p: _fake_floats(p, self.dim, b"img"))
        feats = np.stack([kern(p or b"") for p in payloads]) \
            if payloads else np.empty((0, self.dim), np.float32)
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.ravel(), pa.float32()), self.dim
        )
        return batch.append_column("features", arr)


def _avg_pool(gray: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Area-average downsample to (out_h, out_w) — the standard perceptual-
    hash reduction (nearest-neighbor would make the hash flip under 1-pixel
    shifts; area averaging is what makes pHash-family hashes robust).
    Images smaller than the grid are nearest-upsampled first so every cell
    is non-empty. Deterministic float64 accumulation."""
    from ..functions import codecs

    h, w = gray.shape
    if h < out_h or w < out_w:
        gray = codecs.resize_nearest(gray, max(w, out_w), max(h, out_h))
        h, w = gray.shape
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    ii = np.zeros((h + 1, w + 1), np.float64)
    ii[1:, 1:] = gray.astype(np.float64).cumsum(0).cumsum(1)
    s = (ii[ys[1:, None], xs[None, 1:]] - ii[ys[:-1, None], xs[None, 1:]]
         - ii[ys[1:, None], xs[None, :-1]] + ii[ys[:-1, None], xs[None, :-1]])
    area = ((ys[1:, None] - ys[:-1, None])
            * (xs[None, 1:] - xs[None, :-1])).astype(np.float64)
    return s / area


_BIT64 = np.uint64(1) << np.arange(64, dtype=np.uint64)


def _pack_bits64(bits: np.ndarray) -> int:
    """64 booleans (row-major) -> unsigned 64-bit int."""
    return int((bits.ravel().astype(np.uint64) * _BIT64).sum())


class ImageHashActor(_MediaActor):
    """payload -> perceptual hashes: ``dhash64`` (horizontal-gradient hash
    over a 9x8 area-averaged grid — each bit is cell[i] > cell[i+1]) and
    ``ahash64`` (8x8 mean-threshold average hash). The image-side analogue
    of the text SimHash signature: near-identical pixels -> small hamming
    distance. Stored int64 with the same 2^63 offset convention as
    ``dedup.simhash_dedup`` so parquet/SQL round-trips are lossless.

    codec="fake" derives both hashes from the payload digest (plumbing-only
    path, no decodables needed); codec="real" decodes via the pure-numpy
    codecs (PPM/BMP/PNG/baseline+progressive JPEG)."""

    def __init__(self, codec: str = "fake", dri_workers: int | None = None):
        super().__init__(codec)
        self.dri_workers = dri_workers

    def _hashes(self, payload: bytes) -> tuple[int, int]:
        if self.codec == "fake":
            f = _fake_floats(payload, 16, b"imghash")
            d = int.from_bytes(
                hashlib.sha256(b"d" + f.tobytes()).digest()[:8], "big")
            a = int.from_bytes(
                hashlib.sha256(b"a" + f.tobytes()).digest()[:8], "big")
            return d, a
        from ..functions import codecs

        img = codecs.decode_image(payload, dri_workers=self.dri_workers)
        gray = img.astype(np.float32).mean(axis=2)
        g9 = _avg_pool(gray, 9, 8)
        dh = _pack_bits64(g9[:, 1:] > g9[:, :-1])
        g8 = _avg_pool(gray, 8, 8)
        ah = _pack_bits64(g8 > g8.mean())
        return dh, ah

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs = [self._hashes(p or b"")
              for p in batch.column("payload").to_pylist()]
        off = 1 << 63

        def _signed(vals):
            return pa.array([v - off if v >= off else v for v in vals],
                            pa.int64())

        return (batch.append_column("dhash64", _signed([h[0] for h in hs]))
                .append_column("ahash64", _signed([h[1] for h in hs])))


def image_hashes(ds, codec: str = "fake", batch_size: int = 32,
                 concurrency=(1, 4),
                 dri_workers: int | None = None) -> ray.data.Dataset:
    """Perceptual-hash stage (see :class:`ImageHashActor`)."""
    num_cpus = dri_workers if dri_workers and dri_workers > 1 else None
    return _pool(ds, ImageHashActor, batch_size, concurrency,
                 num_cpus=num_cpus, codec=codec, dri_workers=dri_workers)


def _hash64_neardup(
    sig: ray.data.Dataset,
    id_col: str,
    hash_col: str,
    id_type: pa.DataType,
    hamming_threshold: int,
    max_group: int,
    stage: str,
) -> dict:
    """Banded-hamming near-dup over a MATERIALIZED 64-bit signature table —
    the shared engine behind :func:`image_neardup` and :func:`audio_neardup`
    (and structurally the same plan as ``dedup.simhash_dedup``): 8x8-bit
    band blocking (pigeonhole-complete for hamming <= 7 — any closer pair
    shares at least one exact band), vectorized ids-only melt, hot-bucket
    caps with one logged truncation summary, candidate-bounded hash
    broadcast, exact hamming verify, connected components. Only ids and
    64-bit hashes ever shuffle.
    """
    if not 0 <= hamming_threshold <= 7:
        raise ValueError("hamming_threshold must be in [0, 7] "
                         "(8-band pigeonhole bound)")
    from ..functions import textfns
    from ..state import metrics as _metrics
    from . import cluster as _cluster
    from .dedup import (_bucket_candidate_pairs, _candidate_id_set,
                        _distinct_pairs_with_value, _semi_join_ids_arrow)

    def _melt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        idc = batch.column(id_col)
        if isinstance(idc, pa.ChunkedArray):
            idc = idc.combine_chunks()
        h = batch.column(hash_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64).view(np.uint64)
        bkey = np.empty(n * 8, dtype=np.int64)
        for b in range(8):
            band = ((h >> np.uint64(8 * b)) & np.uint64(0xFF)).astype(np.int64)
            bkey[b * n:(b + 1) * n] = (band * np.int64(257)
                                       ) ^ np.int64(b * 0x9E3779B9)
        return pa.table({"bucket": pa.array(bkey, pa.int64()),
                         id_col: pa.chunked_array([idc] * 8)})

    melted = sig.map_batches(_melt, batch_format="pyarrow")
    pairs = _bucket_candidate_pairs(melted, "bucket", id_col, max_group,
                                    stage=stage).materialize()
    _metrics.log_truncation_summary(stage)

    cand_ids = _candidate_id_set(pairs)
    sig_ref = ray.put({
        r[0]: r[1]
        for b in _semi_join_ids_arrow(sig, id_col, cand_ids)
        .iter_batches(batch_format="pyarrow")
        for r in zip(b.column(id_col).to_pylist(),
                     b.column(hash_col).to_pylist())})
    thr = int(hamming_threshold)
    vkey = (f"{stage}-verify", sig_ref.hex())

    def _verify(batch: pa.Table) -> pa.Table:
        from .matching import _worker_state

        sigs = _worker_state(vkey, lambda: ray.get(sig_ref))
        mask = (1 << 64) - 1
        ham = [textfns.hamming64(int(sigs[x]) & mask, int(sigs[y]) & mask)
               for x, y in zip(batch.column("id_a").to_pylist(),
                               batch.column("id_b").to_pylist())]
        out = pa.table({"id_a": batch.column("id_a"),
                        "id_b": batch.column("id_b"),
                        "hamming": pa.array(ham, pa.int64())})
        return out.filter(pc.less_equal(out.column("hamming"), thr))

    verified = _distinct_pairs_with_value(
        pairs.map_batches(_verify, batch_format="pyarrow"),
        "hamming", id_type).materialize()
    clusters = _cluster.connected_components(verified, "id_a", "id_b")
    return {"hashes": sig, "pairs": verified, "clusters": clusters}


def image_neardup(
    ds: ray.data.Dataset,
    id_col: str = "media_id",
    codec: str = "real",
    hamming_threshold: int = 6,
    max_group: int = 200,
) -> dict:
    """Image near-duplicate detection over the dHash — the image half of the
    corpus dedup family (re-encoded / slightly-edited copies of the same
    picture collide; distinct pictures do not). Pixels stay inside the hash
    actors; see :func:`_hash64_neardup` for the pair plan.

    Returns ``{"hashes", "pairs", "clusters"}``.
    """
    if not 0 <= hamming_threshold <= 7:
        raise ValueError("hamming_threshold must be in [0, 7] "
                         "(8-band pigeonhole bound)")
    sig = image_hashes(ds.select_columns([id_col, "payload"]),
                       codec=codec).select_columns(
        [id_col, "dhash64"]).materialize()
    sch = ds.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]
    return _hash64_neardup(sig, id_col, "dhash64", id_type,
                           hamming_threshold, max_group, "image_neardup")


class AudioHashActor(_MediaActor):
    """payload -> acoustic fingerprint ``afp64``: SimHash over the clip's
    log spectrogram. The clip is split into 8 equal time segments; each
    segment's rFFT power is binned into 9 equal frequency bands and
    normalized by segment power (volume-scale invariance) before the log;
    the centered 72-dim feature vector is projected onto 64 SEEDED Gaussian
    hyperplanes and each bit is the projection's sign.

    Random-hyperplane signs beat the classic adjacent-band-difference bits
    here: a small perturbation (re-encode, light noise) rotates the feature
    vector by a small angle theta, flipping ~64*theta/pi bits SMOOTHLY,
    instead of concentrating flips on whichever band pairs sit near the
    comparison boundary. Same int64 2^63-offset storage as the other
    64-bit signatures. codec="fake" digests the payload (plumbing path);
    codec="real" decodes PCM16 WAV / FLAC via the pure-numpy codecs."""

    def __init__(self, codec: str = "fake", segments: int = 8, bands: int = 9):
        super().__init__(codec)
        self.segments = segments
        self.bands = bands
        # fixed-seed hyperplanes: the fingerprint is a deterministic pure
        # function of the payload across actors, sessions and cluster sizes
        self._planes = np.random.default_rng(0xAF9).standard_normal(
            (64, segments * bands))

    def _hash(self, payload: bytes) -> int:
        if self.codec == "fake":
            return int.from_bytes(
                hashlib.sha256(b"afp" + payload).digest()[:8], "big")
        from ..functions import codecs

        samples, _rate = codecs.decode_audio(payload)
        if not len(samples):
            return 0
        e = np.full((self.segments, self.bands), np.log(1e-3), np.float64)
        chunk = max(1, len(samples) // self.segments)
        for t in range(self.segments):
            seg = samples[t * chunk:(t + 1) * chunk]
            if not len(seg):
                continue
            mag = np.abs(np.fft.rfft(seg)) ** 2          # band POWER
            bands = np.array([p.sum() for p in
                              np.array_split(mag, self.bands)])
            tot = bands.sum()
            if tot <= 0:
                continue
            # -30 dB floor: a near-silent band's log power is hypersensitive
            # to any added noise floor (log of ~0 jumps by decades); bands
            # below 0.1% of segment power clamp to "silence" in both the
            # original and its re-encode, so they cannot flip bits
            e[t] = np.log(np.maximum(bands / tot, 1e-3))
        v = e.ravel()
        v = v - v.mean()
        return _pack_bits64(self._planes @ v > 0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        off = 1 << 63
        vals = [self._hash(p or b"")
                for p in batch.column("payload").to_pylist()]
        return batch.append_column(
            "afp64", pa.array([v - off if v >= off else v for v in vals],
                              pa.int64()))


def audio_hashes(ds, codec: str = "fake", batch_size: int = 32,
                 concurrency=(1, 4)) -> ray.data.Dataset:
    """Acoustic-fingerprint stage (see :class:`AudioHashActor`)."""
    return _pool(ds, AudioHashActor, batch_size, concurrency, codec=codec)


def audio_neardup(
    ds: ray.data.Dataset,
    id_col: str = "media_id",
    codec: str = "real",
    hamming_threshold: int = 6,
    max_group: int = 200,
) -> dict:
    """Audio near-duplicate detection over the acoustic fingerprint — the
    audio member of the media dedup family (volume-scaled / re-encoded /
    lightly-noised copies of the same clip collide). Samples stay inside
    the hash actors; see :func:`_hash64_neardup` for the pair plan.

    Returns ``{"hashes", "pairs", "clusters"}``.
    """
    if not 0 <= hamming_threshold <= 7:
        raise ValueError("hamming_threshold must be in [0, 7] "
                         "(8-band pigeonhole bound)")
    sig = audio_hashes(ds.select_columns([id_col, "payload"]),
                       codec=codec).select_columns(
        [id_col, "afp64"]).materialize()
    sch = ds.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]
    return _hash64_neardup(sig, id_col, "afp64", id_type,
                           hamming_threshold, max_group, "audio_neardup")


class VideoHashActor(_MediaActor):
    """payload -> perceptual clip hash ``vhash64``: up to ``sample_frames``
    evenly-spaced frames are decoded (MJPEG-AVI via the RIFF walker + pure-
    numpy JPEG decoder; MP4 raises per payload, naming the libav plug-in
    point), each frame gets the image dHash, and the clip hash is the
    PER-BIT MAJORITY across sampled frames — re-encodes flip a few bits per
    frame, which majority voting absorbs, while distinct clips disagree on
    most frames. codec="fake" digests the payload (plumbing path)."""

    _REAL_SUPPORTED = True  # MJPEG-AVI end-to-end; MP4 raises per payload

    def __init__(self, codec: str = "fake", sample_frames: int = 8):
        super().__init__(codec)
        self.sample_frames = sample_frames

    def _hash(self, payload: bytes) -> int:
        if self.codec == "fake":
            return int.from_bytes(
                hashlib.sha256(b"vfp" + payload).digest()[:8], "big")
        from ..functions.avi import decode_mjpeg_avi

        _usec, frames = decode_mjpeg_avi(payload)
        if not frames:
            return 0
        idx = np.unique(np.linspace(0, len(frames) - 1,
                                    min(self.sample_frames, len(frames)),
                                    dtype=int))
        votes = np.zeros(64, np.int32)
        for i in idx:
            gray = frames[i].astype(np.float32).mean(axis=2)
            g9 = _avg_pool(gray, 9, 8)
            votes += (g9[:, 1:] > g9[:, :-1]).ravel().astype(np.int32)
        return _pack_bits64(votes * 2 > len(idx))

    def __call__(self, batch: pa.Table) -> pa.Table:
        off = 1 << 63
        vals = [self._hash(p or b"")
                for p in batch.column("payload").to_pylist()]
        return batch.append_column(
            "vhash64", pa.array([v - off if v >= off else v for v in vals],
                                pa.int64()))


def video_hashes(ds, codec: str = "fake", batch_size: int = 8,
                 concurrency=(1, 4),
                 sample_frames: int = 8) -> ray.data.Dataset:
    """Clip perceptual-hash stage (see :class:`VideoHashActor`); small
    batches — each row decodes multiple frames."""
    return _pool(ds, VideoHashActor, batch_size, concurrency,
                 codec=codec, sample_frames=sample_frames)


def video_neardup(
    ds: ray.data.Dataset,
    id_col: str = "media_id",
    codec: str = "real",
    hamming_threshold: int = 6,
    max_group: int = 200,
) -> dict:
    """Video near-duplicate detection over the majority-vote frame dHash —
    the video member of the media dedup family (re-encoded / lightly-edited
    copies of the same clip collide). Frames stay inside the hash actors;
    see :func:`_hash64_neardup` for the pair plan.

    Returns ``{"hashes", "pairs", "clusters"}``.
    """
    if not 0 <= hamming_threshold <= 7:
        raise ValueError("hamming_threshold must be in [0, 7] "
                         "(8-band pigeonhole bound)")
    sig = video_hashes(ds.select_columns([id_col, "payload"]),
                       codec=codec).select_columns(
        [id_col, "vhash64"]).materialize()
    sch = ds.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]
    return _hash64_neardup(sig, id_col, "vhash64", id_type,
                           hamming_threshold, max_group, "video_neardup")


class ImageResizeActor(_MediaActor):
    """Resize stub: rewrites width/height metadata and emits a deterministic
    resized-payload digest column (a real codec would emit re-encoded bytes)."""

    def __init__(self, codec: str = "fake", target: Tuple[int, int] = (224, 224)):
        super().__init__(codec)
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        w = pa.array([self.target[0]] * n, pa.int32())
        h = pa.array([self.target[1]] * n, pa.int32())
        out = batch.drop_columns(["width", "height"])
        out = out.append_column("width", w).append_column("height", h)
        if self.codec == "real":
            from ..functions import codecs

            resized = pa.array(
                [codecs.encode_ppm(codecs.resize_nearest(
                    codecs.decode_image(p or b""), self.target[0],
                    self.target[1]))
                 for p in batch.column("payload").to_pylist()],
                pa.binary(),
            )
            return out.append_column("resized_payload", resized)
        digests = pa.array(
            [hashlib.sha256(b"resize" + (p or b"")).digest()
             for p in batch.column("payload").to_pylist()],
            pa.binary(),
        )
        return out.append_column("resized_digest", digests)


class AudioFeatureActor(_MediaActor):
    """Audio feature-extract stub: n_mels×frames mel-like matrix, flattened."""

    def __init__(self, codec: str = "fake", n_mels: int = 16, frames: int = 8):
        super().__init__(codec)
        self.n_mels = n_mels
        self.frames = frames
        self.n = n_mels * frames

    def _real_features(self, payload: bytes) -> np.ndarray:
        from ..functions import codecs

        samples, _rate = codecs.decode_audio(payload)
        if not len(samples):
            return np.zeros(self.n, np.float32)
        chunk = max(1, len(samples) // self.frames)
        out = np.zeros((self.frames, self.n_mels), np.float32)
        for f in range(self.frames):
            seg = samples[f * chunk : (f + 1) * chunk]
            if not len(seg):
                continue
            mag = np.abs(np.fft.rfft(seg))
            bands = np.array_split(mag, self.n_mels)
            out[f] = [np.log1p(b.sum()) for b in bands]
        return out.ravel()

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        kern = (self._real_features if self.codec == "real"
                else lambda p: _fake_floats(p, self.n, b"aud"))
        feats = np.stack([kern(p or b"") for p in payloads]) \
            if payloads else np.empty((0, self.n), np.float32)
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.ravel(), pa.float32()), self.n
        )
        return batch.append_column("audio_features", arr)


class FrameSampleActor(_MediaActor):
    """Video frame sampling: one output row per sampled frame timestamp.

    ``codec="fake"`` computes the deterministic timestamp grid from
    ``duration_ms`` metadata and a per-frame payload digest (1->N flat-map
    shape with zero container knowledge). ``codec="real"`` GENUINELY parses
    MJPEG-AVI containers (``functions/avi.py`` RIFF walker + the baseline
    JPEG decoder) and digests the DECODED RGB pixels of the frame nearest
    each grid timestamp; MP4/non-MJPEG payloads raise ``ValueError`` naming
    libav as the plug-in point.
    """

    _REAL_SUPPORTED = True  # MJPEG-AVI end-to-end; MP4 raises per payload

    def __init__(self, codec: str = "fake", every_ms: int = 1000, max_frames: int = 16):
        super().__init__(codec)
        self.every_ms = every_ms
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ts, digests = [], [], []
        payloads = batch.column("payload").to_pylist()
        durations = batch.column("duration_ms").to_pylist()
        for mid, dur, p in zip(batch.column("media_id").to_pylist(), durations, payloads):
            if self.codec == "real":
                from ..functions.avi import decode_mjpeg_avi

                usec, frames = decode_mjpeg_avi(p or b"")
                if not frames:  # structurally valid AVI, zero frame chunks
                    continue
                dur_real = len(frames) * usec // 1000
                grid = range(0, max(dur_real, 1), self.every_ms)
                for _, t in zip(range(self.max_frames), grid):
                    fi = min(t * 1000 // usec, len(frames) - 1)
                    ids.append(mid)
                    ts.append(t)
                    digests.append(hashlib.sha256(
                        frames[fi].tobytes()).digest())
                continue
            grid = range(0, max(int(dur or 0), 1), self.every_ms)
            for i, t in zip(range(self.max_frames), grid):
                ids.append(mid)
                ts.append(t)
                digests.append(hashlib.sha256(
                    b"frame" + (p or b"") + t.to_bytes(8, "big")).digest())
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "frame_ts_ms": pa.array(ts, pa.int64()),
            "frame_digest": pa.array(digests, pa.binary()),
        })


def _pool(ds: ray.data.Dataset, actor, batch_size: int, concurrency,
          num_cpus=None, **kw):
    # max_restarts=0: Ray 2.49 MapWorker restart crash-loops (src_fn_name
    # AttributeError) and triggers the ray#53727 constructor-arg warning; task
    # retries at the Dataset layer are the recovery path instead.
    extra = {} if num_cpus is None else {"num_cpus": num_cpus}
    return ds.map_batches(
        actor, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, fn_constructor_kwargs=kw,
        max_restarts=0, max_task_retries=0, **extra,
    )


def decode_images(ds, codec: str = "fake", dim: int = 64,
                  batch_size: int = 32, concurrency=(1, 4),
                  dri_workers: int | None = None) -> ray.data.Dataset:
    """``dri_workers > 1``: each decode actor reserves that many CPUs and
    fans baseline-JPEG restart segments across a per-actor fork pool — the
    knob for large-DRI-image corpora where per-image latency (not just
    per-corpus throughput) matters; actors × dri_workers should fit the
    node."""
    num_cpus = dri_workers if dri_workers and dri_workers > 1 else None
    return _pool(ds, ImageDecodeActor, batch_size, concurrency,
                 num_cpus=num_cpus, codec=codec, dim=dim,
                 dri_workers=dri_workers)


def resize_images(ds, codec: str = "fake", target: Tuple[int, int] = (224, 224),
                  batch_size: int = 32, concurrency=(1, 4)) -> ray.data.Dataset:
    return _pool(ds, ImageResizeActor, batch_size, concurrency, codec=codec, target=target)


def audio_features(ds, codec: str = "fake", batch_size: int = 32,
                   concurrency=(1, 4)) -> ray.data.Dataset:
    return _pool(ds, AudioFeatureActor, batch_size, concurrency, codec=codec)


def sample_frames(ds, codec: str = "fake", every_ms: int = 1000, max_frames: int = 16,
                  batch_size: int = 16, concurrency=(1, 4)) -> ray.data.Dataset:
    return _pool(ds, FrameSampleActor, batch_size, concurrency,
                 codec=codec, every_ms=every_ms, max_frames=max_frames)


def synth_media(n: int, kind: str = "image", seed: int = 0) -> pa.Table:
    """Deterministic synthetic media table for tests/benches (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    ids = [f"{kind}-{i:06d}" for i in range(n)]
    payloads = [rng.integers(0, 256, size=int(rng.integers(64, 512)),
                             dtype=np.uint8).tobytes() for _ in range(n)]
    if kind == "image":
        return pa.table({
            "media_id": ids, "media_type": ["image/jpeg"] * n, "payload": payloads,
            "width": pa.array(rng.integers(100, 4000, n), pa.int32()),
            "height": pa.array(rng.integers(100, 4000, n), pa.int32()),
        })
    if kind == "audio":
        return pa.table({
            "media_id": ids, "media_type": ["audio/wav"] * n, "payload": payloads,
            "sample_rate": pa.array([16000] * n, pa.int32()),
            "duration_ms": pa.array(rng.integers(500, 60_000, n), pa.int32()),
        })
    return pa.table({
        "media_id": ids, "media_type": ["video/mp4"] * n, "payload": payloads,
        "duration_ms": pa.array(rng.integers(1000, 120_000, n), pa.int32()),
        "fps": pa.array([30.0] * n, pa.float32()),
    })


def synth_decodable_media(n: int, kind: str = "ppm", seed: int = 0) -> pa.Table:
    """Synthetic REAL-decodable media table: PPM/BMP/PNG/JPEG gradient images
    or WAV sine payloads (pure-stdlib/numpy encoders from
    ``functions/codecs.py`` and ``functions/jpeg.py``; PNG rows cycle through
    all 5 filter types, JPEG rows alternate 4:4:4 / 4:2:0 and every third is
    progressive; ``jpeg_dri`` rows are large baseline images with restart
    intervals — the segment-parallel decode fixture)."""
    from ..functions import codecs
    from ..functions.jpeg import encode_jpeg

    rng = np.random.default_rng(seed)
    ids = [f"{kind}-{i:06d}" for i in range(n)]
    if kind in ("ppm", "bmp", "png", "jpeg", "jpeg_dri"):
        payloads, ws, hs = [], [], []
        enc = {"ppm": codecs.encode_ppm, "bmp": codecs.encode_bmp}.get(kind)
        for i in range(n):
            if kind == "jpeg_dri":
                # large baseline images with restart intervals — the
                # segment-parallel decode fixture
                w, h = int(rng.integers(192, 320)), int(rng.integers(192, 320))
            else:
                w, h = int(rng.integers(8, 64)), int(rng.integers(8, 64))
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack([
                (xx * 255 // max(w - 1, 1)),
                (yy * 255 // max(h - 1, 1)),
                np.full((h, w), int(rng.integers(0, 256))),
            ], axis=2).astype(np.uint8)
            if kind == "png":
                payloads.append(codecs.encode_png(img, filter_type=i % 5))
            elif kind == "jpeg_dri":
                # photo-like entropy content: the smooth gradient would
                # EOB-out instantly and under-represent real decode cost
                noisy = img.astype(np.int16) + rng.integers(
                    -48, 49, size=img.shape, dtype=np.int16)
                payloads.append(encode_jpeg(
                    np.clip(noisy, 0, 255).astype(np.uint8), quality=85,
                    subsampling="444" if i % 2 == 0 else "420",
                    restart_interval=16))
            elif kind == "jpeg":
                payloads.append(encode_jpeg(
                    img, quality=90,
                    subsampling="444" if i % 2 == 0 else "420",
                    progressive=(i % 3 == 0)))
            else:
                payloads.append(enc(img))
            ws.append(w)
            hs.append(h)
        return pa.table({
            "media_id": ids, "media_type": [f"image/{kind}"] * n,
            "payload": payloads,
            "width": pa.array(ws, pa.int32()), "height": pa.array(hs, pa.int32()),
        })
    if kind in ("wav", "flac"):
        from ..functions.flac import encode_flac

        payloads, durs = [], []
        for i in range(n):
            dur_ms = int(rng.integers(50, 500))
            t = np.arange(int(16000 * dur_ms / 1000)) / 16000.0
            freq = float(rng.integers(100, 2000))
            sig = np.sin(2 * np.pi * freq * t) * 20000
            if kind == "flac":  # noise stresses the rice residual path
                sig = sig + rng.normal(0, 300, len(t))
            samples = np.clip(sig, -32768, 32767).astype(np.int16)
            payloads.append(encode_flac(samples, 16000) if kind == "flac"
                            else codecs.encode_wav(samples, 16000))
            durs.append(dur_ms)
        return pa.table({
            "media_id": ids, "media_type": [f"audio/{kind}"] * n,
            "payload": payloads,
            "sample_rate": pa.array([16000] * n, pa.int32()),
            "duration_ms": pa.array(durs, pa.int32()),
        })
    if kind == "avi":
        from ..functions.avi import encode_mjpeg_avi

        payloads, durs = [], []
        for i in range(n):
            fps = 5
            nf = int(rng.integers(3, 10))
            w, h = int(rng.integers(16, 48)), int(rng.integers(16, 48))
            yy, xx = np.mgrid[0:h, 0:w]
            frames = [
                (((xx * 3 + yy * 2 + f * 29) % 256).astype(np.uint8)
                 [..., None].repeat(3, -1))
                for f in range(nf)
            ]
            payloads.append(encode_mjpeg_avi(frames, fps=fps))
            durs.append(nf * 1000 // fps)
        return pa.table({
            "media_id": ids, "media_type": ["video/x-msvideo"] * n,
            "payload": payloads,
            "duration_ms": pa.array(durs, pa.int32()),
        })
    raise ValueError(f"unknown decodable kind {kind!r}")
