"""Multimodal (image/audio/video) stage plumbing.

Media travel as opaque ``binary`` columns with typed metadata columns —
never decoded on the driver.  Decode / feature-extraction run as
actor-pool ``map_batches`` stages with SMALL batch sizes (a batch ×
concurrency of multi-MB payloads must fit a worker heap; SURVEY
'Memory-aware').

The decode libraries (PIL/ffmpeg/torchaudio) are NOT in this container,
so the codec boundary is stubbed: ``decoder="fake"`` produces a
deterministic fake decode (seeded by content hash) so the Ray-side
plumbing — schema, batch sizing, actor signature, output layout — is
real and tested; ``decoder="pil"`` raises NotImplementedError unless
the library imports.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # image | audio | video
    ("payload", pa.binary()),          # opaque encoded bytes
    ("mime", pa.string()),
    ("width", pa.int32()),             # typed metadata (0 when unknown)
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def _fake_decode(payload: bytes, out_dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: features seeded from the
    content hash, so tests are stable and dedup-by-feature is exercised."""
    seed = int.from_bytes(hashlib.md5(payload or b"").digest()[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(out_dim).astype(np.float32)


class MediaFeatureStage:
    """payload binary -> fixed-dim feature vector (actor pool stage).

    Real deployments pass ``decoder="pil"`` (images) etc.; the decoder
    object is constructed once per actor.  Use batch_size<=64 for
    multi-MB payloads.
    """

    def __init__(self, out_dim: int = 64, decoder: str = "fake", payload_col: str = "payload"):
        self.out_dim = out_dim
        self.payload_col = payload_col
        self.decoder = decoder
        if decoder == "pil":
            try:
                from PIL import Image  # noqa: F401
                self._pil = Image
            except ImportError as e:  # pragma: no cover - lib absent here
                raise NotImplementedError(
                    "PIL not available in this environment; use decoder='fake' "
                    "for plumbing tests") from e
        elif decoder != "fake":
            raise ValueError(f"unknown decoder {decoder!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            _fake_decode(p, self.out_dim)
            for p in batch.column(self.payload_col).to_pylist()
        ]
        return pa.table({
            "media_id": batch.column("media_id"),
            "feature": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
        })


class ImageResizeStage:
    """Stubbed resize: passes metadata through with the target size applied.

    The real stage would decode -> resize -> re-encode per row inside the
    actor; shape of inputs/outputs (and the small-batch requirement) is
    identical, so pipeline wiring is fully testable without codecs.
    """

    def __init__(self, width: int, height: int):
        self.width = width
        self.height = height

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        out = batch.drop_columns([c for c in ("width", "height") if c in batch.column_names])
        out = out.append_column("width", pa.array([self.width] * n, pa.int32()))
        out = out.append_column("height", pa.array([self.height] * n, pa.int32()))
        return out


class FrameSampleStage:
    """Video payload -> every-Nth-frame rows (flat_map shape: one input
    row explodes to ``n_frames`` output rows with frame_idx + per-frame
    feature).  Decode is stubbed like MediaFeatureStage (ffmpeg absent);
    frame count derives from duration_ms at a nominal fps, features are
    content-hash-seeded per (payload, frame_idx) — deterministic.
    """

    def __init__(self, every_n: int = 10, fps: float = 25.0, out_dim: int = 16,
                 max_frames: int = 32):
        self.every_n = every_n
        self.fps = fps
        self.out_dim = out_dim
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, feats = [], [], []
        payloads = batch.column("payload").to_pylist()
        durations = batch.column("duration_ms").to_pylist()
        media_ids = batch.column("media_id").to_pylist()
        for mid, payload, dur in zip(media_ids, payloads, durations):
            n_frames = max(1, int((dur or 0) / 1000.0 * self.fps))
            sampled = range(0, min(n_frames, self.max_frames * self.every_n), self.every_n)
            for fi in sampled:
                ids.append(mid)
                idxs.append(fi)
                feats.append(_fake_decode((payload or b"") + fi.to_bytes(4, "big"),
                                          self.out_dim).tolist())
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "feature": pa.array(feats, pa.list_(pa.float32())),
        })


def make_fake_media_table(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic fake media table for plumbing tests."""
    rng = np.random.default_rng(seed)
    payloads = [rng.bytes(256) for _ in range(n)]
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "kind": pa.array(["image"] * n),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array(["image/fake"] * n),
        "width": pa.array([640] * n, pa.int32()),
        "height": pa.array([480] * n, pa.int32()),
        "duration_ms": pa.array([0] * n, pa.int32()),
    })


# ----------------------------------------------------- REAL codec paths
#
# PIL/ffmpeg are absent here, but two real formats decode with what the
# container DOES have: WAV via the stdlib ``wave`` module and binary PPM
# (P6) via pure numpy.  These give the stages an honest
# decode -> feature / decode -> resize -> re-encode path end-to-end;
# the library-backed decoders (jpeg/mp4/...) remain NotImplementedError
# stubs behind the same interface.

def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """float32 [-1,1] mono -> 16-bit PCM WAV bytes (stdlib wave)."""
    import io
    import wave

    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float64 mono samples in [-1,1], sample rate)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
        width = w.getsampwidth()
        ch = w.getnchannels()
    if width != 2:
        raise ValueError(f"only 16-bit PCM supported, got width={width}")
    x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32767.0
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, rate


def audio_features(samples: np.ndarray, rate: int, out_dim: int = 16) -> np.ndarray:
    """Real audio features: duration, RMS, zero-crossing rate, spectral
    centroid, then (out_dim-4) log-spaced FFT band energies."""
    n = len(samples)
    dur = n / rate if rate else 0.0
    rms = float(np.sqrt((samples ** 2).mean())) if n else 0.0
    zcr = float((np.diff(np.signbit(samples)) != 0).mean()) if n > 1 else 0.0
    spec = np.abs(np.fft.rfft(samples)) if n else np.zeros(1)
    freqs = np.fft.rfftfreq(n, d=1.0 / rate) if n else np.zeros(1)
    centroid = float((freqs * spec).sum() / spec.sum()) if spec.sum() > 0 else 0.0
    nb = max(1, out_dim - 4)
    edges = np.unique(np.geomspace(1, len(spec), nb + 1).astype(int))
    bands = np.add.reduceat(spec ** 2, edges[:-1])[:nb]
    bands = np.log1p(np.pad(bands, (0, nb - len(bands))))
    return np.concatenate(([dur, rms, zcr, centroid], bands)).astype(np.float32)


def encode_ppm(img: np.ndarray) -> bytes:
    """uint8 (h, w, 3) -> binary PPM (P6)."""
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> uint8 (h, w, 3), pure numpy."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    parts = payload.split(b"\n", 3)
    w, h = (int(v) for v in parts[1].split())
    data = parts[3]
    return np.frombuffer(data[: w * h * 3], dtype=np.uint8).reshape(h, w, 3)


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 (h, w, 3) RGB -> PNG bytes (stdlib zlib only).

    A real COMPRESSED image codec with zero external dependencies:
    8-bit truecolor, non-interlaced, one scanline filter (0=None 1=Sub
    2=Up 3=Average 4=Paeth — all five encodable, for decoder-path test
    coverage), zlib-deflated IDAT, CRC'd chunks.  The jpeg/h264 family
    stays behind declared NotImplementedError stubs (codec libraries
    absent in this container)."""
    import zlib

    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_png expects (h, w, 3) RGB")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"bad PNG filter {filter_type}")
    rows = img.reshape(h, w * 3).astype(np.int16)
    left = np.zeros_like(rows)
    left[:, 3:] = rows[:, :-3]
    up = np.zeros_like(rows)
    up[1:] = rows[:-1]
    if filter_type == 0:
        filt = rows
    elif filter_type == 1:
        filt = rows - left
    elif filter_type == 2:
        filt = rows - up
    elif filter_type == 3:
        filt = rows - (left + up) // 2
    else:  # Paeth
        ul = np.zeros_like(rows)
        ul[1:, 3:] = rows[:-1, :-3]
        p = left + up - ul
        pa_, pb, pc_ = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
        pred = np.where((pa_ <= pb) & (pa_ <= pc_), left,
                        np.where(pb <= pc_, up, ul))
        filt = rows - pred
    scan = np.empty((h, w * 3 + 1), dtype=np.uint8)
    scan[:, 0] = filter_type
    scan[:, 1:] = (filt % 256).astype(np.uint8)

    def chunk(typ: bytes, data: bytes) -> bytes:
        body = typ + data
        return struct.pack(">I", len(data)) + body + \
            struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(scan.tobytes(), 6))
            + chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> uint8 (h, w, 3); 8-bit truecolor non-interlaced,
    all five scanline filters, CRC-verified — stdlib zlib + numpy.
    Sequential filters (Sub) reconstruct via per-channel modular cumsum;
    Average/Paeth run a per-pixel loop along the row (decode of
    arbitrary external encoders' output, correctness first)."""
    import zlib

    if not payload.startswith(b"\x89PNG\r\n\x1a\n"):
        raise ValueError("not a PNG payload")
    off, idat, dims = 8, [], None
    while off + 8 <= len(payload):
        ln = int.from_bytes(payload[off:off + 4], "big")
        typ = payload[off + 4:off + 8]
        data = payload[off + 8:off + 8 + ln]
        crc = int.from_bytes(payload[off + 8 + ln:off + 12 + ln], "big")
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {typ!r}")
        off += 12 + ln
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(">IIBBBBB", data)
            if (depth, ctype, comp, filt, inter) != (8, 2, 0, 0, 0):
                raise NotImplementedError(
                    "only 8-bit truecolor non-interlaced PNG supported "
                    f"(depth={depth} colortype={ctype} interlace={inter})")
            dims = (h, w)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if dims is None:
        raise ValueError("PNG missing IHDR")
    h, w = dims
    raw = zlib.decompress(b"".join(idat))
    stride = w * 3
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(raw, np.uint8, stride, y * (stride + 1) + 1)
        prev = out[y - 1] if y else np.zeros(stride, np.uint8)
        if f == 0:
            out[y] = line
        elif f == 2:
            out[y] = line + prev  # uint8 wraparound == mod 256
        elif f == 1:
            # Sub: per-channel prefix sum mod 256 along the row
            rec = line.reshape(w, 3).astype(np.int64).cumsum(axis=0)
            out[y] = (rec % 256).astype(np.uint8).reshape(stride)
        elif f in (3, 4):
            rec = out[y]
            prev_i = prev.astype(np.int64)
            line_i = line.astype(np.int64)
            for x in range(w):
                s = x * 3
                left = rec[s - 3:s].astype(np.int64) if x else np.zeros(3, np.int64)
                up = prev_i[s:s + 3]
                if f == 3:
                    pred = (left + up) // 2
                else:
                    ul = prev_i[s - 3:s] if x else np.zeros(3, np.int64)
                    p = left + up - ul
                    pa_, pb, pc_ = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
                    pred = np.where((pa_ <= pb) & (pa_ <= pc_), left,
                                    np.where(pb <= pc_, up, ul))
                rec[s:s + 3] = ((line_i[s:s + 3] + pred) % 256).astype(np.uint8)
        else:
            raise ValueError(f"bad PNG scanline filter {f}")
    return out.reshape(h, w, 3)


def image_features(img: np.ndarray, out_dim: int = 16) -> np.ndarray:
    """Real image features: per-channel mean/std + luminance histogram."""
    chans = img.reshape(-1, 3).astype(np.float64)
    mean = chans.mean(axis=0) / 255.0
    std = chans.std(axis=0) / 255.0
    lum = chans @ np.array([0.299, 0.587, 0.114])
    nb = max(1, out_dim - 6)
    hist, _ = np.histogram(lum, bins=nb, range=(0, 255))
    hist = hist / max(1, lum.size)
    return np.concatenate([mean, std, hist]).astype(np.float32)


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy striding."""
    h, w, _ = img.shape
    yi = (np.arange(height) * (h / height)).astype(int).clip(0, h - 1)
    xi = (np.arange(width) * (w / width)).astype(int).clip(0, w - 1)
    return img[yi][:, xi]


class RealMediaFeatureStage:
    """payload -> REAL feature vector for wav/ppm payloads (actor pool).

    Same signature and output schema as MediaFeatureStage; the decoder
    dispatches on the ``mime`` column (audio/wav -> stdlib wave decode,
    image/ppm -> numpy PPM decode), so swapping the fake stage for this
    one is a one-line pipeline change.
    """

    def __init__(self, out_dim: int = 16, payload_col: str = "payload"):
        self.out_dim = out_dim
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        mimes = batch.column("mime").to_pylist()
        for payload, mime in zip(batch.column(self.payload_col).to_pylist(), mimes):
            if mime == "audio/wav":
                x, rate = decode_wav(payload)
                feats.append(audio_features(x, rate, self.out_dim))
            elif mime == "image/ppm":
                feats.append(image_features(decode_ppm(payload), self.out_dim))
            elif mime == "image/png":
                feats.append(image_features(decode_png(payload), self.out_dim))
            elif mime == "image/jpeg":
                from ..functions.jpeg import decode_jpeg

                feats.append(image_features(decode_jpeg(payload), self.out_dim))
            else:
                raise ValueError(f"no real decoder for mime {mime!r}")
        return pa.table({
            "media_id": batch.column("media_id"),
            "feature": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
        })


class RealImageResizeStage:
    """Image payload (PPM, PNG or JPEG, by magic bytes) -> decoded,
    nearest-neighbor-resized, re-encoded in the same format."""

    def __init__(self, width: int, height: int):
        self.width = width
        self.height = height

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_payloads = []
        for payload in batch.column("payload").to_pylist():
            if payload.startswith(b"\x89PNG"):
                img = resize_nearest(decode_png(payload), self.width, self.height)
                out_payloads.append(encode_png(img))
            elif payload.startswith(b"\xFF\xD8"):
                from ..functions.jpeg import decode_jpeg, encode_jpeg

                img = resize_nearest(decode_jpeg(payload), self.width, self.height)
                out_payloads.append(encode_jpeg(img))
            else:
                img = resize_nearest(decode_ppm(payload), self.width, self.height)
                out_payloads.append(encode_ppm(img))
        n = batch.num_rows
        t = batch.drop_columns([c for c in ("payload", "width", "height")
                                if c in batch.column_names])
        t = t.append_column("payload", pa.array(out_payloads, pa.binary()))
        t = t.append_column("width", pa.array([self.width] * n, pa.int32()))
        t = t.append_column("height", pa.array([self.height] * n, pa.int32()))
        return t


def make_real_media_table(n: int = 32, seed: int = 5) -> pa.Table:
    """Deterministic REAL media table: even rows = WAV tones (freq/dur
    vary by id), odd rows = PPM gradient images (size/phase vary by id).
    Synthesized in-process — no external data."""
    rows_payload, rows_kind, rows_mime = [], [], []
    widths, heights, durs = [], [], []
    for i in range(n):
        rng = np.random.default_rng(seed * 1_000_003 + i)
        if i % 2 == 0:
            rate = 8000
            dur_s = 0.25 + (i % 8) * 0.125
            t = np.arange(int(rate * dur_s)) / rate
            freq = 110.0 * (1 + (i % 16))
            x = 0.7 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.standard_normal(len(t))
            rows_payload.append(encode_wav(x, rate))
            rows_kind.append("audio")
            rows_mime.append("audio/wav")
            widths.append(0); heights.append(0); durs.append(int(dur_s * 1000))
        else:
            w, h = 32 + (i % 4) * 16, 24 + (i % 3) * 16
            gx = np.linspace(0, 255, w, dtype=np.float64)
            gy = np.linspace(0, 255, h, dtype=np.float64)
            img = np.stack([
                np.add.outer(gy * 0, gx),
                np.add.outer(gy, gx * 0),
                rng.integers(0, 256, size=(h, w)).astype(np.float64),
            ], axis=2).astype(np.uint8)
            if i % 4 == 3:  # lossless COMPRESSED codec rows
                rows_payload.append(encode_png(img, filter_type=i % 5))
                rows_mime.append("image/png")
            elif i % 8 == 1:  # lossy COMPRESSED codec rows (baseline JPEG)
                from ..functions.jpeg import encode_jpeg

                rows_payload.append(encode_jpeg(
                    img, quality=85, subsampling="420" if i % 16 == 1 else "444"))
                rows_mime.append("image/jpeg")
            else:
                rows_payload.append(encode_ppm(img))
                rows_mime.append("image/ppm")
            rows_kind.append("image")
            widths.append(w); heights.append(h); durs.append(0)
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "kind": pa.array(rows_kind),
        "payload": pa.array(rows_payload, pa.binary()),
        "mime": pa.array(rows_mime),
        "width": pa.array(widths, pa.int32()),
        "height": pa.array(heights, pa.int32()),
        "duration_ms": pa.array(durs, pa.int32()),
    })


# ------------------------------------------------- REAL video (AVI/DIB)
#
# ffmpeg is absent, but UNCOMPRESSED AVI needs none of it: the container
# is plain RIFF and each frame is a raw bottom-up BGR DIB — both parse
# with struct/numpy.  This gives the video path the same honest
# decode -> frame-sample -> feature chain the WAV/PPM paths have; the
# compressed codecs (h264/vp9/...) stay NotImplementedError stubs.

import struct


def encode_avi(frames: np.ndarray, fps: int = 10, codec: str = "DIB",
               quality: int = 85) -> bytes:
    """uint8 [n, h, w, 3] RGB frames -> RIFF AVI bytes.

    ``codec="DIB"``: uncompressed ('vids'/'DIB ' stream,
    BITMAPINFOHEADER biCompression=0: bottom-up BGR rows padded to a
    4-byte stride).  ``codec="MJPG"``: Motion-JPEG — every frame is an
    independent baseline JPEG (functions/jpeg.py) in a 00dc chunk with
    biCompression='MJPG', the standard intra-only compressed AVI form.
    """
    if frames.ndim != 4 or frames.shape[3] != 3 or frames.dtype != np.uint8:
        raise ValueError("frames must be uint8 [n, h, w, 3] RGB")
    if codec not in ("DIB", "MJPG"):
        raise ValueError(f"unknown AVI codec {codec!r}")
    n, h, w, _ = frames.shape
    stride = (w * 3 + 3) & ~3

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(kind: bytes, payload: bytes) -> bytes:
        body = kind + payload
        return b"LIST" + struct.pack("<I", len(body)) + body

    movi_frames = []
    if codec == "MJPG":
        from ..functions.jpeg import encode_jpeg

        for f in frames:
            movi_frames.append(chunk(
                b"00dc", encode_jpeg(f, quality=quality, subsampling="420")))
        frame_bytes = max(len(c) - 8 for c in movi_frames)
        handler, compression = b"MJPG", struct.unpack("<I", b"MJPG")[0]
    else:
        pad_cols = stride - w * 3
        for f in frames:
            bgr = f[::-1, :, ::-1]  # bottom-up rows, RGB->BGR
            rows = bgr.reshape(h, w * 3)
            if pad_cols:
                rows = np.concatenate(
                    [rows, np.zeros((h, pad_cols), dtype=np.uint8)], axis=1)
            movi_frames.append(chunk(b"00db", rows.tobytes()))
        frame_bytes = stride * h
        handler, compression = b"DIB ", 0

    avih = struct.pack(
        "<14I", int(1_000_000 / fps), frame_bytes * fps, 0, 0x10,  # HASINDEX-free, AVIF_WASCAPTUREFILE-ish flags
        n, 0, 1, frame_bytes, w, h, 0, 0, 0, 0)
    strh = b"vids" + handler + struct.pack("<10I4h", 0, 0, 0, 1, fps, 0, n,
                                           frame_bytes, 0xFFFFFFFF, 0,
                                           0, 0, w, h)
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, compression,
                       frame_bytes, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(movi_frames))

    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF AVI bytes (uncompressed DIB or Motion-JPEG) ->
    (uint8 [n, h, w, 3] RGB, fps).

    A real RIFF walk: verifies the RIFF/AVI magic, reads
    w/h/bitcount/biCompression from the strf BITMAPINFOHEADER, fps from
    the strh scale/rate pair, and collects every 00db/00dc frame chunk
    under LIST movi.  biCompression=0 -> raw bottom-up BGR DIB rows;
    biCompression='MJPG' -> each chunk is an independent baseline JPEG
    decoded by functions/jpeg.py.  Other codecs (h264/vp9/...) remain
    NotImplementedError stubs."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF AVI payload")
    w = h = bitcount = 0
    fps = 0
    compression = 0
    frames_raw: list[bytes] = []

    def walk(buf: bytes, off: int, end: int) -> None:
        nonlocal w, h, bitcount, fps, compression
        while off + 8 <= end:
            fourcc = buf[off:off + 4]
            (size,) = struct.unpack_from("<I", buf, off + 4)
            data_off = off + 8
            if fourcc == b"LIST":
                walk(buf, data_off + 4, data_off + size)
            elif fourcc == b"strh":
                if size < 28 or data_off + 28 > len(buf):
                    raise ValueError("truncated strh chunk")
                scale, rate = struct.unpack_from("<II", buf, data_off + 20)
                if scale:
                    fps = rate // scale
            elif fourcc == b"strf":
                # length-check before unpack: a truncated strf must
                # raise the malformed-payload ValueError, not leak a
                # struct.error past callers' except clauses (r4 ADVICE)
                if size < 20 or data_off + 20 > len(buf):
                    raise ValueError("truncated strf BITMAPINFOHEADER")
                _, w, h, _, bitcount, compression = struct.unpack_from(
                    "<IiiHHI", buf, data_off)
            elif fourcc in (b"00db", b"00dc"):
                frames_raw.append(buf[data_off:data_off + size])
            off = data_off + size + (size % 2)

    walk(payload, 12, len(payload))
    if not frames_raw or w <= 0 or h <= 0:
        raise ValueError("no decodable frames in AVI payload")
    if compression == struct.unpack("<I", b"MJPG")[0]:
        from ..functions.jpeg import decode_jpeg

        out = np.empty((len(frames_raw), h, w, 3), dtype=np.uint8)
        for i, raw in enumerate(frames_raw):
            out[i] = decode_jpeg(bytes(raw))
        return out, fps
    if compression != 0:
        raise NotImplementedError(
            f"AVI biCompression 0x{compression:08X} not supported "
            "(only raw DIB and MJPG)")
    if bitcount != 24:
        raise NotImplementedError(f"only 24-bit DIB frames supported, got {bitcount}")
    stride = (w * 3 + 3) & ~3
    out = np.empty((len(frames_raw), h, w, 3), dtype=np.uint8)
    for i, raw in enumerate(frames_raw):
        rows = np.frombuffer(raw, dtype=np.uint8, count=stride * h).reshape(h, stride)
        out[i] = rows[:, :w * 3].reshape(h, w, 3)[::-1, :, ::-1]  # bottom-up BGR -> RGB
    return out, fps


class RealFrameSampleStage:
    """AVI payload -> every-Nth REAL frame with real image features.

    Same output schema as the stubbed FrameSampleStage (media_id,
    frame_idx, feature) so pipelines swap stages without plumbing
    changes; decode is the pure-numpy RIFF/DIB parse above and the
    per-frame feature is the same kernel the PPM path uses."""

    def __init__(self, every_n: int = 2, out_dim: int = 16, max_frames: int = 32):
        self.every_n = every_n
        self.out_dim = out_dim
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, feats = [], [], []
        for mid, payload in zip(batch.column("media_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            frames, _fps = decode_avi(payload)
            sampled = range(0, min(len(frames), self.max_frames * self.every_n),
                            self.every_n)
            for fi in sampled:
                ids.append(mid)
                idxs.append(fi)
                feats.append(image_features(frames[fi], self.out_dim).tolist())
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "feature": pa.array(feats, pa.list_(pa.float32())),
        })


def make_real_video_table(n: int = 8, seed: int = 5) -> pa.Table:
    """Deterministic REAL video table: short AVIs of a bright block
    orbiting a gradient background (size/speed/frame count vary by id)
    — every third row Motion-JPEG-compressed, the rest uncompressed
    DIB.  Synthesized in-process — no external data."""
    payloads, widths, heights, durs = [], [], [], []
    for i in range(n):
        rng = np.random.default_rng(seed * 99_991 + i)
        w, h = 24 + (i % 3) * 8, 16 + (i % 2) * 8
        n_frames = 6 + (i % 5) * 3
        fps = 10
        gx = np.linspace(0, 200, w)[None, :]
        gy = np.linspace(0, 200, h)[:, None]
        base = (gx + gy) / 2
        frames = np.empty((n_frames, h, w, 3), dtype=np.uint8)
        for f in range(n_frames):
            img = np.stack([base, base[::-1], np.full_like(base, 40.0 + 10.0 * (i % 5))],
                           axis=2).astype(np.float64)
            cx = int((f * (2 + i % 3)) % max(1, w - 6))
            cy = int((f * (1 + i % 2)) % max(1, h - 6))
            img[cy:cy + 6, cx:cx + 6, :] = 250.0
            img += rng.integers(0, 6, size=img.shape)
            frames[f] = np.clip(img, 0, 255).astype(np.uint8)
        codec = "MJPG" if i % 3 == 2 else "DIB"
        payloads.append(encode_avi(frames, fps, codec=codec))
        widths.append(w); heights.append(h)
        durs.append(int(n_frames / fps * 1000))
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "kind": pa.array(["video"] * n),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array(["video/avi"] * n),
        "width": pa.array(widths, pa.int32()),
        "height": pa.array(heights, pa.int32()),
        "duration_ms": pa.array(durs, pa.int32()),
    })
