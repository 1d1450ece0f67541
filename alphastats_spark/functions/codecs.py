"""Pure-Python/numpy media codecs for the multimodal pipeline.

Real decode kernels that need nothing beyond the standard library and
numpy — the formats a training-data pipeline can rely on without native
codec dependencies:

* **WAV** (``audio/wav``) — stdlib ``wave`` + numpy: 8/16/32-bit PCM to
  float32 samples in [-1, 1].
* **BMP** (``image/bmp``) — 24/32-bit uncompressed BITMAPINFOHEADER.
* **PPM/PGM** (``image/x-portable-pixmap`` / ``-graymap``) — binary P6/P5.
* **PNG** (``image/png``) — 8-bit grayscale/RGB/RGBA, non-interlaced, all
  five scanline filters (None/Sub/Up/Average/Paeth). Sub and Up rows are
  vectorized (cumsum-mod-256 / row addition); Average/Paeth fall back to a
  per-pixel loop — acceptable inside an Arrow-batched kernel, and most
  encoders emit None/Sub/Up for the synthetic data these pipelines carry.

JPEG and video containers stay behind an import-try of the optional real
libraries (``pillow`` etc.) — entropy-coded formats are out of scope for a
dependency-free kernel.

Everything here is driver-independent pure functions over ``bytes`` so the
Spark layer (:mod:`.multimodal`) can call them inside ``mapInPandas``
batches without serialization surprises.
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np

SUPPORTED_IMAGE_MIMES = {
    "image/bmp",
    "image/png",
    "image/x-portable-pixmap",
    "image/x-portable-graymap",
}
SUPPORTED_AUDIO_MIMES = {"audio/wav", "audio/x-wav"}


# ---------------------------------------------------------------------------
# audio


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (float32 samples shaped [n_frames, n_channels] in
    [-1, 1], sample_rate)."""
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        n_channels = w.getnchannels()
        sample_width = w.getsampwidth()
        sample_rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    if sample_width == 1:  # unsigned 8-bit
        samples = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sample_width == 2:
        samples = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    elif sample_width == 4:
        samples = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width: {sample_width}")
    return samples.reshape(-1, n_channels), sample_rate


# ---------------------------------------------------------------------------
# images


def decode_bmp(payload: bytes) -> np.ndarray:
    """24/32-bit uncompressed BMP → uint8 array [h, w, 3] (RGB)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    flipped = height > 0  # positive height = bottom-up row order
    height = abs(height)
    bytes_per_px = bpp // 8
    stride = (width * bytes_per_px + 3) & ~3  # rows pad to 4 bytes
    rows = np.frombuffer(
        payload, np.uint8, count=stride * height, offset=data_offset
    ).reshape(height, stride)[:, : width * bytes_per_px]
    img = rows.reshape(height, width, bytes_per_px)
    if flipped:
        img = img[::-1]
    return img[:, :, 2::-1].copy()  # BGR(A) → RGB, drop alpha


def _ppm_header(payload: bytes, pos: int = 0) -> tuple[bytes, int, int, int, int]:
    """Parse one PPM/PGM header at ``pos``: returns (magic, width, height,
    channels, data_offset). Header = magic, width, height, maxval —
    whitespace/comment separated, one whitespace before the pixel data."""
    magic = payload[pos : pos + 2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    pos, fields = pos + 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while payload[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    channels = 3 if magic == b"P6" else 1
    return magic, width, height, channels, pos


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6 → [h, w, 3]) / PGM (P5 → [h, w]) → uint8 array."""
    _, width, height, channels, pos = _ppm_header(payload)
    arr = np.frombuffer(payload, np.uint8, count=width * height * channels, offset=pos)
    return arr.reshape((height, width, 3) if channels == 3 else (height, width)).copy()


def split_ppm_frames(payload: bytes) -> list[bytes]:
    """Split a concatenated-PPM/PGM "animation" payload into per-frame
    blobs — the dependency-free multi-frame container for the frame-sample
    stage (each frame is self-describing: header + fixed-size pixel data)."""
    frames, pos = [], 0
    while pos < len(payload):
        _, width, height, channels, data_off = _ppm_header(payload, pos)
        end = data_off + width * height * channels
        if end > len(payload):
            raise ValueError("truncated frame in animation payload")
        frames.append(payload[pos:end])
        pos = end
    return frames


def encode_ppm(img: np.ndarray) -> bytes:
    """uint8 array ([h, w, 3] → P6, [h, w] → P5) → binary PPM/PGM bytes."""
    img = np.ascontiguousarray(img.astype(np.uint8))
    if img.ndim == 3 and img.shape[2] == 3:
        magic = b"P6"
    elif img.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError(f"unsupported array shape {img.shape}")
    h, w = img.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + img.tobytes()


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+A, RGBA


def decode_png(payload: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG → uint8 array [h, w(, channels)]."""
    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, idat, ihdr = 8, [], None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        chunk = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, bit_depth, color_type, _comp, _filt, interlace = ihdr
    if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
        raise ValueError(
            f"unsupported PNG: depth={bit_depth} color={color_type} interlace={interlace}"
        )
    channels = _PNG_CHANNELS[color_type]
    stride = width * channels
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG data length mismatch")
    out = np.zeros((height, stride), np.uint8)
    prev = np.zeros(stride, np.uint16)
    for y in range(height):
        f = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.uint16)
        if f == 0:  # None
            decoded = row
        elif f == 1:  # Sub: cumulative sum per channel lane, mod 256
            lanes = row.reshape(width, channels)
            decoded = (np.cumsum(lanes, axis=0, dtype=np.uint64) & 0xFF).reshape(stride)
        elif f == 2:  # Up
            decoded = (row + prev) & 0xFF
        elif f == 3:  # Average — sequential in x (depends on decoded left)
            decoded = np.zeros(stride, np.uint16)
            for x in range(stride):
                left = decoded[x - channels] if x >= channels else 0
                decoded[x] = (row[x] + ((int(left) + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth — sequential in x
            decoded = np.zeros(stride, np.uint16)
            for x in range(stride):
                a = int(decoded[x - channels]) if x >= channels else 0
                b = int(prev[x])
                c = int(prev[x - channels]) if x >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                decoded[x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = decoded.astype(np.uint8)
        prev = decoded.astype(np.uint16)
    img = out.reshape(height, width, channels)
    return img[:, :, 0].copy() if channels == 1 else img


def encode_png(img: np.ndarray) -> bytes:
    """uint8 array ([h, w] gray, [h, w, 3] RGB or [h, w, 4] RGBA) →
    minimal valid PNG (filter None rows, one IDAT)."""
    img = np.ascontiguousarray(img.astype(np.uint8))
    if img.ndim == 2:
        color_type, channels = 0, 1
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, channels = 2, 3
    elif img.ndim == 3 and img.shape[2] == 4:
        color_type, channels = 6, 4
    else:
        raise ValueError(f"unsupported array shape {img.shape}")
    h, w = img.shape[:2]
    body = img.reshape(h, w * channels)
    raw = b"".join(b"\x00" + body[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_image(payload: bytes, mime: str) -> np.ndarray:
    """Dispatch on mime → uint8 pixel array."""
    if mime == "image/bmp":
        return decode_bmp(payload)
    if mime == "image/png":
        return decode_png(payload)
    if mime in ("image/x-portable-pixmap", "image/x-portable-graymap"):
        return decode_ppm(payload)
    try:  # optional real library for entropy-coded formats
        from PIL import Image  # type: ignore[import-not-found]

        return np.asarray(Image.open(io.BytesIO(payload)))
    except ImportError:
        raise ValueError(
            f"unsupported image mime {mime!r}; dependency-free codecs cover "
            f"{sorted(SUPPORTED_IMAGE_MIMES)} (install pillow for JPEG etc.)"
        ) from None


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via pure index gather (no interpolation lib)."""
    h, w = img.shape[:2]
    ys = np.clip(((np.arange(height) + 0.5) * h / height).astype(np.int64), 0, h - 1)
    xs = np.clip(((np.arange(width) + 0.5) * w / width).astype(np.int64), 0, w - 1)
    return img[ys][:, xs]


# ---------------------------------------------------------------------------
# feature kernels (fixed FEATURE_DIM-sized vectors; see multimodal.py)


def image_features(img: np.ndarray, dim: int = 16) -> list[float]:
    """16 deterministic image features: per-channel mean/std (6), normalized
    gradient energies (2), 8-bin grayscale histogram (8); padded/truncated
    to ``dim``."""
    px = img.astype(np.float64)  # float64 accumulation: feature values stay
    # stable to ~1e-15 relative, so quantized oracle checks don't flap
    if px.ndim == 2:
        px = px[:, :, None]
    rgb = px[:, :, :3] if px.shape[2] >= 3 else np.repeat(px[:, :, :1], 3, axis=2)
    gray = rgb.mean(axis=2)
    feats = []
    for ch in range(3):
        feats.append(float(rgb[:, :, ch].mean()) / 255.0)
        feats.append(float(rgb[:, :, ch].std()) / 255.0)
    gx = np.abs(np.diff(gray, axis=1)).mean() if gray.shape[1] > 1 else 0.0
    gy = np.abs(np.diff(gray, axis=0)).mean() if gray.shape[0] > 1 else 0.0
    feats += [float(gx) / 255.0, float(gy) / 255.0]
    hist, _ = np.histogram(gray, bins=8, range=(0.0, 255.0))
    feats += (hist / max(gray.size, 1)).astype(np.float64).tolist()
    return (feats + [0.0] * dim)[:dim]


def audio_features(samples: np.ndarray, sample_rate: int, dim: int = 16) -> list[float]:
    """16 deterministic audio features: duration(s), RMS, zero-crossing
    rate, spectral centroid (normalized), plus 12 log-spaced FFT band
    energies; padded/truncated to ``dim``."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    n = len(mono)
    if n == 0:
        return [0.0] * dim
    duration = n / float(sample_rate)
    rms = float(np.sqrt(np.mean(mono**2)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(mono).astype(np.int8))))) if n > 1 else 0.0
    spec = np.abs(np.fft.rfft(mono))
    freqs = np.fft.rfftfreq(n, 1.0 / sample_rate)
    total = float(spec.sum())
    centroid = float((freqs * spec).sum() / total / (sample_rate / 2)) if total > 0 else 0.0
    feats = [duration, rms, zcr, centroid]
    # 12 log-spaced bands from 20 Hz to Nyquist
    nyquist = sample_rate / 2
    edges = np.geomspace(20.0, max(nyquist, 21.0), 13)
    power = spec**2
    tp = float(power.sum()) or 1.0
    for lo, hi in zip(edges[:-1], edges[1:]):
        mask = (freqs >= lo) & (freqs < hi)
        feats.append(float(power[mask].sum()) / tp)
    return (feats + [0.0] * dim)[:dim]
