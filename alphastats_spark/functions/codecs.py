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

* **JPEG** (``image/jpeg``) — baseline sequential DCT: huffman tables read
  from the file, numpy dequant + matrix IDCT, grayscale/YCbCr with any
  integer sampling factors and restart intervals (progressive and
  arithmetic coding raise). A matching 4:4:4 encoder exists for fixture
  generation.

Video containers stay behind an import-try of the optional real libraries
(``pillow`` etc.).

Everything here is driver-independent pure functions over ``bytes`` so the
Spark layer (:mod:`.multimodal`) can call them inside ``mapInPandas``
batches without serialization surprises.
"""

from __future__ import annotations

import functools as _functools
import io
import types as _types
import struct
import zlib

import numpy as np

SUPPORTED_IMAGE_MIMES = {
    "image/bmp",
    "image/png",
    "image/jpeg",
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
    if mime == "image/jpeg":
        return decode_jpeg(payload)
    try:  # optional real library for formats beyond the built-in kernels
        from PIL import Image  # type: ignore[import-not-found]

        return np.asarray(Image.open(io.BytesIO(payload)))
    except ImportError:
        raise ValueError(
            f"unsupported image mime {mime!r}; dependency-free codecs cover "
            f"{sorted(SUPPORTED_IMAGE_MIMES)} (install pillow for WEBP etc.)"
        ) from None


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via pure index gather (no interpolation lib)."""
    h, w = img.shape[:2]
    ys = np.clip(((np.arange(height) + 0.5) * h / height).astype(np.int64), 0, h - 1)
    xs = np.clip(((np.arange(width) + 0.5) * w / width).astype(np.int64), 0, w - 1)
    return img[ys][:, xs]


# ---------------------------------------------------------------------------
# JPEG — baseline sequential DCT (ITU T.81), dependency-free
#
# Entropy-coded but still tractable without native libraries: huffman
# tables are read from the file's DHT segments, blocks are huffman-decoded
# in Python (small fixed alphabets), and dequant + 2-D IDCT are numpy
# matrix products. Supported: 8-bit baseline (SOF0), grayscale and YCbCr,
# arbitrary integer sampling factors (replication upsampling), restart
# intervals. Not supported (raises): progressive (SOF2), arithmetic
# coding, 12-bit precision.
#
# The encoder emits 4:4:4 baseline with the Annex-K huffman tables and —
# by default — an all-ones quantization table: for smooth content the
# DCT→quant→IDCT roundtrip is then within ±1/LSB, and for CONSTANT blocks
# it is bit-exact (only the integer DC coefficient is non-zero), which is
# what lets a driver gate query check real JPEG decode against a SQL
# oracle.

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.3 typical huffman tables (luminance set; the encoder uses them
# for every component, which is legal — components just reference table 0)
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_basis() -> np.ndarray:
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    c = np.cos((2 * x + 1) * u * np.pi / 16) * np.sqrt(2.0 / 8.0)
    c[0, :] = np.sqrt(1.0 / 8.0)
    return c


_DCT_C = _dct_basis()


@_functools.lru_cache(maxsize=64)
def _huff_codes_cached(bits: tuple, vals: tuple):
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    # read-only view: every caller shares one cached table, and a future
    # caller mutating it would silently corrupt every other user of the
    # same (bits, vals) key — the proxy makes that a TypeError instead
    return _types.MappingProxyType(out)


@_functools.lru_cache(maxsize=64)
def _huff_lookup_cached(bits: tuple, vals: tuple):
    return _types.MappingProxyType({
        (ln, code): sym for sym, (code, ln) in _huff_codes_cached(bits, vals).items()
    })


def _huff_codes(bits: list[int], vals: list[int]):
    """Canonical code assignment: symbol → (code, length).

    Memoized on the (bits, vals) table definition: real corpora reuse a
    handful of tables (ours always emits the two standard ones), and
    rebuilding the dicts per IMAGE was ~38% of a small-image decode.
    The returned mapping is a read-only MappingProxyType — the cached
    dicts are SHARED across callers, so mutation is a bug by construction
    and now raises; the 64-entry LRU bounds memory against adversarial
    per-image tables."""
    return _huff_codes_cached(tuple(bits), tuple(vals))


def _huff_lookup(bits: list[int], vals: list[int]):
    """Decoder-side map: (length, code) → symbol. Memoized — see
    :func:`_huff_codes`."""
    return _huff_lookup_cached(tuple(bits), tuple(vals))


class _BitReader:
    """MSB-first bit reader over UNSTUFFED entropy-coded bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream truncated")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG huffman code")


def _extend(value: int, size: int) -> int:
    if size == 0:
        return 0
    return value if value >= (1 << (size - 1)) else value - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG → uint8 array (H, W) grayscale or (H, W, 3) RGB."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    i = 2
    scan: bytes | None = None
    scan_comps: list[dict] = []
    while i < len(payload):
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
        seg = payload[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0xF
                if pq:
                    tbl = np.frombuffer(seg[j + 1 : j + 129], dtype=">u2").astype(np.int64)
                    j += 129
                else:
                    tbl = np.frombuffer(seg[j + 1 : j + 65], dtype=np.uint8).astype(np.int64)
                    j += 65
                nat = np.empty(64, dtype=np.int64)
                nat[_ZIGZAG] = tbl
                qt[tq] = nat.reshape(8, 8)
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext. seq.)
            if seg[0] != 8:
                raise ValueError("only 8-bit JPEG supported")
            h, w = struct.unpack(">HH", seg[1:5])
            nf = seg[5]
            comps = []
            for k in range(nf):
                cid, hv, tq = seg[6 + 3 * k : 9 + 3 * k]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG (SOF0) supported")
        elif marker == 0xC4:  # DHT (possibly several tables)
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0xF
                bits = list(seg[j + 1 : j + 17])
                n = sum(bits)
                vals = list(seg[j + 17 : j + 17 + n])
                huff[(tc, th)] = _huff_lookup(bits, vals)
                j += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows the segment
            ns = seg[0]
            scan_comps = []
            for k in range(ns):
                cs, tda = seg[1 + 2 * k : 3 + 2 * k]
                comp = next(c for c in comps if c["id"] == cs)
                scan_comps.append({**comp, "td": tda >> 4, "ta": tda & 0xF})
            j = i + 2 + seg_len
            start = j
            while j < len(payload) - 1:
                if payload[j] == 0xFF and payload[j + 1] not in (0x00,) and not (
                    0xD0 <= payload[j + 1] <= 0xD7
                ):
                    break
                j += 1
            scan = payload[start:j]
            i = j
            continue
        i += 2 + seg_len
    if scan is None or not comps:
        raise ValueError("JPEG missing SOS/SOF")

    hmax = max(c["h"] for c in scan_comps)
    vmax = max(c["v"] for c in scan_comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # split on restart markers; unstuff 0xFF00 within each interval
    intervals = []
    j = 0
    cur_start = 0
    while j < len(scan) - 1:
        if scan[j] == 0xFF and 0xD0 <= scan[j + 1] <= 0xD7:
            intervals.append(scan[cur_start:j])
            cur_start = j + 2
            j += 2
        else:
            j += 1
    intervals.append(scan[cur_start:])
    intervals = [iv.replace(b"\xff\x00", b"\xff") for iv in intervals]

    planes = {
        ci: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        for ci, c in enumerate(scan_comps)
    }
    pred = [0] * len(scan_comps)
    reader = _BitReader(intervals[0])
    interval_idx = 0
    mcu_in_interval = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_in_interval == restart_interval:
                interval_idx += 1
                reader = _BitReader(intervals[interval_idx])
                pred = [0] * len(scan_comps)
                mcu_in_interval = 0
            for ci, c in enumerate(scan_comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        t = reader.read_symbol(huff[(0, c["td"])])
                        diff = _extend(reader.read_bits(t), t)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.read_symbol(huff[(1, c["ta"])])
                            r, s = rs >> 4, rs & 0xF
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index out of range")
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        nat = np.empty(64, dtype=np.int64)
                        nat[_ZIGZAG] = zz
                        block = nat.reshape(8, 8) * qt[c["tq"]]
                        px = _DCT_C.T @ block @ _DCT_C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_in_interval += 1

    # upsample to full resolution and crop
    full = []
    for ci, c in enumerate(scan_comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.rint(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def flush(self) -> bytes:
        if self.nbits:
            self.acc = (self.acc << (8 - self.nbits)) | ((1 << (8 - self.nbits)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def encode_jpeg(img: np.ndarray, quant: np.ndarray | None = None) -> bytes:
    """Baseline 4:4:4 JPEG encoder (grayscale or RGB uint8 input).

    ``quant`` is an 8×8 table in natural order; the default all-ones table
    makes the roundtrip near-lossless (bit-exact for constant blocks —
    only the integer DC survives the DCT)."""
    if quant is None:
        quant = np.ones((8, 8), dtype=np.int64)
    quant = quant.astype(np.int64)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ncomp = 1 if gray else 3
    if not gray:
        px = img.astype(np.float64)
        y = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
        cb = -0.168736 * px[:, :, 0] - 0.331264 * px[:, :, 1] + 0.5 * px[:, :, 2] + 128.0
        cr = 0.5 * px[:, :, 0] - 0.418688 * px[:, :, 1] - 0.081312 * px[:, :, 2] + 128.0
        channels = [y, cb, cr]
    else:
        channels = [img.astype(np.float64)]

    # pad to 8×8 multiples by edge replication (skipped when already
    # aligned — np.pad with zero widths still copies the array)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    if ph != h or pw != w:
        channels = [
            np.pad(c, ((0, ph - h), (0, pw - w)), mode="edge") for c in channels
        ]

    dc_codes = _huff_codes(_DC_BITS, _DC_VALS)
    ac_codes = _huff_codes(_AC_BITS, _AC_VALS)
    wtr = _BitWriter()
    pred = [0] * ncomp
    for by in range(ph // 8):
        for bx in range(pw // 8):
            for ci in range(ncomp):
                block = channels[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                coef = _DCT_C @ block @ _DCT_C.T
                q = np.rint(coef / quant).astype(np.int64)
                zz = q.reshape(64)[_ZIGZAG]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                size = int(abs(diff)).bit_length()
                code, ln = dc_codes[size]
                wtr.write(code, ln)
                if size:
                    bits = diff if diff > 0 else diff + (1 << size) - 1
                    wtr.write(bits, size)
                run = 0
                last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if k > last_nz:
                        code, ln = ac_codes[0x00]  # EOB
                        wtr.write(code, ln)
                        break
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_codes[0xF0]  # ZRL
                        wtr.write(code, ln)
                        run -= 16
                    size = int(abs(v)).bit_length()
                    code, ln = ac_codes[(run << 4) | size]
                    wtr.write(code, ln)
                    bits = v if v > 0 else v + (1 << size) - 1
                    wtr.write(bits, size)
                    run = 0
    entropy = wtr.flush()

    out = bytearray(b"\xff\xd8")
    zz_q = quant.reshape(64)[_ZIGZAG]
    if ((zz_q < 0) | (zz_q > 255)).any():  # baseline DQT is 8-bit (Pq=0)
        raise ValueError("quantization table entries must be in [0, 255]")
    out += (
        b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"
        + zz_q.astype(np.uint8).tobytes()
    )
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, bits, vals in ((0, _DC_BITS, _DC_VALS), (1, _AC_BITS, _AC_VALS)):
        body = bytes([tc << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    sos = bytes([ncomp]) + b"".join(bytes([ci + 1, 0x00]) for ci in range(ncomp))
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += entropy + b"\xff\xd9"
    return bytes(out)


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
