"""Image IO + metrics (PNG writer without external deps, RMSE harness).

The reference verifies visually against the GT path tracer (SURVEY §4);
this module is the automated replacement: RMSE between any pass output and
the oracle, plus zero-dependency PNG dumps for inspection.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np


def tonemap_for_display(hdr: np.ndarray, exposure: float = 1.0, gamma: float = 2.2):
    """Simple display transform for debug dumps (the real ACES pass lives
    in models/tonemap.py)."""
    x = np.clip(np.asarray(hdr, np.float32) * exposure, 0.0, None)
    x = x / (1.0 + x)
    return np.clip(x ** (1.0 / gamma), 0.0, 1.0)


def write_png(path: str, img: np.ndarray):
    """Write an (H,W,3) float [0,1] or uint8 image as PNG (pure python)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w, c = img.shape
    assert c in (3, 4)

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    color_type = 2 if c == 3 else 6
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
    if hasattr(path, "write"):  # file-like (viewer streaming)
        path.write(png)
    else:
        with open(path, "wb") as f:
            f.write(png)


def read_png(data_or_path) -> np.ndarray:
    """Minimal PNG reader (8/16-bit, RGB/RGBA/gray, non-interlaced).
    Returns (H, W, C) float32 in [0, 1]. Pure python (zlib only)."""
    if isinstance(data_or_path, (bytes, bytearray)):
        data = bytes(data_or_path)
    else:
        with open(data_or_path, "rb") as f:
            data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos = 8
    idat = b""
    w = h = bitdepth = color_type = None
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, bitdepth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if interlace:
                raise ValueError("interlaced PNG not supported")
        elif tag == b"IDAT":
            idat += chunk
        elif tag == b"IEND":
            break
        pos += 12 + length
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    raw = zlib.decompress(idat)
    bpp = channels * (bitdepth // 8)
    stride = w * bpp
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    off = 0
    for y in range(h):
        ftype = raw[off]
        line = np.frombuffer(raw, np.uint8, stride, off + 1).copy()
        off += 1 + stride
        if ftype == 1:  # sub
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif ftype == 2:  # up
            line = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ftype == 3:  # average
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((int(left) + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # paeth
            for x in range(stride):
                a = int(line[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        out[y] = line
        prev = line
    if bitdepth == 16:
        img16 = out.reshape(h, w, channels, 2)
        img = (img16[..., 0].astype(np.float32) * 256
               + img16[..., 1]) / 65535.0
    else:
        img = out.reshape(h, w, channels).astype(np.float32) / 255.0
    return img


def write_hdr(path: str, img: np.ndarray):
    """Write a Radiance RGBE (.hdr) file (flat scanlines, no RLE).

    The reference loads its environments from .hdr equirect maps
    (common.cpp:597-625 via the dw framework's stb_image HDR path); this
    pair of functions is the TPU framework's RGBE codec."""
    img = np.asarray(img, np.float32)
    assert img.ndim == 3 and img.shape[2] == 3, "expected (H, W, 3)"
    h, w = img.shape[:2]
    maxc = np.max(img, axis=2)
    # frexp: maxc = m * 2^e with m in [0.5, 1)
    m, e = np.frexp(np.maximum(maxc, 1e-32))
    scale = np.where(maxc > 1e-32, m * 256.0 / np.maximum(maxc, 1e-32), 0.0)
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = np.clip(img * scale[..., None] + 0.5, 0, 255
                            ).astype(np.uint8)
    rgbe[..., 3] = np.where(maxc > 1e-32, e + 128, 0).astype(np.uint8)
    header = (b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n"
              + f"-Y {h} +X {w}\n".encode())
    with open(path, "wb") as f:
        f.write(header + rgbe.tobytes())


def _decode_rgbe(rgbe: np.ndarray) -> np.ndarray:
    """(..., 4) uint8 RGBE -> (..., 3) float32 linear radiance."""
    e = rgbe[..., 3].astype(np.int32)
    scale = np.where(e > 0, np.ldexp(1.0, e - 136), 0.0).astype(np.float32)
    return rgbe[..., :3].astype(np.float32) * scale[..., None]


def read_hdr(data_or_path) -> np.ndarray:
    """Read a Radiance RGBE (.hdr) file -> (H, W, 3) float32 linear.

    Supports flat scanlines, new-style (adaptive per-component) RLE, and
    old-style repeat codes — the formats stb_image handles for the
    reference's environment maps."""
    if isinstance(data_or_path, (bytes, bytearray)):
        data = bytes(data_or_path)
    else:
        with open(data_or_path, "rb") as f:
            data = f.read()
    if not (data.startswith(b"#?RADIANCE") or data.startswith(b"#?RGBE")):
        raise ValueError("not a Radiance HDR file")
    # header = lines until a blank line, then the resolution line
    pos = 0
    while True:
        nl = data.index(b"\n", pos)
        line = data[pos:nl]
        pos = nl + 1
        if line == b"":
            break
    nl = data.index(b"\n", pos)
    res = data[pos:nl].split()
    pos = nl + 1
    if len(res) != 4 or res[0] != b"-Y" or res[2] != b"+X":
        raise ValueError(f"unsupported HDR orientation: {res}")
    h, w = int(res[1]), int(res[3])

    buf = np.frombuffer(data, np.uint8, offset=pos)
    out = np.zeros((h, w, 4), np.uint8)
    i = 0
    for y in range(h):
        if w >= 8 and w < 32768 and i + 4 <= len(buf) and buf[i] == 2 \
                and buf[i + 1] == 2 and (int(buf[i + 2]) << 8 | int(buf[i + 3])) == w:
            i += 4  # new-style RLE: 4 component planes
            for c in range(4):
                x = 0
                while x < w:
                    count = int(buf[i])
                    if count > 128:  # run
                        out[y, x:x + count - 128, c] = buf[i + 1]
                        x += count - 128
                        i += 2
                    else:  # literal
                        out[y, x:x + count, c] = buf[i + 1:i + 1 + count]
                        x += count
                        i += 1 + count
        else:  # flat / old-style RLE
            x = 0
            shift = 0
            while x < w:
                px = buf[i:i + 4]
                i += 4
                if px[0] == 1 and px[1] == 1 and px[2] == 1:  # old repeat
                    count = int(px[3]) << shift
                    out[y, x:x + count] = out[y, x - 1]
                    x += count
                    shift += 8
                else:
                    out[y, x] = px
                    x += 1
                    shift = 0
    return _decode_rgbe(out)


def rmse(a: np.ndarray, b: np.ndarray) -> float:
    """Root-mean-square error between two images (fidelity gate:
    <=2% vs GT, BASELINE.md north star)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.sqrt(np.mean((a - b) ** 2)))


def relative_rmse(a: np.ndarray, ref: np.ndarray) -> float:
    """RMSE normalized by the reference's RMS magnitude."""
    ref = np.asarray(ref, np.float64)
    denom = max(np.sqrt(np.mean(ref**2)), 1e-9)
    return rmse(a, ref) / denom
