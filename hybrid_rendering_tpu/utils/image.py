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
    with open(path, "wb") as f:
        f.write(png)


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
