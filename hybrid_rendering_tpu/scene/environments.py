"""File-based HDR environment stack.

The reference ships 4 artist-made HDR equirect maps loaded via stb_image
and converted to 1024^2 cubemaps + SH + GGX prefilter (common.cpp:597-625;
environment combo main.cpp:292-308). Those binary assets are not in its
repo (README.md:47 points at a release archive), so this module provides
(a) a loader for any user-supplied .hdr file and (b) four procedurally
synthesized stand-in environments with the same dynamic-range character
(sky dome + sun disk, sunset, overcast interior-ish light, night), written
through and read back from the RGBE codec so the full file path is
exercised.
"""
from __future__ import annotations

import os

import numpy as np

from hybrid_rendering_tpu.utils import image as img_utils

ENVIRONMENT_NAMES = ("procedural_sky", "arches", "basketball_court",
                     "environment", "overcast")
# name mapping note: the reference's combo lists Arches / Basketball Court /
# Environment / Overcast (main.cpp environment list) — the synthetic maps
# below stand in for those assets with matching lighting character.


def _dirs_equirect(h: int, w: int):
    """Unit direction per texel, matching ops/envmap._dir_to_equirect_uv."""
    theta = (np.arange(h) + 0.5) / h * np.pi
    phi = ((np.arange(w) + 0.5) / w - 0.5) * 2.0 * np.pi
    st = np.sin(theta)[:, None]
    d = np.stack(
        [
            st * np.cos(phi)[None, :],
            np.cos(theta)[:, None] * np.ones((1, w)),
            st * np.sin(phi)[None, :],
        ],
        axis=-1,
    )
    return d.astype(np.float32)


def _sun_disk(d, sun_dir, intensity, sharpness):
    cosang = np.clip(np.sum(d * sun_dir, axis=-1), -1.0, 1.0)
    return np.exp((cosang - 1.0) * sharpness)[..., None] * intensity


def synth_sunset(h=256, w=512):
    """Warm low-sun environment (Arches-like: strong directional + warm
    ground bounce)."""
    d = _dirs_equirect(h, w)
    y = d[..., 1]
    sun = np.array([0.93, 0.12, 0.35])
    sun /= np.linalg.norm(sun)
    horizon = np.exp(-np.abs(y) * 4.0)
    sky = (
        np.array([0.25, 0.30, 0.55]) * np.clip(y, 0, 1)[..., None]
        + np.array([2.0, 0.9, 0.35]) * horizon[..., None]
    )
    ground = np.array([0.35, 0.22, 0.12]) * np.clip(-y, 0, 1)[..., None]
    img = sky + ground + _sun_disk(d, sun, np.array([60.0, 30.0, 12.0]), 800.0)
    return img.astype(np.float32)


def synth_court(h=256, w=512):
    """Indoor court: bright rectangular ceiling panels + wood-toned floor
    (Basketball-Court-like)."""
    d = _dirs_equirect(h, w)
    y = d[..., 1]
    phi = np.arctan2(d[..., 2], d[..., 0])
    panels = (np.sin(phi * 4.0) > 0.55) & (y > 0.55)
    img = np.full((h, w, 3), 0.18, np.float32)
    img += np.array([0.25, 0.20, 0.14]) * np.clip(-y, 0, 1)[..., None]
    img += np.array([0.10, 0.11, 0.13]) * np.clip(y, 0, 1)[..., None]
    img[panels] = [14.0, 14.5, 15.0]
    return img.astype(np.float32)


def synth_meadow(h=256, w=512):
    """Daylight meadow: blue gradient sky, green ground, high sun
    ("Environment"-like generic outdoor map)."""
    d = _dirs_equirect(h, w)
    y = d[..., 1]
    sun = np.array([0.3, 0.8, 0.5])
    sun /= np.linalg.norm(sun)
    sky = (
        np.array([0.35, 0.55, 1.05]) * np.clip(y, 0, 1)[..., None] ** 0.6
        + np.array([0.75, 0.85, 1.0]) * np.exp(-np.abs(y) * 3.0)[..., None]
    )
    ground = np.array([0.16, 0.30, 0.10]) * np.clip(-y, 0, 1)[..., None]
    img = sky + ground + _sun_disk(d, sun, np.array([90.0, 85.0, 70.0]), 1500.0)
    return img.astype(np.float32)


def synth_overcast(h=256, w=512):
    """Flat gray dome, soft top-weighted luminance (Overcast-like)."""
    d = _dirs_equirect(h, w)
    y = d[..., 1]
    lum = 0.6 + 1.4 * np.clip(y, 0, 1) ** 1.2
    img = np.stack([lum, lum, lum * 1.05], -1)
    img *= np.where(y < 0, 0.25, 1.0)[..., None]
    return img.astype(np.float32)


_SYNTH = {
    "arches": synth_sunset,
    "basketball_court": synth_court,
    "environment": synth_meadow,
    "overcast": synth_overcast,
}


def environment_hdr_path(name: str, cache_dir: str | None = None) -> str:
    """Synthesize (once) and return the .hdr path for a named environment."""
    if name not in _SYNTH:
        raise ValueError(f"unknown environment {name!r}; "
                         f"choose from {sorted(_SYNTH)} or pass a .hdr path")
    cache_dir = cache_dir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "data", "env")
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"{name}.hdr")
    if not os.path.exists(path):
        img_utils.write_hdr(path, _SYNTH[name]())
    return path


def load_environment(name_or_path: str, num_levels: int = 5):
    """name or .hdr file -> EquirectEnvironment (radiance + prefilter
    pyramid). The equivalent of the reference's equirect->cubemap +
    mip-gen step (common.cpp:603-613)."""
    from hybrid_rendering_tpu.ops.envmap import EquirectEnvironment

    path = name_or_path
    if not os.path.exists(path):
        path = environment_hdr_path(name_or_path)
    img = img_utils.read_hdr(path)
    return EquirectEnvironment.from_image(img, num_levels=num_levels)
