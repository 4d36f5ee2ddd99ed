"""Tone mapping — exposure x ACES film x gamma.

Behavioural twin of src/tone_map.{h,cpp} + src/shaders/tone_map.frag
(SURVEY §2.8): exposure multiply, ACES filmic fit, gamma 1/2.2, plus the
single_channel replication used for shadow/AO visualization
(tone_map.frag:52-53)."""
from __future__ import annotations

import jax.numpy as jnp

from hybrid_rendering_tpu.config import ToneMapConfig


def aces_film(x):
    """ACES filmic fit (tone_map.frag:36-44 style, Narkowicz fit)."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def tonemap(hdr, cfg: ToneMapConfig = ToneMapConfig(), single_channel: bool = False):
    """(H,W,3) HDR -> (H,W,3) display [0,1]."""
    x = hdr
    if single_channel:
        x = jnp.repeat(x[..., :1], 3, axis=-1) if x.ndim == 3 else jnp.stack(
            [x, x, x], -1
        )
    x = x * cfg.exposure
    if cfg.aces:
        x = aces_film(x)
    else:
        x = jnp.clip(x, 0.0, 1.0)
    return jnp.power(jnp.maximum(x, 0.0), 1.0 / cfg.gamma)
