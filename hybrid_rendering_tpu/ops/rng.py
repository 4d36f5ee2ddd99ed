"""Counter-free vectorized RNG — xoroshiro64* + Wang hash.

Behavioural twin of the reference's GLSL RNG (src/shaders/random.glsl:8-77):
same generator so sample sequences are statistically comparable, but
vectorized over whole ray batches as uint32 arrays (no per-thread state in
registers — state is just a pytree of two uint32 lanes, perfect for VPU).

All functions are shape-polymorphic: state lanes may be any shape.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array

_U32 = jnp.uint32


@struct.dataclass
class RNG:
    """xoroshiro64* state: two uint32 lanes of identical shape."""

    s0: Array
    s1: Array


def _rotl(x: Array, k: int) -> Array:
    return (x << _U32(k)) | (x >> _U32(32 - k))


def wang_hash(seed: Array) -> Array:
    """Thomas Wang 32-bit hash (reference random.glsl:30-39)."""
    seed = jnp.asarray(seed, _U32)
    seed = (seed ^ _U32(61)) ^ (seed >> _U32(16))
    seed = seed * _U32(9)
    seed = seed ^ (seed >> _U32(4))
    seed = seed * _U32(0x27D4EB2D)
    seed = seed ^ (seed >> _U32(15))
    return seed


def rng_init(pixel_id_x: Array, pixel_id_y: Array, frame_index) -> RNG:
    """Seed per-pixel streams.

    The reference seeds s0 = hash(pixel), s1 = hash(frame)
    (random.glsl:41-53) — with s1 pixel-independent, the first samples of a
    frame correlate across the screen and progressive accumulation shows
    ring banding (one ring per frame around punctual lights). Here the
    frame hash is mixed into BOTH lanes per pixel, which removes the
    artifact while keeping the same xoroshiro64* generator."""
    x = jnp.asarray(pixel_id_x, _U32)
    y = jnp.asarray(pixel_id_y, _U32)
    f = jnp.broadcast_to(jnp.asarray(frame_index, _U32), x.shape)
    pix = wang_hash((x << _U32(16)) | y)
    fh = wang_hash(f + _U32(0x9E3779B9))
    s0 = wang_hash(pix ^ fh)
    s1 = wang_hash(pix + fh * _U32(0x85EBCA6B))
    rng = RNG(s0=s0, s1=s1)
    rng, _ = next_uint(rng)
    return rng


def next_uint(rng: RNG):
    """One xoroshiro64* step (reference random.glsl:16-27).
    Returns (new_state, uint32 sample)."""
    result = rng.s0 * _U32(0x9E3779BB)
    s1 = rng.s1 ^ rng.s0
    s0 = _rotl(rng.s0, 26) ^ s1 ^ (s1 << _U32(9))
    s1 = _rotl(s1, 13)
    return RNG(s0=s0, s1=s1), result


def next_float(rng: RNG):
    """Uniform in [0,1) via mantissa-fill (reference random.glsl:55-59)."""
    rng, u = next_uint(rng)
    bits = _U32(0x3F800000) | (u >> _U32(9))
    f = jax.lax.bitcast_convert_type(bits, jnp.float32) - 1.0
    return rng, f


def next_vec2(rng: RNG):
    rng, a = next_float(rng)
    rng, b = next_float(rng)
    return rng, jnp.stack([a, b], axis=-1)


def next_vec3(rng: RNG):
    rng, a = next_float(rng)
    rng, b = next_float(rng)
    rng, c = next_float(rng)
    return rng, jnp.stack([a, b, c], axis=-1)


def pcg2d(v: Array) -> Array:
    """pcg2d hash for decorrelated 2D sequences (used where the reference
    uses the blue-noise sampler fallback). v: (..., 2) uint32."""
    v = jnp.asarray(v, _U32)
    v = v * _U32(1664525) + _U32(1013904223)
    x = v[..., 0] + v[..., 1] * _U32(1664525)
    y = v[..., 1] + x * _U32(1664525)
    x = x ^ (x >> _U32(16))
    y = y ^ (y >> _U32(16))
    x = x + y * _U32(1664525)
    y = y + x * _U32(1664525)
    x = x ^ (x >> _U32(16))
    y = y ^ (y >> _U32(16))
    return jnp.stack([x, y], axis=-1)


def uint_to_unit_float(u: Array) -> Array:
    bits = _U32(0x3F800000) | (jnp.asarray(u, _U32) >> _U32(9))
    return jax.lax.bitcast_convert_type(bits, jnp.float32) - 1.0
