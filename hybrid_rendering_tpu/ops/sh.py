"""Spherical-harmonics environment irradiance + GGX prefilter stand-in.

Replaces the dw extras CubemapSHProjection / CubemapPrefiler [sic]
(SURVEY §2.9): the environment is an analytic function of direction here,
so SH-9 projection is a Monte-Carlo integral done once at setup (host), and
the "prefiltered cubemap mip chain" becomes roughness-blended evaluation —
sharp env at roughness 0 lerping toward the SH irradiance at roughness 1.
Consumed by deferred shading as the no-DDGI / no-reflections fallbacks
(deferred.frag:115-141, 162-168)."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _sh_basis(d):
    """Real SH basis l<=2, 9 coefficients. d: (..., 3) unit."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    one = jnp.ones_like(x)
    return jnp.stack(
        [
            0.282095 * one,
            0.488603 * y,
            0.488603 * z,
            0.488603 * x,
            1.092548 * x * y,
            1.092548 * y * z,
            0.315392 * (3.0 * z * z - 1.0),
            1.092548 * x * z,
            0.546274 * (x * x - y * y),
        ],
        axis=-1,
    )  # (..., 9)


def project_sky_sh9(sky_radiance_fn, num_samples: int = 4096, seed: int = 0):
    """Monte-Carlo SH-9 projection of an analytic sky. Returns (9,3)."""
    rs = np.random.RandomState(seed)
    u = rs.uniform(size=(num_samples, 2))
    z = 1.0 - 2.0 * u[:, 0]
    phi = 2.0 * np.pi * u[:, 1]
    s = np.sqrt(np.maximum(1.0 - z * z, 0.0))
    dirs = np.stack([s * np.cos(phi), z, s * np.sin(phi)], axis=-1).astype(np.float32)
    d = jnp.asarray(dirs)
    radiance = sky_radiance_fn(d)  # (N,3)
    basis = _sh_basis(d)  # (N,9)
    # integral over sphere: 4*pi/N * sum
    coeffs = (4.0 * np.pi / num_samples) * jnp.einsum("nc,nk->kc", radiance, basis)
    return coeffs  # (9,3)


def project_equirect_sh9(img) -> jnp.ndarray:
    """Exact SH-9 projection of an equirect HDR map (the dw
    CubemapSHProjection equivalent for file-based environments,
    common.cpp:614-622). Texel solid angle = sin(theta) dtheta dphi.
    Returns (9,3)."""
    img = np.asarray(img, np.float32)
    h, w = img.shape[:2]
    theta = (np.arange(h) + 0.5) / h * np.pi  # v=0 -> +Y pole
    phi = ((np.arange(w) + 0.5) / w - 0.5) * 2.0 * np.pi
    st = np.sin(theta)
    # dir convention matches _dir_to_equirect_uv (ops/envmap.py)
    dy = np.cos(theta)[:, None] * np.ones((1, w))
    dx = st[:, None] * np.cos(phi)[None, :]
    dz = st[:, None] * np.sin(phi)[None, :]
    dirs = jnp.asarray(np.stack([dx, dy, dz], -1).reshape(-1, 3))
    weights = (st[:, None] * np.ones((1, w))).reshape(-1)
    weights = weights * (np.pi / h) * (2.0 * np.pi / w)
    basis = _sh_basis(dirs)  # (N,9)
    rad = jnp.asarray(img.reshape(-1, 3))
    return jnp.einsum("nc,nk,n->kc", rad, basis, jnp.asarray(weights))


# cosine-convolution factors for irradiance (Ramamoorthi & Hanrahan)
_A = jnp.asarray(
    [np.pi, 2.0943951, 2.0943951, 2.0943951, 0.785398, 0.785398, 0.785398,
     0.785398, 0.785398],
    jnp.float32,
)


def eval_irradiance_sh9(coeffs, n):
    """Diffuse irradiance E(n)/pi for SH-9 coeffs (deferred.frag:115-141
    consumes the same 9-coeff projection)."""
    basis = _sh_basis(n)  # (...,9)
    e = jnp.einsum("...k,kc,k->...c", basis, coeffs, _A)
    return jnp.maximum(e / np.pi, 0.0)


def brdf_integrate_lut(size: int = 32, num_samples: int = 256, seed: int = 7):
    """Preintegrated split-sum BRDF LUT (dw BRDFIntegrateLUT equivalent,
    SURVEY §2.9) — Monte-Carlo over GGX half-vectors. Returns
    (size, size, 2): [scale, bias] indexed by (ndotv, roughness).
    deferred shading uses the analytic fit by default; this LUT is the
    exact-parity option."""
    import jax.numpy as jnp
    from hybrid_rendering_tpu.ops import brdf as brdf_ops
    from hybrid_rendering_tpu.ops.math3d import dot, normalize

    rs = np.random.RandomState(seed)
    xi = jnp.asarray(rs.uniform(size=(num_samples, 2)), jnp.float32)

    ndotv = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    rough = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    NV, R = jnp.meshgrid(ndotv, rough, indexing="ij")  # (S,S)

    v = jnp.stack([jnp.sqrt(1 - NV**2), jnp.zeros_like(NV), NV], -1)  # (S,S,3)
    n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), v.shape)

    def accum(carry, x):
        a_acc, b_acc = carry
        xi2 = x
        alpha = R * R
        h = brdf_ops.sample_specular_ggx_lobe(n, alpha, jnp.broadcast_to(xi2, v.shape[:-1] + (2,)))
        l = 2.0 * dot(v, h)[..., None] * h - v
        nl = jnp.clip(l[..., 2], 0.0, 1.0)
        nh = jnp.clip(h[..., 2], 0.0, 1.0)
        vh = jnp.clip(dot(v, h), 0.0, 1.0)
        valid = nl > 0
        g = brdf_ops.g_schlick_ggx(nl, jnp.clip(NV, 1e-4, 1.0), R)
        g_vis = jnp.where(valid, g * vh / jnp.maximum(nh * jnp.maximum(NV, 1e-4), 1e-6), 0.0)
        fc = jnp.power(1.0 - vh, 5.0)
        return (a_acc + (1 - fc) * g_vis, b_acc + fc * g_vis), None

    (a, b), _ = jax.lax.scan(accum, (jnp.zeros_like(NV), jnp.zeros_like(NV)), xi)
    return jnp.stack([a, b], -1) / num_samples


def make_image_env_fallbacks(env):
    """(irradiance_fn, prefiltered_fn) for an EquirectEnvironment: SH-9
    irradiance from the exact equirect projection + the env's own
    pre-blurred pyramid as the GGX prefilter chain (the full file-based
    environment stack of common.cpp:597-625)."""
    coeffs = project_equirect_sh9(np.asarray(env.levels[1]))

    def irradiance_fn(n):
        return eval_irradiance_sh9(coeffs, n)

    return irradiance_fn, env.prefiltered


def make_env_fallbacks(sky_radiance_fn, num_samples: int = 4096):
    """Returns (irradiance_fn(n), prefiltered_fn(dir, roughness))."""
    coeffs = project_sky_sh9(sky_radiance_fn, num_samples)

    def irradiance_fn(n):
        return eval_irradiance_sh9(coeffs, n)

    def prefiltered_fn(d, roughness):
        sharp = sky_radiance_fn(d)
        diffuse = eval_irradiance_sh9(coeffs, d)
        w = jnp.clip(roughness, 0.0, 1.0)[..., None]
        # roughness^2 falloff approximates the GGX mip chain
        return sharp * (1.0 - w * w) + diffuse * (w * w)

    return irradiance_fn, prefiltered_fn
