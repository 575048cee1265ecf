"""Lat-long HDR environment light: CDF construction, importance sampling,
and direction lookup.

Mirrors `pathtracer/src/static_scene/environment_light.cpp`:
  * init builds sin(θ)-weighted luminance pdf + row-marginal/conditional
    CDF tables (environment_light.cpp:21-49);
  * `sample_L` inverts the 2-level CDF with an upper_bound search and
    converts to solid-angle pdf `pdf·w·h/(2π² sinθ)`
    (environment_light.cpp:123-144);
  * `sample_dir` maps a direction to (θ,φ) to pixel coordinates with the
    seam/pole-robust bilerp (environment_light.cpp:86-120,146-148).

The y axis is up: θ = acos(y), φ = atan2(−z, x) + π.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rrt_tpu.types import EnvMap

PI = math.pi


def build_envmap(data: np.ndarray, dtype=np.float32) -> EnvMap:
    """Build CDF tables from an (H, W, 3) radiance map (host-side)."""
    data = np.asarray(data, np.float64)
    h, w = data.shape[:2]
    illum = (0.2126 * data[..., 0] + 0.7152 * data[..., 1]
             + 0.0722 * data[..., 2])
    j = np.arange(h)
    pdf = illum * np.sin(PI * (j[:, None] + 0.5) / h)
    pdf /= pdf.sum()
    marg = pdf.sum(axis=1)
    cond = pdf / np.where(marg[:, None] == 0, 1.0, marg[:, None])
    cond_cdf = np.cumsum(cond, axis=1)
    marg_cdf = np.cumsum(marg)
    return EnvMap(
        data=jnp.asarray(data, dtype),
        pdf=jnp.asarray(pdf, dtype),
        cond_cdf=jnp.asarray(cond_cdf, dtype),
        marg_cdf=jnp.asarray(marg_cdf, dtype),
    )


def probability_debug_image(env: EnvMap) -> np.ndarray:
    """The reference writes probability_debug.png on init
    (environment_light.cpp:53-68): R = marginal CDF, G = conditional CDF."""
    h, w = env.pdf.shape
    img = np.zeros((h, w, 4), np.uint8)
    img[..., 3] = 255
    img[..., 0] = np.clip(
        255 * np.asarray(env.marg_cdf)[:, None], 0, 255).astype(np.uint8)
    img[..., 1] = np.clip(
        255 * np.asarray(env.cond_cdf), 0, 255).astype(np.uint8)
    return img


def _dir_to_theta_phi(d):
    u = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    theta = jnp.arccos(jnp.clip(u[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(-u[..., 2], u[..., 0]) + PI
    return theta, phi


def _theta_phi_to_dir(theta, phi):
    y = jnp.cos(theta)
    x = jnp.cos(phi - PI) * jnp.sin(theta)
    z = -jnp.sin(phi - PI) * jnp.sin(theta)
    return jnp.stack([x, y, z], axis=-1)


def _bilerp(env: EnvMap, x, y):
    """Seam/pole-robust bilinear lookup (environment_light.cpp:105-120).

    x ∈ [0,w], y ∈ [0,h] continuous pixel coordinates.
    """
    h, w = env.pdf.shape
    right = jnp.rint(x).astype(jnp.int32)
    v = jnp.rint(y).astype(jnp.int32)
    u1 = right.astype(x.dtype) - x + 0.5
    wrap = (right == 0) | (right == w)
    left = jnp.where(wrap, w - 1, right - 1)
    right = jnp.where(wrap, 0, right % w)

    v_low = v == 0
    v_high = v == h
    v1 = jnp.where(v_low, 1.0,
                   jnp.where(v_high, 0.0, v.astype(y.dtype) - y + 0.5))
    v = jnp.where(v_low, 1, jnp.where(v_high, h - 1, v))

    bottom = v
    top = v - 1
    u0 = 1.0 - u1

    def px(row, col):
        return env.data[jnp.clip(row, 0, h - 1), jnp.clip(col, 0, w - 1)]

    tl = px(top, left)
    tr = px(top, right)
    bl = px(bottom, left)
    br = px(bottom, right)
    u1e = u1[..., None]
    u0e = u0[..., None]
    v1e = v1[..., None]
    return (tl * u1e + tr * u0e) * v1e + (bl * u1e + br * u0e) * (1.0 - v1e)


def sample_dir(env: EnvMap, d):
    """Radiance along escaped-ray direction d (environment_light.cpp:146-148)."""
    h, w = env.pdf.shape
    theta, phi = _dir_to_theta_phi(d)
    x = phi / (2.0 * PI) * w
    y = theta / PI * h
    return _bilerp(env, x, y)


def sample_L(env: EnvMap, key, shape, dtype=jnp.float32):
    """Importance-sample the map (ENV_HEMI==0 path).

    Returns (radiance, wi, dist, pdf). Uses the reference's integer
    upper_bound semantics: the sampled (x,y) is the *integer* bin index fed
    back into xy_to_theta_phi and bilerp (environment_light.cpp:128-138).
    """
    h, w = env.pdf.shape
    xi = jax.random.uniform(key, shape + (2,), dtype)
    # row: first index with marg_cdf > ξ  (std::upper_bound)
    y = jnp.sum(env.marg_cdf[None, :] <= xi[..., 1:2], axis=-1)
    y = jnp.clip(y, 0, h - 1)
    cond_rows = env.cond_cdf[y]                      # (..., w)
    x = jnp.sum(cond_rows <= xi[..., 0:1], axis=-1)
    x = jnp.clip(x, 0, w - 1)
    theta = y.astype(dtype) / h * PI
    phi = x.astype(dtype) / w * 2.0 * PI
    wi = _theta_phi_to_dir(theta, phi)
    # row 0 has θ=0 → sin 0; the reference divides by it (UB → inf). Clamp
    # so the pdf stays finite; the contribution rad/pdf → ~0 either way.
    pdf = (env.pdf[y, x] * w * h
           / (2.0 * PI * PI * jnp.maximum(jnp.sin(theta), 1e-8)))
    rad = _bilerp(env, x.astype(dtype), y.astype(dtype))
    dist = jnp.full(shape, jnp.inf, dtype)
    return rad, wi, dist, pdf
