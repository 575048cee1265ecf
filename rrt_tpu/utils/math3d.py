"""Batched 3D math helpers (replaces CGL Vector3D/Matrix3x3 — reference
`pathtracer/CGL/include/CGL/vector3D.h`, `matrix3x3.h`).

All functions operate on arrays whose last axis is the vector dimension and
broadcast over leading (batch) axes, so the same code path serves a single
ray and a megabatch of rays.
"""
from __future__ import annotations

import jax.numpy as jnp

EPS_F = 1e-6


def dot(a, b):
    """Batched dot product over the last axis, keepdims dropped."""
    return jnp.sum(a * b, axis=-1)


def vdot(a, b):
    """Batched dot product, keepdims kept (shape (..., 1))."""
    return jnp.sum(a * b, axis=-1, keepdims=True)


def cross(a, b):
    return jnp.cross(a, b)


def norm(a):
    return jnp.sqrt(jnp.sum(a * a, axis=-1))


def norm2(a):
    return jnp.sum(a * a, axis=-1)


def normalize(a, eps: float = 0.0):
    """Unit vector; `eps` guards the degenerate zero-vector case."""
    n2 = jnp.sum(a * a, axis=-1, keepdims=True)
    return a / jnp.sqrt(n2 + eps)


def make_coord_space(n):
    """Build a batched orthonormal frame with `n` as the z column.

    Mirrors `make_coord_space` (reference `pathtracer/src/bsdf.cpp:13-29`):
    h = n with its smallest-|component| set to 1, y = normalize(h × z),
    x = normalize(z × y). Returns (x, y, z) world-space columns, each (...,3);
    the object→world matrix has columns [x, y, z].
    """
    z = normalize(n)
    an = jnp.abs(n)
    # index of the smallest-magnitude component, matching the reference's
    # <= tie-breaking order (x preferred, then y, then z)
    x_min = (an[..., 0] <= an[..., 1]) & (an[..., 0] <= an[..., 2])
    y_min = (~x_min) & (an[..., 1] <= an[..., 0]) & (an[..., 1] <= an[..., 2])
    bump = jnp.stack(
        [x_min, y_min, ~(x_min | y_min)], axis=-1
    ).astype(n.dtype)
    h = jnp.where(bump > 0, 1.0, n)
    y = normalize(jnp.cross(h, z))
    x = normalize(jnp.cross(z, y))
    return x, y, z


def to_local(x, y, z, v):
    """World→local: rows of the transposed frame matrix (o2wᵀ · v)."""
    return jnp.stack([dot(x, v), dot(y, v), dot(z, v)], axis=-1)


def to_world(x, y, z, v):
    """Local→world: o2w · v = v.x·x + v.y·y + v.z·z."""
    return (
        v[..., 0:1] * x + v[..., 1:2] * y + v[..., 2:3] * z
    )


def reflect_local(wo):
    """Mirror reflection about the local z axis (reference bsdf.cpp:142-144)."""
    return jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], axis=-1)


def transform_point(m, p):
    """Apply 4x4 homogeneous matrix to points (...,3) with w-divide."""
    ph = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
    out = ph @ m.T
    return out[..., :3] / out[..., 3:4]


def transform_vector(m, v):
    """Apply 4x4 matrix to direction vectors (w = 0)."""
    return v @ m[:3, :3].T


def luminance(rgb):
    """Rec.709 luma, matching Spectrum::illum() (CGL/spectrum.h:139-141)."""
    return (
        0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2]
    )
