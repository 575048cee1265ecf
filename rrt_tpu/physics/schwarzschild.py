"""Schwarzschild photon-orbit micro-ray marching.

Re-implements the reference's geodesic stepper
(`pathtracer/src/static_scene/blackhole.cpp:13-40`) as a batched, jittable,
differentiable function. The reference marches every ray as a chain of
straight chord segments: in the plane spanned by the ray and the hole
center, the inverse radius u(φ) obeys the Schwarzschild null-geodesic ODE

    u''(φ) = -u + (3/2) r_s u²            (blackhole.cpp:13-15)

and one Δθ step advances u with the reference's RK-ish update

    u += u'·Δθ + (f1+f2+f3)·Δθ²/6         (blackhole.cpp:28-32)

(the reference computes an unused f4; we don't). The new position is the
polar point (d·cosΔθ, d·sinΔθ) in the step's local frame; the returned
chord is the straight segment between consecutive polar points.

Degenerate radial rays (transverse component dy → 0) are unguarded UB in
the reference (`blackhole.cpp:27` divides by dy); we flag them `dead` —
the same observable outcome (the ray produces no hits) without NaNs
poisoning the batch.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from rrt_tpu.types import BlackHoleParams

_DY_EPS = 1e-12


def ode_rhs(u, r):
    """f(u) = -u + (3/2)·r·u² (blackhole.cpp:13-15)."""
    return -u + 1.5 * r * u * u


def micro_step(pos, direction, bh: BlackHoleParams):
    """One Δθ micro-ray step for a batch of rays.

    Args:
      pos: (...,3) current endpoint (start of the new chord).
      direction: (...,3) unit direction of travel at `pos`.
    Returns:
      (new_dir, chord_len, dead): the next chord's unit direction, its
      length, and a mask of degenerate (radial) rays. The next position is
      `pos + new_dir * chord_len`.
    """
    dt = bh.delta_theta
    x_axis = pos - bh.position
    dist = jnp.linalg.norm(x_axis, axis=-1)
    x_hat = x_axis / dist[..., None]
    u = 1.0 / dist
    dx = jnp.sum(direction * x_hat, axis=-1)
    y_axis = direction - dx[..., None] * x_hat
    dy = jnp.linalg.norm(y_axis, axis=-1)
    dead = dy < _DY_EPS
    safe_dy = jnp.where(dead, 1.0, dy)
    y_hat = y_axis / safe_dy[..., None]
    up = -u * dx / safe_dy
    r = bh.radius
    f1 = ode_rhs(u, r)
    f2 = ode_rhs(u + up * dt / 2.0, r)
    f3 = ode_rhs(u + up * dt / 2.0 + f1 * dt * dt / 4.0, r)
    u_new = u + up * dt + (f1 + f2 + f3) * dt * dt / 6.0
    d_new = 1.0 / u_new
    next_pt = (
        bh.position
        + (d_new * jnp.cos(dt))[..., None] * x_hat
        + (d_new * jnp.sin(dt))[..., None] * y_hat
    )
    chord = next_pt - pos
    chord_len = jnp.linalg.norm(chord, axis=-1)
    # guard zero-length chords (u_new <= 0 ⇒ behind-horizon garbage):
    safe_len = jnp.where(chord_len > 0, chord_len, 1.0)
    new_dir = chord / safe_len[..., None]
    dead = dead | ~jnp.isfinite(chord_len) | (u_new <= 0)
    return new_dir, chord_len, dead


def absorbed_by_hole(o, d, max_t, bh: BlackHoleParams):
    """Does the chord [0, max_t] hit the event-horizon sphere?

    Matches Sphere::intersect used for absorption (`bvh.cpp:107`,
    `sphere.cpp:26-53`): near root preferred, far root accepted (so chords
    *starting inside* the horizon are absorbed too).
    """
    tmp = o - bh.position
    b = 2.0 * jnp.sum(tmp * d, axis=-1)
    c = jnp.sum(tmp * tmp, axis=-1) - bh.radius * bh.radius
    disc = b * b - 4.0 * c
    has = disc >= 0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-b - sq) / 2.0
    t2 = (-b + sq) / 2.0
    ok1 = (0.0 <= t1) & (t1 <= max_t)
    ok2 = (0.0 <= t2) & (t2 <= max_t)
    return has & (ok1 | ok2)


def n_segments(delta_theta: float) -> int:
    """Segment count: j advances while j·Δθ < 2π (bvh.cpp:105)."""
    return int(math.ceil(2.0 * math.pi / float(delta_theta) - 1e-12))
