"""Scalar float64 oracle implementations of the reference math, used to
validate the batched f32 JAX kernels. Written independently from the
formulas documented in SURVEY.md §2.1 (triangle.cpp, sphere.cpp,
blackhole.cpp, bvh.cpp)."""
import math

import numpy as np


def tri_hit(o, d, min_t, max_t, v0, v1, v2):
    e1 = v1 - v0
    e2 = v2 - v0
    s = o - v0
    s1 = np.cross(d, e2)
    s2 = np.cross(s, e1)
    denom = np.dot(s1, e1)
    if denom == 0:
        return None
    t = np.dot(s2, e2) / denom
    b1 = np.dot(s1, s) / denom
    b2 = np.dot(s2, d) / denom
    b0 = 1 - b1 - b2
    if min_t <= t <= max_t and b0 >= 0 and b1 >= 0 and b2 >= 0:
        return t, b1, b2
    return None


def sphere_hit(o, d, min_t, max_t, c, r):
    tmp = o - c
    b = 2 * np.dot(tmp, d)
    cc = np.dot(tmp, tmp) - r * r
    disc = b * b - 4 * cc
    if disc < 0:
        return None
    t1 = (-b - math.sqrt(disc)) / 2
    t2 = (-b + math.sqrt(disc)) / 2
    if min_t <= t1 <= max_t:
        return t1
    if min_t <= t2 <= max_t:
        return t2
    return None


def micro_step(pos, dirn, bh_o, bh_r, dt):
    """One reference geodesic step; returns (chord_dir, chord_len)."""
    def f(u):
        return -u + 1.5 * bh_r * u * u

    x_axis = pos - bh_o
    dist = np.linalg.norm(x_axis)
    x_hat = x_axis / dist
    u = 1.0 / dist
    dx = np.dot(dirn, x_hat)
    y_axis = dirn - dx * x_hat
    dy = np.linalg.norm(y_axis)
    y_hat = y_axis / dy
    up = -u * dx / dy
    f1 = f(u)
    f2 = f(u + up * dt / 2)
    f3 = f(u + up * dt / 2 + f1 * dt * dt / 4)
    u = u + up * dt + (f1 + f2 + f3) * dt * dt / 6
    dnew = 1.0 / u
    nxt = bh_o + dnew * math.cos(dt) * x_hat + dnew * math.sin(dt) * y_hat
    chord = nxt - pos
    ln = np.linalg.norm(chord)
    return chord / ln, ln


def closest_hit(o, d, min_t, max_t, tris, spheres):
    """Loop over all prims; tris = list of (v0,v1,v2), spheres = (c, r).
    Returns (prim_id, t) or None, with triangles indexed first."""
    best = (None, max_t)
    for i, (v0, v1, v2) in enumerate(tris):
        h = tri_hit(o, d, min_t, best[1], v0, v1, v2)
        if h is not None:
            best = (i, h[0])
    for j, (c, r) in enumerate(spheres):
        h = sphere_hit(o, d, min_t, best[1], c, r)
        if h is not None:
            best = (len(tris) + j, h)
    return best if best[0] is not None else None
