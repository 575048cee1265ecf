"""Primitive intersection: batched Möller–Trumbore and sphere tests, plus a
chunked brute-force closest-hit/any-hit query.

Semantics mirror the reference exactly:

* triangles (`triangle.cpp:25-55`): s1=d×e2, s2=s×e1, denom=s1·e1,
  t = s2·e2/denom, b1 = s1·s/denom, b2 = s2·d/denom, accept when
  min_t ≤ t ≤ max_t and b0,b1,b2 ≥ 0; the shading normal is the
  *unnormalized* barycentric blend of vertex normals.
* spheres (`sphere.cpp:10-53`): quadratic with near root preferred, far
  root accepted when the origin is inside; normal = (p−c)/r.

The brute-force query is the reference's `ACCEL == 0` mode (`bvh.h:4`,
`bvh.cpp:55-57`) reborn as the TPU-dense path: a `lax.scan` over fixed
triangle chunks keeps the working set in VMEM and lets XLA fuse the whole
test into vector ops; the closest hit is a running min over chunks instead
of mutable `r.max_t` narrowing.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rrt_tpu.types import Hit, Rays, SceneData

BIG = 1e30


def tri_intersect(o, d, min_t, max_t, v0, v1, v2, valid):
    """Test rays (...,3) against a chunk of triangles (C,3).

    Returns (ok (...,C), t, b1, b2). Inputs broadcast: rays get a
    trailing chunk axis.
    """
    o = o[..., None, :]
    d = d[..., None, :]
    e1 = v1 - v0
    e2 = v2 - v0
    s = o - v0
    s1 = jnp.cross(d, e2)
    s2 = jnp.cross(s, e1)
    denom = jnp.sum(s1 * e1, axis=-1)
    # denom==0 (parallel / degenerate padded tri) is an explicit miss; the
    # safe divisor keeps reverse-mode AD free of inf·0 NaNs on masked lanes
    ok_denom = denom != 0
    inv = 1.0 / jnp.where(ok_denom, denom, 1.0)
    t = jnp.sum(s2 * e2, axis=-1) * inv
    b1 = jnp.sum(s1 * s, axis=-1) * inv
    b2 = jnp.sum(s2 * d, axis=-1) * inv
    b0 = 1.0 - b1 - b2
    ok = (
        (min_t[..., None] <= t)
        & (t <= max_t[..., None])
        & (b0 >= 0)
        & (b1 >= 0)
        & (b2 >= 0)
        & valid
        & ok_denom
    )
    return ok, t, b1, b2


def sphere_intersect(o, d, min_t, max_t, center, radius):
    """Test rays (...,3) against spheres (S,3)/(S,).

    Returns (ok (...,S), t) with the reference's near-then-far root
    acceptance (sphere.cpp:26-53).
    """
    tmp = o[..., None, :] - center
    b = 2.0 * jnp.sum(tmp * d[..., None, :], axis=-1)
    c = jnp.sum(tmp * tmp, axis=-1) - radius * radius
    disc = b * b - 4.0 * c
    has = disc >= 0
    # safe sqrt: masked lanes (disc<0) otherwise produce NaN cotangents,
    # and d√disc → ∞ at disc → 0⁺ (grazing) poisons reverse-mode even
    # under zero cotangents — treat near-tangent as the exact-tangent
    # limit √disc = 0
    pos = disc > 1e-24
    sq = jnp.where(pos, jnp.sqrt(jnp.where(pos, disc, 1.0)), 0.0)
    t1 = (-b - sq) / 2.0
    t2 = (-b + sq) / 2.0
    ok1 = (min_t[..., None] <= t1) & (t1 <= max_t[..., None])
    ok2 = (min_t[..., None] <= t2) & (t2 <= max_t[..., None])
    t = jnp.where(ok1, t1, t2)
    ok = has & (ok1 | ok2) & (radius > 0)
    return ok, t


def closest_hit_brute(
    scene: SceneData,
    o: jnp.ndarray,
    d: jnp.ndarray,
    min_t: jnp.ndarray,
    max_t: jnp.ndarray,
    chunk: int = 512,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Closest hit over all primitives by chunked scan.

    Returns (hit, t, prim_id, b1, b2) where prim_id indexes triangles first
    then spheres (scene flat primitive space); b1/b2 are barycentrics for
    triangle hits (zero for spheres).
    """
    n_t = scene.n_tris
    chunk = min(chunk, n_t)
    while n_t % chunk != 0:   # rows are padded to a multiple of 64
        chunk //= 2
    assert chunk >= 1, "triangle count must be chunk-padded"
    n_chunks = n_t // chunk

    shape = o.shape[:-1]
    init = (
        jnp.full(shape, jnp.inf, o.dtype),          # best t
        jnp.full(shape, -1, jnp.int32),             # best prim
        jnp.zeros(shape, o.dtype),                  # b1
        jnp.zeros(shape, o.dtype),                  # b2
    )

    tri_valid = scene.tri_bsdf >= 0

    def body(carry, ci):
        bt, bp, bb1, bb2 = carry
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, ci * chunk, chunk)
        ok, t, b1, b2 = tri_intersect(
            o, d, min_t, max_t,
            sl(scene.tri_v0), sl(scene.tri_v1), sl(scene.tri_v2),
            sl(tri_valid),
        )
        t = jnp.where(ok, t, jnp.inf)
        j = jnp.argmin(t, axis=-1)
        tj = jnp.take_along_axis(t, j[..., None], axis=-1)[..., 0]
        better = tj < bt
        take = lambda a: jnp.take_along_axis(a, j[..., None], axis=-1)[..., 0]
        return (
            jnp.where(better, tj, bt),
            jnp.where(better, (ci * chunk + j).astype(jnp.int32), bp),
            jnp.where(better, take(b1), bb1),
            jnp.where(better, take(b2), bb2),
        ), None

    (bt, bp, bb1, bb2), _ = jax.lax.scan(
        body, init, jnp.arange(n_chunks), unroll=1)

    # spheres (S is tiny; single dense pass)
    ok, t = sphere_intersect(
        o, d, min_t, max_t, scene.sph_center, scene.sph_radius)
    ok = ok & (scene.sph_bsdf >= 0)
    t = jnp.where(ok, t, jnp.inf)
    j = jnp.argmin(t, axis=-1)
    tj = jnp.take_along_axis(t, j[..., None], axis=-1)[..., 0]
    better = tj < bt
    bt = jnp.where(better, tj, bt)
    bp = jnp.where(better, (n_t + j).astype(jnp.int32), bp)
    bb1 = jnp.where(better, 0.0, bb1)
    bb2 = jnp.where(better, 0.0, bb2)

    hit = jnp.isfinite(bt)
    return hit, jnp.where(hit, bt, max_t), bp, bb1, bb2


def closest_hit_cluster(
    scene: SceneData,
    o: jnp.ndarray,
    d: jnp.ndarray,
    min_t: jnp.ndarray,
    max_t: jnp.ndarray,
    tile: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Closest hit with per-tile cluster culling — the XLA analog of the
    reference's hierarchical BVH traversal (`bvh.cpp:115-138`) and of the
    Pallas kernel's dense two-level scheme.

    Rays are processed in tiles of `tile` lanes (`lax.map`, sequential);
    per tile a `lax.scan` over Morton cluster AABBs slab-tests the whole
    tile and `lax.cond`-skips clusters no ray touches, so the triangle
    work scales with touched clusters instead of scene size. Same outputs
    as `closest_hit_brute`.
    """
    cs = scene.cluster_size
    K = scene.cluster_lo.shape[0]
    tri_valid = scene.tri_bsdf >= 0

    shape = o.shape[:-1]
    n = int(np.prod(shape)) if shape else 1
    n_pad = -(-max(n, 1) // tile) * tile
    flat = lambda a, w: jnp.reshape(a, (-1,) + ((w,) if w else ()))
    pad = lambda a: jnp.pad(a, ((0, n_pad - n),) + ((0, 0),) * (a.ndim - 1))
    o_f = pad(flat(o, 3)).reshape(-1, tile, 3)
    d_f = pad(flat(d, 3)).reshape(-1, tile, 3)
    mn_f = pad(flat(min_t, 0)).reshape(-1, tile)
    # padded lanes get max_t = -inf: they can never hit anything
    mx_f = jnp.pad(flat(max_t, 0), ((0, n_pad - n),),
                   constant_values=-jnp.inf).reshape(-1, tile)

    def per_tile(args):
        ot, dt_, mnt, mxt = args
        safe_d = jnp.where(jnp.abs(dt_) < 1e-20, 1e-20, dt_)
        inv = 1.0 / safe_d

        def body(carry, k):
            bt, bp, bb1, bb2 = carry
            lo = scene.cluster_lo[k]
            hi = scene.cluster_hi[k]
            t0 = (lo - ot) * inv
            t1 = (hi - ot) * inv
            tmn = jnp.max(jnp.minimum(t0, t1), axis=-1)
            tmx = jnp.min(jnp.maximum(t0, t1), axis=-1)
            # cap by the best hit so far: narrower than max_t once a
            # closer hit exists (the r.max_t narrowing of the reference)
            cap = jnp.minimum(mxt, bt)
            reach = (tmn <= tmx) & (tmx >= mnt) & (tmn <= cap) & (
                cap >= mnt)

            def do(c):
                bt, bp, bb1, bb2 = c
                sl = lambda a: jax.lax.dynamic_slice_in_dim(a, k * cs, cs)
                ok, t, b1, b2 = tri_intersect(
                    ot, dt_, mnt, mxt,
                    sl(scene.tri_v0), sl(scene.tri_v1), sl(scene.tri_v2),
                    sl(tri_valid))
                t = jnp.where(ok, t, jnp.inf)
                j = jnp.argmin(t, axis=-1)
                take = lambda a: jnp.take_along_axis(
                    a, j[..., None], axis=-1)[..., 0]
                tj = take(t)
                better = tj < bt
                return (
                    jnp.where(better, tj, bt),
                    jnp.where(better, (k * cs + j).astype(jnp.int32), bp),
                    jnp.where(better, take(b1), bb1),
                    jnp.where(better, take(b2), bb2),
                )

            carry = jax.lax.cond(jnp.any(reach), do, lambda c: c, carry)
            return carry, None

        init = (
            jnp.full((tile,), jnp.inf, o.dtype),
            jnp.full((tile,), -1, jnp.int32),
            jnp.zeros((tile,), o.dtype),
            jnp.zeros((tile,), o.dtype),
        )
        (bt, bp, bb1, bb2), _ = jax.lax.scan(body, init, jnp.arange(K))

        # spheres (S is tiny; single dense pass)
        ok, t = sphere_intersect(
            ot, dt_, mnt, mxt, scene.sph_center, scene.sph_radius)
        ok = ok & (scene.sph_bsdf >= 0)
        t = jnp.where(ok, t, jnp.inf)
        j = jnp.argmin(t, axis=-1)
        tj = jnp.take_along_axis(t, j[..., None], axis=-1)[..., 0]
        better = tj < bt
        bt = jnp.where(better, tj, bt)
        bp = jnp.where(better, (scene.n_tris + j).astype(jnp.int32), bp)
        bb1 = jnp.where(better, 0.0, bb1)
        bb2 = jnp.where(better, 0.0, bb2)
        return bt, bp, bb1, bb2

    bt, bp, bb1, bb2 = jax.lax.map(per_tile, (o_f, d_f, mn_f, mx_f))
    unflat = lambda a: a.reshape(-1)[:n].reshape(shape)
    bt, bp, bb1, bb2 = unflat(bt), unflat(bp), unflat(bb1), unflat(bb2)
    hit = jnp.isfinite(bt)
    return hit, jnp.where(hit, bt, max_t), bp, bb1, bb2


def closest_hit_shortlist(
    scene: SceneData,
    o: jnp.ndarray,
    d: jnp.ndarray,
    min_t: jnp.ndarray,
    max_t: jnp.ndarray,
    tile: int = 128,
    m_clusters: int = 8,
    tile_chunk: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Closest hit via per-tile cluster *shortlists* — dense, branchless,
    fully vectorized XLA (no Pallas, no `lax.cond`).

    The reference walks a pointer BVH per ray (`bvh.cpp:115-138`). The TPU
    formulation here:

      1. every `tile`-lane ray tile slab-tests all K Morton-cluster AABBs
         at once (one dense (tile, K) test, any-reduced over lanes);
      2. each tile's touched cluster ids are compacted front-first (one
         argsort over K) — its traversal *shortlist*;
      3. a `while_loop` drains shortlists `m_clusters` clusters per round:
         gather those clusters' triangle rows and run one dense
         (tile × m·cs) Möller–Trumbore batch, running-min merged. Rounds
         stop when the longest shortlist in the tile-chunk is drained, so
         coherent chunks pay 1-2 rounds regardless of scene size.

    Tiles are processed `tile_chunk` at a time under `lax.map` to bound
    intermediates (the (TC, tile, m·cs) test tensor). Compared to
    `closest_hit_cluster` this replaces per-cluster `lax.cond` skipping
    (branchy, serial, slow to compile) with dense gathers sized by what
    the tile actually touches — the XLA-native version of BVH culling.
    """
    cs = scene.cluster_size
    K = scene.cluster_lo.shape[0]
    M = min(m_clusters, K)
    n_t = scene.n_tris
    tri_valid = scene.tri_bsdf >= 0

    # one extra EMPTY cluster at index K: padding target for short rounds
    pad_rows = cs
    v0p = jnp.concatenate([scene.tri_v0, jnp.zeros((pad_rows, 3), o.dtype)])
    v1p = jnp.concatenate([scene.tri_v1, jnp.zeros((pad_rows, 3), o.dtype)])
    v2p = jnp.concatenate([scene.tri_v2, jnp.zeros((pad_rows, 3), o.dtype)])
    validp = jnp.concatenate([tri_valid, jnp.zeros((pad_rows,), bool)])

    shape = o.shape[:-1]
    n = int(np.prod(shape)) if shape else 1
    lanes = tile_chunk * tile
    n_pad = -(-max(n, 1) // lanes) * lanes
    flat = lambda a, w: jnp.reshape(a, (-1,) + ((w,) if w else ()))
    pad = lambda a: jnp.pad(a, ((0, n_pad - n),) + ((0, 0),) * (a.ndim - 1))
    o_f = pad(flat(o, 3)).reshape(-1, tile_chunk, tile, 3)
    d_f = pad(flat(d, 3)).reshape(-1, tile_chunk, tile, 3)
    mn_f = pad(flat(min_t, 0)).reshape(-1, tile_chunk, tile)
    # padded lanes get max_t = -inf: they can never touch anything
    mx_f = jnp.pad(flat(max_t, 0), ((0, n_pad - n),),
                   constant_values=-jnp.inf).reshape(-1, tile_chunk, tile)

    # shortlist slots padded so every dynamic_slice stays in bounds
    n_rounds = -(-K // M)
    K_slots = n_rounds * M

    def per_chunk(args):
        ot, dt_, mnt, mxt = args                 # (TC, tile, 3) / (TC, tile)
        safe_d = jnp.where(jnp.abs(dt_) < 1e-20, 1e-20, dt_)
        inv = 1.0 / safe_d

        # ---- phase 1: dense per-lane reach, any-reduced to tile level
        lo = scene.cluster_lo                    # (K, 3)
        hi = scene.cluster_hi
        t0 = (lo[None, None] - ot[:, :, None, :]) * inv[:, :, None, :]
        t1 = (hi[None, None] - ot[:, :, None, :]) * inv[:, :, None, :]
        tmn = jnp.max(jnp.minimum(t0, t1), axis=-1)      # (TC, tile, K)
        tmx = jnp.min(jnp.maximum(t0, t1), axis=-1)
        reach = ((tmn <= tmx) & (tmx >= mnt[..., None])
                 & (tmn <= mxt[..., None]) & (mxt >= mnt)[..., None])
        touched = jnp.any(reach, axis=1)                 # (TC, K)

        # ---- phase 2: compact touched ids front-first, in Morton order
        count = jnp.sum(touched, axis=-1)                # (TC,)
        ark = jnp.arange(K, dtype=jnp.int32)
        sort_key = jnp.where(touched, ark, K + ark)
        ids = jnp.argsort(sort_key, axis=-1).astype(jnp.int32)  # (TC, K)
        ids = jnp.pad(ids, ((0, 0), (0, K_slots - K)),
                      constant_values=K)
        count_max = jnp.max(count)

        arc = jnp.arange(cs, dtype=jnp.int32)
        arm = jnp.arange(M, dtype=jnp.int32)

        # ---- phase 3: drain shortlists M clusters per round
        def cond(c):
            r = c[0]
            return r * M < count_max

        def body(c):
            r, bt, bp, bb1, bb2 = c
            ids_r = jax.lax.dynamic_slice(
                ids, (jnp.int32(0), r * M), (tile_chunk, M))
            slot_ok = (r * M + arm)[None, :] < count[:, None]
            cl_ids = jnp.where(slot_ok, ids_r, K)        # (TC, M)
            tri_idx = (cl_ids[:, :, None] * cs + arc[None, None, :]
                       ).reshape(tile_chunk, M * cs)     # (TC, C)
            mx_eff = jnp.minimum(mxt, bt)
            ok, t, b1, b2 = tri_intersect(
                ot, dt_, mnt, mx_eff,
                v0p[tri_idx][:, None], v1p[tri_idx][:, None],
                v2p[tri_idx][:, None], validp[tri_idx][:, None])
            t = jnp.where(ok, t, jnp.inf)
            j = jnp.argmin(t, axis=-1)                   # (TC, tile)
            take = lambda a: jnp.take_along_axis(
                a, j[..., None], axis=-1)[..., 0]
            tj = take(t)
            better = tj < bt
            pj = jnp.take_along_axis(tri_idx, j, axis=-1)
            return (r + 1,
                    jnp.where(better, tj, bt),
                    jnp.where(better, pj, bp),
                    jnp.where(better, take(b1), bb1),
                    jnp.where(better, take(b2), bb2))

        init = (jnp.int32(0),
                jnp.full((tile_chunk, tile), jnp.inf, o.dtype),
                jnp.full((tile_chunk, tile), -1, jnp.int32),
                jnp.zeros((tile_chunk, tile), o.dtype),
                jnp.zeros((tile_chunk, tile), o.dtype))
        _, bt, bp, bb1, bb2 = jax.lax.while_loop(cond, body, init)

        # ---- spheres (S is tiny; single dense pass)
        ok, t = sphere_intersect(
            ot, dt_, mnt, mxt, scene.sph_center, scene.sph_radius)
        ok = ok & (scene.sph_bsdf >= 0)
        t = jnp.where(ok, t, jnp.inf)
        j = jnp.argmin(t, axis=-1)
        tj = jnp.take_along_axis(t, j[..., None], axis=-1)[..., 0]
        better = tj < bt
        bt = jnp.where(better, tj, bt)
        bp = jnp.where(better, (n_t + j).astype(jnp.int32), bp)
        bb1 = jnp.where(better, 0.0, bb1)
        bb2 = jnp.where(better, 0.0, bb2)
        return bt, bp, bb1, bb2

    bt, bp, bb1, bb2 = jax.lax.map(per_chunk, (o_f, d_f, mn_f, mx_f))
    unflat = lambda a: a.reshape(-1)[:n].reshape(shape)
    bt, bp, bb1, bb2 = unflat(bt), unflat(bp), unflat(bb1), unflat(bb2)
    hit = jnp.isfinite(bt)
    return hit, jnp.where(hit, bt, max_t), bp, bb1, bb2


def closest_hit(scene, o, d, min_t, max_t, chunk: int = 512,
                accel: str = "auto"):
    """Dispatch between the culled and brute closest-hit queries.

    accel: "shortlist" = per-tile cluster shortlists, dense + branchless
    (default when cluster tables exist), "cluster" = per-cluster
    `lax.cond` scan (legacy), "brute" = dense chunked scan (also the
    reverse-AD-friendly choice for tiny batches), "auto" picks shortlist
    when cluster tables are available."""
    if accel == "auto":
        accel = "shortlist" if scene.cluster_lo is not None else "brute"
    if accel == "shortlist":
        return closest_hit_shortlist(scene, o, d, min_t, max_t)
    if accel == "cluster":
        return closest_hit_cluster(scene, o, d, min_t, max_t)
    return closest_hit_brute(scene, o, d, min_t, max_t, chunk)


def build_hit(scene: SceneData, o, d, hit, t, prim_id, b1, b2) -> Hit:
    """Gather shading data for resolved hits (Intersection fields,
    reference triangle.cpp:46-52 / sphere.cpp:32-47)."""
    n_t = scene.n_tris
    is_tri = prim_id < n_t
    tid = jnp.clip(prim_id, 0, n_t - 1)
    sid = jnp.clip(prim_id - n_t, 0, scene.n_spheres - 1)

    b0 = 1.0 - b1 - b2
    n_tri = (
        b0[..., None] * scene.tri_n0[tid]
        + b1[..., None] * scene.tri_n1[tid]
        + b2[..., None] * scene.tri_n2[tid]
    )
    # missed lanes keep t = max_t (possibly inf); anchor their hit point at
    # the origin so masked downstream math (and its AD) stays finite
    t_safe = jnp.where(hit, t, 0.0)
    p = o + t_safe[..., None] * d
    n_sph = (p - scene.sph_center[sid]) / scene.sph_radius[sid][..., None]
    n = jnp.where(is_tri[..., None], n_tri, n_sph)
    bsdf = jnp.where(is_tri, scene.tri_bsdf[tid], scene.sph_bsdf[sid])
    bsdf = jnp.where(hit, bsdf, -1)
    return Hit(
        hit=hit,
        t=t,
        p=p,
        n=n,
        w_out=-d,
        prim_id=jnp.where(hit, prim_id, -1),
        bsdf_id=bsdf,
    )
