"""Fused Pallas TPU kernel: geodesic micro-ray march + clustered
intersection, entirely on-chip.

This replaces the XLA composition in `geometry/trace.py` on the hot path.
The XLA version streams (rays × tris) intermediates through HBM once per
segment group (~63× a flat trace). Here one kernel invocation marches a
1024-ray tile through all ≤⌈2π/Δθ⌉ segments:

  * each per-ray quantity is one FULL (8,128) register tile — every vector
    op runs at native VPU width;
  * triangle data (v0, e1, e2 precomputed) lives in SMEM; the inner loop
    broadcasts one triangle's scalars against the whole ray tile per
    iteration (the TPU-idiomatic replacement for per-lane gathers);
  * triangles are Morton-ordered (`geometry/clusters.py`); each segment
    slab-tests the tile against every cluster AABB (scalar bbox × vector
    rays) and `lax.cond`-skips clusters no ray touches — dense two-level
    culling with zero divergence;
  * a `lax.while_loop` over segments exits as soon as every ray in the
    tile has an event (tile-level early exit, finer than the XLA path's
    batch-level exit).

Semantics match `bvh.cpp:103-113` exactly: chords carry their own
[0, len] ranges, event-horizon absorption beats same-segment geometry,
2π exhaustion = escape, and the original ray's min_t/max_t are ignored in
curved mode. With `curved=False` the same body runs one segment honoring
min_t/max_t — the flat fast path.

SMEM residency bounds the scene size per kernel (see SMEM_TRI_BUDGET);
larger scenes currently fall back to the XLA path (a DMA-streaming variant
is the planned follow-up).

Barycentrics are not tracked in-kernel; the winning primitive is re-tested
outside (one triangle per ray) to rebuild the shading payload.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rrt_tpu.geometry.intersect import build_hit, tri_intersect
from rrt_tpu.types import BlackHoleParams, Hit, Rays, SceneData

BIG = 3e37
# triangle rows per part (12 f32 each, double-buffered in SMEM against a
# ~1 MiB budget; bigger scenes iterate Morton-contiguous parts as a
# sequential grid dimension with in-kernel merging). Must be a multiple of
# 8×cluster_size: SMEM blocks need row counts divisible by 8.
PART_TRIS = 512
# total triangle capacity of the partitioned path (sanity cap)
SMEM_TRI_BUDGET = 1 << 20


def _kernel(bhp_ref,                 # (1,8) SMEM: bh px,py,pz,r,dθ
            ox_ref, oy_ref, oz_ref,  # (1,8,128) ray origin tile
            dx_ref, dy_ref, dz_ref,
            mint_ref, maxt_ref,
            tri_ref,                 # (T,12) SMEM: v0,e1,e2,valid,pad
            cl_ref,                  # (K,8) SMEM: lo xyz, hi xyz, pad
            sph_ref,                 # (S,4) SMEM: cx,cy,cz,r
            # outputs (1,8,128)
            hit_ref, abs_ref, t_ref, prim_ref, seg_ref,
            sox_ref, soy_ref, soz_ref, sdx_ref, sdy_ref, sdz_ref,
            *, curved: bool, n_seg: int, n_tri_rows: int,
            cluster_size: int, n_parts: int):
    T = tri_ref.shape[0]
    K = cl_ref.shape[0]
    S = sph_ref.shape[0]

    bh_px = bhp_ref[0, 0]
    bh_py = bhp_ref[0, 1]
    bh_pz = bhp_ref[0, 2]
    bh_r = bhp_ref[0, 3]
    bh_dt = bhp_ref[0, 4]

    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]       # (8,128)
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]

    f0 = jnp.zeros((8, 128), jnp.float32)
    ZERO = f0

    def march(px, py, pz, ux, uy, uz):
        """One Δθ geodesic step (blackhole.cpp:17-40), component form."""
        xax = px - bh_px
        xay = py - bh_py
        xaz = pz - bh_pz
        d2 = xax * xax + xay * xay + xaz * xaz
        at_c = d2 <= 0.0
        dist = jnp.sqrt(jnp.where(at_c, 1.0, d2))
        inv_d = 1.0 / dist
        xhx, xhy, xhz = xax * inv_d, xay * inv_d, xaz * inv_d
        u = inv_d
        ddx = ux * xhx + uy * xhy + uz * xhz
        yax = ux - ddx * xhx
        yay = uy - ddx * xhy
        yaz = uz - ddx * xhz
        y2 = yax * yax + yay * yay + yaz * yaz
        dead = (y2 < 1e-24) | at_c
        dyn = jnp.sqrt(jnp.where(dead, 1.0, y2))
        yhx, yhy, yhz = yax / dyn, yay / dyn, yaz / dyn
        up = -u * ddx / dyn

        def f(uu):
            return -uu + 1.5 * bh_r * uu * uu

        f1 = f(u)
        f2 = f(u + up * bh_dt / 2.0)
        f3 = f(u + up * bh_dt / 2.0 + f1 * bh_dt * bh_dt / 4.0)
        u_new = u + up * bh_dt + (f1 + f2 + f3) * bh_dt * bh_dt / 6.0
        bad_u = u_new <= 0.0
        d_new = 1.0 / jnp.where(bad_u, 1.0, u_new)
        ct = jnp.cos(bh_dt)
        st = jnp.sin(bh_dt)
        nx = bh_px + d_new * ct * xhx + d_new * st * yhx
        ny = bh_py + d_new * ct * xhy + d_new * st * yhy
        nz = bh_pz + d_new * ct * xhz + d_new * st * yhz
        cx, cy, cz = nx - px, ny - py, nz - pz
        c2 = cx * cx + cy * cy + cz * cz
        zl = c2 <= 0.0
        clen = jnp.sqrt(jnp.where(zl, 1.0, c2))
        ilen = 1.0 / clen
        ndx, ndy, ndz = cx * ilen, cy * ilen, cz * ilen
        clen = jnp.where(zl, 0.0, clen)
        dead = dead | bad_u | zl
        return ndx, ndy, ndz, clen, dead

    def absorb(px, py, pz, ux, uy, uz, clen):
        tx = px - bh_px
        ty = py - bh_py
        tz = pz - bh_pz
        b = 2.0 * (tx * ux + ty * uy + tz * uz)
        c = tx * tx + ty * ty + tz * tz - bh_r * bh_r
        disc = b * b - 4.0 * c
        has = disc >= 0.0
        sq = jnp.sqrt(jnp.where(has, disc, 1.0))
        t1 = (-b - sq) * 0.5
        t2 = (-b + sq) * 0.5
        ok1 = (t1 >= 0.0) & (t1 <= clen)
        ok2 = (t2 >= 0.0) & (t2 <= clen)
        return has & (ok1 | ok2) & (bh_r > 0.0)

    def segment_best(px, py, pz, ux, uy, uz, tmin, tmax):
        """Closest hit of chords [tmin, tmax] against the scene."""
        inv_x = 1.0 / ux
        inv_y = 1.0 / uy
        inv_z = 1.0 / uz

        def tri_body(ti, carry):
            """One triangle broadcast against the whole ray tile."""
            best_t, best_p = carry
            v0x = tri_ref[ti, 0]
            v0y = tri_ref[ti, 1]
            v0z = tri_ref[ti, 2]
            e1x = tri_ref[ti, 3]
            e1y = tri_ref[ti, 4]
            e1z = tri_ref[ti, 5]
            e2x = tri_ref[ti, 6]
            e2y = tri_ref[ti, 7]
            e2z = tri_ref[ti, 8]
            valid = tri_ref[ti, 9] > 0.0
            sx = px - v0x
            sy = py - v0y
            sz = pz - v0z
            s1x = uy * e2z - uz * e2y
            s1y = uz * e2x - ux * e2z
            s1z = ux * e2y - uy * e2x
            s2x = sy * e1z - sz * e1y
            s2y = sz * e1x - sx * e1z
            s2z = sx * e1y - sy * e1x
            denom = s1x * e1x + s1y * e1y + s1z * e1z
            okd = denom != 0.0
            inv = 1.0 / jnp.where(okd, denom, 1.0)
            t = (s2x * e2x + s2y * e2y + s2z * e2z) * inv
            b1 = (s1x * sx + s1y * sy + s1z * sz) * inv
            b2 = (s2x * ux + s2y * uy + s2z * uz) * inv
            b0 = 1.0 - b1 - b2
            ok = (okd & valid & (t >= tmin) & (t <= tmax)
                  & (b0 >= 0.0) & (b1 >= 0.0) & (b2 >= 0.0))
            t_m = jnp.where(ok, t, BIG)
            closer = t_m < best_t
            return (jnp.where(closer, t_m, best_t),
                    jnp.where(closer, ti, best_p))

        def cluster_body(k, carry):
            lox = cl_ref[k, 0]
            loy = cl_ref[k, 1]
            loz = cl_ref[k, 2]
            hix = cl_ref[k, 3]
            hiy = cl_ref[k, 4]
            hiz = cl_ref[k, 5]
            tx0 = (lox - px) * inv_x
            tx1 = (hix - px) * inv_x
            ty0 = (loy - py) * inv_y
            ty1 = (hiy - py) * inv_y
            tz0 = (loz - pz) * inv_z
            tz1 = (hiz - pz) * inv_z
            tmn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                          jnp.minimum(ty0, ty1)),
                              jnp.minimum(tz0, tz1))
            tmx = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                          jnp.maximum(ty0, ty1)),
                              jnp.maximum(tz0, tz1))
            reach = (tmn <= tmx) & (tmn <= tmax) & (tmx >= tmin)
            pred = jnp.max(reach.astype(jnp.float32)) > 0.0

            def do(c):
                return jax.lax.fori_loop(
                    k * cluster_size, (k + 1) * cluster_size, tri_body, c)

            return jax.lax.cond(pred, do, lambda c: c, carry)

        best_t = jnp.full((8, 128), BIG, jnp.float32)
        best_p = jnp.full((8, 128), -1, jnp.int32)
        best_t, best_p = jax.lax.fori_loop(
            0, K, cluster_body, (best_t, best_p))

        def sph_body(si, carry):
            best_t, best_p = carry
            cx = sph_ref[si, 0]
            cy = sph_ref[si, 1]
            cz = sph_ref[si, 2]
            r = sph_ref[si, 3]
            tx = px - cx
            ty = py - cy
            tz = pz - cz
            b = 2.0 * (tx * ux + ty * uy + tz * uz)
            c = tx * tx + ty * ty + tz * tz - r * r
            disc = b * b - 4.0 * c
            has = (disc >= 0.0) & (r > 0.0)
            sq = jnp.sqrt(jnp.where(has, disc, 1.0))
            t1 = (-b - sq) * 0.5
            t2 = (-b + sq) * 0.5
            ok1 = (t1 >= tmin) & (t1 <= tmax)
            ok2 = (t2 >= tmin) & (t2 <= tmax)
            ts = jnp.where(ok1, t1, t2)
            ok = has & (ok1 | ok2)
            t_m = jnp.where(ok, ts, BIG)
            closer = t_m < best_t
            return (jnp.where(closer, t_m, best_t),
                    jnp.where(closer, n_tri_rows + si, best_p))

        best_t, best_p = jax.lax.fori_loop(
            0, S, sph_body, (best_t, best_p))
        return best_t, best_p

    # -------------------------------------------------- march/trace loop

    if curved:
        # masks carried as f32 0/1 — Mosaic cannot select between bool
        # (i1) vectors
        init = (jnp.int32(0),
                ox, oy, oz, dx, dy, dz,
                f0, f0, f0,                       # done, dead, absorbed
                jnp.full((8, 128), BIG, jnp.float32),
                jnp.full((8, 128), -1, jnp.int32),
                jnp.full((8, 128), n_seg, jnp.int32),   # event segment
                ox, oy, oz, dx, dy, dz)

        def cond(st):
            s, _, _, _, _, _, _, done_f, dead_f, *_ = st
            active = (done_f == 0.0) & (dead_f == 0.0)
            return (s < n_seg) & jnp.any(active)

        def body(st):
            (s, px, py, pz, ux, uy, uz, done_f, dead_f, absd_f,
             out_t, out_p, out_s, sox, soy, soz, sdx, sdy, sdz) = st
            done = done_f > 0.0
            ndx, ndy, ndz, clen, sdead = march(px, py, pz, ux, uy, uz)
            # done lanes keep marching in lockstep; a later degenerate step
            # must not retro-kill their recorded event
            dead_f = jnp.maximum(dead_f,
                                 (sdead & ~done).astype(jnp.float32))
            dead2 = dead_f > 0.0
            clen = jnp.where(dead2, 0.0, clen)
            ab = absorb(px, py, pz, ndx, ndy, ndz, clen) & ~dead2
            bt, bp = segment_best(px, py, pz, ndx, ndy, ndz, ZERO, clen)
            hit_seg = bt < BIG
            newly = (hit_seg | ab) & ~done & ~dead2
            upd = lambda cur, new: jnp.where(newly, new, cur)
            out_t = upd(out_t, bt)
            out_p = upd(out_p, bp)
            out_s = upd(out_s, jnp.full((8, 128), 1, jnp.int32) * s)
            sox = upd(sox, px)
            soy = upd(soy, py)
            soz = upd(soz, pz)
            sdx = upd(sdx, ndx)
            sdy = upd(sdy, ndy)
            sdz = upd(sdz, ndz)
            absd_f = jnp.where(newly, ab.astype(jnp.float32), absd_f)
            done_f = jnp.maximum(done_f, newly.astype(jnp.float32))
            npx = px + ndx * clen
            npy = py + ndy * clen
            npz = pz + ndz * clen
            return (s + 1, npx, npy, npz, ndx, ndy, ndz, done_f, dead_f,
                    absd_f, out_t, out_p, out_s, sox, soy, soz,
                    sdx, sdy, sdz)

        st = jax.lax.while_loop(cond, body, init)
        (_, _, _, _, _, _, _, done_f, dead_f, absd_f,
         out_t, out_p, out_s, sox, soy, soz, sdx, sdy, sdz) = st
        hit = (done_f > 0.0) & (absd_f == 0.0) & (dead_f == 0.0)
        absd_out = absd_f
    else:
        bt, bp = segment_best(ox, oy, oz, dx, dy, dz,
                              mint_ref[0], maxt_ref[0])
        hit = bt < BIG
        absd_out = f0
        out_t, out_p = bt, bp
        out_s = jnp.zeros((8, 128), jnp.int32)
        sox, soy, soz = ox, oy, oz
        sdx, sdy, sdz = dx, dy, dz

    # Globalize triangle ids: part p covers rows [p·T, (p+1)·T) of the
    # padded table; sphere ids (≥ n_tri_rows ≥ T) are already global.
    p = pl.program_id(1) if n_parts > 1 else 0
    out_p = jnp.where((out_p >= 0) & (out_p < T), out_p + p * T, out_p)
    t_m = jnp.where(hit, out_t, 0.0)
    p_m = jnp.where(hit, out_p, -1)

    def write_fresh():
        hit_ref[0] = hit.astype(jnp.float32)
        abs_ref[0] = absd_out
        t_ref[0] = t_m
        prim_ref[0] = p_m
        seg_ref[0] = out_s
        sox_ref[0] = sox
        soy_ref[0] = soy
        soz_ref[0] = soz
        sdx_ref[0] = sdx
        sdy_ref[0] = sdy
        sdz_ref[0] = sdz

    if n_parts == 1:
        write_fresh()
    else:
        # Output blocks are revisited across the part grid dimension: merge
        # this part's events with the running best by the first-event rule
        # (segment index, then chord t). Geometry-independent absorption is
        # AND-merged: a part only reports non-absorbed if its geometry
        # produced a hit before the absorption segment.
        @pl.when(p == 0)
        def _():
            write_fresh()

        @pl.when(p > 0)
        def _():
            ph = hit_ref[0] > 0.0
            pabs = abs_ref[0] > 0.0
            pt = t_ref[0]
            pp = prim_ref[0]
            ps = seg_ref[0]
            better = hit & (
                (~ph) | (out_s < ps) | ((out_s == ps) & (t_m < pt)))
            hit_ref[0] = (ph | hit).astype(jnp.float32)
            abs_ref[0] = (pabs & (absd_out > 0.0)).astype(jnp.float32)
            t_ref[0] = jnp.where(better, t_m, pt)
            prim_ref[0] = jnp.where(better, p_m, pp)
            seg_ref[0] = jnp.where(better, out_s, ps)
            sox_ref[0] = jnp.where(better, sox, sox_ref[0])
            soy_ref[0] = jnp.where(better, soy, soy_ref[0])
            soz_ref[0] = jnp.where(better, soz, soz_ref[0])
            sdx_ref[0] = jnp.where(better, sdx, sdx_ref[0])
            sdy_ref[0] = jnp.where(better, sdy, sdy_ref[0])
            sdz_ref[0] = jnp.where(better, sdz, sdz_ref[0])


def pallas_supported(scene: SceneData) -> bool:
    """Single-pass for small scenes; Morton-partitioned multi-pass above
    PART_TRIS. The cap is a sanity bound, not an SMEM limit."""
    return scene.n_tris <= SMEM_TRI_BUDGET


@functools.partial(
    jax.jit, static_argnames=("curved", "n_seg", "interpret"))
def pallas_trace_raw(scene: SceneData, bh: Optional[BlackHoleParams],
                     rays: Rays, curved: bool, n_seg: int,
                     interpret: bool = False):
    """Run the fused kernel over 1024-ray tiles; returns flat result
    arrays for the lane batch."""
    tile = 1024
    n = rays.o.shape[0]
    n_pad = -(-n // tile) * tile
    g = n_pad // tile
    T = scene.n_tris
    cs = scene.cluster_size
    # Pad the triangle table to a whole number of PART_TRIS-row parts; the
    # part index is the second (sequential) grid dimension, so one kernel
    # instance covers any scene size with the merge state resident in VMEM.
    n_parts = max(1, -(-T // PART_TRIS))
    T_pad = n_parts * PART_TRIS if n_parts > 1 else T
    cpp = T_pad // n_parts // cs           # clusters per part
    K = T_pad // cs
    S = scene.sph_center.shape[0]

    def shape_r(a):
        a = jnp.asarray(a, jnp.float32).reshape(-1)
        if a.shape[0] != n_pad:
            a = jnp.pad(a, (0, n_pad - a.shape[0]))
        return a.reshape(g, 8, 128)

    pad_d = jnp.where(jnp.abs(rays.d) < 1e-20, 1e-20, rays.d)
    ray_ins = [
        shape_r(rays.o[:, 0]), shape_r(rays.o[:, 1]), shape_r(rays.o[:, 2]),
        shape_r(pad_d[:, 0]), shape_r(pad_d[:, 1]), shape_r(pad_d[:, 2]),
        shape_r(rays.min_t), shape_r(rays.max_t),
    ]
    # SMEM tri rows: v0 | e1 | e2 | valid | pad
    tri_tab = jnp.concatenate([
        jnp.asarray(scene.tri_v0, jnp.float32),
        jnp.asarray(scene.tri_v1 - scene.tri_v0, jnp.float32),
        jnp.asarray(scene.tri_v2 - scene.tri_v0, jnp.float32),
        (scene.tri_bsdf >= 0).astype(jnp.float32)[:, None],
        jnp.zeros((T, 2), jnp.float32),
    ], axis=1)                                        # (T, 12)
    K0 = scene.cluster_lo.shape[0]
    cl_tab = jnp.concatenate([
        jnp.asarray(scene.cluster_lo, jnp.float32),
        jnp.asarray(scene.cluster_hi, jnp.float32),
        jnp.zeros((K0, 2), jnp.float32),
    ], axis=1)                                        # (K0, 8)
    if T_pad > T:
        tri_tab = jnp.pad(tri_tab, ((0, T_pad - T), (0, 0)))
    if K > K0:
        # empty boxes (lo > hi) fail every slab test
        empty = jnp.tile(
            jnp.array([[BIG, BIG, BIG, -BIG, -BIG, -BIG, 0.0, 0.0]],
                      jnp.float32), (K - K0, 1))
        cl_tab = jnp.concatenate([cl_tab, empty], axis=0)
    sph_tab = jnp.concatenate([
        jnp.asarray(scene.sph_center, jnp.float32),
        jnp.where(scene.sph_bsdf >= 0, scene.sph_radius,
                  0.0).astype(jnp.float32)[:, None],
    ], axis=1)                                        # (S, 4)
    if bh is not None:
        bhp = jnp.concatenate([
            jnp.asarray(bh.position, jnp.float32).reshape(3),
            jnp.asarray(bh.radius, jnp.float32).reshape(1),
            jnp.asarray(bh.delta_theta, jnp.float32).reshape(1),
            jnp.zeros(3, jnp.float32)]).reshape(1, 8)
    else:
        bhp = jnp.zeros((1, 8), jnp.float32)

    ray_spec = pl.BlockSpec((1, 8, 128), lambda i, p: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    smem = lambda shape: pl.BlockSpec(
        shape, lambda i, p: tuple(0 for _ in shape), memory_space=pltpu.SMEM)
    part_rows = T_pad // n_parts
    tri_spec = pl.BlockSpec((part_rows, 12), lambda i, p: (p, 0),
                            memory_space=pltpu.SMEM)
    cl_spec = pl.BlockSpec((cpp, 8), lambda i, p: (p, 0),
                           memory_space=pltpu.SMEM)

    out_shapes = (
        [jax.ShapeDtypeStruct((g, 8, 128), jnp.float32) for _ in range(3)]
        + [jax.ShapeDtypeStruct((g, 8, 128), jnp.int32)] * 2
        + [jax.ShapeDtypeStruct((g, 8, 128), jnp.float32) for _ in range(6)]
    )

    kernel = functools.partial(
        _kernel, curved=curved, n_seg=n_seg, n_tri_rows=T_pad,
        cluster_size=scene.cluster_size, n_parts=n_parts)

    outs = pl.pallas_call(
        kernel,
        grid=(g, n_parts),
        in_specs=(
            [smem((1, 8))]
            + [ray_spec] * 8
            + [tri_spec, cl_spec, smem((S, 4))]
        ),
        out_specs=tuple(ray_spec for _ in range(11)),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(bhp, *ray_ins, tri_tab, cl_tab, sph_tab)

    (hit, absd, t, prim, seg, sox, soy, soz, sdx, sdy, sdz) = outs
    cut = lambda a: a.reshape(-1)[:n]
    hit = cut(hit) > 0
    absd = (cut(absd) > 0) & ~hit
    prim = cut(prim)
    # sphere ids were minted in padded-tri space; remap to scene space
    prim = jnp.where(prim >= T_pad, prim - (T_pad - T), prim)
    seg_o = jnp.stack([cut(sox), cut(soy), cut(soz)], axis=-1)
    seg_d = jnp.stack([cut(sdx), cut(sdy), cut(sdz)], axis=-1)
    return (hit, absd, cut(t), prim, cut(seg), seg_o, seg_d)


def pallas_trace(scene: SceneData, bh: Optional[BlackHoleParams],
                 rays: Rays, n_seg: int,
                 interpret: bool = False) -> Hit:
    """Full closest-hit query via the fused kernel, shading payload rebuilt
    outside (barycentrics re-derived for the winning triangle).

    Scenes beyond one SMEM-resident triangle part run as a second
    (sequential) grid dimension over Morton-contiguous cluster ranges;
    per-part events merge in-kernel, in VMEM-resident output blocks, by
    the first-event rule (segment index, then chord t) — identical
    semantics to a monolithic pass because the geodesic march is
    deterministic and event-horizon absorption is geometry-independent."""
    curved = bh is not None and bh.enabled
    flat_shape = rays.o.shape[:-1]
    flat_rays = Rays(
        o=rays.o.reshape(-1, 3),
        d=rays.d.reshape(-1, 3),
        min_t=rays.min_t.reshape(-1),
        max_t=rays.max_t.reshape(-1),
    )
    hit, absd, t, prim, seg, seg_o, seg_d = pallas_trace_raw(
        scene, bh, flat_rays, curved, n_seg, interpret)

    # recompute barycentrics for winning triangles (1 tri per ray)
    n_t = scene.n_tris
    is_tri = (prim >= 0) & (prim < n_t)
    tid = jnp.clip(prim, 0, n_t - 1)
    shape = t.shape
    ok, tt, b1, b2 = tri_intersect(
        seg_o, seg_d,
        jnp.full(shape, -jnp.inf, t.dtype), jnp.full(shape, jnp.inf, t.dtype),
        scene.tri_v0[tid][..., None, :],
        scene.tri_v1[tid][..., None, :],
        scene.tri_v2[tid][..., None, :],
        jnp.ones(shape + (1,), bool),
    )
    b1 = jnp.where(is_tri, b1[..., 0], 0.0)
    b2 = jnp.where(is_tri, b2[..., 0], 0.0)
    h = build_hit(scene, seg_o, seg_d, hit, t, prim, b1, b2)
    if flat_shape != t.shape:
        h = jax.tree_util.tree_map(
            lambda a: a.reshape(flat_shape + a.shape[1:]), h)
    return h
