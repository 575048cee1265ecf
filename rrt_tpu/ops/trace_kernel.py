"""Fused Pallas TPU kernel: geodesic micro-ray march + clustered
intersection, entirely on-chip.

This replaces the XLA composition in `geometry/trace.py` on the hot path.
The XLA version streams (rays × tris) intermediates through HBM once per
segment group (~63× a flat trace). Here one kernel invocation marches a
1024-ray tile through all ≤⌈2π/Δθ⌉ segments.

Layout / culling design:

  * each per-ray quantity is one FULL (8,128) register tile — every vector
    op runs at native VPU width;
  * the geodesic march runs ONCE per ray tile (phase 1, part 0 of the grid)
    and stores every chord (origin, direction, length) in a VMEM scratch
    table; absorption is geometry-independent, so the first-absorption
    segment is resolved here too and seeds the merge state;
  * triangles are Morton-ordered (`geometry/clusters.py`) and split into
    parts of PART_TRIS rows; the part index is a sequential grid
    dimension. Culling is 4-level dense (part AABB → SUP-cluster
    supercluster → CS_K-tri cluster → triangle), with all box tables in
    SMEM, derived on device from the triangle rows;
  * traversal layout (RRT_KERNEL): the default v3 `_phase2_windowed`
    tiles every culling/intersection op over 8 CONSECUTIVE CHORD SEGMENTS
    (sublanes) × 128 rays (lanes) — fine 128-ray culling unions at full
    VPU width, with per-128-ray-row early exit; v2 keeps the original one
    -segment × 1024-ray tiles; v4 additionally swaps the scalar triangle
    broadcast for 8-triangles-on-sublanes blocks read from a VMEM row
    table (fewer vector ops, but measured slower: many small gated ops
    pipeline worse than v3's dense uniform streams);
  * the merged best event (segment index, then chord t) lives in the
    VMEM-resident output blocks across the part dimension, so every part
    bounds its segment loop by the best event found so far by ANY part
    (and by absorption): a tile whose rays all resolve in the first few
    chords never marches the remaining ~60 segments against any part;
  * two (8,128) i32 outputs count primitive and bbox slab tests actually
    paid per lane — the measured analog of the reference's total_isects
    (bvh.h:140), surfaced via `return_stats` up to `Renderer.stats()`.

Semantics match `bvh.cpp:103-113` exactly: chords carry their own
[0, len] ranges, event-horizon absorption beats same-segment geometry,
2π exhaustion = escape, and the original ray's min_t/max_t are ignored in
curved mode. With `curved=False` the same scan runs one segment honoring
min_t/max_t — the flat fast path.

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
# triangle rows per SMEM-resident part (12 f32 each ≈ 24 KiB). Must be a
# multiple of 8×cluster_size: SMEM blocks need row counts divisible by 8.
PART_TRIS = 2048
# total triangle capacity of the partitioned path (sanity cap)
SMEM_TRI_BUDGET = 1 << 20
# kernel culling granularity: CS_K-triangle clusters grouped into
# SUP-cluster superclusters (part -> super -> cluster -> tri), scene-
# adaptive. Swept r4 end-to-end: on BVH-scale scenes 32 beats 16 (config
# 2: 129.2 s vs 135.5 s — double the prim slots but HALF the slab/gate
# traffic; dense triangle streams are cheaper than cluster gates on this
# VPU), while small scenes prefer 16 (bench.py primary: 247k vs 217k
# rays/s). 8 is worse everywhere; 64 would leave fewer supercluster rows
# per part than the SMEM block minimum.
import os as _os
SUP = 8


def _cs_k(n_tris: int) -> int:
    """Scene-adaptive kernel cluster size, swept END-TO-END (r5, CBbunny
    512² 8spp GI proxy under the blk scan): cs8 4.68 s steady /
    2588 tests/ray beats cs16 (5.13 s) and the old cs32 (6.06 s); cs4
    reaches 1485 tests/ray but costs 11% more wall (the straight-line
    supercluster predicate block grows to 64 slabs). Under the r4
    carry scan the ordering was REVERSED (gates were ~300 cy each, so
    coarse clusters won) — cluster size and gate mechanics must be swept
    together. Small scenes keep 16 (cs8 measured equal within noise,
    identical tests/ray). Pinned by tests/test_heuristics.py."""
    env = _os.environ.get("RRT_CSK")
    if env:
        return int(env)
    return 8 if n_tris > 8192 else 16


def _should_sort(n_lanes: int, n_clusters: int) -> bool:
    """Lane-sort gate: the (octant, origin-Morton) sort pays only when
    per-tile culling has clusters to skip AND the batch amortizes the
    argsort (r3/r4 end-to-end sweeps; BASELINE.md sort-key study).
    Pinned by tests/test_heuristics.py."""
    return n_lanes >= 2048 and n_clusters >= 32
# temporary perf-ablation switch: "nophase2" skips traversal entirely
# (march only); "noexec" gates but skips triangle execution
_ABLATE = _os.environ.get("RRT_ABLATE", "")
# Gating mode (r5): "box" replaces every part/supercluster/cluster
# vector-slab gate with a PURE-SCALAR box-overlap test of the cluster box
# (already in SMEM) against a per-(sub-row, window) chord AABB computed
# once in phase 1 and stored in SMEM scratch. The r5 cost probe
# (tools/r5probe.py) measured each vector gate at ~270 cycles — ~15
# vector slab ops plus a vector→scalar max-reduce pipeline sync plus the
# branch — and gating at 47-52% of total kernel time, vs 3-28% for the
# triangle sweep itself. Scalar box-box tests run in the scalar unit with
# NO vector sync (~10 ops), so gate cost collapses; the looser AABB (the
# union of a row's 8 chords vs each exact chord) costs extra triangle
# work, bounded by the optional precise vector slab kept for clusters
# that pass the prefilter ("boxp" = box prefilter + precise slab;
# "box" = prefilter only). "slab" = the r4 per-gate vector slabs.
_GATE = _os.environ.get("RRT_GATE", "slab")
# Traversal state mode (r5): "ref" accumulates the per-part best (t, prim)
# in VMEM scratch refs so every culling branch carries ZERO vector state
# (a lax.cond whose branches carry (8,128) registers forces
# materialization across the branch); "carry" is the r4 loop-carried
# form. Measured on-chip (tools/r5probe3.py, CBbunny 65k rays): ref ==
# carry to within noise (79.3 vs 79.6 ms coherent, bit-identical
# results) — branch-carried vector state is NOT the per-gate cost, so
# the proven carry form stays the default.
# "blk" (r5): the per-gate cost (~300 cy measured) is serialized SMEM box
# loads + a vector→scalar reduce sync + a branch PER CLUSTER; straight-
# line vector code runs at ~1 cy/op. blk computes the 8 slab tests of a
# supercluster block back-to-back (loads/ops pipeline, no intervening
# branches), reduces the 8 predicates independently, then branches on
# ready scalars — amortizing the sync/branch machinery 8×. Measured
# on-chip (CBbunny kbench 65k rays, r5 → BASELINE.md): blk is
# bit-identical to carry with identical culling decisions at 1.41×
# coherent / 1.55× incoherent — the r5 default.
_SCAN = _os.environ.get("RRT_SCAN", "blk")
# windowed-chord re-layout site: "post" (default) = static-index pass
# after the march; "march" = r4's in-loop dynamic stores (56 per
# segment — measured the bulk of the march phase)
_WREL = _os.environ.get("RRT_WREL", "post")
# march-loop unroll factor: segments per while-loop iteration (the
# 12-array carried state costs more per iteration than the ~80 vector
# ops of a segment; unrolling amortizes the loop boundary)
_MUNROLL = max(1, int(_os.environ.get("RRT_MARCH_UNROLL", "4")))
# Lazy interleaved march (r5): march and traversal share ONE window loop,
# so the march stops as soon as ALL 1024 lanes of a tile are resolved —
# and unneeded windows skip their transposed re-layout entirely. A single
# unresolved lane (escaper, unoccluded shadow ray) forces the tile's
# full march, so the win is bounded by whole-tile resolution; measured
# on-chip (r5): single-part scenes gain ~2% end-to-end, multi-part
# scenes lose ~2% (the per-part window loop re-evaluates the whole-tile
# conditions eager mode evaluates once per sub-row). Default "auto" =
# lazy iff the scene fits one part; "1"/"0" force. v2/v4/box-gate modes
# always use the eager phase-1 layout.
_LAZY = _os.environ.get("RRT_LAZY", "auto")


def _sbox_overlap(wb, ref, i):
    """Scalar box-overlap: does the window chord AABB `wb` (6 scalars,
    lo xyz / hi xyz) touch box row i of the SMEM table `ref` (lo xyz in
    cols 0-2, hi in 3-5)? Pure scalar-unit ops — no vector sync. An
    inverted window box (no valid chords: lo=+BIG, hi=-BIG) fails
    naturally, as do the point-at-+BIG padding boxes."""
    wlx, wly, wlz, whx, why, whz = wb
    return ((wlx <= ref[i, 3]) & (whx >= ref[i, 0])
            & (wly <= ref[i, 4]) & (why >= ref[i, 1])
            & (wlz <= ref[i, 5]) & (whz >= ref[i, 2]))


def _phase2_windowed(hit_ref, abs_ref, t_ref, prim_ref, seg_ref,
                     sox_ref, soy_ref, soz_ref, sdx_ref, sdy_ref, sdz_ref,
                     nisect_ref, ncull_ref, wchords, ltouch, wbox, pbox_ref,
                     cl_ref, sup_ref, trow_ref, scan_part, scan_part_box,
                     slab, sbox,
                     *, p, P, SL, n_seg, cluster_size, blocked,
                     occlusion, gate_mode):
    """Segment-windowed curved traversal (kernel v3).

    The v2 loop broadcasts each culling/intersection op over ONE chord
    segment × the whole 1024-ray tile — so a cluster executes whenever any
    of 1024 rays touches it (measured on CBbunny: 18k prim tests/ray vs
    the reference BVH's 112, kbench r4). Here every (8,128) vector op
    covers 8 CONSECUTIVE SEGMENTS (sublanes) × 128 rays (lanes): full VPU
    width, but the culling union is one 128-ray bundle over one short
    8-chord path section — ~8× finer on the ray axis at zero extra
    per-pair cost, and part/cluster slab tests cover 8 segments per op.

    Control flow: fori over the 8 ray sub-rows of the tile; per sub-row a
    while over segment windows with per-sub-row early exit (the slowest of
    128 rays bounds the loop, not the slowest of 1024); per window one
    part-AABB gate, then the shared `scan_part` cluster/triangle loop on
    the (segment, ray) tile; candidates reduce over sublanes by the
    first-event rule (segment, then chord t, then prim id) and merge into
    the per-ray best-event state rows.
    """
    if _ABLATE == "nophase2":
        return
    n_win = -(-n_seg // 8)
    i_rows = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)

    def subtile(r, carry):
        row = lambda ref: ref[0, pl.ds(r, 1)]             # (1,128)

        def improv_at(w):
            s0 = w * 8
            seg = row(seg_ref)
            hitm = row(hit_ref) > 0.0
            if occlusion:
                # any-hit: a lane with ANY geometry hit is final — no
                # same-segment closest-t refinement across parts
                ok = ~hitm & (s0 < seg) & (s0 <= row(ltouch))
            else:
                ok = ((s0 < seg) | ((s0 == seg) & hitm)) \
                    & (s0 <= row(ltouch))
            return jnp.max(ok.astype(jnp.float32)) > 0.0

        def win_cond(c):
            w, improv = c
            return (w < n_win) & improv

        def win_body(c):
            w, _ = c
            sidx = i_rows + w * 8                          # (8,128)
            comps = [wchords[w, cc, r] for cc in range(7)]
            cox, coy, coz, cdx, cdy, cdz, clen = comps
            # one inverse-direction set per (window, sub-row), shared by
            # the part/sphere gates here and every slab in the scan
            cix = 1.0 / cdx
            ciy = 1.0 / cdy
            ciz = 1.0 / cdz
            seg = row(seg_ref)
            hitm = row(hit_ref) > 0.0
            cur_t = row(t_ref)
            valid = (sidx < n_seg) & (sidx <= row(ltouch))
            if occlusion:
                lt_c = (sidx < seg) & valid & ~hitm
                tmax_eff = jnp.where(lt_c, clen, -1.0)
            else:
                lt_c = (sidx < seg) & valid
                eq_c = (sidx == seg) & hitm & valid
                tmax_eff = jnp.where(
                    lt_c, clen,
                    jnp.where(eq_c, jnp.minimum(clen, cur_t), -1.0))
            if gate_mode != "slab" and not blocked:
                # scalar box-prefilter part gate: the window chord AABB
                # (phase-1 SMEM scratch) vs the part box — no vector sync
                wb = tuple(wbox[w, r, c] for c in range(6))
                ncull_ref[0, pl.ds(r, 1)] = ncull_ref[0, pl.ds(r, 1)] + 1
                do_tris = _sbox_overlap(wb, pbox_ref, p)
            else:
                wb = None
                part_reach = slab(
                    pbox_ref[p, 0], pbox_ref[p, 1], pbox_ref[p, 2],
                    pbox_ref[p, 3], pbox_ref[p, 4], pbox_ref[p, 5],
                    cox, coy, coz, cix, ciy, ciz,
                    jnp.zeros((8, 128), jnp.float32), tmax_eff)
                ncull_ref[0, pl.ds(r, 1)] = ncull_ref[0, pl.ds(r, 1)] + 8
                do_tris = jnp.max(part_reach.astype(jnp.float32)) > 0.0
            if SL > 0:
                # sphere-union AABB gate (r5): the global sphere list used
                # to execute its quadratic (sqrt+div) tests at EVERY
                # (window, sub-row) — measured the bulk of the primary
                # scene's 34% gate share. One slab vs the union box skips
                # windows whose chords reach no sphere.
                sph_reach = slab(
                    sbox[0], sbox[1], sbox[2], sbox[3], sbox[4], sbox[5],
                    cox, coy, coz, cix, ciy, ciz,
                    jnp.zeros((8, 128), jnp.float32), tmax_eff)
                ncull_ref[0, pl.ds(r, 1)] = ncull_ref[0, pl.ds(r, 1)] + 8
                do_sph = (p == 0) & (
                    jnp.max(sph_reach.astype(jnp.float32)) > 0.0)
                gate = do_tris | do_sph
            else:
                do_sph = jnp.bool_(False)
                gate = do_tris

            def reduce_merge(bt, bp):
                """First-event reduce of (segment, ray) candidates over the
                window's 8 segments — (segment, chord t, prim id)
                lexicographic — then merge into the per-ray state rows."""
                cand = bp >= 0
                s_m = jnp.where(cand, sidx, n_seg + 1)
                min_s = jnp.min(s_m, axis=0, keepdims=True)   # (1,128)
                on_s = cand & (s_m == min_s)
                t_m = jnp.where(on_s, bt, BIG)
                min_t = jnp.min(t_m, axis=0, keepdims=True)
                on_t = on_s & (t_m == min_t)
                p_m = jnp.where(on_t, bp, jnp.int32(1 << 30))
                min_p = jnp.min(p_m, axis=0, keepdims=True)
                sel = on_t & (p_m == min_p)
                pick = lambda a: jnp.max(
                    jnp.where(sel, a, -BIG), axis=0, keepdims=True)
                has = min_s < n_seg
                seg_r = row(seg_ref)
                hit_r = row(hit_ref)
                t_r = row(t_ref)
                better = has & ((min_s < seg_r)
                                | ((min_s == seg_r) & (hit_r > 0.0)
                                   & (min_t < t_r)))
                bp_g = jnp.where((min_p >= 0) & (min_p < P),
                                 min_p + p * P, min_p)
                st = lambda ref, v: ref.__setitem__(
                    (0, pl.ds(r, 1)), jnp.where(better, v, row(ref)))
                st(hit_ref, 1.0)
                st(abs_ref, 0.0)
                st(t_ref, min_t)
                st(prim_ref, bp_g)
                st(seg_ref, min_s)
                st(sox_ref, pick(cox))
                st(soy_ref, pick(coy))
                st(soz_ref, pick(coz))
                st(sdx_ref, pick(cdx))
                st(sdy_ref, pick(cdy))
                st(sdz_ref, pick(cdz))

            if _ABLATE == "nosub":
                # ablation: window-loop machinery + part gate only (no
                # supercluster/cluster/triangle work) — isolates the
                # per-window fixed cost
                return (w + 1, improv_at(w + 1))
            if not blocked:
                @pl.when(gate)
                def _():
                    if gate_mode != "slab":
                        bt, bp, cnt = scan_part_box(
                            cox, coy, coz, cdx, cdy, cdz, cix, ciy, ciz,
                            jnp.zeros((8, 128), jnp.float32), tmax_eff,
                            do_tris=do_tris, do_sph=do_sph, wb=wb)
                        ncull_ref[0, pl.ds(r, 1)] = \
                            ncull_ref[0, pl.ds(r, 1)] + cnt
                    else:
                        bt, bp = scan_part(
                            cox, coy, coz, cdx, cdy, cdz, cix, ciy, ciz,
                            jnp.zeros((8, 128), jnp.float32), tmax_eff,
                            do_tris=do_tris, do_sph=do_sph)
                    reduce_merge(bt, bp)
            else:
                # spheres (global, part 0) ride the shared window-tile pass
                if SL > 0:
                    @pl.when(do_sph)
                    def _():
                        bt, bp = scan_part(
                            cox, coy, coz, cdx, cdy, cdz, cix, ciy, ciz,
                            jnp.zeros((8, 128), jnp.float32), tmax_eff,
                            do_tris=jnp.bool_(False), do_sph=do_sph)
                        reduce_merge(bt, bp)

                @pl.when(do_tris)
                def _():
                    _blocked_tris(
                        hit_ref, abs_ref, t_ref, prim_ref, seg_ref,
                        sox_ref, soy_ref, soz_ref, sdx_ref, sdy_ref,
                        sdz_ref, nisect_ref, ncull_ref,
                        cl_ref, sup_ref, trow_ref, slab,
                        cox, coy, coz, cdx, cdy, cdz, tmax_eff,
                        r=r, w=w, p=p, P=P,
                        cluster_size=cluster_size)

            return (w + 1, improv_at(w + 1))

        jax.lax.while_loop(win_cond, win_body,
                           (jnp.int32(0), improv_at(jnp.int32(0))))
        return carry

    jax.lax.fori_loop(0, 8, subtile, 0)


def _phase2_lazy(hit_ref, abs_ref, t_ref, prim_ref, seg_ref,
                 sox_ref, soy_ref, soz_ref, sdx_ref, sdy_ref, sdz_ref,
                 nisect_ref, ncull_ref, chords, wchords, mf, mi, fr_ref,
                 pbox_ref, scan_part, slab, march, absorb, sbox, gbox,
                 *, p, P, SL, n_seg, occlusion):
    """Lazy interleaved march + windowed traversal (r5, default curved
    path).

    The r4/r5 layout marched ALL ~⌈2π/Δθ⌉ segments in phase 1, then
    traversed windows until no lane could improve — but in closed scenes
    most lanes resolve (hit geometry, absorb, or die) within the first
    few segments, and the march was 61% of kernel time on the primary
    bench scene (tools/r5probe.py class probes). Here ONE while loop per
    ray tile drives both: iteration w first extends the march by one
    8-segment window if the frontier hasn't covered it (march state
    persists in the mf/mi scratch refs across windows AND grid parts),
    then runs the per-sub-row gated traversal of that window. The loop
    exits when no lane can produce an event in any remaining window:

      A(w): some lane's merged state still admits a geometry event at a
            MARCHED, scene-touching segment ≥ 8w (exactly the old
            per-sub-row ltouch bound, applied to the marched prefix);
      B:    the march is incomplete and some lane has NO event yet
            (it must keep marching — a later segment may touch geometry
            or cross the event horizon).

    Closure events (event-horizon absorption, degenerate death) merge
    into the best-event state the moment the march discovers them, via
    the same first-event rule the traversal uses — which reproduces
    absorption-beats-geometry exactly (bvh.cpp:107-108): a same-segment
    geometry candidate needs `s == seg AND hit`, and closure rows carry
    hit = 0. Results are bit-identical to the eager layout: the march
    sequence is unchanged, every window the eager path would scan is
    scanned with identical tmax_eff (events only exist at segments below
    the march frontier, so the merged state the eager path would have
    seeded is already in place), and windows this path skips provably
    admit no event. Windows no lane can use also skip the transposed
    wchords re-layout (A is monotone non-increasing over parts, so a
    skipped window stays skippable for every later part).
    """
    n_win = -(-n_seg // 8)
    i_rows = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    zero8 = jnp.zeros((8, 128), jnp.float32)

    def segpart(s0):
        """(8,128): can this lane's merged state still improve at s0?"""
        seg = seg_ref[0]
        hitm = hit_ref[0] > 0.0
        if occlusion:
            return ~hitm & (s0 < seg)
        return (s0 < seg) | ((s0 == seg) & hitm)

    def cond_a(w):
        return jnp.max((segpart(w * 8)
                        & (mi[1] >= w * 8)).astype(jnp.float32)) > 0.0

    def cond_b():
        return (fr_ref[0] < n_win) & (jnp.max(
            (seg_ref[0] == n_seg).astype(jnp.float32)) > 0.0)

    def march_window(w):
        """March segments [8w, 8w+8): straight-line, state in scratch.
        Chords go to the segment-major `chords` scratch step by step
        (keeping all 8 steps' values live in registers for the transposed
        store spilled badly — measured on-chip r5)."""
        px, py, pz = mf[0], mf[1], mf[2]
        ux, uy, uz = mf[3], mf[4], mf[5]
        dead_f = mf[6]
        end_seg = mi[0]
        last_t = mi[1]
        for i in range(8):
            s = w * 8 + i
            (ndx, ndy, ndz, rix, riy, riz,
             clen, sdead) = march(px, py, pz, ux, uy, uz)
            dead_f = jnp.maximum(dead_f, sdead.astype(jnp.float32))
            clen = jnp.where(dead_f > 0.0, 0.0, clen)
            chords[s, 0] = px
            chords[s, 1] = py
            chords[s, 2] = pz
            chords[s, 3] = ndx
            chords[s, 4] = ndy
            chords[s, 5] = ndz
            chords[s, 6] = clen
            live = s < n_seg          # scalar: tail window past 2π
            touch = slab(gbox[0], gbox[1], gbox[2],
                         gbox[3], gbox[4], gbox[5],
                         px, py, pz, rix, riy, riz, zero8, clen)
            last_t = jnp.where(touch & (dead_f == 0.0) & live, s, last_t)
            ab = absorb(px, py, pz, ndx, ndy, ndz, clen) & (dead_f == 0.0)
            open_lane = end_seg >= n_seg
            close = (ab | (dead_f > 0.0)) & open_lane & live
            end_seg = jnp.where(close, s, end_seg)
            # closure = a hit-less event at segment s; merged by the
            # first-event rule (an earlier geometry event keeps winning,
            # and closures fire once per lane via open_lane)
            better = close & (s < seg_ref[0])
            seg_ref[0] = jnp.where(better, s, seg_ref[0])
            abs_ref[0] = jnp.where(better & ab, 1.0, abs_ref[0])
            px = px + ndx * clen
            py = py + ndy * clen
            pz = pz + ndz * clen
            ux, uy, uz = ndx, ndy, ndz
        mf[0], mf[1], mf[2] = px, py, pz
        mf[3], mf[4], mf[5] = ux, uy, uz
        mf[6] = dead_f
        mi[0] = end_seg
        mi[1] = last_t
        fr_ref[0] = w + 1

    def traverse(w, r):
        """Gated traversal of window w, sub-row r (the win_body logic of
        `_phase2_windowed`, minus its per-sub-row window loop)."""
        row = lambda ref: ref[0, pl.ds(r, 1)]              # (1,128)
        sidx = i_rows + w * 8
        comps = [wchords[w, cc, r] for cc in range(7)]
        cox, coy, coz, cdx, cdy, cdz, clen = comps
        cix = 1.0 / cdx
        ciy = 1.0 / cdy
        ciz = 1.0 / cdz
        seg = row(seg_ref)
        hitm = row(hit_ref) > 0.0
        cur_t = row(t_ref)
        lt_r = mi[1, pl.ds(r, 1)]                          # (1,128)
        valid = (sidx < n_seg) & (sidx <= lt_r)
        if occlusion:
            lt_c = (sidx < seg) & valid & ~hitm
            tmax_eff = jnp.where(lt_c, clen, -1.0)
        else:
            lt_c = (sidx < seg) & valid
            eq_c = (sidx == seg) & hitm & valid
            tmax_eff = jnp.where(
                lt_c, clen,
                jnp.where(eq_c, jnp.minimum(clen, cur_t), -1.0))
        part_reach = slab(
            pbox_ref[p, 0], pbox_ref[p, 1], pbox_ref[p, 2],
            pbox_ref[p, 3], pbox_ref[p, 4], pbox_ref[p, 5],
            cox, coy, coz, cix, ciy, ciz, zero8, tmax_eff)
        ncull_ref[0, pl.ds(r, 1)] = ncull_ref[0, pl.ds(r, 1)] + 8
        do_tris = jnp.max(part_reach.astype(jnp.float32)) > 0.0
        if SL > 0:
            sph_reach = slab(
                sbox[0], sbox[1], sbox[2], sbox[3], sbox[4], sbox[5],
                cox, coy, coz, cix, ciy, ciz, zero8, tmax_eff)
            ncull_ref[0, pl.ds(r, 1)] = ncull_ref[0, pl.ds(r, 1)] + 8
            do_sph = (p == 0) & (
                jnp.max(sph_reach.astype(jnp.float32)) > 0.0)
            gate = do_tris | do_sph
        else:
            do_sph = jnp.bool_(False)
            gate = do_tris

        @pl.when(gate)
        def _():
            bt, bp = scan_part(
                cox, coy, coz, cdx, cdy, cdz, cix, ciy, ciz,
                zero8, tmax_eff, do_tris=do_tris, do_sph=do_sph)
            # first-event reduce over the window's 8 segments, then merge
            cand = bp >= 0
            s_m = jnp.where(cand, sidx, n_seg + 1)
            min_s = jnp.min(s_m, axis=0, keepdims=True)    # (1,128)
            on_s = cand & (s_m == min_s)
            t_m = jnp.where(on_s, bt, BIG)
            min_t = jnp.min(t_m, axis=0, keepdims=True)
            on_t = on_s & (t_m == min_t)
            p_m = jnp.where(on_t, bp, jnp.int32(1 << 30))
            min_p = jnp.min(p_m, axis=0, keepdims=True)
            sel = on_t & (p_m == min_p)
            pick = lambda a: jnp.max(
                jnp.where(sel, a, -BIG), axis=0, keepdims=True)
            has = min_s < n_seg
            seg_r = row(seg_ref)
            hit_r = row(hit_ref)
            t_r = row(t_ref)
            better = has & ((min_s < seg_r)
                            | ((min_s == seg_r) & (hit_r > 0.0)
                               & (min_t < t_r)))
            bp_g = jnp.where((min_p >= 0) & (min_p < P),
                             min_p + p * P, min_p)
            st = lambda ref, v: ref.__setitem__(
                (0, pl.ds(r, 1)), jnp.where(better, v, row(ref)))
            st(hit_ref, 1.0)
            st(abs_ref, 0.0)
            st(t_ref, min_t)
            st(prim_ref, bp_g)
            st(seg_ref, min_s)
            st(sox_ref, pick(cox))
            st(soy_ref, pick(coy))
            st(soz_ref, pick(coz))
            st(sdx_ref, pick(cdx))
            st(sdy_ref, pick(cdy))
            st(sdz_ref, pick(cdz))

    def body(c):
        w, _ = c

        @pl.when(w >= fr_ref[0])
        def _():
            march_window(w)
            # transposed per-window re-layout (reads back the segment-
            # major chords) — only if some lane can still use this window
            # (A is monotone over parts: a window skipped here is
            # skipped by every later part too)
            @pl.when(cond_a(w))
            def _():
                for c2 in range(7):
                    segs = [chords[w * 8 + i2, c2] for i2 in range(8)]
                    for r2 in range(8):
                        rows = [jax.lax.slice(
                            segs[i2], (r2, 0), (r2 + 1, 128))
                            for i2 in range(8)]
                        wchords[w, c2, r2] = jnp.concatenate(rows, axis=0)

        @pl.when(cond_a(w))
        def _():
            def sub(r, cc):
                lt_r = mi[1, pl.ds(r, 1)]                  # (1,128)
                seg_row = seg_ref[0, pl.ds(r, 1)]
                hit_row = hit_ref[0, pl.ds(r, 1)] > 0.0
                s0 = w * 8
                if occlusion:
                    sp = ~hit_row & (s0 < seg_row)
                else:
                    sp = (s0 < seg_row) | ((s0 == seg_row) & hit_row)
                improv_r = jnp.max(
                    (sp & (lt_r >= s0)).astype(jnp.float32)) > 0.0

                @pl.when(improv_r)
                def _():
                    traverse(w, r)
                return cc

            jax.lax.fori_loop(0, 8, sub, 0)

        w2 = w + 1
        return (w2, (w2 < n_win) & (cond_a(w2) | cond_b()))

    jax.lax.while_loop(lambda c: c[1], body,
                       (jnp.int32(0), cond_a(jnp.int32(0)) | cond_b()))


def _blocked_tris(hit_ref, abs_ref, t_ref, prim_ref, seg_ref,
                  sox_ref, soy_ref, soz_ref, sdx_ref, sdy_ref, sdz_ref,
                  nisect_ref, ncull_ref, cl_ref, sup_ref, trow_ref, slab,
                  cox, coy, coz, cdx, cdy, cdz, tmax_eff,
                  *, r, w, p, P, cluster_size):
    """Block-vectorized triangle sweep for one (sub-row, window, part).

    Execution tile = 8 TRIANGLES (sublanes, one VMEM row each from
    `trow_ref`) × 128 rays (lanes) against ONE chord segment — every
    vector op is 1024 useful ray-triangle pairs, unlike the scalar
    `tri_body` path whose windowed tiles spend 7/8 of each op on segments
    that mostly don't cross the cluster. Gating stays window-level
    (supercluster → cluster slab tests amortize over 8 segments); a
    crossing cluster then executes only for the window segments whose
    chords actually reach it, merging per segment in ascending order so
    the first-event rule is exact.
    """
    n_blk = cluster_size // 8
    i_sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    inv_x = 1.0 / cdx
    inv_y = 1.0 / cdy
    inv_z = 1.0 / cdz
    zero8 = jnp.zeros((8, 128), jnp.float32)
    rsel = (0, pl.ds(r, 1))

    def seg_exec(k, s, reach):
        if _ABLATE == "noexec":
            return
        pred = jnp.max(reach[s].astype(jnp.float32)) > 0.0

        @pl.when(pred)
        def _():
            sl = lambda a: jax.lax.slice(a, (s, 0), (s + 1, 128))  # (1,128)
            ox, oy, oz = sl(cox), sl(coy), sl(coz)
            dxr, dyr, dzr = sl(cdx), sl(cdy), sl(cdz)
            tmaxr = sl(tmax_eff)
            nisect_ref[rsel] = nisect_ref[rsel] + cluster_size
            bt = jnp.full((8, 128), BIG, jnp.float32)
            bp = jnp.full((8, 128), -1, jnp.int32)
            for b in range(n_blk):
                base = k * cluster_size + b * 8
                blk = trow_ref[pl.ds(base, 8), :]                  # (8,128)
                col = lambda c: jax.lax.slice(blk, (0, c), (8, c + 1))
                v0x, v0y, v0z = col(0), col(1), col(2)
                e1x, e1y, e1z = col(3), col(4), col(5)
                e2x, e2y, e2z = col(6), col(7), col(8)
                valid = col(9) > 0.0
                sx = ox - v0x                                      # (8,128)
                sy = oy - v0y
                sz = oz - v0z
                s1x = dyr * e2z - dzr * e2y
                s1y = dzr * e2x - dxr * e2z
                s1z = dxr * e2y - dyr * e2x
                s2x = sy * e1z - sz * e1y
                s2y = sz * e1x - sx * e1z
                s2z = sx * e1y - sy * e1x
                denom = s1x * e1x + s1y * e1y + s1z * e1z
                okd = denom != 0.0
                inv = 1.0 / jnp.where(okd, denom, 1.0)
                t = (s2x * e2x + s2y * e2y + s2z * e2z) * inv
                b1 = (s1x * sx + s1y * sy + s1z * sz) * inv
                b2 = (s2x * dxr + s2y * dyr + s2z * dzr) * inv
                b0 = 1.0 - b1 - b2
                ok = (okd & valid & (t >= 0.0) & (t <= tmaxr)
                      & (b0 >= 0.0) & (b1 >= 0.0) & (b2 >= 0.0))
                t_m = jnp.where(ok, t, BIG)
                closer = t_m < bt
                bt = jnp.where(closer, t_m, bt)
                bp = jnp.where(closer, base + i_sub, bp)
            # reduce the 8 triangle sublanes → per-ray best (t, prim)
            min_t = jnp.min(bt, axis=0, keepdims=True)            # (1,128)
            on_t = (bt == min_t) & (bp >= 0)
            p_m = jnp.where(on_t, bp, jnp.int32(1 << 30))
            min_p = jnp.min(p_m, axis=0, keepdims=True)
            has = min_p < jnp.int32(1 << 30)
            s_glob = w * 8 + s
            seg_r = seg_ref[rsel]
            hit_r = hit_ref[rsel]
            t_r = t_ref[rsel]
            better = has & ((s_glob < seg_r)
                            | ((s_glob == seg_r) & (hit_r > 0.0)
                               & (min_t < t_r)))
            st = lambda ref, v: ref.__setitem__(
                rsel, jnp.where(better, v, ref[rsel]))
            st(hit_ref, 1.0)
            st(abs_ref, 0.0)
            st(t_ref, min_t)
            st(prim_ref, min_p + p * P)
            st(seg_ref, s_glob)
            st(sox_ref, ox)
            st(soy_ref, oy)
            st(soz_ref, oz)
            st(sdx_ref, dxr)
            st(sdy_ref, dyr)
            st(sdz_ref, dzr)

    def cluster_body(k, c):
        reach = slab(cl_ref[k, 0], cl_ref[k, 1], cl_ref[k, 2],
                     cl_ref[k, 3], cl_ref[k, 4], cl_ref[k, 5],
                     cox, coy, coz, inv_x, inv_y, inv_z, zero8, tmax_eff)
        ncull_ref[rsel] = ncull_ref[rsel] + 8
        pred = jnp.max(reach.astype(jnp.float32)) > 0.0

        def do(cc):
            for s in range(8):
                seg_exec(k, s, reach)
            return cc

        return jax.lax.cond(pred, do, lambda cc: cc, c)

    def super_body(u, c):
        reach = slab(sup_ref[u, 0], sup_ref[u, 1], sup_ref[u, 2],
                     sup_ref[u, 3], sup_ref[u, 4], sup_ref[u, 5],
                     cox, coy, coz, inv_x, inv_y, inv_z, zero8, tmax_eff)
        ncull_ref[rsel] = ncull_ref[rsel] + 8
        pred = jnp.max(reach.astype(jnp.float32)) > 0.0
        return jax.lax.cond(
            pred,
            lambda cc: jax.lax.fori_loop(u * SUP, (u + 1) * SUP,
                                         cluster_body, cc),
            lambda cc: cc, c)

    jax.lax.fori_loop(0, sup_ref.shape[0], super_body, jnp.int32(0))


def _kernel(bhp_ref,                 # (1,24) SMEM: bh px,py,pz,r,dθ, scene
                                     # bbox lo/hi xyz, sphere-union lo/hi
            ox_ref, oy_ref, oz_ref,  # (1,8,128) ray origin tile
            dx_ref, dy_ref, dz_ref,
            mint_ref, maxt_ref,
            tri_ref,                 # (12,P) SMEM part: v0,e1,e2,valid,pad
                                     # (transposed: SMEM pads the minor dim
                                     # to 128 words, so rows must be dense)
            cl_ref,                  # (cpp,8) SMEM part: lo xyz, hi xyz, pad
            sup_ref,                 # (spp,8) SMEM part: supercluster boxes
            trow_ref,                # (P,128) VMEM part: row-per-triangle
                                     # [v0 xyz, e1 xyz, e2 xyz, valid, 0...]
            sph_ref,                 # (S,4) SMEM: cx,cy,cz,r
            pbox_ref,                # (n_parts,8) SMEM: part lo/hi xyz, pad
            # outputs (1,8,128): merged best-event state across parts
            hit_ref, abs_ref, t_ref, prim_ref, seg_ref,
            sox_ref, soy_ref, soz_ref, sdx_ref, sdy_ref, sdz_ref,
            # measured work counters (1,8,128) i32, accumulated across
            # parts: primitive tests paid per lane (the reference's
            # total_isects, bvh.h:140) and bbox slab tests paid per lane
            nisect_ref, ncull_ref,
            chords,                  # VMEM scratch (n_chord,7,8,128)
            wchords,                 # VMEM scratch (n_win,7,8,8,128): the
                                     # same chords re-laid per sub-row for
                                     # the windowed sweep: [w,c,r,s%8,:]
            ltouch,                  # VMEM scratch (1,8,128) i32: last seg
                                     # whose chord touches the scene bbox
            wbox,                    # SMEM scratch (n_win,8,6): per
                                     # (window, sub-row) chord AABB for
                                     # the scalar box gates (gate "box*")
            bts_ref, bps_ref,        # VMEM scratch (1,8,128): the running
                                     # best (t, prim) of one scan_part
                                     # call (_SCAN == "ref": culling
                                     # branches carry no vector state)
            mf,                      # VMEM scratch (7,8,128) f32: lazy
                                     # march state (pos, dir, dead flag)
            mi,                      # VMEM scratch (2,8,128) i32: lazy
                                     # march state (end_seg, last touch)
            fr_ref,                  # SMEM scratch (1,) i32: lazy march
                                     # frontier (windows marched so far)
            *, curved: bool, n_seg: int, n_tri_rows: int,
            cluster_size: int, n_parts: int, windowed: bool,
            blocked: bool, part_rows: int, occlusion: bool,
            n_live_sph: int = -1):
    P = part_rows                    # triangle rows in this part
    cpp = cl_ref.shape[0]            # clusters in this part
    S = sph_ref.shape[0]
    # live-sphere prefix (build pads dead rows at the tail): the sphere
    # loops and gates only ever touch the first SL rows
    SL = S if n_live_sph < 0 else min(n_live_sph, S)
    p = pl.program_id(1) if n_parts > 1 else 0
    # scalar box-prefilter gating serves the windowed scalar-sweep path;
    # v2/flat/blocked keep the r4 vector-slab gates
    gate_mode = _GATE if (windowed and not blocked) else "slab"

    bh_px = bhp_ref[0, 0]
    bh_py = bhp_ref[0, 1]
    bh_pz = bhp_ref[0, 2]
    bh_r = bhp_ref[0, 3]
    bh_dt = bhp_ref[0, 4]
    # live-sphere union AABB (lo xyz, hi xyz) for the per-window sphere
    # gate; inverted (lo=+BIG > hi=-BIG) when no live spheres exist
    sbox = tuple(bhp_ref[0, 11 + i] for i in range(6))

    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]       # (8,128)
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]

    f0 = jnp.zeros((8, 128), jnp.float32)
    i_nseg = jnp.full((8, 128), n_seg, jnp.int32)

    def march(px, py, pz, ux, uy, uz):
        """One Δθ geodesic step (blackhole.cpp:17-40), component form."""
        xax = px - bh_px
        xay = py - bh_py
        xaz = pz - bh_pz
        d2 = xax * xax + xay * xay + xaz * xaz
        at_c = d2 <= 0.0
        dist = jnp.sqrt(jnp.where(at_c, 1.0, d2))
        # one reciprocal per norm, then multiplies: VPU division costs
        # ~60-70 cycles per (8,128) op (the r5 primary-scene probe
        # measured the march division-bound at 18 slow ops/step), so the
        # three per-axis divisions collapse onto the u=1/dist value the
        # step needs anyway. The XLA path (physics/schwarzschild.
        # micro_step) uses the SAME reciprocal-multiply forms so the two
        # compilations stay bit-identical on calm lanes.
        u = 1.0 / dist
        xhx, xhy, xhz = xax * u, xay * u, xaz * u
        ddx = ux * xhx + uy * xhy + uz * xhz
        yax = ux - ddx * xhx
        yay = uy - ddx * xhy
        yaz = uz - ddx * xhz
        y2 = yax * yax + yay * yay + yaz * yaz
        dead = (y2 < 1e-24) | at_c
        dyn = jnp.sqrt(jnp.where(dead, 1.0, y2))
        rdyn = 1.0 / dyn
        yhx, yhy, yhz = yax * rdyn, yay * rdyn, yaz * rdyn
        up = -u * ddx * rdyn

        def f(uu):
            return -uu + 1.5 * bh_r * uu * uu

        f1 = f(u)
        f2 = f(u + up * bh_dt / 2.0)
        f3 = f(u + up * bh_dt / 2.0 + f1 * bh_dt * bh_dt / 4.0)
        u_new = u + up * bh_dt + (f1 + f2 + f3) * bh_dt * bh_dt / 6.0
        # u_new <= 0: the reference's d = 1/u goes negative and the path
        # teleports through the hole (blackhole.cpp:33-36) — reproduce
        # (see physics/schwarzschild.py); clamp |d| for f32 chord² safety
        tiny = 1e-30
        u_safe = jnp.where(jnp.abs(u_new) > tiny, u_new,
                           jnp.where(u_new >= 0.0, tiny, -tiny))
        d_new = jnp.clip(1.0 / u_safe, -1e9, 1e9)
        ct = jnp.cos(bh_dt)
        st = jnp.sin(bh_dt)
        nx = bh_px + d_new * ct * xhx + d_new * st * yhx
        ny = bh_py + d_new * ct * xhy + d_new * st * yhy
        nz = bh_pz + d_new * ct * xhz + d_new * st * yhz
        cx, cy, cz = nx - px, ny - py, nz - pz
        c2 = cx * cx + cy * cy + cz * cz
        zl = c2 <= 0.0
        clen = jnp.sqrt(jnp.where(zl, 1.0, c2))
        rclen = 1.0 / clen
        ndx, ndy, ndz = cx * rclen, cy * rclen, cz * rclen
        # inverse chord direction for THIS step's scene-bbox touch test
        # (phase-2 gates recompute their own, once per window sub-row —
        # storing these cost more in march-side chord stores than the
        # saved divisions, measured on-chip r5)
        rix, riy, riz = 1.0 / ndx, 1.0 / ndy, 1.0 / ndz
        clen = jnp.where(zl, 0.0, clen)
        dead = dead | zl
        return ndx, ndy, ndz, rix, riy, riz, clen, dead

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

    def slab(lox, loy, loz, hix, hiy, hiz,
             px, py, pz, ix, iy, iz, tmin, tmax):
        """Does any lane's [tmin, tmax] chord touch the (scalar) box?
        Lanes with tmax < tmin never reach."""
        tx0 = (lox - px) * ix
        tx1 = (hix - px) * ix
        ty0 = (loy - py) * iy
        ty1 = (hiy - py) * iy
        tz0 = (loz - pz) * iz
        tz1 = (hiz - pz) * iz
        tmn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                      jnp.minimum(ty0, ty1)),
                          jnp.minimum(tz0, tz1))
        tmx = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                      jnp.maximum(ty0, ty1)),
                          jnp.maximum(tz0, tz1))
        return ((tmn <= tmx) & (tmn <= tmax) & (tmx >= tmin)
                & (tmax >= tmin))

    def scan_part(px, py, pz, ux, uy, uz, inv_x, inv_y, inv_z,
                  tmin, tmax, do_tris, do_sph):
        """Best (t, local prim) of chords [tmin, tmax] against this part's
        clusters (gated by the caller's part-AABB test `do_tris`) plus —
        on part 0, when the caller's sphere-union slab passes (`do_sph`) —
        the LIVE prefix of the global sphere list. Lanes with tmax < tmin
        match nothing. Inverse directions come precomputed from the chord
        table (march stores them once; see `march`)."""

        def tri_body(ti, carry):
            """One triangle broadcast against the whole ray tile."""
            best_t, best_p = carry
            v0x = tri_ref[0, ti]
            v0y = tri_ref[1, ti]
            v0z = tri_ref[2, ti]
            e1x = tri_ref[3, ti]
            e1y = tri_ref[4, ti]
            e1z = tri_ref[5, ti]
            e2x = tri_ref[6, ti]
            e2y = tri_ref[7, ti]
            e2z = tri_ref[8, ti]
            valid = tri_ref[9, ti] > 0.0
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
            reach = slab(cl_ref[k, 0], cl_ref[k, 1], cl_ref[k, 2],
                         cl_ref[k, 3], cl_ref[k, 4], cl_ref[k, 5],
                         px, py, pz, inv_x, inv_y, inv_z, tmin, tmax)
            pred = jnp.max(reach.astype(jnp.float32)) > 0.0
            ncull_ref[0] = ncull_ref[0] + 1

            def do(c):
                nisect_ref[0] = nisect_ref[0] + cluster_size
                if _ABLATE == "noexec":
                    return c
                return jax.lax.fori_loop(
                    k * cluster_size, (k + 1) * cluster_size, tri_body, c)

            if _SCAN == "ref":
                # zero-carry branch: the running best lives in VMEM
                # scratch, so the cond materializes no vector state
                @pl.when(pred)
                def _():
                    bt, bp = do((bts_ref[0], bps_ref[0]))
                    bts_ref[0] = bt
                    bps_ref[0] = bp
                return carry
            return jax.lax.cond(pred, do, lambda c: c, carry)

        def super_body(u, carry):
            reach = slab(sup_ref[u, 0], sup_ref[u, 1], sup_ref[u, 2],
                         sup_ref[u, 3], sup_ref[u, 4], sup_ref[u, 5],
                         px, py, pz, inv_x, inv_y, inv_z, tmin, tmax)
            pred = jnp.max(reach.astype(jnp.float32)) > 0.0
            ncull_ref[0] = ncull_ref[0] + 1

            def do(c):
                return jax.lax.fori_loop(
                    u * SUP, (u + 1) * SUP, cluster_body, c)

            if _SCAN == "ref":
                @pl.when(pred)
                def _():
                    do(jnp.int32(0))
                return carry
            return jax.lax.cond(pred, do, lambda c: c, carry)

        def sph_body(si, carry):
            best_t, best_p = carry
            nisect_ref[0] = nisect_ref[0] + 1
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

        n_sup = cpp // SUP
        if _SCAN == "ref":
            bts_ref[0] = jnp.full((8, 128), BIG, jnp.float32)
            bps_ref[0] = jnp.full((8, 128), -1, jnp.int32)

            @pl.when(do_tris)
            def _():
                jax.lax.fori_loop(0, n_sup, super_body, jnp.int32(0))
            if SL > 0:
                # spheres are global: test the live prefix once, on part 0
                @pl.when(do_sph)
                def _():
                    bt, bp = jax.lax.fori_loop(
                        0, SL, sph_body, (bts_ref[0], bps_ref[0]))
                    bts_ref[0] = bt
                    bps_ref[0] = bp
            return (bts_ref[0], bps_ref[0])
        carry = (jnp.full((8, 128), BIG, jnp.float32),
                 jnp.full((8, 128), -1, jnp.int32))
        carry = jax.lax.cond(
            do_tris,
            lambda c: jax.lax.fori_loop(0, n_sup, super_body, c),
            lambda c: c, carry)
        if SL > 0:
            # spheres are global: test the live prefix once, on part 0
            carry = jax.lax.cond(
                do_sph,
                lambda c: jax.lax.fori_loop(0, SL, sph_body, c),
                lambda c: c, carry)
        return carry

    def scan_part_blk(px, py, pz, ux, uy, uz, inv_x, inv_y, inv_z,
                      tmin, tmax, do_tris, do_sph):
        """Block-gated traversal (_SCAN == "blk"): same culling DECISIONS
        as scan_part, restructured so the slab tests of a whole
        supercluster block run straight-line (SMEM box loads and vector
        ops pipeline with no intervening branches) and the branches then
        test ready scalar predicates. The running best lives in the
        bts/bps scratch refs, so no branch carries vector state. Results
        are bit-identical to scan_part (identical tests, identical merge
        order)."""

        def tri_body(ti, carry):
            best_t, best_p = carry
            v0x = tri_ref[0, ti]
            v0y = tri_ref[1, ti]
            v0z = tri_ref[2, ti]
            e1x = tri_ref[3, ti]
            e1y = tri_ref[4, ti]
            e1z = tri_ref[5, ti]
            e2x = tri_ref[6, ti]
            e2y = tri_ref[7, ti]
            e2z = tri_ref[8, ti]
            valid = tri_ref[9, ti] > 0.0
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

        def sph_body(si, carry):
            best_t, best_p = carry
            nisect_ref[0] = nisect_ref[0] + 1
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

        def reach_pred(ref, i):
            reach = slab(ref[i, 0], ref[i, 1], ref[i, 2],
                         ref[i, 3], ref[i, 4], ref[i, 5],
                         px, py, pz, inv_x, inv_y, inv_z, tmin, tmax)
            return jnp.max(reach.astype(jnp.float32)) > 0.0

        def sweep(k):
            nisect_ref[0] = nisect_ref[0] + cluster_size
            if _ABLATE == "noexec":
                return
            bt, bp = jax.lax.fori_loop(
                k * cluster_size, (k + 1) * cluster_size, tri_body,
                (bts_ref[0], bps_ref[0]))
            bts_ref[0] = bt
            bps_ref[0] = bp

        bts_ref[0] = jnp.full((8, 128), BIG, jnp.float32)
        bps_ref[0] = jnp.full((8, 128), -1, jnp.int32)
        n_sup = cpp // SUP

        @pl.when(do_tris)
        def _():
            ncull_ref[0] = ncull_ref[0] + n_sup
            sup_preds = [reach_pred(sup_ref, u) for u in range(n_sup)]
            for u in range(n_sup):
                @pl.when(sup_preds[u])
                def _(u=u):
                    ncull_ref[0] = ncull_ref[0] + SUP
                    cpreds = [reach_pred(cl_ref, u * SUP + j)
                              for j in range(SUP)]
                    for j in range(SUP):
                        @pl.when(cpreds[j])
                        def _(j=j, u=u):
                            sweep(u * SUP + j)

        if SL > 0:
            @pl.when(do_sph)
            def _():
                bt, bp = jax.lax.fori_loop(
                    0, SL, sph_body, (bts_ref[0], bps_ref[0]))
                bts_ref[0] = bt
                bps_ref[0] = bp
        return (bts_ref[0], bps_ref[0])

    def scan_part_box(px, py, pz, ux, uy, uz, inv_x, inv_y, inv_z,
                      tmin, tmax, do_tris, do_sph, wb):
        """Box-prefilter traversal of this part (gate modes "box"/"boxp",
        r5): every supercluster/cluster gate is a PURE-SCALAR box-overlap
        test of the SMEM box tables against `wb`, this sub-row window's
        chord AABB — no vector ops, no vector→scalar sync (the r5 probe
        measured the old per-gate vector slab + max-reduce + branch at
        ~270 cycles, 47-52% of kernel time). "boxp" additionally keeps
        one precise vector slab per surviving cluster to bound the extra
        triangle work the looser window AABB lets through. Returns
        (best_t, best_p, n_gate_tests) — the scalar test count is charged
        to ncull by the caller, once per window."""
        precise = _GATE == "boxp"

        def tri_body(ti, carry):
            best_t, best_p = carry
            v0x = tri_ref[0, ti]
            v0y = tri_ref[1, ti]
            v0z = tri_ref[2, ti]
            e1x = tri_ref[3, ti]
            e1y = tri_ref[4, ti]
            e1z = tri_ref[5, ti]
            e2x = tri_ref[6, ti]
            e2y = tri_ref[7, ti]
            e2z = tri_ref[8, ti]
            valid = tri_ref[9, ti] > 0.0
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

        def sweep(k, c):
            bt, bp, cnt = c
            nisect_ref[0] = nisect_ref[0] + cluster_size
            if _ABLATE == "noexec":
                return (bt, bp, cnt)
            bt, bp = jax.lax.fori_loop(
                k * cluster_size, (k + 1) * cluster_size, tri_body,
                (bt, bp))
            return (bt, bp, cnt)

        def cluster_body(k, carry):
            pred = _sbox_overlap(wb, cl_ref, k)

            def do(c):
                bt, bp, cnt = c
                if precise:
                    reach = slab(
                        cl_ref[k, 0], cl_ref[k, 1], cl_ref[k, 2],
                        cl_ref[k, 3], cl_ref[k, 4], cl_ref[k, 5],
                        px, py, pz, inv_x, inv_y, inv_z, tmin, tmax)
                    pred2 = jnp.max(reach.astype(jnp.float32)) > 0.0
                    return jax.lax.cond(pred2, lambda cc: sweep(k, cc),
                                        lambda cc: cc, (bt, bp, cnt + 1))
                return sweep(k, (bt, bp, cnt))

            bt, bp, cnt = carry
            return jax.lax.cond(pred, do, lambda c: c,
                                (bt, bp, cnt + 1))

        def super_body(u, carry):
            pred = _sbox_overlap(wb, sup_ref, u)
            bt, bp, cnt = carry
            return jax.lax.cond(
                pred,
                lambda c: jax.lax.fori_loop(u * SUP, (u + 1) * SUP,
                                            cluster_body, c),
                lambda c: c, (bt, bp, cnt + 1))

        def sph_body(si, carry):
            best_t, best_p, cnt = carry
            nisect_ref[0] = nisect_ref[0] + 1
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
                    jnp.where(closer, n_tri_rows + si, best_p), cnt)

        carry = (jnp.full((8, 128), BIG, jnp.float32),
                 jnp.full((8, 128), -1, jnp.int32), jnp.int32(0))
        n_sup = cpp // SUP
        carry = jax.lax.cond(
            do_tris,
            lambda c: jax.lax.fori_loop(0, n_sup, super_body, c),
            lambda c: c, carry)
        if SL > 0:
            carry = jax.lax.cond(
                do_sph,
                lambda c: jax.lax.fori_loop(0, SL, sph_body, c),
                lambda c: c, carry)
        return carry

    def merge_update(s_idx, bt, bp, cox, coy, coz, cdx, cdy, cdz):
        """Fold this segment's candidates into the cross-part best-event
        state by the first-event rule (segment index, then chord t)."""
        seg = seg_ref[0]
        hitm = hit_ref[0] > 0.0
        cur_t = t_ref[0]
        better = (bp >= 0) & ((s_idx < seg)
                              | ((s_idx == seg) & hitm & (bt < cur_t)))
        bp_g = jnp.where((bp >= 0) & (bp < P), bp + p * P, bp)
        hit_ref[0] = jnp.where(better, 1.0, hit_ref[0])
        abs_ref[0] = jnp.where(better, 0.0, abs_ref[0])
        t_ref[0] = jnp.where(better, bt, cur_t)
        prim_ref[0] = jnp.where(better, bp_g, prim_ref[0])
        seg_ref[0] = jnp.where(better, s_idx, seg)
        sox_ref[0] = jnp.where(better, cox, sox_ref[0])
        soy_ref[0] = jnp.where(better, coy, soy_ref[0])
        soz_ref[0] = jnp.where(better, coz, soz_ref[0])
        sdx_ref[0] = jnp.where(better, cdx, sdx_ref[0])
        sdy_ref[0] = jnp.where(better, cdy, sdy_ref[0])
        sdz_ref[0] = jnp.where(better, cdz, sdz_ref[0])

    # ------------------------------------------------ phase 1 (part 0):
    # march all chords once into VMEM scratch; resolve absorption and
    # degenerate-death bounds (both geometry-independent).
    if curved:
        lazy_on = (n_parts == 1) if _LAZY == "auto" else (_LAZY != "0")
        lazy = (windowed and lazy_on and gate_mode == "slab"
                and not blocked and _ABLATE == "")
        if lazy:
            @pl.when(p == 0)
            def _():
                mf[0], mf[1], mf[2] = ox, oy, oz
                mf[3], mf[4], mf[5] = dx, dy, dz
                mf[6] = f0                          # dead flag
                mi[0] = i_nseg                      # end_seg (open)
                mi[1] = jnp.full((8, 128), -1, jnp.int32)   # last touch
                fr_ref[0] = 0
                nisect_ref[0] = jnp.zeros((8, 128), jnp.int32)
                ncull_ref[0] = jnp.zeros((8, 128), jnp.int32)
                hit_ref[0] = f0
                abs_ref[0] = f0
                t_ref[0] = jnp.full((8, 128), BIG, jnp.float32)
                prim_ref[0] = jnp.full((8, 128), -1, jnp.int32)
                seg_ref[0] = i_nseg
                sox_ref[0] = ox
                soy_ref[0] = oy
                soz_ref[0] = oz
                sdx_ref[0] = dx
                sdy_ref[0] = dy
                sdz_ref[0] = dz

            gbox = tuple(bhp_ref[0, 5 + i] for i in range(6))
            _phase2_lazy(
                hit_ref, abs_ref, t_ref, prim_ref, seg_ref,
                sox_ref, soy_ref, soz_ref, sdx_ref, sdy_ref, sdz_ref,
                nisect_ref, ncull_ref, chords, wchords, mf, mi, fr_ref,
                pbox_ref, scan_part_blk if _SCAN == "blk" else scan_part,
                slab, march, absorb, sbox, gbox,
                p=p, P=P, SL=SL, n_seg=n_seg, occlusion=occlusion)
            return

        @pl.when(p == 0)
        def _():
            glox = bhp_ref[0, 5]
            gloy = bhp_ref[0, 6]
            gloz = bhp_ref[0, 7]
            ghix = bhp_ref[0, 8]
            ghiy = bhp_ref[0, 9]
            ghiz = bhp_ref[0, 10]

            def cond(c):
                s = c[0]
                open_any = c[-1]
                return (s < n_seg) & open_any

            def step(c):
                """One Δθ segment: march, record chord, update the
                absorption/death/last-touch bounds. Steps past n_seg
                (unrolled-loop tail) record into padded chord rows and
                MASK every bound update — a 2π-complete lane must read
                as escaped, never absorbed at a phantom segment."""
                (s, px, py, pz, ux, uy, uz, dead_f, end_seg, abs_f,
                 last_t, _) = c
                live = s < n_seg
                (ndx, ndy, ndz, rix, riy, riz,
                 clen, sdead) = march(px, py, pz, ux, uy, uz)
                dead_f = jnp.maximum(dead_f, sdead.astype(jnp.float32))
                clen = jnp.where(dead_f > 0.0, 0.0, clen)
                chords[s, 0] = px
                chords[s, 1] = py
                chords[s, 2] = pz
                chords[s, 3] = ndx
                chords[s, 4] = ndy
                chords[s, 5] = ndz
                chords[s, 6] = clen
                if windowed and _WREL == "march":
                    # legacy in-march windowed re-layout: dynamic-index
                    # (1,128) stores per segment — measured ~60% of the
                    # march phase; the default now re-lays out post-march
                    # with fully static indices (see below)
                    wi = s // 8
                    sw = s - wi * 8
                    for _c2, _v in enumerate(
                            (px, py, pz, ndx, ndy, ndz, clen)):
                        for _r2 in range(8):
                            wchords[wi, _c2, _r2, pl.ds(sw, 1)] = \
                                jax.lax.slice(_v, (_r2, 0), (_r2 + 1, 128))
                # geometry is only reachable on chords touching the global
                # scene bbox; the LAST touching segment (over the whole
                # march, so lensed re-entry is exact) bounds phase 2
                touch = slab(glox, gloy, gloz, ghix, ghiy, ghiz,
                             px, py, pz, rix, riy, riz,
                             jnp.zeros((8, 128), jnp.float32), clen)
                last_t = jnp.where(touch & (dead_f == 0.0) & live,
                                   s, last_t)
                ab = absorb(px, py, pz, ndx, ndy, ndz, clen) & (
                    dead_f == 0.0)
                open_lane = end_seg >= n_seg
                close = (ab | (dead_f > 0.0)) & open_lane & live
                end_seg = jnp.where(close, s, end_seg)
                abs_f = jnp.where(close & ab, 1.0, abs_f)
                npx = px + ndx * clen
                npy = py + ndy * clen
                npz = pz + ndz * clen
                open_any = jnp.max(
                    (end_seg >= n_seg).astype(jnp.float32)) > 0.0
                return (s + 1, npx, npy, npz, ndx, ndy, ndz, dead_f,
                        end_seg, abs_f, last_t, open_any)

            def body(c):
                # _MUNROLL segments per while iteration: the loop-carried
                # state is 12 (8,128) arrays whose per-iteration spill/
                # reload was a large share of the march phase; unrolling
                # amortizes it (early exit coarsens to every _MUNROLL
                # segments — extra masked steps are harmless)
                for _ in range(_MUNROLL):
                    c = step(c)
                return c

            init = (jnp.int32(0), ox, oy, oz, dx, dy, dz, f0,
                    i_nseg, f0, jnp.full((8, 128), -1, jnp.int32),
                    jnp.bool_(True))
            fin = jax.lax.while_loop(cond, body, init)
            end_seg, abs_f, last_t = fin[8], fin[9], fin[10]
            ltouch[0] = last_t
            if windowed and _WREL != "march":
                # post-march windowed re-layout with fully STATIC
                # indices: wchords[w,c,r] sublane i = chords[8w+i,c] row
                # r. Replaces the per-segment dynamic stores inside the
                # march loop (56 per step — measured the bulk of the
                # march phase). Segments past an early march exit carry
                # stale data, but phase 2 masks them via ltouch/tmax_eff
                # and NaN-safe comparisons, exactly as before.
                for w2 in range(-(-n_seg // 8)):
                    for c2 in range(7):
                        segs = [chords[min(8 * w2 + i2, n_seg - 1), c2]
                                for i2 in range(8)]
                        for r2 in range(8):
                            rows = [jax.lax.slice(
                                segs[i2], (r2, 0), (r2 + 1, 128))
                                if 8 * w2 + i2 < n_seg else
                                jnp.zeros((1, 128), jnp.float32)
                                for i2 in range(8)]
                            wchords[w2, c2, r2] = jnp.concatenate(
                                rows, axis=0)
            if windowed and gate_mode != "slab":
                # Per-(window, sub-row) chord AABBs → SMEM scratch, read
                # by phase 2's scalar box gates. Chords with clen == 0
                # (dead/padded/masked lanes — all provably past their
                # lane's ltouch) and stale slots beyond the march's early
                # exit (sidx > every lane's ltouch) are excluded; a
                # window/row with no valid chord stores an inverted box,
                # which every scalar overlap test fails.
                i_sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
                n_win_s = -(-n_seg // 8)
                for w in range(n_win_s):
                    sidx_w = i_sub8 + w * 8
                    for r in range(8):
                        lt_r = jax.lax.slice(last_t, (r, 0), (r + 1, 128))
                        cc = [wchords[w, c2, r] for c2 in range(7)]
                        cox_, coy_, coz_, cdx_, cdy_, cdz_, cl_ = cc
                        val = (cl_ > 0.0) & (sidx_w <= lt_r)
                        exx = cox_ + cdx_ * cl_
                        exy = coy_ + cdy_ * cl_
                        exz = coz_ + cdz_ * cl_
                        for c2, (a, b2) in enumerate(
                                ((cox_, exx), (coy_, exy), (coz_, exz))):
                            wbox[w, r, c2] = jnp.min(jnp.where(
                                val, jnp.minimum(a, b2), BIG))
                            wbox[w, r, c2 + 3] = jnp.max(jnp.where(
                                val, jnp.maximum(a, b2), -BIG))
            nisect_ref[0] = jnp.zeros((8, 128), jnp.int32)
            ncull_ref[0] = jnp.zeros((8, 128), jnp.int32)
            # seed the merge state: absorption (or death) bounds the
            # first-event search; geometry must land strictly earlier.
            hit_ref[0] = f0
            abs_ref[0] = abs_f
            t_ref[0] = jnp.full((8, 128), BIG, jnp.float32)
            prim_ref[0] = jnp.full((8, 128), -1, jnp.int32)
            seg_ref[0] = end_seg
            sox_ref[0] = ox
            soy_ref[0] = oy
            soz_ref[0] = oz
            sdx_ref[0] = dx
            sdy_ref[0] = dy
            sdz_ref[0] = dz

        # -------------------------------------------- phase 2 (all parts):
        if windowed:
            _phase2_windowed(
                hit_ref, abs_ref, t_ref, prim_ref, seg_ref,
                sox_ref, soy_ref, soz_ref, sdx_ref, sdy_ref, sdz_ref,
                nisect_ref, ncull_ref, wchords, ltouch, wbox, pbox_ref,
                cl_ref, sup_ref, trow_ref,
                scan_part_blk if _SCAN == "blk" else scan_part,
                scan_part_box, slab, sbox,
                p=p, P=P, SL=SL, n_seg=n_seg,
                cluster_size=cluster_size, blocked=blocked,
                occlusion=occlusion, gate_mode=gate_mode)
            return

        # v2 layout: loop segments while any lane can still improve on the
        # merged best event; per segment one part-AABB test gates the
        # clusters (whole 1024-ray tile per gate).
        def improvable(s):
            """Per-lane: can segment s still improve the merged best?"""
            seg = seg_ref[0]
            hitm = hit_ref[0] > 0.0
            return ((s < seg) | ((s == seg) & hitm)) & (s <= ltouch[0])

        def seg_cond(c):
            s, improv = c
            return (s < n_seg) & improv

        def seg_body(c):
            s, _ = c
            cox = chords[s, 0]
            coy = chords[s, 1]
            coz = chords[s, 2]
            cdx = chords[s, 3]
            cdy = chords[s, 4]
            cdz = chords[s, 5]
            clen = chords[s, 6]
            cix = 1.0 / cdx
            ciy = 1.0 / cdy
            ciz = 1.0 / cdz
            seg = seg_ref[0]
            hitm = hit_ref[0] > 0.0
            cur_t = t_ref[0]
            lt = (s < seg) & (s <= ltouch[0])
            eq = (s == seg) & hitm & (s <= ltouch[0])
            tmax_eff = jnp.where(
                lt, clen,
                jnp.where(eq, jnp.minimum(clen, cur_t), -1.0))
            # one part-AABB slab test gates everything else this segment
            part_reach = slab(
                pbox_ref[p, 0], pbox_ref[p, 1], pbox_ref[p, 2],
                pbox_ref[p, 3], pbox_ref[p, 4], pbox_ref[p, 5],
                cox, coy, coz, cix, ciy, ciz,
                jnp.zeros((8, 128), jnp.float32), tmax_eff)
            ncull_ref[0] = ncull_ref[0] + 1
            do_tris = jnp.max(part_reach.astype(jnp.float32)) > 0.0
            if SL > 0:
                sph_reach = slab(
                    sbox[0], sbox[1], sbox[2], sbox[3], sbox[4], sbox[5],
                    cox, coy, coz, cix, ciy, ciz,
                    jnp.zeros((8, 128), jnp.float32), tmax_eff)
                ncull_ref[0] = ncull_ref[0] + 1
                do_sph = (p == 0) & (
                    jnp.max(sph_reach.astype(jnp.float32)) > 0.0)
                gate = do_tris | do_sph
            else:
                do_sph = jnp.bool_(False)
                gate = do_tris

            @pl.when(gate)
            def _():
                bt, bp = (scan_part_blk if _SCAN == "blk" else scan_part)(
                    cox, coy, coz, cdx, cdy, cdz, cix, ciy, ciz,
                    jnp.zeros((8, 128), jnp.float32), tmax_eff,
                    do_tris=do_tris, do_sph=do_sph)
                merge_update(s, bt, bp, cox, coy, coz, cdx, cdy, cdz)

            s2 = s + 1
            improv = jnp.max(improvable(s2).astype(jnp.float32)) > 0.0
            return (s2, improv)

        improv0 = jnp.max(
            improvable(jnp.int32(0)).astype(jnp.float32)) > 0.0
        jax.lax.while_loop(seg_cond, seg_body, (jnp.int32(0), improv0))
    else:
        # flat: one "segment" = the original ray honoring min_t/max_t
        @pl.when(p == 0)
        def _():
            hit_ref[0] = f0
            abs_ref[0] = f0
            t_ref[0] = jnp.full((8, 128), BIG, jnp.float32)
            prim_ref[0] = jnp.full((8, 128), -1, jnp.int32)
            # "no event yet" = segment 1: flat events land at segment 0 and
            # must satisfy the strict first-event rule (s < seg)
            seg_ref[0] = jnp.ones((8, 128), jnp.int32)
            sox_ref[0] = ox
            soy_ref[0] = oy
            soz_ref[0] = oz
            sdx_ref[0] = dx
            sdy_ref[0] = dy
            sdz_ref[0] = dz
            nisect_ref[0] = jnp.zeros((8, 128), jnp.int32)
            ncull_ref[0] = jnp.zeros((8, 128), jnp.int32)

        hitm = hit_ref[0] > 0.0
        cur_t = t_ref[0]
        tmax_eff = jnp.where(hitm, jnp.minimum(maxt_ref[0], cur_t),
                             maxt_ref[0])
        inv_dx = 1.0 / dx
        inv_dy = 1.0 / dy
        inv_dz = 1.0 / dz
        ncull_ref[0] = ncull_ref[0] + 1
        part_reach = slab(
            pbox_ref[p, 0], pbox_ref[p, 1], pbox_ref[p, 2],
            pbox_ref[p, 3], pbox_ref[p, 4], pbox_ref[p, 5],
            ox, oy, oz, inv_dx, inv_dy, inv_dz,
            mint_ref[0], tmax_eff)
        do_tris = jnp.max(part_reach.astype(jnp.float32)) > 0.0
        if SL > 0:
            sph_reach = slab(
                sbox[0], sbox[1], sbox[2], sbox[3], sbox[4], sbox[5],
                ox, oy, oz, inv_dx, inv_dy, inv_dz,
                mint_ref[0], tmax_eff)
            ncull_ref[0] = ncull_ref[0] + 1
            do_sph = (p == 0) & (
                jnp.max(sph_reach.astype(jnp.float32)) > 0.0)
        else:
            do_sph = jnp.bool_(False)

        @pl.when(do_tris | do_sph)
        def _():
            bt, bp = (scan_part_blk if _SCAN == "blk" else scan_part)(
                ox, oy, oz, dx, dy, dz, inv_dx, inv_dy, inv_dz,
                mint_ref[0], tmax_eff, do_tris=do_tris, do_sph=do_sph)
            merge_update(jnp.zeros((8, 128), jnp.int32), bt, bp,
                         ox, oy, oz, dx, dy, dz)


def pallas_supported(scene: SceneData) -> bool:
    """Single-pass for small scenes; Morton-partitioned multi-pass above
    PART_TRIS. The cap is a sanity bound, not an SMEM limit."""
    return scene.n_tris <= SMEM_TRI_BUDGET


@functools.partial(
    jax.jit, static_argnames=("curved", "n_seg", "interpret", "windowed",
                              "blocked", "occlusion"))
def pallas_trace_raw(scene: SceneData, bh: Optional[BlackHoleParams],
                     rays: Rays, curved: bool, n_seg: int,
                     interpret: bool = False, windowed: bool = True,
                     blocked: bool = True, occlusion: bool = False):
    # the flat (curved=False) branch runs the scalar scan_part sweep and
    # needs the SMEM triangle table — the blocked layout is curved-only
    blocked = blocked and curved
    """Run the fused kernel over 1024-ray tiles; returns flat result
    arrays for the lane batch."""
    tile = 1024
    n = rays.o.shape[0]
    n_pad = -(-n // tile) * tile
    g = n_pad // tile
    T = scene.n_tris
    CS_K = _cs_k(T)
    # Pad the triangle table to a whole number of PART_TRIS-row parts; the
    # part index is the second (sequential) grid dimension, so one kernel
    # instance covers any scene size with the merge state resident in VMEM.
    # blocked mode streams triangles as VMEM row-tables (4 MB/part) and
    # needs no SMEM triangle part, so parts can be 4x larger — grid-step
    # overhead (~10-16 us each, dominated by block DMA + pipeline sync)
    # scales with tiles x parts and was the measured floor of the r4
    # kernel (14 ms march-only on 64 tiles x 14 parts).
    part_tris = (4 * PART_TRIS) if blocked else PART_TRIS
    part_tris = int(_os.environ.get("RRT_PART_TRIS", part_tris))
    n_parts = max(1, -(-T // part_tris))
    T_pad = n_parts * part_tris if n_parts > 1 else T
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
    tri_rows = jnp.concatenate([
        jnp.asarray(scene.tri_v0, jnp.float32),
        jnp.asarray(scene.tri_v1 - scene.tri_v0, jnp.float32),
        jnp.asarray(scene.tri_v2 - scene.tri_v0, jnp.float32),
        (scene.tri_bsdf >= 0).astype(jnp.float32)[:, None],
        jnp.zeros((T, 2), jnp.float32),
    ], axis=1)                                        # (T, 12)
    if T_pad > T:
        tri_rows = jnp.pad(tri_rows, ((0, T_pad - T), (0, 0)))
    # each mode reads exactly one triangle layout; the other gets a tiny
    # dummy so its DMA cost vanishes:
    #   scalar sweep (v2/v3 + flat): SMEM (12, part) transposed table
    #   blocked sweep (v4):          VMEM (part, 128) row-per-triangle
    if blocked:
        tri_tab = jnp.zeros((12, 8), jnp.float32)
        trow_tab = jnp.pad(tri_rows, ((0, 0), (0, 116)))  # (T_pad, 128)
    else:
        tri_tab = tri_rows.T                          # (12, T_pad), dense
        trow_tab = jnp.zeros((8, 128), jnp.float32)
    # Kernel-level 3-level culling tables, derived from the triangle rows
    # (independent of scene.cluster_size, which serves the XLA paths):
    # CS_K-tri clusters and SUP-cluster superclusters. Finer clusters cut
    # wasted Möller–Trumbore work; the supercluster level keeps the slab
    # count from quadrupling in exchange (measured via the kernel's
    # nisect/ncull counters).
    live_t = (scene.tri_bsdf >= 0)[:, None]
    tmin = jnp.where(live_t, jnp.minimum(
        jnp.minimum(scene.tri_v0, scene.tri_v1), scene.tri_v2), BIG)
    tmax = jnp.where(live_t, jnp.maximum(
        jnp.maximum(scene.tri_v0, scene.tri_v1), scene.tri_v2), -BIG)
    if T_pad > T:
        tmin = jnp.concatenate(
            [tmin, jnp.full((T_pad - T, 3), BIG, jnp.float32)])
        tmax = jnp.concatenate(
            [tmax, jnp.full((T_pad - T, 3), -BIG, jnp.float32)])
    K = T_pad // CS_K
    K_pad = -(-K // SUP) * SUP
    cpp = K // n_parts              # real clusters per part
    cpp_pad = K_pad // n_parts      # incl. padded (inverted-box) rows
    spp = cpp_pad // SUP            # superclusters per part
    cl_lo = tmin.reshape(K, CS_K, 3).min(axis=1)
    cl_hi = tmax.reshape(K, CS_K, 3).max(axis=1)
    if K_pad > K:
        cl_lo = jnp.concatenate(
            [cl_lo, jnp.full((K_pad - K, 3), BIG, jnp.float32)])
        cl_hi = jnp.concatenate(
            [cl_hi, jnp.full((K_pad - K, 3), -BIG, jnp.float32)])
    sup_lo = cl_lo.reshape(K_pad // SUP, SUP, 3).min(axis=1)
    sup_hi = cl_hi.reshape(K_pad // SUP, SUP, 3).max(axis=1)
    # per-part AABB from the (pad-masked) triangle extents directly
    part_lo = tmin.reshape(n_parts, T_pad // n_parts, 3).min(axis=1)
    part_hi = tmax.reshape(n_parts, T_pad // n_parts, 3).max(axis=1)
    # Empty (all-padding) boxes come out inverted (lo=+BIG, hi=-BIG) —
    # and the min/max slab formulation is INSENSITIVE to inversion, so an
    # inverted box passes every test (it brute-forced 260 pad clusters
    # per segment at part_tris=8192 before this was caught). A point box
    # at +BIG genuinely fails: its t-interval collapses to ±BIG, outside
    # any chord's [0, tmax].
    def _fail_empty(lo, hi):
        bad = jnp.any(lo > hi, axis=1, keepdims=True)
        return (jnp.where(bad, BIG, lo), jnp.where(bad, BIG, hi))

    cl_lo, cl_hi = _fail_empty(cl_lo, cl_hi)
    sup_lo, sup_hi = _fail_empty(sup_lo, sup_hi)
    part_lo, part_hi = _fail_empty(part_lo, part_hi)
    cl_tab = jnp.concatenate(
        [cl_lo, cl_hi, jnp.zeros((K_pad, 2), jnp.float32)], axis=1)
    sup_tab = jnp.concatenate(
        [sup_lo, sup_hi, jnp.zeros((K_pad // SUP, 2), jnp.float32)], axis=1)
    pbox_tab = jnp.concatenate(
        [part_lo, part_hi, jnp.zeros((n_parts, 2), jnp.float32)], axis=1)
    sph_tab = jnp.concatenate([
        jnp.asarray(scene.sph_center, jnp.float32),
        jnp.where(scene.sph_bsdf >= 0, scene.sph_radius,
                  0.0).astype(jnp.float32)[:, None],
    ], axis=1)                                        # (S, 4)
    # global scene bbox (triangles ∪ live spheres) for the phase-1
    # chord-reach bound
    live_s = scene.sph_radius > 0
    sc_pad = jnp.where(live_s[:, None], scene.sph_center,
                       jnp.full((1, 3), BIG, jnp.float32))
    sr_pad = jnp.where(live_s, scene.sph_radius, 0.0)
    glo = jnp.minimum(part_lo.min(axis=0),
                      jnp.min(sc_pad - sr_pad[:, None], axis=0))
    ghi = jnp.maximum(part_hi.max(axis=0),
                      jnp.max(jnp.where(live_s[:, None],
                                        scene.sph_center, -BIG)
                              + sr_pad[:, None], axis=0))
    # live-sphere union AABB for the kernel's per-window sphere gate
    # (inverted lo=+BIG/hi=-BIG when no live sphere → every slab fails)
    s_live = live_s & (scene.sph_bsdf >= 0)
    sb_lo = jnp.min(jnp.where(s_live[:, None],
                              scene.sph_center - sr_pad[:, None], BIG),
                    axis=0)
    sb_hi = jnp.max(jnp.where(s_live[:, None],
                              scene.sph_center + sr_pad[:, None], -BIG),
                    axis=0)
    if bh is not None:
        bh_row = jnp.concatenate([
            jnp.asarray(bh.position, jnp.float32).reshape(3),
            jnp.asarray(bh.radius, jnp.float32).reshape(1),
            jnp.asarray(bh.delta_theta, jnp.float32).reshape(1),
            jnp.asarray(glo, jnp.float32).reshape(3),
            jnp.asarray(ghi, jnp.float32).reshape(3)])
    else:
        bh_row = jnp.zeros(11, jnp.float32)
    bhp = jnp.concatenate([
        bh_row,
        jnp.asarray(sb_lo, jnp.float32).reshape(3),
        jnp.asarray(sb_hi, jnp.float32).reshape(3),
        jnp.zeros(7, jnp.float32)]).reshape(1, 24)

    ray_spec = pl.BlockSpec((1, 8, 128), lambda i, p: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    smem = lambda shape: pl.BlockSpec(
        shape, lambda i, p: tuple(0 for _ in shape), memory_space=pltpu.SMEM)
    part_rows = T_pad // n_parts
    if blocked:
        tri_spec = pl.BlockSpec((12, 8), lambda i, p: (0, 0),
                                memory_space=pltpu.SMEM)
    else:
        tri_spec = pl.BlockSpec((12, part_rows), lambda i, p: (0, p),
                                memory_space=pltpu.SMEM)
    cl_spec = pl.BlockSpec((cpp_pad, 8), lambda i, p: (p, 0),
                           memory_space=pltpu.SMEM)
    sup_spec = pl.BlockSpec((spp, 8), lambda i, p: (p, 0),
                            memory_space=pltpu.SMEM)
    if blocked:
        trow_spec = pl.BlockSpec((part_rows, 128), lambda i, p: (p, 0),
                                 memory_space=pltpu.VMEM)
    else:
        trow_spec = pl.BlockSpec((8, 128), lambda i, p: (0, 0),
                                 memory_space=pltpu.VMEM)
    pbox_spec = smem((n_parts, 8))

    out_shapes = (
        [jax.ShapeDtypeStruct((g, 8, 128), jnp.float32) for _ in range(3)]
        + [jax.ShapeDtypeStruct((g, 8, 128), jnp.int32)] * 2
        + [jax.ShapeDtypeStruct((g, 8, 128), jnp.float32) for _ in range(6)]
        + [jax.ShapeDtypeStruct((g, 8, 128), jnp.int32)] * 2  # counters
    )

    kernel = functools.partial(
        _kernel, curved=curved, n_seg=n_seg, n_tri_rows=T_pad,
        cluster_size=CS_K, n_parts=n_parts,
        windowed=windowed and curved, blocked=blocked,
        part_rows=part_rows, occlusion=occlusion and windowed and curved,
        n_live_sph=getattr(scene, "n_live_spheres", -1))

    # chord rows padded to the march unroll (tail steps write there);
    # the lazy interleaved march writes whole 8-segment windows
    lazy_on = (n_parts == 1) if _LAZY == "auto" else (_LAZY != "0")
    lazy = (curved and windowed and not blocked and lazy_on
            and _GATE == "slab" and _ABLATE == "")
    n_win = -(-n_seg // 8) if (curved and windowed) else 1
    if not curved:
        n_chord = 1
    elif lazy:
        n_chord = n_win * 8
    else:
        n_chord = -(-n_seg // _MUNROLL) * _MUNROLL
    outs = pl.pallas_call(
        kernel,
        grid=(g, n_parts),
        in_specs=(
            [smem((1, 24))]
            + [ray_spec] * 8
            + [tri_spec, cl_spec, sup_spec, trow_spec, smem((S, 4)),
               pbox_spec]
        ),
        out_specs=tuple(ray_spec for _ in range(13)),
        out_shape=tuple(out_shapes),
        scratch_shapes=[pltpu.VMEM((n_chord, 7, 8, 128), jnp.float32),
                        pltpu.VMEM((n_win, 7, 8, 8, 128), jnp.float32),
                        pltpu.VMEM((1, 8, 128), jnp.int32),
                        pltpu.SMEM((n_win, 8, 6), jnp.float32),
                        pltpu.VMEM((1, 8, 128), jnp.float32),
                        pltpu.VMEM((1, 8, 128), jnp.int32),
                        pltpu.VMEM((7, 8, 128), jnp.float32),
                        pltpu.VMEM((2, 8, 128), jnp.int32),
                        pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(bhp, *ray_ins, tri_tab, cl_tab, sup_tab, trow_tab, sph_tab, pbox_tab)

    (hit, absd, t, prim, seg, sox, soy, soz, sdx, sdy, sdz,
     nisect, ncull) = outs
    cut = lambda a: a.reshape(-1)[:n]
    hit = cut(hit) > 0
    absd = (cut(absd) > 0) & ~hit
    prim = cut(prim)
    # sphere ids were minted in padded-tri space; remap to scene space
    prim = jnp.where(prim >= T_pad, prim - (T_pad - T), prim)
    t = jnp.where(hit, cut(t), 0.0)
    seg_o = jnp.stack([cut(sox), cut(soy), cut(soz)], axis=-1)
    seg_d = jnp.stack([cut(sdx), cut(sdy), cut(sdz)], axis=-1)
    # measured per-lane work (real lanes only: padding occupies the tail)
    stats = jnp.stack([jnp.sum(cut(nisect), dtype=jnp.float32),
                       jnp.sum(cut(ncull), dtype=jnp.float32)])
    return (hit, absd, t, prim, cut(seg), seg_o, seg_d, stats)


def pallas_trace(scene: SceneData, bh: Optional[BlackHoleParams],
                 rays: Rays, n_seg: int,
                 interpret: bool = False,
                 return_seg: bool = False,
                 return_stats: bool = False,
                 sort_hint: str = "dir",
                 occlusion: bool = False) -> Hit:
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
    # Sort lanes by (direction octant, origin Morton cell) so the
    # kernel's per-tile cluster culling sees coherent tiles even for
    # bounce/shadow batches — same scheme as the XLA path
    # (trace.trace_curved_marched). Undone on return.
    import os
    n_lanes = flat_rays.o.shape[0]
    # sorting pays on BVH-scale scenes where per-tile culling matters;
    # on few-cluster scenes it is pure overhead — gate on cluster count.
    # RRT_TRACE_SORT=force overrides the gate (lazy-march experiments:
    # sorting clusters masked/terminated lanes into tiles the interleaved
    # march can skip wholesale)
    sort_env = os.environ.get("RRT_TRACE_SORT", "1")
    sort = (sort_env == "force"
            or (_should_sort(n_lanes, scene.cluster_lo.shape[0])
                and sort_env != "0"))
    if sort:
        from rrt_tpu.geometry.trace import _morton7, _scene_bbox
        glo, ghi = _scene_bbox(scene)
        ext = jnp.where(ghi > glo, ghi - glo, 1.0)
        q = jnp.clip(((flat_rays.o - glo) / ext) * 127.0,
                     0.0, 127.0).astype(jnp.int32)
        m = (_morton7(q[:, 0]) << 2 | _morton7(q[:, 1]) << 1
             | _morton7(q[:, 2]))
        # Sort-key design, swept r4 on real configs: the shipped default
        # is the sign-octant + 21-bit origin-Morton key (db=1) for EVERY
        # batch type — measured best end-to-end (config 2: 137.7 s vs
        # 149.8 s for per-type direction/cell keys). Isolated kbench
        # patterns tell a different story (direction-major db=6 is 1.5-
        # 2.7x faster for single-origin batches: 57.8/66.0 ms coherent/
        # incoherent vs 85/177) but that pattern does not represent real
        # bounce batches (random origins AND directions), where finer
        # direction bins scatter spatially-local origins and RAISE
        # measured prim tests/ray. Knobs kept for future tuning:
        # RRT_SORT_DIRBITS (bits/axis), sort_hint="cell" (15-bit origin
        # cell major, then direction cones).
        if sort_hint == "cell":
            db = int(os.environ.get("RRT_SORT_DIRBITS", "5"))
        else:
            db = int(os.environ.get("RRT_SORT_DIRBITS", "1"))
        lv = 1 << db
        qd = jnp.clip(((flat_rays.d + 1.0) * (0.5 * lv)),
                      0.0, lv - 1).astype(jnp.int32)
        octant = (qd[:, 0] << (2 * db)) | (qd[:, 1] << db) | qd[:, 2]
        if sort_hint == "cell":
            key = ((m >> 6) << (3 * db)) | octant
        else:
            # budget the int32 key: direction bins take the high bits,
            # the origin Morton code keeps whatever fits (coarser cells
            # at high db — they only order lanes WITHIN a direction bin)
            mbits = min(21, 30 - 3 * db)
            key = (octant << mbits) | (m >> (21 - mbits))
        perm = jnp.argsort(key)
        flat_rays = jax.tree_util.tree_map(lambda a: a[perm], flat_rays)
    # kernel layout (RRT_KERNEL): v3 = segment-windowed gating with the
    # scalar-triangle sweep (default — fastest measured; dense full-tile
    # op streams pipeline at ~1 op/cycle); v4 = windowed gating +
    # block-vectorized 8-tri sweep (fewer vector ops but loses more to
    # small-op pipeline friction); v2 = per-segment full-tile
    mode = os.environ.get("RRT_KERNEL", "v3")
    windowed = mode != "v2"
    blocked = mode not in ("v2", "v3")
    hit, absd, t, prim, seg, seg_o, seg_d, kstats = pallas_trace_raw(
        scene, bh, flat_rays, curved, n_seg, interpret, windowed, blocked,
        occlusion)
    if sort:
        inv_perm = jnp.argsort(perm)
        unp = lambda a: a[inv_perm]
        hit, absd, t, prim, seg = (unp(hit), unp(absd), unp(t), unp(prim),
                                   unp(seg))
        seg_o, seg_d = unp(seg_o), unp(seg_d)

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
    # clamp to the simplex: an f32 disagreement between the in-kernel test
    # and this re-derivation (near-edge hits) must not produce out-of-range
    # normal blends
    b1 = jnp.clip(jnp.where(is_tri, b1[..., 0], 0.0), 0.0, 1.0)
    b2 = jnp.clip(jnp.where(is_tri, b2[..., 0], 0.0), 0.0, 1.0)
    b2 = jnp.minimum(b2, 1.0 - b1)
    h = build_hit(scene, seg_o, seg_d, hit, t, prim, b1, b2)
    if flat_shape != t.shape:
        h = jax.tree_util.tree_map(
            lambda a: a.reshape(flat_shape + a.shape[1:]), h)
        seg = seg.reshape(flat_shape)
    out = (h,)
    if return_seg:
        out = out + (seg,)
    if return_stats:
        # [prim tests paid, bbox slab tests paid] summed over real lanes —
        # the measured analog of the reference's total_isects (bvh.h:140,
        # reported at pathtracer.cpp:637-638)
        out = out + (kstats,)
    return out if len(out) > 1 else h
