"""Curved-space trace: geodesic micro-ray marching fused with closest-hit.

This is the TPU reformulation of the architectural hook at
`bvh.cpp:103-113`: every ray (camera / bounce / shadow) is marched as up to
⌈2π/Δθ⌉ chord segments; per segment the reference (1) advances the geodesic,
(2) kills the path on event-horizon absorption, (3) runs a full BVH
traversal of the chord and stops at the first segment containing a hit.

Reference semantics faithfully kept:
  * the original ray's min_t/max_t are DISCARDED — each chord carries its
    own [0, chord_len] range (so camera near/far clip and shadow-ray
    distance limits have no effect in curved mode);
  * absorption beats closer geometry within the same segment;
  * rays that march a full 2π without an event are treated as escaped;
  * escaped rays keep their ORIGINAL direction for env-map lookups
    (part1_code.cpp:106-107) — callers use `rays.d`, not the bent
    direction.

TPU design: instead of the reference's per-ray early exit, segments are
processed in groups of `seg_group`; each group folds its segments into the
ray batch axis so one chunked primitive pass serves group·N rays (dense,
fusion-friendly), and a `lax.while_loop` over groups exits early once every
lane has an event. Worst case equals the reference's 63 traversals; batches
that resolve early skip whole groups.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from rrt_tpu.geometry.intersect import (build_hit, closest_hit,
                                        sphere_intersect, tri_intersect)
from rrt_tpu.physics import schwarzschild as ss
from rrt_tpu.types import BlackHoleParams, Hit, Rays, SceneData


def trace_flat(scene: SceneData, rays: Rays, chunk: int = 512,
               accel: str = "auto") -> Hit:
    """Straight-ray closest hit honoring min_t/max_t (new capability:
    the reference cannot disable curvature)."""
    hit, t, pid, b1, b2 = closest_hit(
        scene, rays.o, rays.d, rays.min_t, rays.max_t, chunk, accel)
    return build_hit(scene, rays.o, rays.d, hit, t, pid, b1, b2)


def trace_curved(
    scene: SceneData,
    bh: BlackHoleParams,
    rays: Rays,
    seg_group: int = 9,
    chunk: int = 512,
    early_exit: bool = True,
    n_seg: int = None,
    accel: str = "auto",
    return_seg: bool = False,
) -> Hit:
    """Micro-ray marched closest hit (bvh.cpp:103-113 semantics).

    `early_exit=True` uses a `lax.while_loop` over segment groups (fast,
    not reverse-differentiable); `early_exit=False` runs all groups under
    `lax.scan` so `jax.grad` can flow through the geodesic chords (for
    d(image)/d(black-hole mass/position)).

    `n_seg` (static) must be given when `bh.delta_theta` is traced (e.g.
    when differentiating w.r.t. it); otherwise it is derived from the
    concrete value.
    """
    if n_seg is None:
        n_seg = ss.n_segments(float(bh.delta_theta))
    n_groups = -(-n_seg // seg_group)

    shape = rays.o.shape[:-1]
    dt = rays.o.dtype

    def seg_scan(carry, _):
        pos, dirn, dead = carry
        new_dir, chord, step_dead = ss.micro_step(pos, dirn, bh)
        dead = dead | step_dead
        chord = jnp.where(dead, 0.0, chord)
        new_pos = pos + new_dir * chord[..., None]
        absorbed = ss.absorbed_by_hole(pos, new_dir, chord, bh) & ~dead
        return (new_pos, new_dir, dead), (pos, new_dir, chord, absorbed, dead)

    # resolved state per ray
    init = dict(
        pos=rays.o,
        dirn=rays.d,
        dead=jnp.zeros(shape, bool),
        done=jnp.zeros(shape, bool),        # event found (hit or absorbed)
        absorbed=jnp.zeros(shape, bool),
        t=jnp.zeros(shape, dt),
        prim=jnp.full(shape, -1, jnp.int32),
        b1=jnp.zeros(shape, dt),
        b2=jnp.zeros(shape, dt),
        seg_o=rays.o,                        # winning chord origin/direction
        seg_d=rays.d,
        seg=jnp.full(shape, n_seg, jnp.int32),  # winning segment index
        group=jnp.array(0, jnp.int32),
    )

    def cond(st):
        return (st["group"] < n_groups) & ~jnp.all(st["done"] | st["dead"])

    def body(st):
        g = seg_group
        (pos, dirn, dead), (so, sd, slen, sabs, sdead) = jax.lax.scan(
            seg_scan, (st["pos"], st["dirn"], st["dead"]), None, length=g)
        # fold segments into the batch axis for one dense intersection pass
        hit, t, pid, b1, b2 = closest_hit(
            scene, so, sd,
            jnp.zeros_like(slen), slen, chunk, accel)
        # first event (absorption-before-hit within a segment:
        # absorption wins, bvh.cpp:107-109)
        event = (hit | sabs) & ~sdead                      # (g, ...)
        idx = jnp.argmax(event, axis=0)                    # first True
        any_event = jnp.any(event, axis=0)

        def sel(a):
            """Pick a[idx] along the segment axis (works for scalars and
            trailing-3 vectors)."""
            ix = idx.reshape(idx.shape + (1,) * (a.ndim - 1 - idx.ndim))
            ix = jnp.broadcast_to(ix[None], (1,) + a.shape[1:])
            return jnp.take_along_axis(a, ix, axis=0)[0]
        new_done = any_event & ~st["done"]
        upd = lambda cur, new: jnp.where(new_done, new, cur)
        upd3 = lambda cur, new: jnp.where(new_done[..., None], new, cur)
        return dict(
            pos=pos,
            dirn=dirn,
            dead=dead,
            done=st["done"] | any_event,
            absorbed=upd(st["absorbed"], sel(sabs)),
            t=upd(st["t"], sel(t)),
            prim=upd(st["prim"], sel(pid)),
            b1=upd(st["b1"], sel(b1)),
            b2=upd(st["b2"], sel(b2)),
            seg_o=upd3(st["seg_o"], sel(so)),
            seg_d=upd3(st["seg_d"], sel(sd)),
            seg=upd(st["seg"],
                    st["group"] * seg_group + idx.astype(jnp.int32)),
            group=st["group"] + 1,
        )

    if early_exit:
        st = jax.lax.while_loop(cond, body, init)
    else:
        st, _ = jax.lax.scan(
            lambda s, _: (body(s), None), init, None, length=n_groups)

    ok = st["done"] & ~st["absorbed"]
    hit = build_hit(
        scene, st["seg_o"], st["seg_d"], ok, st["t"], st["prim"],
        st["b1"], st["b2"])
    if return_seg:
        return hit, st["seg"]
    return hit


def _pallas_eligible(scene: SceneData) -> bool:
    from rrt_tpu.ops.trace_kernel import pallas_supported
    return jax.default_backend() == "tpu" and pallas_supported(scene)


def trace(scene: SceneData, bh: BlackHoleParams, rays: Rays,
          chunk: int = 512, seg_group: int = 9,
          early_exit: bool = True, n_seg: int = None,
          backend: str = "auto", accel: str = "auto") -> Hit:
    """Dispatch on the (static) curvature flag and backend.

    backend: "pallas" = fused on-chip kernel (TPU, SMEM-sized scenes),
    "xla" = composed XLA ops (any platform, reverse-differentiable),
    "auto" = pallas when eligible. The differentiable path must use "xla"
    (the kernel has no custom VJP yet).
    """
    if backend == "auto":
        backend = "pallas" if _pallas_eligible(scene) else "xla"
    if backend == "pallas":
        from rrt_tpu.ops.trace_kernel import pallas_trace
        from rrt_tpu.physics import schwarzschild as ss
        if n_seg is None:
            n_seg = ss.n_segments(float(bh.delta_theta)) if (
                bh is not None and bh.enabled) else 1
        return pallas_trace(scene, bh, rays, n_seg=n_seg)
    if bh is not None and bh.enabled:
        return trace_curved(scene, bh, rays, seg_group, chunk, early_exit,
                            n_seg, accel)
    return trace_flat(scene, rays, chunk, accel)


def trace_with_seg(scene: SceneData, bh: BlackHoleParams, rays: Rays,
                   n_seg: int = None, backend: str = "auto",
                   chunk: int = 512, seg_group: int = 9):
    """Closest hit plus the winning micro-segment index per ray (n_seg for
    rays with no geometry event). Used by the differentiable
    reconstruction below."""
    curved = bh is not None and bh.enabled
    if backend == "auto":
        backend = "pallas" if _pallas_eligible(scene) else "xla"
    if n_seg is None:
        n_seg = ss.n_segments(float(bh.delta_theta)) if curved else 1
    if backend == "pallas":
        from rrt_tpu.ops.trace_kernel import pallas_trace
        return pallas_trace(scene, bh, rays, n_seg=n_seg, return_seg=True)
    if curved:
        return trace_curved(scene, bh, rays, seg_group, chunk,
                            early_exit=True, n_seg=n_seg, return_seg=True)
    h = trace_flat(scene, rays, chunk)
    return h, jnp.zeros(h.t.shape, jnp.int32)


def trace_diff(scene: SceneData, bh: BlackHoleParams, rays: Rays,
               n_seg: int = None, backend: str = "auto",
               chunk: int = 512) -> Hit:
    """Differentiable closest hit: fast discrete primal + continuous
    reconstruction.

    The discrete structure (winning primitive, winning segment, hit/absorb
    masks) comes from the non-differentiable fast path (the fused Pallas
    kernel on TPU) under stop_gradient; the continuous payload is then
    RE-DERIVED differentiably: the geodesic march is replayed as a
    `lax.scan` (cheap — no intersections) to get the winning chord as a
    function of the black-hole parameters, and only the ONE winning
    primitive per ray is re-intersected. Gradients flow through chord
    geometry → t/p/n → shading exactly as in the monolithic XLA autodiff
    path, at a tiny fraction of its cost (which brute-forced rays × tris ×
    segments through reverse mode; see VERDICT r1 item 2).

    Matches the AD decomposition promised in SURVEY §7: detached discrete
    decisions, reparameterized continuous factors. Visibility gradients
    remain out of scope.
    """
    curved = bh is not None and bh.enabled
    if n_seg is None:
        n_seg = ss.n_segments(float(bh.delta_theta)) if curved else 1
    sg = lambda t: jax.tree_util.tree_map(jax.lax.stop_gradient, t)
    h0, seg = trace_with_seg(sg(scene), sg(bh), sg(rays),
                             n_seg=n_seg, backend=backend, chunk=chunk)
    hitm = h0.hit
    prim = h0.prim_id
    shape = h0.t.shape

    if curved:
        sgc = jnp.clip(seg, 0, n_seg - 1)

        # Replay the march differentiably; collect every chord's (o, d).
        # Lanes are FROZEN past their winning segment: marching absorbed
        # lanes further would integrate u = 1/d to infinity inside the
        # horizon, and inf forward values poison the backward pass with
        # NaN even under zero cotangents.
        def step(c, s):
            pos, dirn, dead = c
            nd, clen, sdead = ss.micro_step(pos, dirn, bh)
            dead = dead | sdead
            clen = jnp.where(dead | (s >= sgc), 0.0, clen)
            nxt = pos + nd * clen[..., None]
            return (nxt, nd, dead), (pos, nd)
        (_, _, _), (so_all, sd_all) = jax.lax.scan(
            step, (rays.o, rays.d, jnp.zeros(shape, bool)),
            jnp.arange(n_seg))
        ix = sgc[None, ..., None]
        so = jnp.take_along_axis(
            so_all, jnp.broadcast_to(ix, (1,) + shape + (3,)), axis=0)[0]
        sd = jnp.take_along_axis(
            sd_all, jnp.broadcast_to(ix, (1,) + shape + (3,)), axis=0)[0]
    else:
        so, sd = rays.o, rays.d

    # re-intersect only the winning primitive, differentiably
    n_t = scene.n_tris
    is_tri = hitm & (prim >= 0) & (prim < n_t)
    is_sph = hitm & (prim >= n_t)
    tid = jnp.clip(prim, 0, n_t - 1)
    sid = jnp.clip(prim - n_t, 0, scene.n_spheres - 1)
    neg = jnp.full(shape, -jnp.inf, h0.t.dtype)
    pos_inf = jnp.full(shape, jnp.inf, h0.t.dtype)
    okT, tT, b1, b2 = tri_intersect(
        so, sd, neg, pos_inf,
        scene.tri_v0[tid][..., None, :],
        scene.tri_v1[tid][..., None, :],
        scene.tri_v2[tid][..., None, :],
        jnp.ones(shape + (1,), bool))
    okS, tS = sphere_intersect(
        so, sd, jnp.zeros_like(neg), pos_inf,
        scene.sph_center[sid][..., None, :],
        scene.sph_radius[sid][..., None])
    t = jnp.where(is_tri, tT[..., 0], jnp.where(is_sph, tS[..., 0], 0.0))
    b1 = jnp.clip(jnp.where(is_tri, b1[..., 0], 0.0), 0.0, 1.0)
    b2 = jnp.clip(jnp.where(is_tri, b2[..., 0], 0.0), 0.0, 1.0)
    b2 = jnp.minimum(b2, 1.0 - b1)
    return build_hit(scene, so, sd, hitm, t, prim, b1, b2)


def occluded(scene: SceneData, bh: BlackHoleParams, rays: Rays,
             chunk: int = 512, seg_group: int = 9,
             early_exit: bool = True, n_seg: int = None,
             backend: str = "auto") -> jnp.ndarray:
    """Shadow query: does `bvh->intersect(ray)` report a hit?

    Note the reference quirks this inherits: in curved mode the shadow
    ray's distance-to-light max_t is ignored (chords carry their own
    ranges), and a path absorbed by the hole reports NO occlusion
    (bvh.cpp:107-108 returns false).

    Occlusion is purely discrete (a bool), so inputs are detached from
    autodiff unconditionally — this keeps the fast early-exit while-loop
    usable under `jax.grad` (visibility gradients are out of scope).
    """
    sg = lambda t: jax.tree_util.tree_map(jax.lax.stop_gradient, t)
    h = trace(sg(scene), sg(bh), sg(rays), chunk, seg_group, early_exit,
              n_seg, backend)
    return h.hit
