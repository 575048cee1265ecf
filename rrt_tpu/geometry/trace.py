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

from rrt_tpu.geometry.intersect import build_hit, closest_hit_brute
from rrt_tpu.physics import schwarzschild as ss
from rrt_tpu.types import BlackHoleParams, Hit, Rays, SceneData


def trace_flat(scene: SceneData, rays: Rays, chunk: int = 512) -> Hit:
    """Straight-ray closest hit honoring min_t/max_t (new capability:
    the reference cannot disable curvature)."""
    hit, t, pid, b1, b2 = closest_hit_brute(
        scene, rays.o, rays.d, rays.min_t, rays.max_t, chunk)
    return build_hit(scene, rays.o, rays.d, hit, t, pid, b1, b2)


def trace_curved(
    scene: SceneData,
    bh: BlackHoleParams,
    rays: Rays,
    seg_group: int = 9,
    chunk: int = 512,
    early_exit: bool = True,
    n_seg: int = None,
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
        group=jnp.array(0, jnp.int32),
    )

    def cond(st):
        return (st["group"] < n_groups) & ~jnp.all(st["done"] | st["dead"])

    def body(st):
        g = seg_group
        (pos, dirn, dead), (so, sd, slen, sabs, sdead) = jax.lax.scan(
            seg_scan, (st["pos"], st["dirn"], st["dead"]), None, length=g)
        # fold segments into the batch axis for one dense intersection pass
        hit, t, pid, b1, b2 = closest_hit_brute(
            scene, so, sd,
            jnp.zeros_like(slen), slen, chunk)
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
    return hit


def _pallas_eligible(scene: SceneData) -> bool:
    from rrt_tpu.ops.trace_kernel import pallas_supported
    return jax.default_backend() == "tpu" and pallas_supported(scene)


def trace(scene: SceneData, bh: BlackHoleParams, rays: Rays,
          chunk: int = 512, seg_group: int = 9,
          early_exit: bool = True, n_seg: int = None,
          backend: str = "auto") -> Hit:
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
                            n_seg)
    return trace_flat(scene, rays, chunk)


def occluded(scene: SceneData, bh: BlackHoleParams, rays: Rays,
             chunk: int = 512, seg_group: int = 9,
             early_exit: bool = True, n_seg: int = None,
             backend: str = "auto") -> jnp.ndarray:
    """Shadow query: does `bvh->intersect(ray)` report a hit?

    Note the reference quirks this inherits: in curved mode the shadow
    ray's distance-to-light max_t is ignored (chords carry their own
    ranges), and a path absorbed by the hole reports NO occlusion
    (bvh.cpp:107-108 returns false).
    """
    h = trace(scene, bh, rays, chunk, seg_group, early_exit, n_seg, backend)
    return h.hit
