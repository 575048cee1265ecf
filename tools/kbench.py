"""Microbenchmark for the curved-trace kernels on a bunny-scale scene.

Times curved closest-hit traces for (a) coherent camera rays and
(b) incoherent (shuffled-direction) rays, on whatever backend JAX has.

Usage: python tools/kbench.py [n_rays_log2] [backend] [accel]
  backend: pallas | xla   (default xla: on the axon tunnel the first
           Mosaic compile of a process costs 400-800s — see BASELINE.md)
  accel:   shortlist | cluster | brute   (xla backend only)
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from rrt_tpu.scene.build import load_scene
from rrt_tpu.types import BlackHoleParams, Rays
from rrt_tpu.geometry.trace import trace

SCENE = "/root/reference/pathtracer/dae/sky/CBbunny.dae"


def timeit(f, *a, reps=3):
    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps, out


def main():
    n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    backend = sys.argv[2] if len(sys.argv) > 2 else "xla"
    accel = sys.argv[3] if len(sys.argv) > 3 else "shortlist"
    n = 1 << n_log2
    from rrt_tpu.io import collada
    from rrt_tpu.scene.build import build_scene
    scene, cam = build_scene(collada.load(SCENE), 512, 512)
    print(f"tris={scene.n_tris} clusters={scene.cluster_lo.shape[0]} "
          f"backend={backend} accel={accel}")
    bh = BlackHoleParams(position=jnp.array([0.0, 1.0, 0.0]),
                         radius=jnp.float32(0.1),
                         delta_theta=jnp.float32(0.1))

    # coherent camera rays
    w = h = int(np.sqrt(n))
    xs = (jnp.arange(w * h) % w + 0.5) / w
    ys = (jnp.arange(w * h) // w + 0.5) / h
    rays = cam.generate_rays(jnp.stack([xs, ys], axis=-1))

    # incoherent: same origins, shuffled directions
    key = jax.random.PRNGKey(0)
    perm = jax.random.permutation(key, w * h)
    rays_inc = Rays(o=rays.o, d=rays.d[perm], min_t=rays.min_t,
                    max_t=rays.max_t)

    for name, r in [("coherent", rays), ("incoherent", rays_inc)]:
        f = jax.jit(lambda rr: trace(scene, bh, rr, backend=backend,
                                     accel=accel).hit)
        t0 = time.time()
        out = f(r)
        jax.block_until_ready(out)
        tc = time.time() - t0
        dt, out = timeit(f, r)
        hits = int(jnp.sum(out))
        print(f"{name}: {n} rays in {dt*1e3:.1f} ms -> "
              f"{n/dt/1e6:.2f} M curved rays/s  (hits={hits}, "
              f"first-call {tc:.1f}s)")
        if backend == "pallas":
            # measured work counters (reference analog: avg isect
            # tests/ray, pathtracer.cpp:637-638)
            from rrt_tpu.ops.trace_kernel import pallas_trace
            _, st = jax.jit(
                lambda rr: pallas_trace(scene, bh, rr, n_seg=63,
                                        return_stats=True))(r)
            ni, nc = (float(v) for v in st)
            print(f"  measured: {ni/n:.0f} prim tests/ray, "
                  f"{nc/n:.0f} bbox tests/ray (reference: 112 tests/ray)")


if __name__ == "__main__":
    main()
