"""Microbenchmark for the fused trace kernel on a bunny-scale scene.

Times curved closest-hit traces for (a) coherent camera rays and
(b) incoherent (shuffled-direction) rays, on whatever backend JAX has.
Usage: python tools/kbench.py [n_rays_log2]
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
    cs = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n = 1 << n_log2
    from rrt_tpu.io import collada
    from rrt_tpu.scene.build import build_scene
    scene, cam = build_scene(collada.load(SCENE), 512, 512, pad_tris_to=cs)
    print(f"tris={scene.n_tris} clusters={scene.cluster_lo.shape[0]}")
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
        f = jax.jit(lambda rr: trace(scene, bh, rr, backend="pallas").hit)
        dt, out = timeit(f, r)
        hits = int(jnp.sum(out))
        print(f"{name}: {n} rays in {dt*1e3:.1f} ms -> "
              f"{n/dt/1e6:.2f} M curved rays/s  (hits={hits})")


if __name__ == "__main__":
    main()
