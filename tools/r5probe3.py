"""Round-5 probe #3: zero-carry (ref) scan vs loop-carried scan, on-chip."""
import importlib
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def reload_kernel():
    import rrt_tpu.ops.trace_kernel as tk
    importlib.reload(tk)
    jax.clear_caches()
    return tk


def timeit(f, *a, reps=3):
    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps, out


def main():
    n = 1 << 16
    from rrt_tpu.io import collada
    from rrt_tpu.scene.build import build_scene
    from rrt_tpu.types import BlackHoleParams, Rays

    SCENE = "/root/reference/pathtracer/dae/sky/CBbunny.dae"
    scene, cam = build_scene(collada.load(SCENE), 512, 512)
    bh = BlackHoleParams(position=jnp.array([0.0, 1.0, 0.0]),
                        radius=jnp.float32(0.1),
                        delta_theta=jnp.float32(0.1))
    print(f"device={jax.devices()[0].platform} tris={scene.n_tris}",
          flush=True)

    w = h = int(np.sqrt(n))
    xs = (jnp.arange(w * h) % w + 0.5) / w
    ys = (jnp.arange(w * h) // w + 0.5) / h
    rays = cam.generate_rays(jnp.stack([xs, ys], axis=-1))
    key = jax.random.PRNGKey(0)
    perm = jax.random.permutation(key, w * h)
    rays_inc = Rays(o=rays.o, d=rays.d[perm], min_t=rays.min_t,
                    max_t=rays.max_t)

    ref = {}

    def run(tag, tk, r, refkey=None):
        f = jax.jit(lambda rr: tk.pallas_trace(
            scene, bh, rr, n_seg=63, return_stats=True))
        t0 = time.time()
        out = f(r)
        jax.block_until_ready(out)
        tc = time.time() - t0
        dt, out = timeit(f, r)
        hh, st = out
        ni, nc = float(st[0]), float(st[1])
        tsum = float(jnp.sum(jnp.where(hh.hit, hh.t, 0.0)))
        match = ""
        if refkey is not None:
            if refkey in ref:
                match = " bit==" + str(abs(ref[refkey] - tsum) < 1e-3)
            else:
                ref[refkey] = tsum
        print(f"{tag}: {dt*1e3:.1f} ms ({n/dt/1e6:.2f} M rays/s) "
              f"prim/ray={ni/n:.0f} cull/ray={nc/n:.0f} "
              f"hits={int(jnp.sum(hh.hit))}{match} compile={tc:.1f}s",
              flush=True)
        return dt

    results = {}
    cfgs = [
        ("carry", {"RRT_SCAN": "carry"}),
        ("refscan", {"RRT_SCAN": "ref"}),
        ("refscan_cs64_pt4096", {"RRT_SCAN": "ref", "RRT_CSK": "64",
                                 "RRT_PART_TRIS": "4096"}),
        ("refscan_cs16", {"RRT_SCAN": "ref", "RRT_CSK": "16"}),
        ("refscan_noexec", {"RRT_SCAN": "ref", "RRT_ABLATE": "noexec"}),
    ]
    for tag, env in cfgs:
        for k, v in env.items():
            os.environ[k] = v
        try:
            tk = reload_kernel()
            rk = None if "noexec" in tag else ("coh", "inc")
            results[f"coh_{tag}"] = run(
                f"coherent {tag}", tk, rays, rk and rk[0])
            results[f"inc_{tag}"] = run(
                f"incoherent {tag}", tk, rays_inc, rk and rk[1])
        except Exception as e:  # noqa: BLE001
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:180]}",
                  flush=True)
        for k in env:
            del os.environ[k]

    print(json.dumps({k: round(v * 1e3, 2) for k, v in results.items()}),
          flush=True)


if __name__ == "__main__":
    main()
