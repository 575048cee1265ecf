"""Round-5 kernel cost-attribution probe (one process, one warmup).

Measures, on CBbunny config-2-class rays, where the Pallas trace kernel's
time actually goes:
  full      — shipped v3 kernel
  noexec    — culling/gating only (triangle execution skipped)
  nophase2  — geodesic march only (traversal skipped)
so: tri-exec = full - noexec, gating = noexec - nophase2, march+fixed =
nophase2. Also sweeps RRT_PART_TRIS (grid-step overhead) and RRT_CSK.

Run on the TPU via the axon tunnel from /root/repo (one relay session!).
"""
import importlib
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def reload_kernel():
    """RRT_ABLATE is read at module import; reload to apply env changes."""
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
    n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n = 1 << n_log2
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

    def run(tag, tk, r):
        f = jax.jit(lambda rr: tk.pallas_trace(
            scene, bh, rr, n_seg=63, return_stats=True))
        t0 = time.time()
        out = f(r)
        jax.block_until_ready(out)
        tc = time.time() - t0
        dt, out = timeit(f, r)
        h, st = out
        ni, nc = float(st[0]), float(st[1])
        print(f"{tag}: {dt*1e3:.1f} ms ({n/dt/1e6:.2f} M rays/s) "
              f"prim/ray={ni/n:.0f} bbox/ray={nc/n:.0f} "
              f"hits={int(jnp.sum(h.hit))} compile={tc:.1f}s", flush=True)
        return dt

    results = {}
    # --- ablation split at shipped defaults ---
    for ab in ("", "noexec", "nophase2"):
        os.environ["RRT_ABLATE"] = ab
        tk = reload_kernel()
        tag = ab or "full"
        results[f"coh_{tag}"] = run(f"coherent {tag}", tk, rays)
        results[f"inc_{tag}"] = run(f"incoherent {tag}", tk, rays_inc)
    os.environ["RRT_ABLATE"] = ""

    # --- part-size sweep (grid-step overhead) ---
    for pt in (4096, 8192):
        os.environ["RRT_PART_TRIS"] = str(pt)
        try:
            tk = reload_kernel()
            results[f"coh_pt{pt}"] = run(f"coherent part={pt}", tk, rays)
            results[f"inc_pt{pt}"] = run(f"incoherent part={pt}", tk,
                                         rays_inc)
        except Exception as e:  # noqa: BLE001 — SMEM limits expected
            print(f"part={pt}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
        del os.environ["RRT_PART_TRIS"]

    # --- cluster-size cross-check on this batch ---
    os.environ["RRT_CSK"] = "16"
    tk = reload_kernel()
    results["coh_cs16"] = run("coherent cs16", tk, rays)
    results["inc_cs16"] = run("incoherent cs16", tk, rays_inc)
    del os.environ["RRT_CSK"]

    tri = results.get("coh_full", 0) - results.get("coh_noexec", 0)
    gate = results.get("coh_noexec", 0) - results.get("coh_nophase2", 0)
    print(json.dumps({k: round(v * 1e3, 2) for k, v in results.items()}))
    print(f"SPLIT coherent: tri-exec={tri*1e3:.1f}ms "
          f"gating={gate*1e3:.1f}ms "
          f"march+fixed={results.get('coh_nophase2', 0)*1e3:.1f}ms",
          flush=True)


if __name__ == "__main__":
    main()
