"""Benchmark: curved-spacetime global-illumination render throughput.

Config (BASELINE.md "bench-r1"): CBspheres_lambertian.dae, 256×256, 16 spp,
4 area-light samples, max depth 5, default black hole (position (0,1,0),
r=0.1, Δθ=0.1 — curvature ON, exactly the reference binary's behavior).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference CPU binary (tools/refbuild/build.sh) at the same
config on this host (2 cores, -t 8): 78.7 s → 13,318 camera rays/s
(15.88M marched rays, 202k marched rays/s). See BASELINE.md.
"""
import json
import sys
import time

import numpy as np

SCENE = "/root/reference/pathtracer/dae/sky/CBspheres_lambertian.dae"
W = H = 256
SPP = 16
REF_CAMERA_RAYS_PER_SEC = 13318.0  # reference binary, this host, same config


def main():
    import jax
    from rrt_tpu.scene.build import load_scene
    from rrt_tpu.render.renderer import Renderer
    from rrt_tpu.utils.config import RenderConfig

    cfg = RenderConfig(width=W, height=H, ns_aa=SPP, ns_area_light=4,
                       max_ray_depth=5, seed=0)
    scene, cam = load_scene(SCENE, W, H)
    r = Renderer(scene, cam, cfg)

    # warmup: compile + run the full render once (first TPU compile is
    # slow; the steady-state render is what the metric measures)
    r.render()

    t0 = time.time()
    hdr, count = r.render()
    dt = time.time() - t0

    n_rays = W * H * SPP
    rays_per_sec = n_rays / dt
    out = {
        "metric": "camera_rays_per_sec_curved_gi_256x256_16spp_d5",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s/chip",
        "vs_baseline": round(rays_per_sec / REF_CAMERA_RAYS_PER_SEC, 3),
    }
    print(json.dumps(out))
    # secondary diagnostics to stderr (driver reads stdout JSON only)
    print(f"# wall={dt:.1f}s mean_radiance={float(np.mean(hdr)):.4f} "
          f"device={jax.devices()[0].platform}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
