"""Benchmark: curved-spacetime global-illumination render throughput.

Primary config (BASELINE.md "bench-r1", unchanged for round-over-round
comparability): CBspheres_lambertian.dae, 256x256, 16 spp, 4 area-light
samples, max depth 5, default black hole (position (0,1,0), r=0.1,
dtheta=0.1 — curvature ON, exactly the reference binary's behavior).
Secondary: CBbunny.dae (28.6k tris) 128x128, 1 spp, depth 2 — the
BVH-scale traversal metric.

Prints ONE JSON line. The primary "metric/value/vs_baseline" keys keep
their r1/r2 meaning; extra keys carry the additional metrics:
  marched_rays_per_sec   — all closest-hit/occlusion traces per second
  geodesic_steps_per_sec — micro-ray march steps per second (63/trace)
  mfu_lower_bound_pct    — modeled USEFUL flops vs v5e-1 peak (see note)
  bunny_camera_rays_per_sec — CBbunny end-to-end camera throughput
  trace_backend          — 'pallas' or 'xla' (probe-selected)

Backend note: on tunneled-TPU environments where the terminal compiles
remotely, the FIRST Mosaic (Pallas) compile of a process can take
400-800s (see BASELINE.md r3 notes). A subprocess probe with a timeout
decides whether the fused Pallas kernel is usable here; otherwise the
pure-XLA chord-shortlist path runs — slower, but the bench always
completes.

Baseline: the reference CPU binary (tools/refbuild/build.sh) at the same
primary config on this host (2 cores, -t 8): 78.7 s -> 13,318 camera
rays/s. See BASELINE.md.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

SCENE = "/root/reference/pathtracer/dae/sky/CBspheres_lambertian.dae"
BUNNY = "/root/reference/pathtracer/dae/sky/CBbunny.dae"
W = H = 256
SPP = 16
REF_CAMERA_RAYS_PER_SEC = 13318.0  # reference binary, this host, same config

# v5e-1 peak: 394 TFLOP/s bf16 MXU; the tracer is f32 VPU work, whose
# per-chip peak is ~2 TFLOP/s-class — we report against the VPU number
# (this is a VPU workload by construction; quoting MXU peak would be
# meaningless).
V5E_VPU_PEAK_FLOPS = 2.0e12

PROBE = r"""
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
def k(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 2.0
f = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8,128), jnp.float32))
print(float(f(jnp.ones((8,128))).sum()))
"""


def probe_pallas(timeout_s: int = 90) -> bool:
    """Can this environment compile a Mosaic kernel in reasonable time?
    Runs in a SUBPROCESS so a pathological compile can be killed without
    wedging this process (and before this process touches the chip)."""
    if os.environ.get("RRT_BENCH_BACKEND") in ("pallas", "xla"):
        return os.environ["RRT_BENCH_BACKEND"] == "pallas"
    try:
        r = subprocess.run([sys.executable, "-c", PROBE],
                           timeout=timeout_s, capture_output=True)
        ok = r.returncode == 0
    except subprocess.TimeoutExpired:
        return False
    # the axon relay serves ONE client session at a time and stays wedged
    # briefly after one ends — touching the chip immediately after the
    # probe subprocess intermittently kills the main process's first
    # dispatch ("TPU device error", observed r4). Let it settle.
    time.sleep(20)
    return ok


def main():
    backend = "pallas" if probe_pallas() else "xla"

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("RRT_JAX_CACHE",
                                         "/root/.cache/rrt_jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from rrt_tpu.scene.build import load_scene
    from rrt_tpu.render.renderer import Renderer
    from rrt_tpu.utils.config import RenderConfig

    cfg = RenderConfig(width=W, height=H, ns_aa=SPP, ns_area_light=4,
                       max_ray_depth=5, seed=0, trace_backend=backend)
    scene, cam = load_scene(SCENE, W, H)
    r = Renderer(scene, cam, cfg)

    # warmup: compile + run the full render once (first TPU compile is
    # slow; the steady-state render is what the metric measures). A
    # relay-infrastructure fault here is fatal to this process's backend,
    # so re-exec once in a fresh process rather than dying.
    try:
        r.render()
    except Exception as e:                   # noqa: BLE001
        if os.environ.get("RRT_BENCH_RETRY"):
            raise
        print(f"# warmup failed ({e}); re-exec once after settle",
              file=sys.stderr)
        time.sleep(30)
        os.environ["RRT_BENCH_RETRY"] = "1"
        os.execv(sys.executable, [sys.executable] + sys.argv)

    t0 = time.time()
    hdr, count = r.render()
    dt = time.time() - t0

    n_rays = W * H * SPP
    rays_per_sec = n_rays / dt
    st = r.stats(dt)
    marched_per_sec = st.total_rays / dt
    geo_steps_per_sec = st.total_rays * st.geodesic_segments_max / dt
    # modeled USEFUL flop lower bound: geodesic march (58 flop/step) +
    # one Moller-Trumbore test per trace per winning primitive (40) +
    # shading estimate (~200/camera ray). Traversal overtesting is
    # deliberately NOT counted as useful work.
    useful_flops = (st.total_rays * st.geodesic_segments_max * 58
                    + st.total_rays * 40 + st.camera_rays * 200)
    mfu = 100.0 * useful_flops / dt / V5E_VPU_PEAK_FLOPS

    # secondary: bunny-scale traversal, small frame. Never let this stage
    # cost the primary metric — any failure degrades to bunny=None.
    bunny_rps = None
    bdt = 0.0
    try:
        bcfg = RenderConfig(width=128, height=128, ns_aa=1, ns_area_light=1,
                            max_ray_depth=2, seed=0, trace_backend=backend)
        bscene, bcam = load_scene(BUNNY, 128, 128)
        br = Renderer(bscene, bcam, bcfg)
        br.render()                      # compile
        t0 = time.time()
        br.render()
        bdt = time.time() - t0
        bunny_rps = round(128 * 128 / bdt, 1)
    except Exception as e:               # noqa: BLE001 — report, don't die
        print(f"# bunny stage failed: {e}", file=sys.stderr)

    out = {
        "metric": "camera_rays_per_sec_curved_gi_256x256_16spp_d5",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s/chip",
        "vs_baseline": round(rays_per_sec / REF_CAMERA_RAYS_PER_SEC, 3),
        "marched_rays_per_sec": round(marched_per_sec, 1),
        "geodesic_steps_per_sec": round(geo_steps_per_sec, 1),
        "mfu_lower_bound_pct": round(mfu, 3),
        "bunny_camera_rays_per_sec": bunny_rps,
        "trace_backend": backend,
    }
    print(json.dumps(out))
    # secondary diagnostics to stderr (driver reads stdout JSON only)
    print(f"# wall={dt:.1f}s bunny_wall={bdt:.1f}s "
          f"mean_radiance={float(np.mean(hdr)):.4f} "
          f"device={jax.devices()[0].platform} "
          f"phases[{r.timer.report()}]", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
