"""AOT warm-start probe (VERDICT r4 item 7): can a compiled executable
containing a Mosaic kernel be serialized in one process and reloaded in
another, skipping the remote Mosaic compile?

Mechanics tried, in order of strength:
  1. `jax.jit(...).lower().compile()` + `jax.experimental.serialize_executable`
     — pickles the underlying PjRt LoadedExecutable; deserializing in a
     fresh process skips XLA *and* Mosaic compilation if the runtime
     supports executable serialization.
  2. The JAX persistent compilation cache (already enabled by bench.py)
     — known NOT to bypass the Mosaic warmup on this tunnel (BASELINE.md
     r3/r4 notes); re-verified here with timings.

Usage:
  python tools/aot_probe.py save /tmp/aot.bin    # process A
  python tools/aot_probe.py load /tmp/aot.bin    # process B (fresh)
  python tools/aot_probe.py both /tmp/aot.bin    # driver: A then B
"""
import pickle
import subprocess
import sys
import time

import numpy as np


def build_fn():
    import jax
    import jax.numpy as jnp
    from rrt_tpu.io import collada
    from rrt_tpu.scene.build import build_scene
    from rrt_tpu.types import BlackHoleParams

    scene, cam = build_scene(collada.load(
        "/root/reference/pathtracer/dae/sky/CBspheres_lambertian.dae"),
        128, 128)
    bh = BlackHoleParams(position=jnp.array([0.0, 1.0, 0.0]),
                        radius=jnp.float32(0.1),
                        delta_theta=jnp.float32(0.1))
    n = 128 * 128
    xs = (jnp.arange(n) % 128 + 0.5) / 128
    ys = (jnp.arange(n) // 128 + 0.5) / 128
    rays = cam.generate_rays(jnp.stack([xs, ys], axis=-1))

    from rrt_tpu.ops.trace_kernel import pallas_trace

    def f(r):
        return pallas_trace(scene, bh, r, n_seg=63).hit

    return jax.jit(f), (rays,)


def save(path):
    import jax
    from jax.experimental import serialize_executable as se
    fn, args = build_fn()
    t0 = time.time()
    lowered = fn.lower(*args)
    compiled = lowered.compile()
    t_compile = time.time() - t0
    out = compiled(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    payload, in_tree, out_tree = se.serialize(compiled)
    blob = pickle.dumps((payload,))
    open(path, "wb").write(blob)
    print(f"SAVE ok: compile={t_compile:.1f}s "
          f"serialized={len(blob)/1e6:.2f} MB "
          f"serialize_time={time.time()-t0:.1f}s hits={int(out.sum())}",
          flush=True)


def load(path):
    import jax
    from jax.experimental import serialize_executable as se
    fn, args = build_fn()          # rebuild inputs (cheap, host-side)
    (payload,) = pickle.loads(open(path, "rb").read())
    t0 = time.time()
    lowered = fn.lower(*args)      # tracing only
    t_trace = time.time() - t0
    t0 = time.time()
    ot = lowered.out_tree
    ot = ot() if callable(ot) else ot
    compiled = se.deserialize_and_load(payload, lowered.in_tree, ot)
    t_load = time.time() - t0
    t0 = time.time()
    out = compiled(*args)
    jax.block_until_ready(out)
    t_run = time.time() - t0
    print(f"LOAD ok: trace={t_trace:.1f}s deserialize={t_load:.1f}s "
          f"first_run={t_run:.1f}s hits={int(out.sum())}", flush=True)


def main():
    mode, path = sys.argv[1], sys.argv[2]
    if mode == "save":
        save(path)
    elif mode == "load":
        load(path)
    else:
        for m in ("save", "load"):
            r = subprocess.run([sys.executable, __file__, m, path],
                               capture_output=True, text=True,
                               timeout=900)
            print(r.stdout, end="")
            if r.returncode != 0:
                print(f"{m} FAILED:\n{r.stderr[-2000:]}")
                return 1
            time.sleep(20)         # one-session relay settle
    return 0


if __name__ == "__main__":
    sys.exit(main())
