"""Scaling harness: lane-sharded render throughput vs device/process count.

Referenced by tests/mp_worker.py. Two modes:

  default (CPU): for each (processes, local-devices) config, spawn that
    many REAL OS processes federated by jax.distributed over a localhost
    coordinator (the code path a multi-host TPU pod takes over DCN), each
    with `--devices` virtual CPU devices; every process renders its lane
    shard of a fixed WHOLE-frame forward pass (weak-per-device scaling is
    meaningless on a 2-core host, so the table reports aggregate
    lanes/sec and per-config efficiency vs the 1x1 run — on shared cores
    this measures SPMD/federation OVERHEAD, not hardware speedup; the
    >=0.8 scaling target needs real chips).

  --tpu: single-chip overhead check — the same jitted forward with and
    without the NamedSharding constraint on a 1-device mesh (sharded and
    unsharded must cost the same; a gap means the sharding layer itself
    burns time).

Usage:
  python tools/scaling_bench.py [--size 64] [--configs 1x1,1x2,1x4,2x2,1x8]
  PYTHONPATH=. python tools/scaling_bench.py --tpu [--size 128]
"""
from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_config(nproc: int, ndev: int, size: int, tmpdir: str):
    """Spawn nproc federated processes x ndev local devices; return
    (total_lanes, max_worker_seconds)."""
    port = _free_port()
    env = dict(os.environ)
    env.update(
        PYTHONPATH=REPO,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={ndev}",
    )
    outs = [os.path.join(tmpdir, f"sb_{nproc}x{ndev}_{i}.npz")
            for i in range(nproc)]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(nproc), str(port),
             outs[i], str(size)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(nproc)
    ]
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=1200)
        if p.returncode != 0:
            raise RuntimeError(
                f"worker {i} of {nproc}x{ndev} failed:\n"
                + out.decode(errors="replace")[-2000:])
    dts = [float(np.load(o)["dt"]) for o in outs]
    return size * size, max(dts)


def main_cpu(args):
    import tempfile
    configs = []
    for c in args.configs.split(","):
        p, d = c.strip().split("x")
        configs.append((int(p), int(d)))
    rows = []
    with tempfile.TemporaryDirectory() as td:
        for nproc, ndev in configs:
            lanes, dt = run_config(nproc, ndev, args.size, td)
            rows.append((nproc, ndev, lanes, dt, lanes / dt))
            print(f"{nproc} proc x {ndev} dev: {lanes} lanes in {dt:.3f}s "
                  f"-> {lanes/dt:,.0f} lanes/s")
    base = rows[0][4]
    print("\n| procs | devices | lanes/s | vs 1x1 |")
    print("|---|---|---|---|")
    for nproc, ndev, lanes, dt, thr in rows:
        print(f"| {nproc} | {nproc*ndev} | {thr:,.0f} | {thr/base:.2f}x |")
    print("\n(2-core host: virtual devices share cores — this measures "
          "SPMD+federation overhead, not hardware scaling)")


def main_tpu(args):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from rrt_tpu.scene.build import load_scene
    from rrt_tpu.render.integrator import est_radiance
    from rrt_tpu.render.renderer import make_black_hole
    from rrt_tpu.utils.config import RenderConfig

    W = H = args.size
    cfg = RenderConfig(width=W, height=H, ns_aa=1, ns_area_light=1,
                       max_ray_depth=2, seed=0)
    scene, cam = load_scene(
        "/root/reference/pathtracer/dae/sky/CBspheres_lambertian.dae", W, H)
    bh = make_black_hole(cfg)
    ys, xs = np.meshgrid((np.arange(H) + 0.5) / H, (np.arange(W) + 0.5) / W,
                         indexing="ij")
    xy = np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float32)
    rays = cam.generate_rays(jnp.asarray(xy))
    key = jax.random.key(0)
    mesh = Mesh(np.array(jax.devices()), ("lanes",))
    sh = NamedSharding(mesh, P("lanes"))

    def fwd_plain(s, b, r):
        return est_radiance(s, b, r, cfg, key)

    def fwd_sharded(s, b, r):
        r = jax.lax.with_sharding_constraint(r, sh)
        return est_radiance(s, b, r, cfg, key)

    for name, f in (("unsharded", fwd_plain), ("sharded", fwd_sharded)):
        g = jax.jit(f)
        out = g(scene, bh, rays)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(3):
            out = g(scene, bh, rays)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / 3
        print(f"{name}: {W*H} lanes in {dt*1e3:.1f} ms "
              f"({W*H/dt:,.0f} lanes/s) on {len(jax.devices())} device(s)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--configs", default="1x1,1x2,1x4,2x2,1x8")
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()
    if args.tpu:
        main_tpu(args)
    else:
        main_cpu(args)
