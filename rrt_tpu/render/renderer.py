"""Render driver: the TPU replacement for the reference's tile scheduler.

The reference fills a mutex-guarded WorkQueue with 32×32 tiles and spawns
worker std::threads (`pathtracer.cpp:224-282`, `work_queue.h`). Here a
render is a host loop over *sample passes*: each pass traces one jittered
sample for every pixel as a single jitted megabatch (optionally sharded
over a device mesh), accumulating into device buffers. Adaptive sampling
(`part1_code.cpp:147-159`) runs the same passes with per-pixel stop masks:
converged pixels stop accumulating (their sample count freezes), keeping
every pass the same static shape.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rrt_tpu.render import film
from rrt_tpu.render.integrator import est_radiance
from rrt_tpu.scene.camera import Camera
from rrt_tpu.types import BlackHoleParams, Rays, SceneData
from rrt_tpu.utils.config import RenderConfig


def make_black_hole(cfg: RenderConfig, dtype=jnp.float32) -> Optional[BlackHoleParams]:
    b = cfg.black_hole
    if not b.enabled:
        return None
    return BlackHoleParams(
        position=jnp.asarray(b.position, dtype),
        radius=jnp.asarray(b.radius, dtype),
        delta_theta=jnp.asarray(b.delta_theta, dtype),
        enabled=True,
    )


class Renderer:
    """Progressive whole-frame renderer with adaptive sampling."""

    def __init__(self, scene: SceneData, camera: Camera, cfg: RenderConfig,
                 sharding=None):
        self.scene = scene
        self.camera = camera
        self.cfg = cfg
        self.bh = make_black_hole(cfg)
        self.sharding = sharding
        self._pass_fns = {}  # samples-per-pass k -> jitted pass fn

    def _pass_fn(self, k: int):
        fn = self._pass_fns.get(k)
        if fn is None:
            fn = jax.jit(functools.partial(self._sample_pass, k=k),
                         donate_argnums=(0,))
            self._pass_fns[k] = fn
        return fn

    # -------------------------------------------------------- pass kernel

    def _rays_for(self, xy_jitter, key, k: int = 1):
        cfg, cam = self.cfg, self.camera
        h, w = cfg.height, cfg.width
        ys, xs = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.float32),
            jnp.arange(w, dtype=jnp.float32), indexing="ij")
        px = jnp.stack([xs, ys], axis=-1).reshape(-1, 2)
        if k > 1:
            px = jnp.tile(px, (k, 1))
        m = px.shape[0]
        if xy_jitter.shape[0] != m:          # centered single-sample case
            xy_jitter = jnp.broadcast_to(xy_jitter[:1], (m, 2))
        xy = (px + xy_jitter) / jnp.array([w, h], jnp.float32)
        if cfg.thin_lens:
            k1, k2 = jax.random.split(key)
            rnd_r = jax.random.uniform(k1, (m,))
            rnd_th = jax.random.uniform(k2, (m,)) * 2.0 * jnp.pi
            return cam.generate_rays_thin_lens(xy, rnd_r, rnd_th)
        return cam.generate_rays(xy)

    def _sample_pass(self, acc, key, sample_idx, k: int):
        """Trace `k` jittered samples for every pixel in ONE megabatch
        (k·N lanes), masked-accumulate.

        acc = (radiance_sum (N,3), s1, s2, count, done) with N = H·W.
        `sample_idx` is the first sample index of the pass; when adaptive,
        `k` divides samples_per_batch so convergence tests still happen
        exactly at batch boundaries (part1_code.cpp:147-159).
        """
        cfg = self.cfg
        rad_sum, s1, s2, count, done = acc
        k_jit, k_lens, k_rad = jax.random.split(key, 3)
        n = cfg.width * cfg.height
        if cfg.ns_aa == 1:
            jitter = jnp.full((n, 2), 0.5, jnp.float32)
        else:
            jitter = jax.random.uniform(k_jit, (k * n, 2), jnp.float32)
        rays = self._rays_for(jitter, k_lens, k)
        if self.sharding is not None:
            rays = jax.lax.with_sharding_constraint(rays, self.sharding)
        L = est_radiance(self.scene, self.bh, rays, cfg, k_rad)
        L = jnp.nan_to_num(L, nan=0.0, posinf=0.0, neginf=0.0)
        L = L.reshape(k, n, 3)

        active = ~done
        rad_sum = rad_sum + jnp.where(active[:, None], L.sum(0), 0.0)
        illum = (0.2126 * L[..., 0] + 0.7152 * L[..., 1]
                 + 0.0722 * L[..., 2])                       # (k, n)
        s1 = s1 + jnp.where(active, illum.sum(0), 0.0)
        s2 = s2 + jnp.where(active, (illum * illum).sum(0), 0.0)
        count = count + k * active.astype(jnp.int32)

        if cfg.adaptive:
            # convergence test at batch boundaries (part1_code.cpp:147-159):
            # i+1 = count, avg = s1/(i+1), sd² = (s2 − avg·s1)/i
            at_batch = (sample_idx + k) % cfg.samples_per_batch == 0
            i1 = count.astype(jnp.float32)
            avg = s1 / jnp.maximum(i1, 1.0)
            var = (s2 - avg * s1) / jnp.maximum(i1 - 1.0, 1.0)
            sd = jnp.sqrt(jnp.maximum(var, 0.0))
            conv = 1.96 * sd / jnp.sqrt(jnp.maximum(i1, 1.0)) \
                <= cfg.max_tolerance * avg
            done = done | (at_batch & active & conv)

        return (rad_sum, s1, s2, count, done)

    # -------------------------------------------------------- driver

    def render(self, progress=None) -> Tuple[np.ndarray, np.ndarray]:
        """Full-frame render. Returns (hdr (H,W,3), sample_count (H,W))."""
        cfg = self.cfg
        n = cfg.width * cfg.height
        acc = (
            jnp.zeros((n, 3), jnp.float32),
            jnp.zeros(n, jnp.float32),
            jnp.zeros(n, jnp.float32),
            jnp.zeros(n, jnp.int32),
            jnp.zeros(n, bool),
        )
        base = jax.random.key(cfg.seed)
        # samples per pass: fill the chip with up to max_pass_lanes lanes;
        # under adaptive sampling k must divide samples_per_batch so the
        # 1.96σ test lands exactly on batch boundaries
        k = max(1, min(cfg.ns_aa, cfg.max_pass_lanes // max(n, 1)))
        if cfg.adaptive:
            while cfg.samples_per_batch % k != 0:
                k -= 1
        s = 0
        while s < cfg.ns_aa:
            ks = min(k, cfg.ns_aa - s)
            acc = self._pass_fn(ks)(acc, jax.random.fold_in(base, s),
                                    jnp.asarray(s, jnp.int32))
            s += ks
            if cfg.adaptive and s % cfg.samples_per_batch == 0:
                if bool(jnp.all(acc[4])):
                    break
            if progress is not None:
                progress(s, cfg.ns_aa)
        rad_sum, _, _, count, _ = acc
        count = np.asarray(count).reshape(cfg.height, cfg.width)
        hdr = (np.asarray(rad_sum).reshape(cfg.height, cfg.width, 3)
               / np.maximum(count[..., None], 1))
        self.last_sample_count = count
        return hdr, count

    def stats(self, wall_seconds: float = 0.0):
        """Trace-count accounting (reference total_rays analog,
        pathtracer.cpp:637-638)."""
        from rrt_tpu.render.lights import is_delta_light
        from rrt_tpu.utils.stats import expected_stats
        nls = sum(
            1 if is_delta_light(self.scene.lights, i) else
            self.cfg.ns_area_light
            for i in range(len(self.scene.lights.kind_host)))
        done = getattr(self, "last_sample_count", None)
        samples = int(done.mean()) if done is not None else self.cfg.ns_aa
        st = expected_stats(self.cfg, nls, samples)
        st.wall_seconds = wall_seconds
        return st

    def render_cell(self, x, y, dx, dy) -> np.ndarray:
        """Re-render a sub-rectangle (`-p x y dx dy`, pathtracer.cpp:583-609):
        renders the full frame pass but returns only the cell."""
        hdr, _ = self.render()
        return hdr[y:y + dy, x:x + dx]

    def render_to_file(self, path: str, cell=None, progress=None):
        """Headless render → PNG (+ the reference's unconditional
        sampling-rate heatmap companion, pathtracer.cpp:684)."""
        hdr, count = self.render(progress=progress)
        if cell is not None:
            x, y, dx, dy = cell
            full = np.zeros_like(hdr)
            full[y:y + dy, x:x + dx] = hdr[y:y + dy, x:x + dx]
            hdr = full
        film.save_image(path, hdr)
        base = path[:-4] if path.endswith(".png") else path
        film.save_sampling_rate_image(base + "_rate.png", count, self.cfg.ns_aa)
        return hdr
