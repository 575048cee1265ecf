"""Orbit camera with pinhole and thin-lens ray generation.

Mirrors `pathtracer/src/camera.cpp` + the pinhole generate_ray in
`part1_code.cpp:182-187`. The camera state lives on the host (numpy floats);
`generate_rays` produces a batched jax computation.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from rrt_tpu.types import Rays
from rrt_tpu.io.collada import CameraInfo


def _radians(d):
    return d * math.pi / 180.0


def _degrees(r):
    return r * 180.0 / math.pi


@dataclasses.dataclass
class Camera:
    h_fov: float = 50.0
    v_fov: float = 35.0
    n_clip: float = 0.001
    f_clip: float = 1000.0
    pos: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3))
    target_pos: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3))
    phi: float = 0.0
    theta: float = 0.0
    r: float = 1.0
    min_r: float = 0.0
    max_r: float = 1e9
    c2w: np.ndarray = dataclasses.field(default_factory=lambda: np.eye(3))
    screen_w: int = 800
    screen_h: int = 600
    screen_dist: float = 1.0
    ar: float = 1.0
    # thin lens (application.h:61-62 defaults; keyboard-adjustable in ref)
    lens_radius: float = 0.25
    focal_distance: float = 4.7

    # ------------------------------------------------------------ configure

    def configure(self, info: CameraInfo, screen_w: int, screen_h: int):
        """Fit FoV to the screen aspect ratio (camera.cpp:22-40)."""
        self.screen_w, self.screen_h = screen_w, screen_h
        self.n_clip, self.f_clip = info.n_clip, info.f_clip
        self.h_fov, self.v_fov = info.h_fov, info.v_fov
        ar1 = math.tan(_radians(self.h_fov) / 2) / math.tan(
            _radians(self.v_fov) / 2)
        self.ar = screen_w / screen_h
        if ar1 < self.ar:    # hFov too small
            self.h_fov = 2 * _degrees(
                math.atan(math.tan(_radians(self.v_fov) / 2) * self.ar))
        elif ar1 > self.ar:  # vFov too small
            self.v_fov = 2 * _degrees(
                math.atan(math.tan(_radians(self.h_fov) / 2) / self.ar))
        self.screen_dist = screen_h / (2.0 * math.tan(_radians(self.v_fov) / 2))

    def set_screen_size(self, screen_w: int, screen_h: int):
        """Resize AFTER configure: FoV re-derived from the frozen screenDist
        (camera.cpp:68-74). The reference's headless path configures at the
        default 800×600 then resizes to `-r W H` (application.cpp:90,
        main.cpp:181), which changes the effective FoV — reproduced here."""
        self.screen_w, self.screen_h = screen_w, screen_h
        self.ar = screen_w / screen_h
        self.h_fov = 2 * _degrees(math.atan(screen_w / (2 * self.screen_dist)))
        self.v_fov = 2 * _degrees(math.atan(screen_h / (2 * self.screen_dist)))

    def place(self, target, phi, theta, r, min_r, max_r):
        """Orbit placement (camera.cpp:42-54 + compute_position:96-119)."""
        self.r = min(max(r, min_r), max_r)
        self.phi = phi + 1e-6 if math.sin(phi) == 0 else phi
        self.theta = theta
        self.target_pos = np.asarray(target, dtype=np.float64)
        self.min_r, self.max_r = min_r, max_r
        self._compute_position()

    def _compute_position(self):
        sin_phi = math.sin(self.phi)
        if sin_phi == 0:
            self.phi += 1e-6
            sin_phi = math.sin(self.phi)
        dir_to_cam = np.array([
            self.r * sin_phi * math.sin(self.theta),
            self.r * math.cos(self.phi),
            self.r * sin_phi * math.cos(self.theta),
        ])
        self.pos = self.target_pos + dir_to_cam
        up = np.array([0.0, 1.0 if sin_phi > 0 else -1.0, 0.0])
        x = np.cross(up, dir_to_cam)
        x /= np.linalg.norm(x)
        y = np.cross(dir_to_cam, x)
        y /= np.linalg.norm(y)
        self.c2w = np.stack(
            [x, y, dir_to_cam / np.linalg.norm(dir_to_cam)], axis=1)

    # ---------------------------------------------------------- ray gen

    def generate_rays(self, xy, dtype=jnp.float32) -> Rays:
        """Pinhole rays for normalized screen coords xy ∈ [0,1]² (...,2).

        Matches `Camera::generate_ray` (part1_code.cpp:182-187): the screen
        plane sits at camera z = −1 spanning ±tan(fov/2); min_t=nClip,
        max_t=fClip.
        """
        xy = jnp.asarray(xy, dtype)
        bx = math.tan(_radians(self.h_fov) / 2)
        by = math.tan(_radians(self.v_fov) / 2)
        sx = (2.0 * xy[..., 0] - 1.0) * bx
        sy = (2.0 * xy[..., 1] - 1.0) * by
        d_cam = jnp.stack([sx, sy, -jnp.ones_like(sx)], axis=-1)
        c2w = jnp.asarray(self.c2w, dtype)
        d = d_cam @ c2w.T
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        o = jnp.broadcast_to(jnp.asarray(self.pos, dtype), d.shape)
        shape = xy.shape[:-1]
        return Rays(
            o=o,
            d=d,
            min_t=jnp.full(shape, self.n_clip, dtype),
            max_t=jnp.full(shape, self.f_clip, dtype),
        )

    def generate_rays_thin_lens(self, xy, rnd_r, rnd_theta,
                                dtype=jnp.float32) -> Rays:
        """Thin-lens rays (camera.cpp:176-184): sample the lens disk at
        radius lensRadius·√rndR, focus plane at focalDistance."""
        xy = jnp.asarray(xy, dtype)
        bx = math.tan(_radians(self.h_fov) / 2)
        by = math.tan(_radians(self.v_fov) / 2)
        sx = (2.0 * xy[..., 0] - 1.0) * bx
        sy = (2.0 * xy[..., 1] - 1.0) * by
        pin = jnp.stack([sx, sy, -jnp.ones_like(sx)], axis=-1)
        lr = self.lens_radius * jnp.sqrt(jnp.asarray(rnd_r, dtype))
        p_lens = jnp.stack(
            [lr * jnp.cos(rnd_theta), lr * jnp.sin(rnd_theta),
             jnp.zeros_like(lr)], axis=-1)
        c2w = jnp.asarray(self.c2w, dtype)
        o = jnp.asarray(self.pos, dtype) + p_lens @ c2w.T
        d = (pin * self.focal_distance - p_lens) @ c2w.T
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        shape = xy.shape[:-1]
        return Rays(
            o=o,
            d=d,
            min_t=jnp.full(shape, self.n_clip, dtype),
            max_t=jnp.full(shape, self.f_clip, dtype),
        )

    # ---------------------------------------------------------- settings IO

    def dump_settings(self, path: str):
        """Text dump compatible with Camera::dump_settings
        (camera.cpp:138-153), so reference camera files round-trip."""
        with open(path, "w") as f:
            f.write(f"{self.h_fov} {self.v_fov} {self.ar} "
                    f"{self.n_clip} {self.f_clip}\n")
            f.write(" ".join(str(v) for v in self.pos) + " "
                    + " ".join(str(v) for v in self.target_pos) + " \n")
            f.write(f"{self.phi} {self.theta} {self.r} "
                    f"{self.min_r} {self.max_r}\n")
            f.write(" ".join(str(self.c2w[i, j])
                             for i in range(3) for j in range(3)) + " \n")
            f.write(f"{self.screen_w} {self.screen_h} {self.screen_dist}\n")
            f.write(f"{self.focal_distance} {self.lens_radius}\n")

    def load_settings(self, path: str):
        """Parse a reference camera settings dump (camera.cpp:155-169)."""
        toks = open(path).read().split()
        it = iter(toks)

        def f():
            return float(next(it))

        self.h_fov, self.v_fov, self.ar = f(), f(), f()
        self.n_clip, self.f_clip = f(), f()
        self.pos = np.array([f(), f(), f()])
        self.target_pos = np.array([f(), f(), f()])
        self.phi, self.theta, self.r = f(), f(), f()
        self.min_r, self.max_r = f(), f()
        self.c2w = np.array([[f() for _ in range(3)] for _ in range(3)])
        self.screen_w, self.screen_h = int(f()), int(f())
        self.screen_dist = f()
        self.focal_distance, self.lens_radius = f(), f()
