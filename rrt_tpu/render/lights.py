"""Light sampling (sample_L) for next-event estimation.

Mirrors `pathtracer/src/static_scene/light.cpp` per type; the env light
delegates to `rrt_tpu.scene.envmap`. Each call samples ONE light row for a
whole lane batch; the integrator stacks per-light sample batches, exactly
replicating the reference's per-light loop (part1_code.cpp:41-55).
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from rrt_tpu.scene import envmap as envlib
from rrt_tpu.types import (
    EnvMap, LIGHT_AREA, LIGHT_DIRECTIONAL, LIGHT_ENV, LIGHT_HEMISPHERE,
    LIGHT_POINT, LIGHT_SPOT, LightTable,
)

PI = math.pi
INF = jnp.inf

# InfiniteHemisphereLight's sampleToWorld (light.cpp:27-32): maps the
# z-up sampler frame to the scene's y-up hemisphere.
_HEMI_TO_WORLD = jnp.array([[1.0, 0.0, 0.0],
                            [0.0, 0.0, -1.0],
                            [0.0, 1.0, 0.0]])


class LightSample(NamedTuple):
    radiance: jnp.ndarray  # (..., 3)
    wi: jnp.ndarray        # (..., 3) world direction toward the light
    dist: jnp.ndarray      # (...,) distance to light
    pdf: jnp.ndarray       # (...,)


def sample_light(
    lights: LightTable,
    light_idx: int,
    p: jnp.ndarray,
    key,
    env: Optional[EnvMap] = None,
    env_importance: bool = True,
) -> LightSample:
    """sample_L for static light row `light_idx` at shading points p (...,3).

    `light_idx` is a python int (the light loop is unrolled at trace time,
    like the reference's `for (SceneLight *sl : scene->lights)`).
    """
    kind = lights.kind_host[light_idx]
    shape = p.shape[:-1]
    dt = p.dtype

    if kind == LIGHT_DIRECTIONAL:
        wi = jnp.broadcast_to(lights.direction[light_idx], p.shape)
        return LightSample(
            radiance=jnp.broadcast_to(lights.radiance[light_idx], p.shape),
            wi=wi,
            dist=jnp.full(shape, INF, dt),
            pdf=jnp.ones(shape, dt),
        )

    if kind == LIGHT_HEMISPHERE:
        xi = jax.random.uniform(key, shape + (2,), dt)
        # UniformHemisphereSampler3D (sampler.cpp:15-29)
        theta = jnp.arccos(xi[..., 0])
        phi = 2.0 * PI * xi[..., 1]
        d = jnp.stack([jnp.sin(theta) * jnp.cos(phi),
                       jnp.sin(theta) * jnp.sin(phi),
                       jnp.cos(theta)], axis=-1)
        wi = d @ _HEMI_TO_WORLD.astype(dt).T
        return LightSample(
            radiance=jnp.broadcast_to(lights.radiance[light_idx], p.shape),
            wi=wi,
            dist=jnp.full(shape, INF, dt),
            pdf=jnp.full(shape, 1.0 / (2.0 * PI), dt),
        )

    if kind == LIGHT_POINT:
        d = lights.position[light_idx] - p
        sq = jnp.sum(d * d, axis=-1)
        # guarded norm: a shading point exactly at the light otherwise
        # produces inf local jacobians that poison reverse-mode AD even
        # under zero cotangents
        pos_ok = sq > 0
        dist = jnp.sqrt(jnp.where(pos_ok, sq, 1.0))
        return LightSample(
            radiance=jnp.broadcast_to(lights.radiance[light_idx], p.shape),
            wi=d / dist[..., None],
            dist=jnp.where(pos_ok, dist, 0.0),
            pdf=jnp.ones(shape, dt),
        )

    if kind == LIGHT_SPOT:
        # stub in the reference: zero radiance (light.cpp:61-69)
        return LightSample(
            radiance=jnp.zeros(p.shape, dt),
            wi=jnp.broadcast_to(
                jnp.array([0.0, 1.0, 0.0], dt), p.shape),
            dist=jnp.full(shape, INF, dt),
            pdf=jnp.ones(shape, dt),
        )

    if kind == LIGHT_AREA:
        # AreaLight::sample_L (light.cpp:80-92)
        xi = jax.random.uniform(key, shape + (2,), dt) - 0.5
        pos = (lights.position[light_idx]
               + xi[..., 0:1] * lights.dim_x[light_idx]
               + xi[..., 1:2] * lights.dim_y[light_idx])
        d = pos - p
        sq = jnp.sum(d * d, axis=-1)
        # guarded divisions (see LIGHT_POINT note): dist → 0 and cosθ' → 0
        # both yield inf forward values whose reverse-mode jacobians are
        # NaN · 0; the reference's C++ just produces inf pdf → zero
        # contribution, reproduced here with a large finite pdf
        pos_ok = sq > 0
        dist = jnp.sqrt(jnp.where(pos_ok, sq, 1.0))
        wi = d / dist[..., None]
        cos_t = jnp.sum(wi * lights.direction[light_idx], axis=-1)
        den = lights.area[light_idx] * jnp.abs(cos_t)
        den_ok = pos_ok & (den > 0)
        pdf = jnp.where(den_ok, sq / jnp.where(den_ok, den, 1.0), 1e30)
        rad = jnp.where(
            (den_ok & (cos_t < 0))[..., None],
            jnp.broadcast_to(lights.radiance[light_idx], p.shape), 0.0)
        return LightSample(radiance=rad, wi=wi,
                           dist=jnp.where(pos_ok, dist, 0.0), pdf=pdf)

    if kind == LIGHT_ENV:
        assert env is not None, "LIGHT_ENV row without an EnvMap"
        if env_importance:
            rad, wi, dist, pdf = envlib.sample_L(env, key, shape, dt)
        else:
            # ENV_HEMI==1 (environment_light.cpp:139-142): uniform-sphere
            # directions, pdf 1/4π, radiance looked up along wi
            k1, k2 = jax.random.split(key)
            z = 2.0 * jax.random.uniform(k1, shape, dt) - 1.0
            phi = 2.0 * PI * jax.random.uniform(k2, shape, dt)
            s = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
            wi = jnp.stack([s * jnp.cos(phi), s * jnp.sin(phi), z], axis=-1)
            rad = envlib.sample_dir(env, wi)
            dist = jnp.full(shape, INF, dt)
            pdf = jnp.full(shape, 0.25 / PI, dt)
        return LightSample(radiance=rad, wi=wi, dist=dist, pdf=pdf)

    raise ValueError(f"unknown light kind {kind}")


def is_delta_light(lights: LightTable, light_idx: int) -> bool:
    k = lights.kind_host[light_idx]
    return k in (LIGHT_DIRECTIONAL, LIGHT_POINT, LIGHT_SPOT)
