"""SceneInfo → flat SceneData + configured Camera.

Replaces the reference's Application::load → DynamicScene → get_static_scene
chain (`application.cpp:219-295`, `dynamic_scene/scene.cpp:133-145`): node
transforms are baked into world-space triangle/sphere arrays, materials
become BSDFTable rows, light wrappers become LightTable rows, and the orbit
camera is placed from the scene bbox exactly as the reference does.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from rrt_tpu.io import collada
from rrt_tpu.scene import mesh as meshlib
from rrt_tpu.scene.camera import Camera
from rrt_tpu.types import (
    BSDF_DIFFUSE, BSDF_EMISSION, BSDF_GLASS, BSDF_MICROFACET, BSDF_MIRROR,
    BSDF_REFRACTION, BSDFTable, EnvMap, LIGHT_AREA, LIGHT_DIRECTIONAL,
    LIGHT_ENV, LIGHT_HEMISPHERE, LIGHT_POINT, LIGHT_SPOT, LightTable,
    SceneData,
)

_BSDF_KIND = {
    "diffuse": BSDF_DIFFUSE,
    "mirror": BSDF_MIRROR,
    "microfacet": BSDF_MICROFACET,
    "refraction": BSDF_REFRACTION,
    "glass": BSDF_GLASS,
    "emission": BSDF_EMISSION,
}


def _xf_point(m: np.ndarray, p) -> np.ndarray:
    """(m · (p,1)).to3D() — NO w-divide, matching CGL Vector4D::to3D(),
    which the reference's light/camera wrappers use."""
    out = m @ np.append(np.asarray(p, dtype=np.float64), 1.0)
    return out[:3]


def _xf_point_proj(m: np.ndarray, p) -> np.ndarray:
    """(m · (p,1)).projectTo3D() — with w-divide, used for mesh vertices
    (dynamic_scene/mesh.cpp:27) and sphere centers (application.cpp:339)."""
    out = m @ np.append(np.asarray(p, dtype=np.float64), 1.0)
    return out[:3] / out[3]


class _BSDFAccum:
    def __init__(self):
        self.rows = []

    def add(self, mat: Optional[collada.MaterialInfo]) -> int:
        """One BSDFTable row per material instance (the reference news a
        BSDF object per node too; missing material → gray DiffuseBSDF(0.5),
        dynamic_scene/mesh.cpp:31-34)."""
        if mat is None:
            mat = collada.MaterialInfo()  # diffuse 0.5 default
        self.rows.append(mat)
        return len(self.rows) - 1

    def table(self, dtype=np.float32) -> BSDFTable:
        rows = self.rows or [collada.MaterialInfo()]
        return BSDFTable(
            kind=jnp.asarray([_BSDF_KIND[m.kind] for m in rows], jnp.int32),
            reflectance=jnp.asarray([m.reflectance for m in rows], dtype),
            transmittance=jnp.asarray([m.transmittance for m in rows], dtype),
            emission=jnp.asarray([m.emission for m in rows], dtype),
            eta=jnp.asarray([m.eta for m in rows], dtype),
            k=jnp.asarray([m.k for m in rows], dtype),
            alpha=jnp.asarray([m.alpha for m in rows], dtype),
            ior=jnp.asarray([m.ior for m in rows], dtype),
        )


def _light_row(node: collada.Node) -> Optional[dict]:
    """Replicate the DynamicScene light wrapper constructions
    (dynamic_scene/*_light.h) composed with the StaticScene light ctors
    (static_scene/light.cpp)."""
    li: collada.LightInfo = node.instance
    t = node.transform
    row = dict(
        kind=-1,
        radiance=np.asarray(li.spectrum, dtype=np.float64),
        position=np.zeros(3),
        direction=np.zeros(3),
        dim_x=np.zeros(3),
        dim_y=np.zeros(3),
        area=0.0,
    )
    if li.light_type == "ambient":
        # AmbientLight → InfiniteHemisphereLight (ambient_light.h)
        row["kind"] = LIGHT_HEMISPHERE
    elif li.light_type == "directional":
        # wrapper: dir_w = -(T·(d,1)).unit(); static ctor: dirToLight =
        # -dir_w.unit() — net dirToLight = unit(T·(d,1))
        # (directional_light.h + light.cpp:11-15). The w=1 (point, not
        # vector) transform is a reference quirk we reproduce.
        d = _xf_point(t, li.direction)
        row["kind"] = LIGHT_DIRECTIONAL
        row["direction"] = d / np.linalg.norm(d)  # stores dirToLight
    elif li.light_type == "point":
        row["kind"] = LIGHT_POINT
        row["position"] = _xf_point(t, li.position)
    elif li.light_type == "spot":
        # SpotLight::sample_L is a stub returning zero (light.cpp:61-69)
        pos = _xf_point(t, li.position)
        d = _xf_point(t, li.direction) - pos
        row["kind"] = LIGHT_SPOT
        row["position"] = pos
        row["direction"] = d / np.linalg.norm(d)
    elif li.light_type == "area":
        # area_light.h:9-26
        pos = _xf_point(t, np.zeros(3))
        d = _xf_point(t, li.direction) - pos
        dim_x_local = np.cross(li.up, li.direction)
        dim_x = _xf_point(t, dim_x_local) - pos
        dim_y = _xf_point(t, li.up) - pos
        row["kind"] = LIGHT_AREA
        row["position"] = pos
        row["direction"] = d / np.linalg.norm(d)
        row["dim_x"] = dim_x
        row["dim_y"] = dim_y
        row["area"] = np.linalg.norm(dim_x) * np.linalg.norm(dim_y)
    else:
        return None
    return row


def build_scene(
    info: collada.SceneInfo,
    screen_w: int = 800,
    screen_h: int = 600,
    env: Optional[EnvMap] = None,
    dtype=np.float32,
    pad_tris_to: int = 64,
    fov_mode: str = "reference",
) -> Tuple[SceneData, Camera]:
    """Build the flat SceneData and a camera placed like the reference.

    Padding: triangle rows are padded to a multiple of `pad_tris_to` with
    degenerate rows (bsdf_id = -1) so traversal kernels can use fixed-size
    chunks; intersection code masks on bsdf_id >= 0.
    """
    bsdfs = _BSDFAccum()
    tv0, tv1, tv2, tn0, tn1, tn2, tb = [], [], [], [], [], [], []
    sph_c, sph_r, sph_b = [], [], []
    light_rows = []
    cam_info: Optional[collada.CameraInfo] = None
    c_dir = np.array([0.0, 0.0, -1.0])

    bbox_min = np.full(3, np.inf)
    bbox_max = np.full(3, -np.inf)

    for node in info.nodes:
        inst = node.instance
        if isinstance(inst, collada.CameraInfo):
            cam_info = inst
            # c_dir = (T·(view_dir,1)).unit() — yes, as a *point*
            # (application.cpp:238-240)
            d = _xf_point(node.transform, inst.view_dir)
            c_dir = d / np.linalg.norm(d)
        elif isinstance(inst, collada.LightInfo):
            row = _light_row(node)
            if row is not None:
                light_rows.append(row)
        elif isinstance(inst, collada.SphereInfo):
            # position/scale extraction per init_sphere
            # (application.cpp:330-343)
            pos = _xf_point_proj(node.transform, np.zeros(3))
            scale = np.linalg.norm(node.transform[:3, :3] @ np.array([1.0, 0, 0]))
            r = inst.radius * scale
            bid = bsdfs.add(inst.material)
            sph_c.append(pos)
            sph_r.append(r)
            sph_b.append(bid)
            bbox_min = np.minimum(bbox_min, pos - r)
            bbox_max = np.maximum(bbox_max, pos + r)
        elif isinstance(inst, collada.PolymeshInfo):
            if len(inst.polygons) == 0 or len(inst.vertices) == 0:
                continue
            verts = meshlib.transform_vertices(node.transform, inst.vertices)
            tris = meshlib.triangulate(inst.polygons)
            normals = meshlib.reference_vertex_normals(verts, inst.polygons)
            bid = bsdfs.add(inst.material)
            tv0.append(verts[tris[:, 0]])
            tv1.append(verts[tris[:, 1]])
            tv2.append(verts[tris[:, 2]])
            tn0.append(normals[tris[:, 0]])
            tn1.append(normals[tris[:, 1]])
            tn2.append(normals[tris[:, 2]])
            tb.append(np.full(len(tris), bid, dtype=np.int32))
            bbox_min = np.minimum(bbox_min, verts.min(axis=0))
            bbox_max = np.maximum(bbox_max, verts.max(axis=0))

    if tv0:
        tv0 = np.concatenate(tv0)
        tv1 = np.concatenate(tv1)
        tv2 = np.concatenate(tv2)
        tn0 = np.concatenate(tn0)
        tn1 = np.concatenate(tn1)
        tn2 = np.concatenate(tn2)
        tb = np.concatenate(tb)
    else:
        tv0 = tv1 = tv2 = tn0 = tn1 = tn2 = np.zeros((0, 3))
        tb = np.zeros((0,), dtype=np.int32)

    # Morton-sort the triangles so spatially-close rows are contiguous
    # (the dense two-level acceleration structure, geometry/clusters.py)
    from rrt_tpu.geometry import clusters as cl
    n_t = len(tb)
    if n_t > 0:
        order = cl.morton_order(tv0, tv1, tv2)
        tv0, tv1, tv2 = tv0[order], tv1[order], tv2[order]
        tn0, tn1, tn2 = tn0[order], tn1[order], tn2[order]
        tb = tb[order]

    # pad triangles to a chunk multiple with degenerate far-away rows
    n_pad = (-n_t) % pad_tris_to if pad_tris_to else 0
    if n_pad or n_t == 0:
        n_pad = max(n_pad, pad_tris_to if n_t == 0 else n_pad)
        far = np.full((n_pad, 3), 1e30)
        tv0 = np.concatenate([tv0, far])
        tv1 = np.concatenate([tv1, far])
        tv2 = np.concatenate([tv2, far])
        zn = np.zeros((n_pad, 3))
        tn0 = np.concatenate([tn0, zn])
        tn1 = np.concatenate([tn1, zn])
        tn2 = np.concatenate([tn2, zn])
        tb = np.concatenate([tb, np.full(n_pad, -1, dtype=np.int32)])

    cluster_lo, cluster_hi = cl.cluster_bboxes(
        tv0, tv1, tv2, tb >= 0, pad_tris_to)

    # pad spheres to a fixed lane width (kernel-friendly static shape);
    # the live count rides SceneData as static metadata so the kernel's
    # sphere loop only visits the live prefix
    n_live_spheres = len(sph_c)
    while len(sph_c) < 8:
        sph_c.append(np.full(3, 1e30))
        sph_r.append(0.0)
        sph_b.append(-1)

    if light_rows:
        lt = LightTable(
            kind=jnp.asarray([r["kind"] for r in light_rows], jnp.int32),
            radiance=jnp.asarray([r["radiance"] for r in light_rows], dtype),
            position=jnp.asarray([r["position"] for r in light_rows], dtype),
            direction=jnp.asarray([r["direction"] for r in light_rows], dtype),
            dim_x=jnp.asarray([r["dim_x"] for r in light_rows], dtype),
            dim_y=jnp.asarray([r["dim_y"] for r in light_rows], dtype),
            area=jnp.asarray([r["area"] for r in light_rows], dtype),
            kind_host=tuple(int(r["kind"]) for r in light_rows),
        )
    else:
        z3 = jnp.zeros((0, 3), dtype)
        lt = LightTable(
            kind=jnp.zeros((0,), jnp.int32), radiance=z3, position=z3,
            direction=z3, dim_x=z3, dim_y=z3, area=jnp.zeros((0,), dtype),
            kind_host=())

    if env is not None:
        # the reference appends the env light to scene->lights
        # (pathtracer.cpp:107-109)
        lt = LightTable(
            kind=jnp.concatenate([lt.kind, jnp.asarray([LIGHT_ENV], jnp.int32)]),
            radiance=jnp.concatenate([lt.radiance, jnp.zeros((1, 3), dtype)]),
            position=jnp.concatenate([lt.position, jnp.zeros((1, 3), dtype)]),
            direction=jnp.concatenate([lt.direction, jnp.zeros((1, 3), dtype)]),
            dim_x=jnp.concatenate([lt.dim_x, jnp.zeros((1, 3), dtype)]),
            dim_y=jnp.concatenate([lt.dim_y, jnp.zeros((1, 3), dtype)]),
            area=jnp.concatenate([lt.area, jnp.zeros((1,), dtype)]),
            kind_host=lt.kind_host + (LIGHT_ENV,),
        )

    scene = SceneData(
        tri_v0=jnp.asarray(tv0, dtype), tri_v1=jnp.asarray(tv1, dtype),
        tri_v2=jnp.asarray(tv2, dtype),
        tri_n0=jnp.asarray(tn0, dtype), tri_n1=jnp.asarray(tn1, dtype),
        tri_n2=jnp.asarray(tn2, dtype),
        tri_bsdf=jnp.asarray(tb, jnp.int32),
        sph_center=jnp.asarray(np.asarray(sph_c), dtype),
        sph_radius=jnp.asarray(np.asarray(sph_r), dtype),
        sph_bsdf=jnp.asarray(np.asarray(sph_b), jnp.int32),
        bsdfs=bsdfs.table(dtype),
        lights=lt,
        env=env,
        cluster_lo=jnp.asarray(cluster_lo, dtype),
        cluster_hi=jnp.asarray(cluster_hi, dtype),
        cluster_size=pad_tris_to,
        n_live_spheres=n_live_spheres,
    )

    # ----- camera placement from scene bbox (application.cpp:263-288).
    # The reference always configures at the 800×600 default first and then
    # resizes (application.cpp:90, main.cpp resize call), which rescales the
    # FoV through the frozen screenDist — replicated exactly.
    cam = Camera()
    if cam_info is not None:
        if fov_mode == "reference":
            cam.configure(cam_info, 800, 600)
            if (screen_w, screen_h) != (800, 600):
                cam.set_screen_size(screen_w, screen_h)
        else:
            # "native": fit the scene FoV directly to the target resolution
            # (what the reference would do if W×H were its window default)
            cam.configure(cam_info, screen_w, screen_h)
    if np.all(np.isfinite(bbox_min)):
        target = 0.5 * (bbox_min + bbox_max)
        extent = bbox_max - bbox_min
        cvd = np.linalg.norm(extent) / 2 * 1.5
        view_distance = cvd * 2
        cam.place(
            target,
            math.acos(np.clip(c_dir[1], -1.0, 1.0)),
            math.atan2(c_dir[0], c_dir[2]),
            view_distance,
            cvd / 10.0,
            cvd * 20.0,
        )
    return scene, cam


def load_scene(path: str, screen_w: int = 800, screen_h: int = 600,
               env: Optional[EnvMap] = None, dtype=np.float32,
               fov_mode: str = "reference"):
    """Convenience: parse a .dae and build the flat scene + camera."""
    return build_scene(collada.load(path), screen_w, screen_h, env, dtype,
                       fov_mode=fov_mode)
