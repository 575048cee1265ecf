"""Polygon-soup → triangle arrays with smooth vertex normals.

Replaces the reference's halfedge pipeline (HalfedgeMesh::build →
Vertex::computeNormal → StaticScene::Mesh flattening,
`halfEdgeMesh.cpp:29`, `halfEdgeMesh.h:487-514`, `object.cpp:16-58`).
The halfedge structure exists in the reference only to (a) compute
area-weighted vertex normals and (b) support mesh-edit operations that are
all unimplemented stubs (`meshEdit.cpp:6-104`), so the TPU build goes
straight from indexed polygons to flat arrays.
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np


def triangulate(polygons: Sequence[Sequence[int]]) -> np.ndarray:
    """Faces → (T,3) int index array.

    The reference emits only the FIRST THREE vertices of each face
    (`object.cpp:36-41` walks h, h->next, h->next->next), which silently
    truncates any quad; every shipped scene is pure triangles, and we keep
    that exact behavior for parity.
    """
    tris = [p[:3] for p in polygons if len(p) >= 3]
    if not tris:
        return np.zeros((0, 3), dtype=np.int64)
    return np.asarray(tris, dtype=np.int64)


def vertex_normals(vertices: np.ndarray, tris: np.ndarray) -> np.ndarray:
    """Area-weighted smooth vertex normals.

    Matches Vertex::computeNormal (`halfEdgeMesh.h:487-514`): at each vertex
    sum cross(pj−pi, pk−pi) over incident faces — which for a triangle equals
    the same 2·area·n̂ regardless of which corner pi is — then normalize.
    """
    from rrt_tpu.utils import native
    nat = native.vertex_normals(vertices, tris)
    if nat is not None:
        return nat
    v0 = vertices[tris[:, 0]]
    v1 = vertices[tris[:, 1]]
    v2 = vertices[tris[:, 2]]
    face_n = np.cross(v1 - v0, v2 - v0)  # 2·area · n̂, orientation from winding
    normals = np.zeros_like(vertices)
    for c in range(3):
        np.add.at(normals, tris[:, c], face_n)
    lens = np.linalg.norm(normals, axis=1, keepdims=True)
    lens[lens == 0] = 1.0
    return normals / lens


def transform_vertices(transform: np.ndarray, vertices: np.ndarray) -> np.ndarray:
    """Bake a node's world transform into the vertex positions, exactly as
    DynamicScene::Mesh does at construction (`dynamic_scene/mesh.cpp:25-28`)."""
    ph = np.concatenate([vertices, np.ones((len(vertices), 1))], axis=1)
    out = ph @ transform.T
    return out[:, :3] / out[:, 3:4]
