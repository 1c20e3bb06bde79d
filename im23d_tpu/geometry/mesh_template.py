"""Mesh template: UV-sphere topology + deformation by UV displacement maps.

Functional re-design of the reference ``MeshTemplate``
(``code/rendering/mesh_template.py:12-219``): all topology-derived constants
(topo map, tangent frames, symmetry index sets, face adjacency) are
precomputed host-side in numpy at construction and stored as static device
arrays; the deformation methods are pure jnp functions safe under jit.

Conventions: NHWC maps; displacement/texture maps are the full
(already symmetrized) width; UV y-flip and the symmetric-UV compensation
match the reference bit-for-bit (``mesh_template.py:125-170``), which
pretrained-weight parity depends on (SURVEY.md §7.4 #4).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from im23d_tpu.geometry.objio import Mesh, load_obj, save_obj, uv_sphere
from im23d_tpu.ops.sampling import circpad


def _face_adjacency(faces: np.ndarray) -> np.ndarray:
    """(F, 3) indices of the edge-adjacent face across each face edge.

    Replaces Kaolin's ``compute_adjacency_info`` ``ff`` table (used by the
    flatness loss, ``code/utils/losses.py:13``).
    """
    edge_to_faces: dict[tuple[int, int], list[int]] = {}
    for fi, (a, b, c) in enumerate(faces):
        for e in [(a, b), (b, c), (c, a)]:
            key = (min(e), max(e))
            edge_to_faces.setdefault(key, []).append(fi)
    ff = np.zeros((len(faces), 3), np.int32)
    for fi, (a, b, c) in enumerate(faces):
        for k, e in enumerate([(a, b), (b, c), (c, a)]):
            key = (min(e), max(e))
            adj = [f for f in edge_to_faces[key] if f != fi]
            ff[fi, k] = adj[0] if adj else fi
    return ff


class MeshTemplate:
    """Host-side precompute + device-side deformation for a UV sphere."""

    def __init__(self, mesh: Mesh | str | None = None, is_symmetric: bool = True,
                 segments: int = 32, rings: int = 16):
        if mesh is None:
            mesh = uv_sphere(segments=segments, rings=rings)
        elif isinstance(mesh, str):
            mesh = load_obj(mesh)
        if isinstance(mesh, Mesh) and mesh.uvs is not None and len(mesh.uvs):
            # Infer ring/segment counts from the mesh itself (the topo map
            # below divides by them): a UV sphere's v chart has rings+1
            # distinct latitudes (u is unusable — pole fans add half-offset
            # u values), and (rings-1)*segments + 2 vertices.  Trusting
            # filename hints silently mis-binned 16/17-ring reference
            # templates.
            vs = np.unique(np.round(np.asarray(mesh.uvs)[:, 1], 5))
            inf_rings = len(vs) - 1
            n_body = len(mesh.vertices) - 2
            if inf_rings > 1 and n_body % (inf_rings - 1) == 0:
                segments, rings = n_body // (inf_rings - 1), inf_rings
            else:
                raise ValueError(
                    f"mesh is not a UV sphere: {inf_rings + 1} uv latitudes "
                    f"inconsistent with {len(mesh.vertices)} vertices"
                )
        self.mesh = mesh
        self.is_symmetric = is_symmetric
        self.segments = segments
        self.rings = rings

        v = mesh.vertices
        self.poles = [int(np.argmax(v[:, 1])), int(np.argmin(v[:, 1]))]

        # Symmetry index sets about the x axis (reference :25-50)
        axis = 0
        neg = np.nonzero(v[:, axis] < -1e-4)[0]
        zero = np.nonzero(np.abs(v[:, axis]) < 1e-4)[0]
        pos = []
        for idx in neg:
            mirrored = v[idx].copy()
            mirrored[axis] *= -1
            dists = np.linalg.norm(v - mirrored, axis=-1)
            j = int(np.argmin(dists))
            assert dists[j] < 1e-4, dists[j]
            pos.append(j)
        pos = np.asarray(pos, np.int64)
        assert len(pos) == len(set(pos.tolist()))
        assert len(pos) + len(neg) + len(zero) == len(v)
        self.neg_indices = neg.astype(np.int32)
        self.pos_indices = pos.astype(np.int32)
        self.zero_indices = zero.astype(np.int32)
        self.nonneg_indices = np.concatenate([pos, zero]).astype(np.int32)

        # Per-vertex UV "topo map" from face UVs with u wraparound (:56-75)
        seg, rng = self.segments, self.rings
        accum: dict[int, list[np.ndarray]] = {}
        for f_uv, f_v in zip(mesh.face_uvs, mesh.faces):
            for t, vert in zip(f_uv, f_v):
                res = mesh.uvs[t] * [seg, rng]
                if abs(res[0] - seg) < 1e-4:
                    res = res.copy()
                    res[0] = 0.0  # wrap around
                accum.setdefault(int(vert), []).append(res)
        topo = np.zeros((len(v), 2), np.float32)
        for idx, vals in accum.items():
            topo[idx] = np.mean(np.asarray(vals, np.float32), axis=0) / [seg, rng]
        topo = topo * 2.0 - 1.0
        topo = topo * np.asarray([1.0, -1.0], np.float32)  # flip v
        self.topo_map = topo
        self.nonneg_topo_map = topo[self.nonneg_indices]

        # Force x = 0 for on-plane vertices when symmetric (:77-79)
        symmetry_mask = np.ones_like(v)
        symmetry_mask[zero, 0] = 0.0
        self.symmetry_mask = symmetry_mask

        # Tangent frames: normal / tangent / bitangent, zero at poles (:81-93)
        normals = v / np.linalg.norm(v, axis=1, keepdims=True)
        up = np.asarray([[0.0, 1.0, 0.0]], np.float32)
        tangents = np.cross(normals, np.broadcast_to(up, normals.shape))
        t_norm = np.linalg.norm(tangents, axis=1, keepdims=True)
        tangents = tangents / np.maximum(t_norm, 1e-12)
        bitangents = np.cross(normals, tangents)
        for p in self.poles:
            tangents[p] = 0.0
            bitangents[p] = 0.0
        self.tangent_map = np.stack([normals, tangents, bitangents], axis=1).astype(
            np.float32
        )  # (V, 3, 3)
        self.nonneg_tangent_map = self.tangent_map[self.nonneg_indices]

        self.ff = _face_adjacency(mesh.faces)

        # Device constants
        self.vertices_j = jnp.asarray(mesh.vertices)
        self.faces_j = jnp.asarray(mesh.faces)
        self.face_uvs_j = jnp.asarray(mesh.face_uvs)
        self.uvs_j = jnp.asarray(mesh.uvs)
        self.topo_j = jnp.asarray(self.topo_map)
        self.nonneg_topo_j = jnp.asarray(self.nonneg_topo_map)
        self.tangent_j = jnp.asarray(self.tangent_map)
        self.nonneg_tangent_j = jnp.asarray(self.nonneg_tangent_map)
        self.symmetry_mask_j = jnp.asarray(self.symmetry_mask)
        self.nonneg_idx_j = jnp.asarray(self.nonneg_indices)
        self.neg_idx_j = jnp.asarray(self.neg_indices)
        self.pos_idx_j = jnp.asarray(self.pos_indices)
        self.ff_j = jnp.asarray(self.ff)
        self._vertex_sampler_cache: dict[tuple[int, int], jnp.ndarray] = {}

    # ---- device-side pure functions -------------------------------------

    @property
    def num_vertices(self) -> int:
        return int(self.mesh.vertices.shape[0])

    def deform(self, deltas: jnp.ndarray) -> jnp.ndarray:
        """Local (n, t, b) displacements -> object space (reference :106-111)."""
        tgm = self.nonneg_tangent_j if self.is_symmetric else self.tangent_j
        return jnp.einsum("bvi,vij->bvj", deltas, tgm)

    def compute_normals(self, vertex_positions: jnp.ndarray) -> jnp.ndarray:
        """Unit face normals from final vertex positions (reference :113-123)."""
        a = vertex_positions[:, self.faces_j[:, 0]]
        b = vertex_positions[:, self.faces_j[:, 1]]
        c = vertex_positions[:, self.faces_j[:, 2]]
        n = jnp.cross(b - a, c - a)
        return n / jnp.maximum(
            jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12
        )

    def _vertex_sampler(self, H: int, W: int) -> jnp.ndarray:
        """Static bilinear sampling matrix (Vn, H*W) for the displacement map.

        The topo UVs are template constants, so the circular-pad +
        UV-shift + align_corners bilinear gather of ``get_vertex_positions``
        collapses into one precomputed 4-nnz-per-row matrix; the on-device
        sample becomes a single small matmul.  XLA's TPU gather lowering
        serializes per index (~100 ms per call at inference scale); the
        matmul is microseconds.
        """
        key = (H, W)
        cached = self._vertex_sampler_cache.get(key)
        if cached is not None:
            return jnp.asarray(cached)
        topo = (
            self.nonneg_topo_map if self.is_symmetric else self.topo_map
        ).astype(np.float32).copy()
        if self.is_symmetric:
            delta = 1.0 / (2 * W)
            expansion = (W + 1) / W
            topo[:, 0] = (topo[:, 0] + 1 + 2 * delta - expansion) / expansion
        Wp = W + 2  # circular pad of 1 on each side
        px = (topo[:, 0] + 1.0) * 0.5 * (Wp - 1)
        py = (topo[:, 1] + 1.0) * 0.5 * (H - 1)
        x0 = np.floor(px)
        y0 = np.floor(py)
        wx1 = px - x0
        wy1 = py - y0
        Vn = topo.shape[0]
        M = np.zeros((Vn, H * W), np.float32)
        rows = np.arange(Vn)
        for dy, wy in ((0, 1.0 - wy1), (1, wy1)):
            for dx, wx in ((0, 1.0 - wx1), (1, wx1)):
                xi = x0 + dx
                yi = y0 + dy
                valid = (xi >= 0) & (xi < Wp) & (yi >= 0) & (yi < H)
                # padded column -> source column (circular)
                xs = (np.clip(xi, 0, Wp - 1).astype(np.int64) - 1) % W
                ys = np.clip(yi, 0, H - 1).astype(np.int64)
                np.add.at(
                    M, (rows, ys * W + xs), (wy * wx * valid).astype(np.float32)
                )
        # cache the host array: a jnp constant created inside someone's jit
        # trace would leak that trace's tracer into later calls
        self._vertex_sampler_cache[key] = M
        return jnp.asarray(M)

    def get_vertex_positions(self, displacement_map: jnp.ndarray) -> jnp.ndarray:
        """UV displacement map (B, H, W, 3) -> (B, V, 3) object-space vertices.

        Mirrors the reference math exactly (``mesh_template.py:125-149``):
        circular-pad + UV shift, symmetric-compensation of the topo x
        coordinate, bilinear sample (as a precomputed static matmul),
        tangent-space deform, mirror symmetrize.
        """
        B, H, W, _ = displacement_map.shape
        M = self._vertex_sampler(H, W)
        local = jax.lax.dot_general(
            M, displacement_map.reshape(B, H * W, 3),
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        ).transpose(1, 0, 2)  # (B, Vn, 3)
        deltas = self.deform(local)
        if self.is_symmetric:
            V = self.num_vertices
            full = jnp.zeros((B, V, 3), deltas.dtype)
            full = full.at[:, self.nonneg_idx_j].set(deltas)
            mirrored = full[:, self.pos_idx_j] * jnp.asarray(
                [-1.0, 1.0, 1.0], deltas.dtype
            )
            full = full.at[:, self.neg_idx_j].set(mirrored)
            deltas = full * self.symmetry_mask_j[None]
        return self.vertices_j[None] + deltas

    def adjust_uv_and_texture(self, texture: jnp.ndarray):
        """UVs + boundary-preprocessed texture (reference :151-170), NHWC.

        Returns (uvs (B, T, 2), texture (B, H, W', C)).
        """
        B, H, W, _ = texture.shape
        if self.is_symmetric:
            delta = 1.0 / (2 * W)
            expansion = (W + 1) / W
            uvs = self.uvs_j.at[:, 0].set((self.uvs_j[:, 0] + delta) / expansion)
            texture = circpad(texture, 1)
        else:
            uvs = self.uvs_j
            texture = jnp.concatenate([texture, texture[:, :, :1]], axis=2)
        uvs = jnp.broadcast_to(uvs[None], (B, *uvs.shape))
        return uvs, texture

    def export_obj(self, path_prefix: str, vertex_positions, texture=None) -> None:
        save_obj(
            path_prefix,
            self.mesh,
            np.asarray(vertex_positions),
            np.asarray(texture) if texture is not None else None,
        )
