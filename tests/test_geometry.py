import numpy as np
import jax.numpy as jnp

from im23d_tpu.geometry.mesh_template import MeshTemplate
from im23d_tpu.geometry.objio import load_obj, save_obj, uv_sphere


def test_uv_sphere_counts_match_reference_templates():
    # reference uvsphere_16rings.obj: 482 vertices / 960 faces (SURVEY §1)
    m = uv_sphere(32, 16)
    assert m.vertices.shape == (482, 3)
    assert m.faces.shape == (960, 3)
    m31 = uv_sphere(32, 31)
    assert m31.vertices.shape == (962, 3)
    assert m31.faces.shape == (1920, 3)


def test_uv_sphere_geometry_sane():
    m = uv_sphere(32, 16)
    r = np.linalg.norm(m.vertices, axis=1)
    np.testing.assert_allclose(r, 1.0, atol=1e-5)
    assert m.uvs.min() >= 0.0 and m.uvs.max() <= 1.0
    # all faces reference valid vertices/uvs
    assert m.faces.max() < len(m.vertices)
    assert m.face_uvs.max() < len(m.uvs)


def test_obj_roundtrip(tmp_path):
    m = uv_sphere(8, 4)
    save_obj(str(tmp_path / "sphere"), m, m.vertices)
    m2 = load_obj(str(tmp_path / "sphere.obj"))
    np.testing.assert_allclose(m2.vertices, m.vertices, atol=1e-4)
    np.testing.assert_array_equal(m2.faces, m.faces)
    np.testing.assert_array_equal(m2.face_uvs, m.face_uvs)


def test_template_symmetry_partition():
    t = MeshTemplate(segments=32, rings=16)
    V = t.num_vertices
    assert len(t.pos_indices) == len(t.neg_indices)
    assert len(t.pos_indices) + len(t.neg_indices) + len(t.zero_indices) == V
    # mirror property
    v = t.mesh.vertices
    np.testing.assert_allclose(
        v[t.pos_indices][:, 0], -v[t.neg_indices][:, 0], atol=1e-5
    )
    np.testing.assert_allclose(
        v[t.pos_indices][:, 1:], v[t.neg_indices][:, 1:], atol=1e-5
    )


def test_template_tangent_frames():
    t = MeshTemplate(segments=32, rings=16)
    tm = t.tangent_map
    # poles have zero tangent/bitangent
    for p in t.poles:
        np.testing.assert_allclose(tm[p, 1], 0.0)
        np.testing.assert_allclose(tm[p, 2], 0.0)
    # frames orthonormal away from poles
    others = [i for i in range(t.num_vertices) if i not in t.poles]
    n, tg, bt = tm[others, 0], tm[others, 1], tm[others, 2]
    np.testing.assert_allclose((n * tg).sum(-1), 0.0, atol=1e-5)
    np.testing.assert_allclose((n * bt).sum(-1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(tg, axis=-1), 1.0, atol=1e-5)


def test_face_adjacency_closed_surface():
    t = MeshTemplate(segments=16, rings=8)
    ff = t.ff
    F = len(t.mesh.faces)
    assert ff.shape == (F, 3)
    for fi in range(F):
        assert len(set(ff[fi].tolist())) == 3  # three distinct neighbors
        assert fi not in ff[fi]


def test_zero_displacement_is_identity():
    t = MeshTemplate(segments=32, rings=16)
    dm = jnp.zeros((2, 32, 32, 3))
    out = np.asarray(t.get_vertex_positions(dm))
    np.testing.assert_allclose(out, np.tile(t.mesh.vertices, (2, 1, 1)), atol=1e-6)


def test_compute_normals_outward_sphere():
    t = MeshTemplate(segments=32, rings=16)
    pos = jnp.asarray(t.mesh.vertices)[None]
    normals = np.asarray(t.compute_normals(pos))[0]
    centroids = t.mesh.vertices[t.mesh.faces].mean(axis=1)
    dots = (normals * centroids).sum(-1)
    assert (dots > 0).all()
    np.testing.assert_allclose(np.linalg.norm(normals, axis=-1), 1.0, atol=1e-5)


def test_get_vertex_positions_parity_with_reference_math():
    """Oracle: the reference MeshTemplate.get_vertex_positions math
    (mesh_template.py:125-149) re-implemented with torch grid_sample."""
    import torch
    import torch.nn.functional as F

    t = MeshTemplate(segments=32, rings=16)
    rng = np.random.RandomState(0)
    W = 32
    dm = rng.randn(2, 32, W, 3).astype(np.float32) * 0.05

    ours = np.asarray(t.get_vertex_positions(jnp.asarray(dm)))

    # --- reference math in torch (NCHW) ---
    dm_t = torch.tensor(dm.transpose(0, 3, 1, 2))  # (B,3,H,W)
    # adjust_uv_and_texture: circular pad W by 1
    dm_padded = torch.cat((dm_t[:, :, :, -1:], dm_t, dm_t[:, :, :, :1]), dim=3)
    topo = torch.tensor(t.nonneg_topo_map.copy())
    delta = 1 / (2 * W)
    expansion = (W + 1) / W
    topo[:, 0] = (topo[:, 0] + 1 + 2 * delta - expansion) / expansion
    topo_expanded = topo.unsqueeze(0).unsqueeze(-2).expand(2, -1, -1, -1)
    local = (
        F.grid_sample(dm_padded, topo_expanded, mode="bilinear", align_corners=True)
        .squeeze(-1)
        .permute(0, 2, 1)
    )  # (B, Vn, 3)
    tgm = torch.tensor(t.nonneg_tangent_map)
    deltas = (local.unsqueeze(-2) @ tgm.expand(2, -1, -1, -1)).squeeze(-2)
    V = t.num_vertices
    full = torch.zeros(2, V, 3)
    full[:, t.nonneg_indices] = deltas
    full2 = full.clone()
    full2[:, t.neg_indices] = full[:, t.pos_indices] * torch.tensor([-1.0, 1, 1])
    deltas_full = full2 * torch.tensor(t.symmetry_mask).unsqueeze(0)
    expected = (torch.tensor(t.mesh.vertices).unsqueeze(0) + deltas_full).numpy()

    np.testing.assert_allclose(ours, expected, atol=1e-5)


def test_template_from_obj_infers_ring_segment_counts(tmp_path):
    # A 17-ring/24-segment sphere OBJ (no filename hint): the template must
    # infer the counts from the mesh, not default to 32x16
    m = uv_sphere(24, 17)
    save_obj(str(tmp_path / "custom_sphere"), m, m.vertices)
    t = MeshTemplate(str(tmp_path / "custom_sphere.obj"))
    assert (t.segments, t.rings) == (24, 17)
    ref = MeshTemplate(segments=24, rings=17)
    np.testing.assert_allclose(t.topo_map, ref.topo_map, atol=1e-4)


def test_template_rejects_non_sphere_obj(tmp_path):
    import pytest

    (tmp_path / "tri.obj").write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nvt 0 0\nvt 1 0\nvt 0 1\n"
        "f 1/1 2/2 3/3\n"
    )
    with pytest.raises(ValueError, match="not a UV sphere"):
        MeshTemplate(str(tmp_path / "tri.obj"))
