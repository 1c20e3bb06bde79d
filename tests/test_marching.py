"""Marching-tetrahedra iso-surface extraction + point-cloud -> mesh tool."""

import numpy as np

from im23d_tpu.geometry.marching import (
    marching_tetrahedra,
    point_cloud_to_mesh,
    save_obj_simple,
)


def _sphere_volume(S=32, r=0.35):
    z, y, x = np.meshgrid(*[np.linspace(-0.5, 0.5, S)] * 3, indexing="ij")
    return (np.sqrt(z**2 + y**2 + x**2) < r).astype(np.float32)


def test_sphere_surface_geometry():
    S, r = 32, 0.35
    verts, faces = marching_tetrahedra(_sphere_volume(S, r), 0.5)
    assert len(verts) > 100 and len(faces) > 100
    assert faces.max() < len(verts)
    # vertices sit near the sphere of radius r (index coords -> [-0.5, 0.5])
    p = verts / (S - 1) - 0.5
    radii = np.linalg.norm(p, axis=-1)
    assert abs(np.mean(radii) - r) < 0.03
    assert np.std(radii) < 0.03


def test_watertight_and_oriented():
    S = 24
    verts, faces = marching_tetrahedra(_sphere_volume(S, 0.3), 0.5)
    # closed surface: every edge shared by exactly two triangles
    edges = np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]
    )
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()
    # outward orientation: signed volume (divergence theorem) is positive
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    signed = np.einsum("ij,ij->i", v0 - verts.mean(0), np.cross(v1 - v0, v2 - v0)).sum()
    assert signed > 0


def test_empty_and_full_volumes():
    empty = np.zeros((8, 8, 8), np.float32)
    verts, faces = marching_tetrahedra(empty, 0.5)
    assert len(verts) == 0 and len(faces) == 0
    verts, faces = marching_tetrahedra(empty + 1.0, 0.5)
    assert len(faces) == 0


def test_point_cloud_to_mesh_roundtrip(tmp_path):
    # dense samples on a sphere surface -> meshed blob near that sphere
    rng = np.random.RandomState(0)
    d = rng.randn(4000, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pts = d * 0.3
    verts, faces = point_cloud_to_mesh(pts, voxel_size=48, sigma=1.0,
                                       level=0.25)
    assert len(faces) > 100
    radii = np.linalg.norm(verts, axis=-1)
    assert 0.15 < np.median(radii) < 0.45

    out = tmp_path / "mesh.obj"
    save_obj_simple(str(out), verts, faces)
    lines = out.read_text().splitlines()
    assert sum(l.startswith("v ") for l in lines) == len(verts)
    assert sum(l.startswith("f ") for l in lines) == len(faces)


def test_cli_from_npy(tmp_path):
    from im23d_tpu.cli.pointcloud_to_mesh import main

    rng = np.random.RandomState(1)
    d = rng.randn(2000, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    np.save(tmp_path / "cloud.npy", (d * 0.25).astype(np.float32))
    out = tmp_path / "mesh.obj"
    rc = main(["--input", str(tmp_path / "cloud.npy"), "--output", str(out),
               "--voxel_size", "40", "--sigma", "1.0", "--level", "0.25"])
    assert rc == 0
    assert out.exists()
