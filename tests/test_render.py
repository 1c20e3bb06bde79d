import jax
import jax.numpy as jnp
import numpy as np

from im23d_tpu.geometry.mesh_template import MeshTemplate
from im23d_tpu.render.rasterizer import rasterize
from im23d_tpu.render.renderer import fragment_shader, render_mesh


def single_triangle(scale=1.0):
    # CCW triangle covering the image center
    verts = jnp.asarray(
        [[[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0], [0.0, 0.5, 0.0]]], jnp.float32
    ) * scale
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    return verts, faces


def test_rasterize_single_triangle_coverage():
    verts, faces = single_triangle()
    attrs = jnp.ones((1, 1, 3, 1), jnp.float32)
    feat, soft = rasterize(verts, faces, attrs, 32, 32)
    feat = np.asarray(feat)[0, :, :, 0]
    soft = np.asarray(soft)[0, :, :, 0]
    # center pixel is inside
    assert feat[16, 16] > 0.99
    assert soft[16, 16] > 0.99
    # far corner is outside
    assert feat[0, 0] == 0.0
    assert soft[0, 0] < 0.1
    # coverage roughly equals triangle area fraction (0.25 of [-1,1]^2 is
    # 1/8 of the image area... area = 0.5*base*height = 0.5*1*1 = 0.5 NDC
    # units^2 out of 4 -> 12.5%)
    frac = (feat > 0.5).mean()
    assert 0.08 < frac < 0.18


def test_rasterize_backface_culled():
    verts, faces = single_triangle()
    faces_cw = faces[:, ::-1]  # flip winding -> back-facing
    attrs = jnp.ones((1, 1, 3, 1), jnp.float32)
    feat, soft = rasterize(verts, faces_cw, attrs, 16, 16)
    assert float(jnp.sum(feat)) == 0.0
    assert float(jnp.max(soft)) < 0.05


def test_rasterize_depth_order():
    # two triangles, the second closer (higher z) -> wins the attribute
    verts = jnp.asarray(
        [
            [
                [-0.8, -0.8, 0.0], [0.8, -0.8, 0.0], [0.0, 0.8, 0.0],
                [-0.8, -0.8, 0.5], [0.8, -0.8, 0.5], [0.0, 0.8, 0.5],
            ]
        ],
        jnp.float32,
    )
    faces = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    attrs = jnp.zeros((1, 2, 3, 1), jnp.float32)
    attrs = attrs.at[0, 0].set(1.0).at[0, 1].set(2.0)
    feat, _ = rasterize(verts, faces, attrs, 16, 16)
    center = float(feat[0, 8, 8, 0])
    assert abs(center - 2.0) < 1e-4


def test_rasterize_barycentric_interpolation():
    verts, faces = single_triangle(scale=1.8)
    # attribute = x coordinate of each corner: interpolation must reproduce
    # the pixel x coordinate inside the triangle
    attrs = verts[..., 0][:, None, :, None]  # (1, 1, 3, 1)
    feat, _ = rasterize(verts, faces, attrs, 64, 64)
    xs = (np.arange(64) + 0.5) / 64 * 2 - 1
    inside_row = np.asarray(feat)[0, 40]  # row below center -> inside band
    cols = np.nonzero(np.abs(inside_row[:, 0]) > 1e-6)[0]
    assert len(cols) > 5
    np.testing.assert_allclose(inside_row[cols, 0], xs[cols], atol=0.05)


def test_rasterize_y_up_orientation():
    # small triangle near the TOP of NDC space (y ~ +0.8) must appear in
    # the top rows of the image
    verts = jnp.asarray(
        [[[-0.3, 0.6, 0.0], [0.3, 0.6, 0.0], [0.0, 0.95, 0.0]]], jnp.float32
    )
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    attrs = jnp.ones((1, 1, 3, 1), jnp.float32)
    feat, _ = rasterize(verts, faces, attrs, 32, 32)
    top_half = np.asarray(feat)[0, :16].sum()
    bottom_half = np.asarray(feat)[0, 16:].sum()
    assert top_half > 0 and bottom_half == 0


def test_soft_coverage_gradient_moves_vertices():
    verts, faces = single_triangle()
    attrs = jnp.ones((1, 1, 3, 1), jnp.float32)
    target = jnp.zeros((1, 16, 16, 1))

    def loss(v):
        _, soft = rasterize(v, faces, attrs, 16, 16, sigma=1e-2)
        return jnp.sum((soft - target) ** 2)

    g = jax.grad(loss)(verts)
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    assert np.abs(g).sum() > 0  # silhouette gradient reaches vertices


def test_render_mesh_template_sphere():
    t = MeshTemplate(segments=16, rings=8)
    B = 2
    dm = jnp.zeros((B, 8, 16, 3))
    vtx = t.get_vertex_positions(dm) * 0.6  # sphere of radius 0.6 in NDC
    tex = jnp.ones((B, 32, 64, 3)) * jnp.asarray([1.0, 0.5, 0.25])
    uvs, tex_adj = t.adjust_uv_and_texture(tex)
    img, alpha, normals = render_mesh(
        vtx, t.faces_j, uvs, t.face_uvs_j, tex_adj, 32, 32
    )
    img = np.asarray(img)
    alpha = np.asarray(alpha)
    assert img.shape == (B, 32, 32, 3)
    # center shows the texture color
    np.testing.assert_allclose(img[0, 16, 16], [1.0, 0.5, 0.25], atol=0.05)
    # alpha near 1 in center, near 0 at corners
    assert alpha[0, 16, 16, 0] > 0.9
    assert alpha[0, 0, 0, 0] < 0.1
    # silhouette is a disc of radius ~0.6 NDC -> ~28% of the image
    frac = (alpha[0, :, :, 0] > 0.5).mean()
    assert 0.2 < frac < 0.4
    assert normals.shape == (B, t.faces_j.shape[0], 3)


def test_fragment_shader_background():
    tc = jnp.full((1, 4, 4, 2), 0.5)
    tex = jnp.ones((1, 8, 8, 3)) * 0.8
    mask = jnp.zeros((1, 4, 4, 1))
    bg = jnp.ones((1, 4, 4, 3)) * 0.3
    out = fragment_shader(tc, tex, mask, bg)
    np.testing.assert_allclose(np.asarray(out), 0.3, atol=1e-6)
    out2 = fragment_shader(tc, tex, jnp.ones((1, 4, 4, 1)), bg)
    np.testing.assert_allclose(np.asarray(out2), 0.8, atol=1e-6)
