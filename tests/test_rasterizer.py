"""Software z-buffer rasterizer (render/rasterizer.py) — the GL-free
reimplementation of the reference's pyrender mesh pipeline
(reference: render/renderer.py:26-161)."""

import numpy as np

from regennet_tpu.render.rasterizer import (
    PERSON_MESH_COLORS,
    fit_weak_perspective,
    rasterize_mesh,
    render_mesh_sequence,
)


def _tri(z=0.0):
    # big triangle covering the image center, at constant view-space depth
    return np.asarray(
        [[-0.8, -0.8, z], [0.8, -0.8, z], [0.0, 0.9, z]], np.float32
    )


class TestRasterize:
    def test_triangle_covers_center_not_corner(self):
        img = rasterize_mesh(
            _tri(), np.asarray([[0, 1, 2]]),
            np.asarray([[1.0, 0.0, 0.0]]), resolution=(64, 64),
        )
        assert img.shape == (64, 64, 3) and img.dtype == np.uint8
        center = img[32, 32]
        corner = img[1, 1]
        assert center[0] > 150 and center[1] < 100  # lit red
        assert (corner == 255).all()  # white background

    def test_zbuffer_occlusion(self):
        # red triangle nearer to the camera (depth = -z smaller for larger
        # z) must occlude the green one where they overlap
        verts = np.concatenate([_tri(z=0.5), _tri(z=-0.5)])
        faces = np.asarray([[0, 1, 2], [3, 4, 5]])
        colors = np.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        img = rasterize_mesh(verts, faces, colors, resolution=(64, 64))
        center = img[32, 32]
        assert center[0] > center[1]  # red in front
        # swapping depths flips the winner
        verts2 = np.concatenate([_tri(z=-0.5), _tri(z=0.5)])
        img2 = rasterize_mesh(verts2, faces, colors, resolution=(64, 64))
        center2 = img2[32, 32]
        assert center2[1] > center2[0]

    def test_winding_invariance(self):
        img_ccw = rasterize_mesh(
            _tri(), np.asarray([[0, 1, 2]]),
            np.asarray([[0.2, 0.4, 0.9]]), resolution=(48, 48),
        )
        img_cw = rasterize_mesh(
            _tri(), np.asarray([[0, 2, 1]]),
            np.asarray([[0.2, 0.4, 0.9]]), resolution=(48, 48),
        )
        np.testing.assert_array_equal(img_ccw, img_cw)

    def test_shading_varies_with_normal(self):
        # two same-color triangles with different orientations shade
        # differently (flat Lambert + ambient 0.4, reference scene light)
        flat = _tri(z=0.0)
        tilted = _tri(z=0.0)
        tilted[2, 2] = 1.5  # tilt out of the screen plane
        colors = np.asarray([[1.0, 1.0, 1.0]])
        img_flat = rasterize_mesh(flat, np.asarray([[0, 1, 2]]), colors,
                                  resolution=(48, 48),
                                  bg_color=(0.0, 0.0, 0.0))
        img_tilt = rasterize_mesh(tilted, np.asarray([[0, 1, 2]]), colors,
                                  resolution=(48, 48),
                                  bg_color=(0.0, 0.0, 0.0))
        c1, c2 = int(img_flat[24, 24, 0]), int(img_tilt[24, 24, 0])
        assert abs(c1 - c2) > 5
        # ambient floor keeps every lit face above 0.4 * color
        assert min(c1, c2) >= int(0.4 * 255) - 2

    def test_fit_weak_perspective_centers(self):
        verts = np.asarray([[2.0, 1.0, 0.0], [4.0, 3.0, 0.0]])
        sx, sy, tx, ty = fit_weak_perspective(verts)
        assert np.isclose(sx * (3.0 + tx), 0.0)  # x center -> ndc 0
        assert np.isclose(sy * (2.0 - ty), 0.0)  # y center -> ndc 0
        # extremes inside the fill box
        assert abs(sx * (4.0 + tx)) <= 0.9


class TestRenderMeshSequence:
    def test_two_person_sequence(self):
        rng = np.random.default_rng(0)
        base = rng.normal(size=(20, 3)).astype(np.float32) * 0.3
        faces = np.asarray([[i, (i + 1) % 20, (i + 7) % 20]
                            for i in range(0, 20, 2)])
        seq = np.stack([
            np.stack([base + [dx, 0, 0]] * 3, -1)
            for dx in (-1.0, 1.0)
        ])  # [2, 20, 3, 3]
        frames = render_mesh_sequence(seq, faces, resolution=(80, 80))
        assert len(frames) == 3
        f = frames[0]
        assert f.shape == (80, 80, 3) and f.dtype == np.uint8
        # both reference material colors appear: ivory person (R=G>B) on
        # the left, gray person (R=G=B<255) on the right
        left, right = f[:, :40].reshape(-1, 3), f[:, 40:].reshape(-1, 3)
        assert ((left[:, 0] == left[:, 1]) & (left[:, 2] < left[:, 0])
                & (left[:, 0] < 255)).any()
        assert ((right[:, 0] == right[:, 1]) & (right[:, 1] == right[:, 2])
                & (right[:, 0] < 250)).any()

    def test_render_video_mesh_route(self, tmp_path):
        import os

        from regennet_tpu.render.renderer import render_video

        rng = np.random.default_rng(0)
        verts = rng.normal(size=(2, 12, 3, 3)).astype(np.float32)
        faces = np.asarray([[0, 1, 2], [2, 3, 4], [4, 5, 6]])
        out = render_video(verts, str(tmp_path / "mesh.gif"), fps=4,
                           faces=faces)
        assert os.path.exists(out) and os.path.getsize(out) > 0


def test_padded_chunk_lane_never_wins():
    """With a chunk size that forces zero-padded face lanes in the scan,
    the padded (degenerate, area-0) faces must not beat real geometry and
    depth order must hold across chunk boundaries."""
    verts = np.asarray([
        [-0.8, -0.8, 0.0], [0.8, -0.8, 0.0], [0.0, 0.9, 0.0],
        [-0.8, -0.8, 0.5], [0.8, -0.8, 0.5], [0.0, 0.9, 0.5],
        [-0.2, -0.2, -0.9], [0.2, -0.2, -0.9], [0.0, 0.2, -0.9],
    ], np.float32)
    faces = np.asarray([[0, 1, 2], [3, 4, 5], [6, 7, 8]])
    colors = np.eye(3, dtype=np.float32)
    img = rasterize_mesh(verts, faces, colors, resolution=(64, 64), chunk=2)
    c = img[40, 32]
    assert c[1] > c[0] and c[1] > c[2]  # nearest (green, z=0.5) wins
    assert (img[1, 1] == 255).all()
