"""Body model / LBS tests.

Golden reference: an independent, naive numpy LBS (sequential 4x4 homogeneous
chain, per-vertex loop-free skinning) written here from the SMPL equations —
validating the level-parallel/fused production implementation against
straight-line math rather than against itself.
"""

import jax
import jax.numpy as jnp
import numpy as np

from regennet_tpu.ops import body_model as bm
from regennet_tpu.ops import lbs, rotations as geo
from regennet_tpu.ops import pose_decode


def naive_lbs(model, rotmats, betas=None):
    """Straight-line numpy LBS: returns (joints [B,J,3], verts [B,V,3])."""
    rotmats = np.asarray(rotmats, dtype=np.float64)
    B, J = rotmats.shape[:2]
    v_t = np.asarray(model.v_template, np.float64)
    if betas is not None:
        v_t = v_t[None] + np.einsum(
            "vcn,bn->bvc", np.asarray(model.shapedirs, np.float64), betas
        )
    else:
        v_t = np.broadcast_to(v_t[None], (B,) + v_t.shape)
    rest = np.einsum("jv,bvc->bjc", np.asarray(model.j_regressor, np.float64), v_t)

    parents = model.parents
    A = np.zeros((B, J, 4, 4))
    for b in range(B):
        for j in range(J):
            local = np.eye(4)
            local[:3, :3] = rotmats[b, j]
            if j == 0:
                local[:3, 3] = rest[b, 0]
                A[b, j] = local
            else:
                local[:3, 3] = rest[b, j] - rest[b, parents[j]]
                A[b, j] = A[b, parents[j]] @ local
    joints = A[:, :, :3, 3].copy()

    # relative transforms for skinning
    pose_feat = (rotmats[:, 1:] - np.eye(3)).reshape(B, -1)
    offsets = np.einsum(
        "bp,pk->bk", pose_feat, np.asarray(model.posedirs, np.float64)
    ).reshape(B, -1, 3)
    v_posed = v_t + offsets
    W = np.asarray(model.lbs_weights, np.float64)
    verts = np.zeros((B, W.shape[0], 3))
    for b in range(B):
        for j in range(J):
            rel = A[b, j].copy()
            rel[:3, 3] -= rel[:3, :3] @ rest[b, j]
            pts = v_posed[b] @ rel[:3, :3].T + rel[:3, 3]
            verts[b] += W[:, j : j + 1] * pts
    return joints, verts


def _random_pose(key, B, J, scale=0.6):
    aa = jax.random.normal(key, (B, J, 3)) * scale
    return geo.axis_angle_to_matrix(aa)


def test_joints_match_naive_smplx():
    model = bm.synthetic("smplx", num_vertices=64)
    rot = _random_pose(jax.random.PRNGKey(0), 3, model.num_joints)
    ours = np.asarray(lbs.joints(model, rot))
    golden, _ = naive_lbs(model, rot)
    np.testing.assert_allclose(ours, golden, atol=1e-4)


def test_joints_match_naive_smpl_with_betas():
    model = bm.synthetic("smpl", num_vertices=64)
    B = 2
    rot = _random_pose(jax.random.PRNGKey(1), B, model.num_joints)
    betas = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (B, 10))) * 0.5
    ours = np.asarray(lbs.joints(model, rot, jnp.asarray(betas)))
    golden, _ = naive_lbs(model, rot, betas)
    np.testing.assert_allclose(ours, golden, atol=1e-4)


def test_vertices_match_naive():
    model = bm.synthetic("smplx", num_vertices=48)
    rot = _random_pose(jax.random.PRNGKey(3), 2, model.num_joints)
    ours = np.asarray(lbs.vertices(model, rot))
    _, golden = naive_lbs(model, rot)
    np.testing.assert_allclose(ours, golden, atol=1e-4)


def test_virtual_vertex_anchor():
    # the synthetic model rigidly skins one virtual vertex to each joint;
    # the kinematic fast path must agree with full vertex skinning there
    model = bm.synthetic("smplx", num_vertices=32)
    rot = _random_pose(jax.random.PRNGKey(4), 2, model.num_joints)
    kin = np.asarray(lbs.joints(model, rot))
    verts = np.asarray(lbs.vertices(model, rot))
    anchors = verts[:, -model.num_joints :]
    np.testing.assert_allclose(kin, anchors, atol=2e-3)


def test_identity_pose_is_rest_pose():
    model = bm.synthetic("smplx", num_vertices=32)
    eye = jnp.broadcast_to(jnp.eye(3), (1, model.num_joints, 3, 3))
    j = np.asarray(lbs.joints(model, eye))[0]
    rest = np.asarray(lbs.shaped_rest_joints(model, None))[0]
    np.testing.assert_allclose(j, rest, atol=1e-5)


def test_extended_joints_smpl_shape():
    model = bm.synthetic("smpl", num_vertices=64)
    rot = _random_pose(jax.random.PRNGKey(5), 2, model.num_joints)
    ext = lbs.extended_joints(model, rot)
    assert ext.shape == (2, 24 + 21 + 9, 3)


class TestPoseDecode:
    def _x(self, key, B=2, V=56, F=6, T=5, num_person=1):
        return jax.random.normal(key, (B, V, F * num_person, T)) * 0.5

    def test_shapes_single_person(self):
        model = bm.synthetic("smplx", num_vertices=32)
        x = self._x(jax.random.PRNGKey(6))
        out = pose_decode.rot2xyz(x, None, model, jointstype="smplx")
        assert out.shape == (2, 55, 3, 5)

    def test_shapes_two_person(self):
        model = bm.synthetic("smplx", num_vertices=32)
        x = self._x(jax.random.PRNGKey(7), num_person=2)
        out = pose_decode.rot2xyz(
            x, None, model, jointstype="smplx", num_person=2, vertstrans=True
        )
        assert out.shape == (2, 55, 6, 5)

    def test_root_centered(self):
        model = bm.synthetic("smplx", num_vertices=32)
        x = self._x(jax.random.PRNGKey(8))
        out = pose_decode.rot2xyz(x, None, model, jointstype="smplx")
        np.testing.assert_allclose(np.asarray(out[:, 0]), 0.0, atol=1e-5)

    def test_mask_zeroes_invalid_frames(self):
        model = bm.synthetic("smplx", num_vertices=32)
        x = self._x(jax.random.PRNGKey(9))
        mask = jnp.asarray([[True] * 3 + [False] * 2, [True] * 5])
        out = pose_decode.rot2xyz(x, mask, model, jointstype="smplx")
        np.testing.assert_allclose(np.asarray(out[0, :, :, 3:]), 0.0, atol=1e-6)
        assert np.abs(np.asarray(out[1, 1:, :, 3:])).max() > 0

    def test_vertstrans_adds_translation(self):
        model = bm.synthetic("smplx", num_vertices=32)
        x = self._x(jax.random.PRNGKey(10))
        base = pose_decode.rot2xyz(x, None, model, jointstype="smplx")
        trans = pose_decode.rot2xyz(
            x, None, model, jointstype="smplx", vertstrans=True
        )
        # single person: translations re-based to first frame
        x_tr = np.asarray(x[:, -1, :3, :])
        x_tr = x_tr - x_tr[:, :, :1]
        np.testing.assert_allclose(
            np.asarray(trans - base), np.broadcast_to(x_tr[:, None], trans.shape),
            atol=1e-5,
        )

    def test_xyz_passthrough(self):
        model = bm.synthetic("smplx", num_vertices=32)
        x = self._x(jax.random.PRNGKey(11))
        out = pose_decode.rot2xyz(x, None, model, pose_rep="xyz")
        assert out is x

    def test_jit_compiles(self):
        model = bm.synthetic("smplx", num_vertices=32)
        x = self._x(jax.random.PRNGKey(12))
        fn = jax.jit(
            lambda x: pose_decode.rot2xyz(x, None, model, jointstype="smplx")
        )
        out = fn(x)
        assert out.shape == (2, 55, 3, 5)


def test_body_model_pytree_roundtrip():
    model = bm.synthetic("smplx", num_vertices=16)
    leaves, treedef = jax.tree_util.tree_flatten(model)
    model2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert model2.name == "smplx"
    assert model2.num_joints == 55
