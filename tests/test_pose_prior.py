"""SMPLify pose prior tests: GMM max-mixture + angle priors, incl. golden
parity against the reference MaxMixturePrior/angle_prior executing on a
fabricated mixture file."""

import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from regennet_tpu.visualize.pose_prior import (
    angle_prior,
    gmm_neg_log_likelihood,
    gmof,
    load_gmm_prior,
    make_pose_prior_fn,
    synthetic_gmm_prior,
)

from tests.reference_harness import load_reference, reference_available

D = 69  # SMPL body pose: 23 joints x 3 axis-angle


@pytest.mark.fast
def test_gmm_prior_rejects_hyperextension_l2_cannot():
    """The load-bearing property the L2 prior lacks (VERDICT round 1): a
    knee bent the anatomically impossible way must cost much more than the
    same-magnitude natural bend. L2 scores them identically."""
    natural = np.zeros((1, D), np.float32)
    natural[0, 52] = -2.0  # knee flexion (sign -1 is the natural direction)
    impossible = np.zeros((1, D), np.float32)
    impossible[0, 52] = +2.0  # hyper-extension

    l2 = make_pose_prior_fn("l2", D)
    assert float(l2(jnp.asarray(natural))[0]) == pytest.approx(
        float(l2(jnp.asarray(impossible))[0])
    )

    gmm = make_pose_prior_fn("gmm", D)
    cost_nat = float(gmm(jnp.asarray(natural))[0])
    cost_imp = float(gmm(jnp.asarray(impossible))[0])
    assert cost_imp > cost_nat * 2, (cost_nat, cost_imp)


@pytest.mark.fast
def test_synthetic_gmm_nll_grows_away_from_rest():
    prior = synthetic_gmm_prior(D)
    rest = jnp.zeros((1, D))
    near = jnp.full((1, D), 0.1)
    far = jnp.full((1, D), 1.5)
    nll = lambda p: float(gmm_neg_log_likelihood(prior, p)[0])
    assert nll(rest) < nll(near) < nll(far)


@pytest.mark.fast
def test_gmof_matches_closed_form():
    x = jnp.asarray([-3.0, 0.0, 0.5, 200.0])
    out = np.asarray(gmof(x, 100.0))
    expected = (100.0**2 * np.asarray(x) ** 2) / (
        100.0**2 + np.asarray(x) ** 2
    )
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def _fake_gmm_dict(M=4, dim=D, seed=0):
    rng = np.random.default_rng(seed)
    means = 0.2 * rng.standard_normal((M, dim))
    covs = []
    for _ in range(M):
        a = rng.standard_normal((dim, dim)) * 0.02
        covs.append(a @ a.T + 0.25 * np.eye(dim))
    weights = rng.random(M)
    weights = weights / weights.sum()
    return {
        "means": means.astype(np.float64),
        "covars": np.stack(covs).astype(np.float64),
        "weights": weights.astype(np.float64),
    }


@pytest.mark.fast
def test_load_gmm_prior_pkl_roundtrip(tmp_path):
    gmm = _fake_gmm_dict()
    path = tmp_path / "gmm_04.pkl"
    with open(path, "wb") as f:
        pickle.dump(gmm, f)
    prior = load_gmm_prior(str(path))
    assert prior.dim == D
    # spot-check the normalised nll weights against the reference formula
    sqrdets = np.sqrt(np.linalg.det(gmm["covars"]))
    expected = gmm["weights"] / (
        (2 * np.pi) ** (D / 2.0) * (sqrdets / sqrdets.min())
    )
    np.testing.assert_allclose(
        np.asarray(prior.nll_weights), expected.astype(np.float32), rtol=1e-5
    )


@pytest.mark.skipif(not reference_available(), reason="no /root/reference")
def test_gmm_prior_matches_reference_maxmixture(tmp_path):
    """Golden: our merged NLL equals the reference MaxMixturePrior
    (reference prior.py:180-195) on the same mixture file."""
    torch = pytest.importorskip("torch")
    load_reference()  # sys.path + numpy shims
    from visualize.joints2smpl.src.prior import MaxMixturePrior

    gmm = _fake_gmm_dict(M=8)
    with open(tmp_path / "gmm_08.pkl", "wb") as f:
        pickle.dump(gmm, f)

    ref_prior = MaxMixturePrior(prior_folder=str(tmp_path), num_gaussians=8,
                                use_merged=True)
    ours = load_gmm_prior(str(tmp_path / "gmm_08.pkl"))

    rng = np.random.default_rng(5)
    pose = rng.normal(scale=0.5, size=(6, D)).astype(np.float32)
    betas = np.zeros((6, 10), np.float32)
    ref_nll = ref_prior(torch.tensor(pose), torch.tensor(betas)).numpy()
    our_nll = np.asarray(gmm_neg_log_likelihood(ours, jnp.asarray(pose)))
    np.testing.assert_allclose(our_nll, ref_nll, rtol=2e-4)


@pytest.mark.skipif(not reference_available(), reason="no /root/reference")
def test_angle_prior_matches_reference(tmp_path):
    torch = pytest.importorskip("torch")
    load_reference()
    from visualize.joints2smpl.src.customloss import angle_prior as ref_angle

    rng = np.random.default_rng(6)
    pose = rng.normal(scale=0.8, size=(4, D)).astype(np.float32)
    theirs = ref_angle(torch.tensor(pose)).numpy()
    ours = np.asarray(angle_prior(jnp.asarray(pose)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_fit_sequence_with_gmm_prior_converges():
    from regennet_tpu.ops import body_model as bm, lbs, rotations as geo
    from regennet_tpu.visualize.joints2smpl import fit_sequence

    model = bm.synthetic("smpl", num_vertices=16)
    T = 2
    gt_aa = jax.random.normal(jax.random.PRNGKey(0), (T, 24, 3)) * 0.15
    gt_rot = geo.axis_angle_to_matrix(gt_aa)
    gt_joints = np.asarray(lbs.joints(model, gt_rot))
    gt_joints = gt_joints - gt_joints[:, :1]

    result = fit_sequence(model, gt_joints, num_steps=150, lr=0.05,
                          w_smooth=0.0, pose_prior="gmm")
    fitted_rot = geo.rotation_6d_to_matrix(jnp.asarray(result["pose6d"]))
    fitted = np.asarray(lbs.joints(model, fitted_rot))
    fitted = fitted - fitted[:, :1]
    rmse = np.sqrt(np.mean((fitted - gt_joints) ** 2))
    assert rmse < 0.08, rmse
    assert result["losses"][-1] < result["losses"][0]
