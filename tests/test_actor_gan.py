"""Conditional motion GAN baseline: noise family, hinge steps, CLI."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regennet_tpu.data import synthetic
from regennet_tpu.models.actor_gan import (
    Discriminator,
    Generator,
    gen_noise,
    loss_hinge_dis,
    loss_hinge_gen,
    make_gan_steps,
    make_optimizers,
)


@pytest.fixture(scope="module")
def data_path(tmp_path_factory):
    root = tmp_path_factory.mktemp("gands")
    return synthetic.make_dataset_pair(str(root), "chi3d", num_clips=8)


class TestNoise:
    def test_modes_shapes(self):
        rng = np.random.default_rng(0)
        assert gen_noise(rng, 4, 8, 3).shape == (4, 3, 1, 8)
        assert gen_noise(rng, 4, 8, 3, mode="independent_2").shape == (4, 3, 2, 8)
        n3 = gen_noise(rng, 4, 8, 3, mode="independent_3")
        assert n3.shape == (4, 3, 2, 8)
        np.testing.assert_array_equal(n3[:, :, 0], n3[:, :, 1])
        nc = gen_noise(rng, 4, 8, 3, mode="constant")
        assert nc.shape == (4, 3, 1, 8)
        np.testing.assert_array_equal(nc[..., 0], nc[..., 7])
        assert gen_noise(rng, 4, 8, 3, mode="gaussian").shape == (4, 3)
        assert gen_noise(rng, 4, 8, 3, mode="gp").shape == (4, 3, 1, 8)
        assert gen_noise(
            rng, 4, 8, 3, mode="multi_gp", n_person=2
        ).shape == (4, 3, 2, 8)
        with pytest.raises(ValueError):
            gen_noise(rng, 4, 8, 3, mode="bogus")

    def test_gp_noise_is_smooth(self):
        """GP noise with a large length scale varies less frame-to-frame
        than independent noise (that is its purpose: smooth latent paths)."""
        rng = np.random.default_rng(0)
        gp = gen_noise(rng, 64, 32, 2, mode="gp", length_scale=20.0)
        ind = gen_noise(rng, 64, 32, 2, mode="independent")
        dgp = np.abs(np.diff(gp, axis=-1)).mean()
        dind = np.abs(np.diff(ind, axis=-1)).mean()
        assert dgp < dind * 0.5


class TestHinge:
    def test_hinge_values(self):
        real = jnp.asarray([2.0, 0.5])
        fake = jnp.asarray([-2.0, 0.5])
        lr, lf = loss_hinge_dis(fake, real)
        assert float(lr) == pytest.approx(0.25)  # mean(relu(1-[2,.5]))
        assert float(lf) == pytest.approx(0.75)  # mean(relu(1+[-2,.5]))
        assert float(loss_hinge_gen(fake)) == pytest.approx(0.75)


class TestTraining:
    def test_steps_update_and_are_finite(self):
        V, C, T, A, B = 10, 6, 12, 4, 8
        G = Generator(njoints=V, nfeats=C, num_actions=A, num_frames=T,
                      latent_dim=32, ff_size=64, num_layers=1, num_heads=2)
        D = Discriminator(njoints=V, nfeats=C, num_actions=A, latent_dim=32,
                          ff_size=64, num_layers=1, num_heads=2)
        rng = np.random.default_rng(0)
        noise = jnp.asarray(gen_noise(rng, B, 6, 4))
        label = jnp.zeros((B,), jnp.int32)
        x = jnp.asarray(rng.normal(size=(B, V, C, T)), jnp.float32)
        params_g = G.init(jax.random.PRNGKey(0), noise, label)["params"]
        params_d = D.init(jax.random.PRNGKey(1), x, label)["params"]
        opt_d, opt_g = make_optimizers(1e-3, 4.0, 0.5, 0.0)
        d_step, g_step = make_gan_steps(G, D, opt_d, opt_g)
        os_d, os_g = opt_d.init(params_d), opt_g.init(params_g)

        pd0 = jax.tree_util.tree_leaves(params_d)[0].copy()
        pg0 = jax.tree_util.tree_leaves(params_g)[0].copy()
        for i in range(3):
            y_fake = jnp.asarray(rng.integers(0, A, B), jnp.int32)
            params_d, os_d, md = d_step(params_d, os_d, params_g, x, label,
                                        noise, y_fake, jax.random.PRNGKey(i))
            params_g, os_g, mg = g_step(params_g, os_g, params_d, noise,
                                        y_fake)
        assert np.isfinite(float(md["lossD"]))
        assert np.isfinite(float(mg["lossG"]))
        assert np.abs(
            np.asarray(jax.tree_util.tree_leaves(params_d)[0]) - pd0
        ).max() > 0
        assert np.abs(
            np.asarray(jax.tree_util.tree_leaves(params_g)[0]) - pg0
        ).max() > 0

    def test_generator_shape(self):
        G = Generator(njoints=25, nfeats=6, num_actions=8, num_frames=20,
                      latent_dim=32, ff_size=64, num_layers=1, num_heads=2)
        rng = np.random.default_rng(0)
        noise = jnp.asarray(gen_noise(rng, 3, 6, 4, mode="gp"))
        label = jnp.asarray([0, 3, 7], jnp.int32)
        params = G.init(jax.random.PRNGKey(0), noise, label)["params"]
        out = G.apply({"params": params}, noise, label)
        assert out.shape == (3, 25, 6, 20)
        assert np.isfinite(np.asarray(out)).all()


class TestCLI:
    def test_train_gan_end_to_end(self, data_path, tmp_path):
        from regennet_tpu.train import train_gan

        args = train_gan.parse_args([
            "--data_path", data_path, "--save_dir", str(tmp_path / "save"),
            "--num_frames", "12", "--batch_size", "4", "--num_epochs", "2",
            "--snapshot", "2", "--latent_dim", "32", "--nnoise", "4",
            "--noise_channel", "8", "--noise_mode", "independent",
            "--gen_per_class", "2",
        ])
        params_g, params_d = train_gan.main(args)
        assert params_g is not None and params_d is not None

        import h5py

        out = tmp_path / "save" / "gen_per_class.h5"
        assert out.exists()
        with h5py.File(out, "r") as f:
            keys = sorted(f.keys())
            assert keys[0] == "A001_0"
            first = f[keys[0]][()]
            # [V, C, T]: 2-person chi3d = 56 joints x (6 rot6d x 2 persons)
            assert first.shape == (56, 12, 12)


class TestWGANGP:
    def test_wgan_gp_steps(self):
        """KGAN mode: critic loss + gradient penalty, finite and updating."""
        V, C, T, A, B = 10, 6, 12, 4, 8
        G = Generator(njoints=V, nfeats=C, num_actions=A, num_frames=T,
                      latent_dim=32, ff_size=64, num_layers=1, num_heads=2)
        D = Discriminator(njoints=V, nfeats=C, num_actions=A, latent_dim=32,
                          ff_size=64, num_layers=1, num_heads=2)
        rng = np.random.default_rng(0)
        noise = jnp.asarray(gen_noise(rng, B, 6, 4))
        label = jnp.zeros((B,), jnp.int32)
        x = jnp.asarray(rng.normal(size=(B, V, C, T)), jnp.float32)
        params_g = G.init(jax.random.PRNGKey(0), noise, label)["params"]
        params_d = D.init(jax.random.PRNGKey(1), x, label)["params"]
        opt_d, opt_g = make_optimizers(1e-3, 4.0, 0.5, 0.0)
        d_step, g_step = make_gan_steps(G, D, opt_d, opt_g,
                                        loss_mode="wgan-gp", lambda_gp=10.0)
        os_d = opt_d.init(params_d)
        params_d2, os_d, md = d_step(params_d, os_d, params_g, x, label,
                                     noise, label, jax.random.PRNGKey(2))
        assert np.isfinite(float(md["lossD"]))
        assert np.abs(
            np.asarray(jax.tree_util.tree_leaves(params_d2)[0])
            - np.asarray(jax.tree_util.tree_leaves(params_d)[0])
        ).max() > 0

    def test_gradient_penalty_near_zero_for_unit_grad(self):
        """GP is ~(||grad||-1)^2: a linear D with unit-norm weights along the
        flattened input gives penalty ~0."""
        from regennet_tpu.models.actor_gan import gradient_penalty

        class UnitD:
            def apply(self, variables, x, labels):
                B = x.shape[0]
                flat = x.reshape(B, -1)
                w = jnp.ones_like(flat[0]) / jnp.sqrt(flat.shape[1] * 1.0)
                return flat @ w

        real = jnp.asarray(np.random.default_rng(0).normal(size=(4, 3, 2, 5)),
                           jnp.float32)
        fake = real * 0.5
        gp = gradient_penalty(UnitD(), {}, real, fake,
                              jnp.zeros((4,), jnp.int32), jax.random.PRNGKey(0))
        assert float(gp) < 1e-6
