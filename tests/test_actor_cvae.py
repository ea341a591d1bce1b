"""ACTOR CVAE baseline: shapes, ELBO descent, class-conditional sampling."""

import jax
import jax.numpy as jnp
import pytest
import numpy as np
import optax

from regennet_tpu.models.actor_cvae import ActorCVAE, cvae_losses

B, J, F, T = 4, 25, 6, 12


def _build():
    model = ActorCVAE(
        njoints=J, nfeats=F, num_actions=5, latent_dim=32, ff_size=64,
        num_layers=2, num_heads=2, dropout=0.0,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (B, J, F, T)) * 0.3
    action = jnp.asarray([0, 1, 2, 3])
    variables = model.init(jax.random.PRNGKey(1), x, action)
    return model, variables, x, action


def test_forward_shapes():
    model, variables, x, action = _build()
    out = model.apply(variables, x, action, rng=jax.random.PRNGKey(2))
    assert out["output"].shape == (B, J, F, T)
    assert out["mu"].shape == (B, 32)
    assert np.isfinite(np.asarray(out["output"])).all()


def test_generation_is_action_conditional():
    model, variables, x, action = _build()
    rng = jax.random.PRNGKey(3)
    z = jax.random.normal(rng, (2, 32))
    a1 = model.apply(variables, z, jnp.asarray([0, 0]), T, method=model.decode)
    a2 = model.apply(variables, z, jnp.asarray([4, 4]), T, method=model.decode)
    assert np.abs(np.asarray(a1 - a2)).max() > 1e-4


def test_elbo_descends():
    model, variables, x, action = _build()
    params = variables["params"]
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, rng):
        def loss_fn(p):
            out = model.apply({"params": p}, x, action, rng=rng, train=False)
            return cvae_losses(out, x)["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = jax.random.PRNGKey(4)
    losses = []
    for i in range(60):
        rng, srng = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, srng)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])


class TestArchVariants:
    """fc / gru encoder-decoder families (reference ARCHINAMES)."""

    @pytest.mark.parametrize("arch", ["fc", "gru"])
    def test_forward_and_generate(self, arch):
        from regennet_tpu.models.actor_cvae import ActorCVAE, cvae_losses

        T = 10
        model = ActorCVAE(njoints=8, nfeats=6, num_actions=4, latent_dim=32,
                          ff_size=64, num_layers=1, num_heads=2, arch=arch,
                          num_frames=T, num_gru_layers=2)
        x = jax.random.normal(jax.random.PRNGKey(0), (3, 8, 6, T))
        action = jnp.asarray([0, 1, 3], jnp.int32)
        variables = model.init(jax.random.PRNGKey(1), x, action,
                               rng=jax.random.PRNGKey(2))
        out = model.apply(variables, x, action, rng=jax.random.PRNGKey(3))
        assert out["output"].shape == x.shape
        assert out["mu"].shape == (3, 32)
        losses = cvae_losses(out, x)
        assert np.isfinite(float(losses["loss"]))

        gen = model.generate(variables, action, T, jax.random.PRNGKey(4))
        assert gen.shape == x.shape
        assert np.isfinite(np.asarray(gen)).all()

    def test_fc_trains(self):
        import optax

        from regennet_tpu.models.actor_cvae import ActorCVAE, cvae_losses

        T = 8
        model = ActorCVAE(njoints=4, nfeats=6, num_actions=2, latent_dim=16,
                          arch="fc", num_frames=T)
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 6, T)) * 0.1
        action = jnp.zeros((8,), jnp.int32)
        variables = model.init(jax.random.PRNGKey(1), x, action,
                               rng=jax.random.PRNGKey(2))
        params = variables["params"]
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state, rng):
            def loss_fn(p):
                out = model.apply({"params": p}, x, action, rng=rng)
                return cvae_losses(out, x)["loss"]
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        losses = []
        for i in range(30):
            params, opt_state, loss = step(params, opt_state,
                                           jax.random.PRNGKey(i))
            losses.append(float(loss))
        assert losses[-1] < losses[0]


class TestArchFamilies:
    """grutrans/transgru recombinations + the autotrans AR decoder
    (reference: architectures/{grutrans,transgru,autotrans}.py)."""

    def _model(self, arch, **kw):
        from regennet_tpu.models.actor_cvae import ActorCVAE

        return ActorCVAE(
            njoints=J, nfeats=F, num_actions=5, latent_dim=32, ff_size=64,
            num_layers=1, num_heads=2, dropout=0.0, num_gru_layers=1,
            arch=arch, num_frames=T, **kw,
        )

    @pytest.mark.parametrize("arch", ["grutrans", "transgru", "autotrans"])
    def test_forward_shapes(self, arch):
        model = self._model(arch)
        x = jax.random.normal(jax.random.PRNGKey(0), (B, J, F, T)) * 0.3
        action = jnp.asarray([0, 1, 2, 3])
        variables = model.init(jax.random.PRNGKey(1), x, action)
        out = model.apply(variables, x, action, rng=jax.random.PRNGKey(2))
        assert out["output"].shape == (B, J, F, T)
        assert np.isfinite(np.asarray(out["output"])).all()

    def test_autotrans_generation_is_self_consistent(self):
        """AR generation is a fixed point of the teacher-forced decode:
        re-decoding with the generated frames as teacher reproduces them."""
        model = self._model("autotrans")
        x = jax.random.normal(jax.random.PRNGKey(0), (B, J, F, T)) * 0.3
        action = jnp.asarray([0, 1, 2, 3])
        variables = model.init(jax.random.PRNGKey(1), x, action)
        z = jax.random.normal(jax.random.PRNGKey(3), (B, 32))
        gen = model.generate_autoregressive(variables, z, action, T)
        redecode = model.apply(
            variables, z, action, T, method=model.decode, x_teacher=gen
        )
        np.testing.assert_allclose(
            np.asarray(gen), np.asarray(redecode), atol=1e-4
        )

    def test_autotrans_teacher_forcing_uses_shifted_frames(self):
        """Changing future GT frames must not affect earlier outputs
        (causal masking over the shifted teacher sequence)."""
        model = self._model("autotrans")
        x = jax.random.normal(jax.random.PRNGKey(0), (B, J, F, T)) * 0.3
        action = jnp.asarray([0, 1, 2, 3])
        variables = model.init(jax.random.PRNGKey(1), x, action)
        z = jax.random.normal(jax.random.PRNGKey(3), (B, 32))
        out1 = model.apply(variables, z, action, T, method=model.decode,
                           x_teacher=x)
        x2 = x.at[:, :, :, -1].set(99.0)
        out2 = model.apply(variables, z, action, T, method=model.decode,
                           x_teacher=x2)
        np.testing.assert_allclose(
            np.asarray(out1[..., :-1]), np.asarray(out2[..., :-1]), atol=1e-5
        )
