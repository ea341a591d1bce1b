"""Conditional motion GAN — the adversarial generative baseline family.

Capability parity with the vendored ACTOR GAN/KGAN model types the
reference carries for baseline comparisons (reference:
actor-x/src/models/modeltype/gan.py + kgan.py): a class-conditional motion
GAN trained with hinge losses (gan.py:21-28), alternating D/G updates with
a `repeat_D` schedule (gan.py:384,414), separate Adam optimisers with a
discriminator lr multiplier and (beta1, 0.999) betas (gan.py:126-138), the
full structured-noise family including multi-scale Gaussian-process noise
(gan.py:276-347), normal(0, 0.02) weight init (gan.py:30-52), and
per-class sample dumps keyed 'A###_i' (gan.py:142-160).

The reference's generator/discriminator classes are loaded dynamically
from external yaml configs that are not in its tree (gan.py:115-117 via
torchlight import_class), so the architectures here are self-contained
TPU-friendly equivalents: a token-upsampling transformer generator and a
projection-conditional discriminator (logit = psi(f(x)) + <phi(y), f(x)>),
both built from the shared transformer blocks.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from regennet_tpu.models import transformer as tfm

_GAN_INIT = nn.initializers.normal(0.02)  # reference weights_init


class Generator(nn.Module):
    """noise [B, Z, P, NN] + label [B] -> motion [B, V, C, T]."""

    njoints: int
    nfeats: int
    num_actions: int
    num_frames: int
    latent_dim: int = 256
    ff_size: int = 512
    num_layers: int = 2
    num_heads: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, noise, label, train: bool = False):
        B = noise.shape[0]
        NN = noise.shape[-1]
        # noise tokens: [B, NN, Z*P]
        tokens = noise.reshape(B, -1, NN).transpose(0, 2, 1)
        h = nn.Dense(self.latent_dim, kernel_init=_GAN_INIT, dtype=self.dtype,
                     name="noise_embed")(tokens)
        table = self.param(
            "label_embedding", _GAN_INIT, (self.num_actions, self.latent_dim)
        )
        h = h + jnp.asarray(table)[label][:, None, :].astype(h.dtype)
        h = h + tfm.sinusoidal_table(max(NN, 1), self.latent_dim)[None].astype(
            h.dtype
        )
        h = tfm.Encoder(
            self.num_layers, self.num_heads, self.latent_dim, self.ff_size,
            0.0, tfm.gelu_exact, self.dtype, name="encoder",
        )(h, None, deterministic=not train)
        # temporal upsample: NN noise tokens -> T frames (linear)
        h = jax.image.resize(
            h, (B, self.num_frames, self.latent_dim), method="linear"
        )
        out = nn.Dense(
            self.njoints * self.nfeats, kernel_init=_GAN_INIT,
            name="output_head",
        )(h.astype(jnp.float32))
        out = out.reshape(B, self.num_frames, self.njoints, self.nfeats)
        return out.transpose(0, 2, 3, 1)  # [B, V, C, T]


class Discriminator(nn.Module):
    """Projection-conditional discriminator: motion + label -> logit [B]."""

    njoints: int
    nfeats: int
    num_actions: int
    latent_dim: int = 256
    ff_size: int = 512
    num_layers: int = 2
    num_heads: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, motion, label, train: bool = False):
        B, V, C, T = motion.shape
        x = motion.transpose(0, 3, 1, 2).reshape(B, T, V * C)
        h = nn.Dense(self.latent_dim, kernel_init=_GAN_INIT, dtype=self.dtype,
                     name="frame_embed")(x.astype(self.dtype))
        h = h + tfm.sinusoidal_table(T, self.latent_dim)[None].astype(h.dtype)
        h = tfm.Encoder(
            self.num_layers, self.num_heads, self.latent_dim, self.ff_size,
            0.0, tfm.gelu_exact, self.dtype, name="encoder",
        )(h, None, deterministic=not train)
        feat = jnp.mean(h.astype(jnp.float32), axis=1)  # [B, D]
        psi = nn.Dense(1, kernel_init=_GAN_INIT, name="psi")(feat)[:, 0]
        phi = self.param(
            "label_projection", _GAN_INIT, (self.num_actions, self.latent_dim)
        )
        proj = jnp.sum(jnp.asarray(phi)[label] * feat, axis=-1)
        return psi + proj


def loss_hinge_dis(dis_fake, dis_real):
    """reference: actor-x/src/models/modeltype/gan.py:21-24."""
    loss_real = jnp.mean(nn.relu(1.0 - dis_real))
    loss_fake = jnp.mean(nn.relu(1.0 + dis_fake))
    return loss_real, loss_fake


def loss_hinge_gen(dis_fake):
    """reference: actor-x/src/models/modeltype/gan.py:27-29."""
    return -jnp.mean(dis_fake)


def _rbf_cov(scale: float, length: int, level: int = 2) -> np.ndarray:
    """reference: actor-x/src/models/modeltype/gan.py:276-281."""
    i = np.tile(np.arange(length), (length, 1))
    r = np.abs(i - i.T)
    return np.exp(-((r / scale) ** level))


def gen_noise(rng: np.random.Generator, N: int, NN: int, Z: int,
              lambda_noise: float = 1.0, mode: str = "independent",
              length_scale: float = 10.0, n_person: int = 1) -> np.ndarray:
    """Structured noise family (reference: gan.py:284-347), host-side numpy
    like the reference (GP modes need multivariate sampling)."""
    if mode == "independent":
        return rng.normal(size=(N, Z, 1, NN)).astype(np.float32)
    if mode == "independent_2":
        return rng.normal(size=(N, Z, 2, NN)).astype(np.float32)
    if mode == "independent_3":
        n = rng.normal(size=(N, Z, 1, NN)).astype(np.float32)
        return np.concatenate([n, n], axis=2)
    if mode == "constant":
        n = rng.normal(size=(N, Z, 1, 1)).astype(np.float32)
        return np.broadcast_to(n, (N, Z, 1, NN)).copy()
    if mode == "gaussian":
        return rng.normal(size=(N, Z)).astype(np.float32)
    if mode in ("gp", "multi_gp", "gp_single_scale"):
        persons = n_person if mode == "multi_gp" else 1
        noise = []
        for c in range(Z):
            scale = (
                length_scale if mode == "gp_single_scale"
                else length_scale * (c + 1) / Z
            )
            cov = _rbf_cov(scale, NN, level=2)
            n = lambda_noise * rng.multivariate_normal(
                np.zeros(NN), cov, size=(N, persons)
            )
            noise.append(n)
        out = np.stack(noise, 1).astype(np.float32)
        assert out.shape == (N, Z, persons, NN)
        return out
    raise ValueError(f"noise mode {mode} not supported")


def make_optimizers(base_lr: float, d_lr_mult: float, beta1: float,
                    weight_decay: float):
    """reference: gan.py:126-138 — Adam(beta1, 0.999) with D lr multiplier."""
    opt_d = optax.adamw(base_lr * d_lr_mult, b1=beta1, b2=0.999,
                        weight_decay=weight_decay)
    opt_g = optax.adamw(base_lr, b1=beta1, b2=0.999,
                        weight_decay=weight_decay)
    return opt_d, opt_g


def gradient_penalty(D: Discriminator, params_d, real, fake, labels, rng):
    """WGAN-GP penalty on random real/fake interpolates
    (reference: kgan.py:309-329)."""
    alpha = jax.random.uniform(
        rng, (real.shape[0],) + (1,) * (real.ndim - 1), real.dtype
    )
    inter = alpha * real + (1.0 - alpha) * fake

    def d_sum(x):
        return jnp.sum(D.apply({"params": params_d}, x, labels))

    grads = jax.grad(d_sum)(inter)
    norms = jnp.sqrt(
        jnp.sum(grads.reshape(real.shape[0], -1) ** 2, axis=1) + 1e-12
    )
    return jnp.mean((norms - 1.0) ** 2)


def make_gan_steps(G: Generator, D: Discriminator, opt_d, opt_g,
                   loss_mode: str = "hinge", lambda_gp: float = 10.0):
    """Jitted alternating GAN steps.

    loss_mode 'hinge' mirrors the GAN model type (reference forward:
    gan.py:350-440); 'wgan-gp' mirrors KGAN (Wasserstein critic with
    gradient penalty, kgan.py:332-392). d_step: D sees real (x, y) and
    G(noise, y_fake) with G frozen. g_step: G maximises D(G(noise,
    y_fake)) with D frozen.
    """
    if loss_mode not in ("hinge", "wgan-gp"):
        raise ValueError(f"unknown loss_mode {loss_mode}")

    @jax.jit
    def d_step(params_d, opt_state_d, params_g, x, y, noise, y_fake, rng):
        fake = G.apply({"params": params_g}, noise, y_fake)

        def loss_fn(pd):
            dis_real = D.apply({"params": pd}, x, y)
            dis_fake = D.apply({"params": pd}, fake, y_fake)
            if loss_mode == "hinge":
                loss_real, loss_fake = loss_hinge_dis(dis_fake, dis_real)
                loss = loss_real + loss_fake
            else:
                loss_real = -jnp.mean(dis_real)
                loss_fake = jnp.mean(dis_fake)
                gp = gradient_penalty(D, pd, x, fake, y_fake, rng)
                loss = loss_real + loss_fake + lambda_gp * gp
            metrics = {
                "lossD": loss,
                "lossD_real": loss_real,
                "lossD_fake": loss_fake,
                "accD_real": jnp.mean((dis_real > 0).astype(jnp.float32)),
                "accD_fake": jnp.mean((dis_fake < 0).astype(jnp.float32)),
            }
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params_d
        )
        updates, opt_state_d = opt_d.update(grads, opt_state_d, params_d)
        params_d = optax.apply_updates(params_d, updates)
        return params_d, opt_state_d, metrics

    @jax.jit
    def g_step(params_g, opt_state_g, params_d, noise, y_fake):
        def loss_fn(pg):
            fake = G.apply({"params": pg}, noise, y_fake)
            dis_fake = D.apply({"params": params_d}, fake, y_fake)
            loss = loss_hinge_gen(dis_fake)  # == -mean(D(fake)), both modes
            metrics = {
                "lossG": loss,
                "accG": jnp.mean((dis_fake > 0).astype(jnp.float32)),
            }
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params_g
        )
        updates, opt_state_g = opt_g.update(grads, opt_state_g, params_g)
        params_g = optax.apply_updates(params_g, updates)
        return params_g, opt_state_g, metrics

    return d_step, g_step


def gen_samples_per_class(G: Generator, params_g, num_classes: int,
                          out_path: str, noise_cfg: Dict, per_class: int = 100,
                          seed: int = 0) -> None:
    """Per-class generation dump, same h5 key scheme as the reference
    ('A{class+1:03d}_{index}', gan.py:142-160)."""
    import h5py

    rng = np.random.default_rng(seed)
    apply = jax.jit(lambda n, l: G.apply({"params": params_g}, n, l))
    with h5py.File(out_path, "w") as f:
        for c in range(num_classes):
            noise = jnp.asarray(gen_noise(rng, per_class, **noise_cfg))
            label = jnp.full((per_class,), c, jnp.int32)
            out = np.asarray(apply(noise, label))
            for i in range(per_class):
                f[f"A{c + 1:03d}_{i}"] = out[i]
