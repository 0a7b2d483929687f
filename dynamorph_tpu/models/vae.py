"""VAE / IWAE / AAE latent models, TPU-native.

Behavioral spec: reference HiddenStateExtractor/vae.py:477-616 (VAE),
:619-697 (IWAE), :700-857 (AAE). Same encoder trunk family as VQVAEz16;
implementation shares blocks via models/common.py, runs NHWC, and threads
explicit PRNG keys through the stochastic paths (reparameterisation,
dropout) instead of global RNG state.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..nn import functional as F
from . import common
from .common import nchw_to_nhwc, nhwc_to_nchw


def _init_z16_encoder(ks, ni, nh, nrh, nrl, extra_out: int = 0):
    """The shared conv trunk (reference vae.py:523-537 == :273-286 + optional
    final 1x1 widening conv for VAE's mean/logstd split)."""
    bn = F.init_batch_norm
    bn1p, bn1s = bn(nh // 2)
    bn2p, bn2s = bn(nh)
    bn3p, bn3s = bn(nh)
    bn4p, bn4s = bn(nh)
    res_p, res_s = common.init_residual_block(ks[5], nh, nrh, nrl)
    params = {
        "conv0": F.init_conv(ks[0], 1, 1, ni, nh // 2),
        "conv1": F.init_conv(ks[1], 4, 4, nh // 2, nh // 2),
        "bn1": bn1p,
        "conv2": F.init_conv(ks[2], 4, 4, nh // 2, nh),
        "bn2": bn2p,
        "conv3": F.init_conv(ks[3], 4, 4, nh, nh),
        "bn3": bn3p,
        "conv4": F.init_conv(ks[4], 3, 3, nh, nh),
        "bn4": bn4p,
        "res": res_p,
    }
    state = {"bn1": bn1s, "bn2": bn2s, "bn3": bn3s, "bn4": bn4s, "res": res_s}
    if extra_out:
        params["conv5"] = F.init_conv(ks[6], 1, 1, nh, extra_out)
    return params, state


def _apply_z16_encoder(p, s, x, train: bool):
    ns = {}
    # conv0 (1x1) + conv1 (4x4 s2) fused into one conv (see common.py)
    h = common.fused_preconv_stride_conv(p["conv0"], p["conv1"], x)
    h, ns["bn1"] = F.batch_norm(p["bn1"], s["bn1"], h, train)
    h = F.relu(h)
    h = F.conv2d(p["conv2"], h, 2, 1)
    h, ns["bn2"] = F.batch_norm(p["bn2"], s["bn2"], h, train)
    h = F.relu(h)
    h = F.conv2d(p["conv3"], h, 2, 1)
    h, ns["bn3"] = F.batch_norm(p["bn3"], s["bn3"], h, train)
    h = F.relu(h)
    h = F.conv2d(p["conv4"], h, 1, 1)
    h, ns["bn4"] = F.batch_norm(p["bn4"], s["bn4"], h, train)
    h, ns["res"] = common.apply_residual_block(p["res"], s["res"], h, train)
    if "conv5" in p:
        h = F.conv2d(p["conv5"], h, 1, 0)
    return h, ns


def _init_z16_decoder(ks, ni, nh):
    """Reference vae.py:539-546 (same as VQVAEz16's decoder)."""
    return {
        "deconv0": F.init_conv_transpose(ks[0], 4, 4, nh, nh // 2),
        "deconv1": F.init_conv_transpose(ks[1], 4, 4, nh // 2, nh // 4),
        "deconv2": F.init_conv_transpose(ks[2], 4, 4, nh // 4, nh // 4),
        "conv_out": F.init_conv(ks[3], 1, 1, nh // 4, ni),
    }


def _apply_z16_decoder(p, z):
    h = F.relu(F.conv_transpose2d(p["deconv0"], z, 2, 1))
    h = F.relu(F.conv_transpose2d(p["deconv1"], h, 2, 1))
    h = F.relu(F.conv_transpose2d(p["deconv2"], h, 2, 1))
    return F.conv2d(p["conv_out"], h, 1, 0)


@dataclasses.dataclass(frozen=True)
class VAEModel:
    """Regular VAE (reference vae.py:477-616).

    Quirks preserved: reconstruction loss is a *sum* (vae.py:575), reported
    recon_loss is normalised by B*32768 (vae.py:594), time-matching loss uses
    z_mean.
    """
    num_inputs: int = 2
    num_hiddens: int = 16
    num_residual_hiddens: int = 32
    num_residual_layers: int = 2
    weight_recon: float = 1.0
    weight_kld: float = 1.0
    weight_matching: float = 0.005
    w_a: float = 1.1
    w_t: float = 0.1
    w_n: float = -0.5
    margin: float = 0.5
    channel_var: Tuple[float, ...] = (1.0, 1.0)
    # optional sharded time-matching loss (see models/vqvae.py tm_loss_fn)
    tm_loss_fn: object = None

    def init(self, key):
        ks = jax.random.split(key, 12)
        enc_p, enc_s = _init_z16_encoder(
            ks[:7], self.num_inputs, self.num_hiddens,
            self.num_residual_hiddens, self.num_residual_layers,
            extra_out=2 * self.num_hiddens)
        dec_p = _init_z16_decoder(ks[7:11], self.num_inputs, self.num_hiddens)
        return {"enc": enc_p, "dec": dec_p}, {"enc": enc_s}

    def _channel_var(self):
        return jnp.asarray(self.channel_var, jnp.float32)

    def apply(self, params, state, inputs, key, train: bool = False,
              time_matching_mat=None, batch_mask=None):
        x = nchw_to_nhwc(inputs)
        mask = nchw_to_nhwc(batch_mask) if batch_mask is not None else None
        z, enc_ns = _apply_z16_encoder(params["enc"], state["enc"], x, train)
        nh = self.num_hiddens
        z_mean, z_logstd = z[..., :nh], z[..., nh:]
        z_std = jnp.exp(0.5 * z_logstd)
        eps = jax.random.normal(key, z_std.shape, z_std.dtype)
        z_sample = z_mean + z_std * eps
        kld = -0.5 * jnp.sum(1 + z_logstd - z_mean ** 2 - jnp.exp(z_logstd))
        decoded = _apply_z16_decoder(params["dec"], z_sample)
        recon = common.masked_recon_loss(decoded, x, mask, self._channel_var(),
                                         reduction="sum")
        total = self.weight_recon * recon + self.weight_kld * kld
        tm = jnp.zeros((), jnp.float32)
        if time_matching_mat is not None:
            zf = z_mean.reshape(z_mean.shape[0], -1)
            tm_fn = self.tm_loss_fn or common.time_matching_loss
            tm = tm_fn(zf, time_matching_mat,
                       self.w_a, self.w_t, self.w_n, self.margin)
            total = total + self.weight_matching * tm
        losses = {
            "recon_loss": recon / (inputs.shape[0] * 32768),
            "KLD": kld,
            "time_matching_loss": tm,
            "total_loss": total,
            "perplexity": jnp.zeros(()),
        }
        return nhwc_to_nchw(decoded), losses, {"enc": enc_ns}

    def predict(self, params, state, inputs):
        """Deterministic path: decode z_mean (reference vae.py:600-616)."""
        x = nchw_to_nhwc(inputs)
        z, _ = _apply_z16_encoder(params["enc"], state["enc"], x, train=False)
        z_mean = z[..., : self.num_hiddens]
        decoded = _apply_z16_decoder(params["dec"], z_mean)
        recon = jnp.mean((decoded - x) ** 2 / self._channel_var())
        return nhwc_to_nchw(decoded), {"recon_loss": recon}

    def encode(self, params, state, inputs):
        x = nchw_to_nhwc(inputs)
        z, _ = _apply_z16_encoder(params["enc"], state["enc"], x, train=False)
        z_mean = z[..., : self.num_hiddens]
        return nhwc_to_nchw(z_mean), nhwc_to_nchw(z_mean), None


@dataclasses.dataclass(frozen=True)
class IWAEModel(VAEModel):
    """Importance-weighted autoencoder (reference vae.py:619-697)."""
    k: int = 5

    def apply(self, params, state, inputs, key, train: bool = False,
              time_matching_mat=None, batch_mask=None, fixed_eps=None):
        """``fixed_eps``: optional (k, B, H, W, C) NHWC noise overriding the
        random draws (deterministic evaluation / parity testing)."""
        x = nchw_to_nhwc(inputs)
        mask = nchw_to_nhwc(batch_mask) if batch_mask is not None else jnp.ones_like(x)
        z, enc_ns = _apply_z16_encoder(params["enc"], state["enc"], x, train)
        nh = self.num_hiddens
        z_mean, z_logstd = z[..., :nh], z[..., nh:]
        z_std = jnp.exp(0.5 * z_logstd)

        tm = jnp.zeros((), jnp.float32)
        if time_matching_mat is not None:
            zf = z_mean.reshape(z_mean.shape[0], -1)
            tm_fn = self.tm_loss_fn or common.time_matching_loss
            tm = tm_fn(zf, time_matching_mat,
                       self.w_a, self.w_t, self.w_n, self.margin)

        cv = self._channel_var()

        def one_sample(eps):
            zs = z_mean + z_std * eps
            decoded = _apply_z16_decoder(params["dec"], zs)
            log_p_x_z = -jnp.sum(
                ((decoded * mask - x * mask) ** 2) / cv, axis=(1, 2, 3))
            log_p_z = -jnp.sum(0.5 * zs ** 2, axis=(1, 2, 3))
            log_q_z_x = -jnp.sum(0.5 * eps ** 2 + z_logstd, axis=(1, 2, 3))
            return log_p_x_z + log_p_z - log_q_z_x, -log_p_x_z

        if fixed_eps is None:
            keys = jax.random.split(key, self.k)
            epss = jax.vmap(lambda k_i: jax.random.normal(
                k_i, z_std.shape, z_std.dtype))(keys)
        else:
            epss = jnp.asarray(fixed_eps)
        log_ws, recon_losses = jax.vmap(one_sample)(epss)   # (k, B)
        log_ws = log_ws.T                                    # (B, k)
        recon_losses = recon_losses.T
        log_ws_shift = log_ws - jnp.max(log_ws, axis=1, keepdims=True)
        ws = jnp.exp(log_ws_shift)
        norm_ws = jax.lax.stop_gradient(ws / jnp.sum(ws, axis=1, keepdims=True))
        loss = -jnp.sum(norm_ws * log_ws)
        total = loss + self.weight_matching * tm
        recon = jnp.sum(norm_ws * recon_losses)
        losses = {
            "recon_loss": recon / (inputs.shape[0] * 32768),
            "time_matching_loss": tm,
            "total_loss": total,
            "perplexity": jnp.zeros(()),
        }
        return None, losses, {"enc": enc_ns}

    def log_likelihood_bound(self, params, state, inputs, key,
                             batch_mask=None):
        """Monte-Carlo importance-weighted log-likelihood bound
        ``L_k = mean_B [logsumexp_k log w - log k]`` (Burda et al. 2016,
        eq. 8) with the eval-mode encoder. For iid weight draws E[L_k] is
        non-decreasing in k and L_1 is the single-sample VAE ELBO estimator.
        The training objective in ``apply`` is the gradient-friendly
        normalized-weight form (reference vae.py:664-676), NOT this bound;
        use this method for model comparison / bound-tightening checks.
        Uses the same (unnormalized) log-density conventions as ``apply`` so
        values are comparable across k for a fixed model.

        CAVEAT — not a true log p(x) bound: the q-density term inherits the
        reference's convention of subtracting ``z_logstd`` per dimension
        (reference vae.py:668) while the sampled std is
        ``exp(0.5 * z_logstd)``, i.e. the subtracted log-std is 2x the true
        one, and ``log_p_x_z``/``log_p_z`` drop their Gaussian
        normalizers. The value therefore bounds log E[w] under a mismatched
        density whose data-dependent offset varies with the encoder's
        predicted variances — usable ONLY for relative comparisons between
        k values or checkpoints of the same model, never as an absolute
        likelihood. A corrected variant would subtract ``0.5 * z_logstd``
        in ``log_q_z_x``."""
        x = nchw_to_nhwc(inputs)
        mask = (nchw_to_nhwc(batch_mask) if batch_mask is not None
                else jnp.ones_like(x))
        z, _ = _apply_z16_encoder(params["enc"], state["enc"], x, train=False)
        nh = self.num_hiddens
        z_mean, z_logstd = z[..., :nh], z[..., nh:]
        z_std = jnp.exp(0.5 * z_logstd)
        cv = self._channel_var()

        def one_sample(eps):
            zs = z_mean + z_std * eps
            decoded = _apply_z16_decoder(params["dec"], zs)
            log_p_x_z = -jnp.sum(
                ((decoded * mask - x * mask) ** 2) / cv, axis=(1, 2, 3))
            log_p_z = -jnp.sum(0.5 * zs ** 2, axis=(1, 2, 3))
            log_q_z_x = -jnp.sum(0.5 * eps ** 2 + z_logstd, axis=(1, 2, 3))
            return log_p_x_z + log_p_z - log_q_z_x

        keys = jax.random.split(key, self.k)
        epss = jax.vmap(lambda k_i: jax.random.normal(
            k_i, z_std.shape, z_std.dtype))(keys)
        log_ws = jax.vmap(one_sample)(epss)            # (k, B)
        from jax.scipy.special import logsumexp

        return jnp.mean(logsumexp(log_ws, axis=0) - jnp.log(float(self.k)))


@dataclasses.dataclass(frozen=True)
class AAEModel:
    """Adversarial autoencoder (reference vae.py:700-857)."""
    num_inputs: int = 2
    num_hiddens: int = 16
    num_residual_hiddens: int = 32
    num_residual_layers: int = 2
    weight_recon: float = 1.0
    weight_matching: float = 0.005
    w_a: float = 1.1
    w_t: float = 0.1
    w_n: float = -0.5
    margin: float = 0.5
    channel_var: Tuple[float, ...] = (1.0, 1.0)
    # optional sharded time-matching loss (see models/vqvae.py tm_loss_fn)
    tm_loss_fn: object = None

    def init(self, key):
        ks = jax.random.split(key, 24)
        enc_p, enc_s = _init_z16_encoder(
            ks[:7], self.num_inputs, self.num_hiddens,
            self.num_residual_hiddens, self.num_residual_layers)
        dec_p = _init_z16_decoder(ks[7:11], self.num_inputs, self.num_hiddens)
        nh = self.num_hiddens
        bn = F.init_batch_norm
        dbn1p, dbn1s = bn(nh // 2)
        dbn2p, dbn2s = bn(nh // 2)
        dbn3p, dbn3s = bn(nh // 2)
        # Discriminator over 16x16 latents -> 3 stride-2 convs -> 2x2x(nh//2)
        # -> MLP (reference vae.py:759-778).
        enc_d_p = {
            "conv0": F.init_conv(ks[11], 1, 1, nh, nh // 2),
            "conv1": F.init_conv(ks[12], 4, 4, nh // 2, nh // 2),
            "bn1": dbn1p,
            "conv2": F.init_conv(ks[13], 4, 4, nh // 2, nh // 2),
            "bn2": dbn2p,
            "conv3": F.init_conv(ks[14], 4, 4, nh // 2, nh // 2),
            "bn3": dbn3p,
            "fc1": F.init_linear(ks[15], nh * 2, nh * 8),
            "fc2": F.init_linear(ks[16], nh * 8, nh),
            "fc3": F.init_linear(ks[17], nh, 1),
        }
        enc_d_s = {"bn1": dbn1s, "bn2": dbn2s, "bn3": dbn3s}
        params = {"enc": enc_p, "dec": dec_p, "enc_d": enc_d_p}
        state = {"enc": enc_s, "enc_d": enc_d_s}
        return params, state

    def _channel_var(self):
        return jnp.asarray(self.channel_var, jnp.float32)

    def _apply_disc(self, p, s, z, key, train: bool):
        ns = {}
        h = F.conv2d(p["conv0"], z, 1, 0)
        h = F.conv2d(p["conv1"], h, 2, 1)
        h, ns["bn1"] = F.batch_norm(p["bn1"], s["bn1"], h, train)
        h = F.relu(h)
        h = F.conv2d(p["conv2"], h, 2, 1)
        h, ns["bn2"] = F.batch_norm(p["bn2"], s["bn2"], h, train)
        h = F.relu(h)
        h = F.conv2d(p["conv3"], h, 2, 1)
        h, ns["bn3"] = F.batch_norm(p["bn3"], s["bn3"], h, train)
        h = F.relu(h)
        # torch flattens NCHW channel-major (vae.py:770 Flatten after convs).
        h = nhwc_to_nchw(h).reshape(h.shape[0], -1)
        h = F.linear(p["fc1"], h)
        if train:
            k1, key = jax.random.split(key)
            keep = jax.random.bernoulli(k1, 0.75, h.shape)
            h = jnp.where(keep, h / 0.75, 0.0)
        h = F.relu(h)
        h = F.linear(p["fc2"], h)
        if train:
            k2, key = jax.random.split(key)
            keep = jax.random.bernoulli(k2, 0.75, h.shape)
            h = jnp.where(keep, h / 0.75, 0.0)
        h = F.relu(h)
        h = F.sigmoid(F.linear(p["fc3"], h))
        return h, ns

    def apply(self, params, state, inputs, train: bool = False,
              time_matching_mat=None, batch_mask=None):
        x = nchw_to_nhwc(inputs)
        mask = nchw_to_nhwc(batch_mask) if batch_mask is not None else None
        z, enc_ns = _apply_z16_encoder(params["enc"], state["enc"], x, train)
        decoded = _apply_z16_decoder(params["dec"], z)
        recon = common.masked_recon_loss(decoded, x, mask, self._channel_var())
        total = self.weight_recon * recon
        tm = jnp.zeros((), jnp.float32)
        if time_matching_mat is not None:
            zf = z.reshape(z.shape[0], -1)
            tm_fn = self.tm_loss_fn or common.time_matching_loss
            tm = tm_fn(zf, time_matching_mat,
                       self.w_a, self.w_t, self.w_n, self.margin)
            total = total + self.weight_matching * tm
        losses = {
            "recon_loss": recon,
            "time_matching_loss": tm,
            "total_loss": total,
            "perplexity": jnp.zeros(()),
        }
        new_state = dict(state)
        new_state["enc"] = enc_ns
        return nhwc_to_nchw(decoded), losses, new_state

    def adversarial_loss(self, params, state, inputs, key, train: bool = True):
        """Generator/discriminator losses (reference vae.py:834-853)."""
        eps = 1e-9
        x = nchw_to_nhwc(inputs)
        k_prior, k_d1, k_d2 = jax.random.split(key, 3)
        # BN running stats evolve exactly as the reference's sequential
        # torch forwards (vae.py:845-848): enc(inputs) updates enc stats,
        # then enc_d sees z_data and z_prior in order, the second call
        # starting from the first call's updated stats
        z_data, enc_ns = _apply_z16_encoder(params["enc"], state["enc"], x,
                                            train)
        z_prior = jax.random.normal(k_prior, z_data.shape, z_data.dtype)
        s_data, disc_ns = self._apply_disc(params["enc_d"], state["enc_d"],
                                           z_data, k_d1, train)
        s_prior, disc_ns = self._apply_disc(params["enc_d"], disc_ns,
                                            z_prior, k_d2, train)
        g_loss = -jnp.mean(jnp.log(s_data + eps))
        d_loss = -jnp.mean(jnp.log(s_prior + eps)
                           + jnp.log(1 - jax.lax.stop_gradient(s_data) + eps))
        new_state = dict(state)
        new_state["enc"] = enc_ns
        new_state["enc_d"] = disc_ns
        return {
            "generator_loss": g_loss,
            "descriminator_loss": d_loss,
            "score": jnp.mean(s_data),
        }, new_state

    def encode(self, params, state, inputs):
        x = nchw_to_nhwc(inputs)
        z, _ = _apply_z16_encoder(params["enc"], state["enc"], x, train=False)
        return nhwc_to_nchw(z), nhwc_to_nchw(z), None
