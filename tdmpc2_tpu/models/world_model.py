"""TD-MPC2 implicit world model, TPU-native.

Functional re-design of the reference WorldModel
(reference: tdmpc2/common/world_model.py:11-216): the model is a param pytree
plus pure apply methods on a stateless `WorldModel` namespace object that
closes over the (static) config. There is no detached/target module gymnastics
(world_model.py:38-53) — detached Q evaluation is `jax.lax.stop_gradient` on
the Q param subtree, and the target Q network is a separate param copy updated
with Polyak averaging by the agent.

Networks (world_model.py:25-30):
- encoder:     per-obs-kind MLP (state) or CNN (rgb), SimNorm-capped
- dynamics:    MLP([z ⊕ task_emb, a] -> z'), SimNorm-capped
- reward:      MLP([z ⊕ task_emb, a] -> num_bins logits)
- termination: MLP([z ⊕ task_emb] -> 1 logit), episodic tasks only
- pi:          MLP([z ⊕ task_emb] -> 2*action_dim), tanh-squashed Gaussian
- Qs:          vmapped ensemble of MLPs -> num_bins logits, dropout on first
               layer, zero-init output weights (world_model.py:30-32)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tdmpc2_tpu.models import layers
from tdmpc2_tpu.ops import math


class WorldModel:
    """Stateless apply-function namespace; all params are explicit."""

    def __init__(self, cfg, compute_dtype=None):
        """`compute_dtype` (e.g. jnp.bfloat16) selects the matmul compute
        precision for every MLP head (fp32 master weights + fp32
        accumulation, layers.linear_apply). The agent builds a second
        bf16-compute view of the same params for the update path when
        cfg.bf16_update is set; planner/acting keep full fp32."""
        self.cfg = cfg
        self.compute_dtype = compute_dtype
        if cfg.multitask:
            # mask[i, :action_dims[i]] = 1 (reference world_model.py:22-24)
            masks = np.zeros((len(cfg.tasks), cfg.action_dim), np.float32)
            for i, ad in enumerate(cfg.action_dims):
                masks[i, :ad] = 1.0
            self.action_masks = jnp.asarray(masks)
        else:
            self.action_masks = None
        self.log_std_min = float(cfg.log_std_min)
        self.log_std_dif = float(cfg.log_std_max) - float(cfg.log_std_min)

    # -- init ---------------------------------------------------------------

    def init(self, key) -> dict:
        cfg = self.cfg
        keys = jax.random.split(key, 8)
        n_bins = max(cfg.num_bins, 1)
        act_in = cfg.latent_dim + cfg.action_dim + cfg.task_dim
        z_in = cfg.latent_dim + cfg.task_dim

        encoder = {}
        obs_shape = dict(cfg.obs_shape)
        if 'state' in obs_shape:
            encoder['state'] = layers.mlp_init(
                keys[0], obs_shape['state'][0] + cfg.task_dim,
                max(cfg.num_enc_layers - 1, 1) * [cfg.enc_dim],
                cfg.latent_dim, final_normed=True)
        if 'rgb' in obs_shape:
            encoder['rgb'] = layers.conv_encoder_init(
                keys[0], obs_shape['rgb'][0], cfg.num_channels)
            # conv output must equal latent_dim (64px/32ch -> 512, the
            # reference geometry, layers.py:136-150)
            conv_out = layers.conv_output_dim(
                obs_shape['rgb'][1], obs_shape['rgb'][2], cfg.num_channels)
            if conv_out != cfg.latent_dim:
                raise ValueError(
                    f'latent_dim={cfg.latent_dim} must equal the conv '
                    f'encoder output {conv_out} for rgb input '
                    f'{obs_shape["rgb"]} with num_channels={cfg.num_channels}')

        params = {
            'encoder': encoder,
            'dynamics': layers.mlp_init(
                keys[1], act_in, 2 * [cfg.mlp_dim], cfg.latent_dim,
                final_normed=True),
            'reward': layers.mlp_init(
                keys[2], act_in, 2 * [cfg.mlp_dim], n_bins, zero_final=True),
            'pi': layers.mlp_init(
                keys[3], z_in, 2 * [cfg.mlp_dim], 2 * cfg.action_dim),
            'Qs': layers.ensemble_init(
                keys[4], cfg.num_q,
                lambda k: layers.mlp_init(
                    k, act_in, 2 * [cfg.mlp_dim], n_bins, zero_final=True)),
        }
        if cfg.episodic:
            params['termination'] = layers.mlp_init(
                keys[5], z_in, 2 * [cfg.mlp_dim], 1)
        if cfg.multitask:
            params['task_emb'] = layers.embedding_init(
                keys[6], len(cfg.tasks), cfg.task_dim)
        return params

    # -- task embedding (reference world_model.py:88-101) --------------------

    def task_emb(self, params, x, task):
        """Look up the task embedding (max_norm=1 renorm at lookup) and concat.

        Note: torch's Embedding(max_norm=1) renormalizes stored rows in-place
        pre-lookup without differentiating through the renorm; we apply the
        equivalent stop-gradient rescale at lookup time.
        """
        task = jnp.asarray(task)
        emb = params['task_emb']['w'][task]
        norm = jnp.linalg.norm(emb, axis=-1, keepdims=True)
        scale = jax.lax.stop_gradient(jnp.minimum(1.0, 1.0 / jnp.maximum(norm, 1e-12)))
        emb = emb * scale
        if x.ndim == emb.ndim + 1:        # x: [T, B, D], emb: [B, dt]
            emb = jnp.broadcast_to(emb, (x.shape[0],) + emb.shape)
        elif emb.ndim < x.ndim or (emb.shape[0] == 1 and x.shape[0] != 1):
            emb = jnp.broadcast_to(emb, x.shape[:-1] + emb.shape[-1:])
        return jnp.concatenate([x, emb], axis=-1)

    # -- heads ---------------------------------------------------------------

    def encode(self, params, obs, task=None, key=None):
        """obs -> SimNorm latent (reference world_model.py:103-112)."""
        cfg = self.cfg
        if cfg.multitask:
            obs = self.task_emb(params, obs, task)
        if cfg.obs == 'rgb':
            enc = params['encoder']['rgb']
            # compute_dtype (cfg.bf16_update) covers the conv stack too: the
            # pixel update is conv-dominated and its activations are the HBM
            # traffic that bf16 I/O halves (the MXU already multiplies in
            # bf16 under matmul_precision='default').
            dt = self.compute_dtype or jnp.float32
            if obs.ndim == 5:  # [T, B, C, H, W]: vmap over time
                if key is not None:
                    tkeys = jax.random.split(key, obs.shape[0])
                    return jax.vmap(
                        lambda o, k: layers.conv_encoder_apply(
                            enc, o, cfg.simnorm_dim, key=k, dtype=dt))(obs, tkeys)
                return jax.vmap(
                    lambda o: layers.conv_encoder_apply(
                        enc, o, cfg.simnorm_dim, dtype=dt))(obs)
            return layers.conv_encoder_apply(enc, obs, cfg.simnorm_dim, key=key,
                                             dtype=dt)
        return layers.mlp_apply(
            params['encoder']['state'], obs,
            final_act=lambda x: layers.simnorm(x, cfg.simnorm_dim),
            dtype=self.compute_dtype)

    def next(self, params, z, a, task=None):
        """Latent dynamics (reference world_model.py:114-121)."""
        if self.cfg.multitask:
            z = self.task_emb(params, z, task)
        za = jnp.concatenate([z, a], axis=-1)
        return layers.mlp_apply(
            params['dynamics'], za,
            final_act=lambda x: layers.simnorm(x, self.cfg.simnorm_dim),
            dtype=self.compute_dtype)

    def reward(self, params, z, a, task=None):
        """Reward logits (reference world_model.py:123-130)."""
        if self.cfg.multitask:
            z = self.task_emb(params, z, task)
        za = jnp.concatenate([z, a], axis=-1)
        return layers.mlp_apply(params['reward'], za,
                                dtype=self.compute_dtype)

    def termination(self, params, z, task=None, unnormalized: bool = False):
        """Termination probability/logit (reference world_model.py:132-141)."""
        if self.cfg.multitask:
            z = self.task_emb(params, z, task)
        logit = layers.mlp_apply(params['termination'], z,
                                 dtype=self.compute_dtype)
        return logit if unnormalized else jax.nn.sigmoid(logit)

    def pi(self, params, z, key, task=None):
        """Sample from the tanh-squashed Gaussian policy prior.

        Returns (action, info) — info carries mean/log_std/entropy terms used
        by the policy update (reference world_model.py:144-184).
        """
        cfg = self.cfg
        if cfg.multitask:
            z = self.task_emb(params, z, task)
        out = layers.mlp_apply(params['pi'], z, dtype=self.compute_dtype)
        mean, lstd = jnp.split(out, 2, axis=-1)
        lstd = math.log_std(lstd, self.log_std_min, self.log_std_dif)
        eps = jax.random.normal(key, mean.shape, mean.dtype)

        if cfg.multitask:  # mask unused action dims (world_model.py:158-162)
            mask = self.action_masks[task]
            mean = mean * mask
            lstd = lstd * mask
            eps = eps * mask
            size = jnp.sum(self.action_masks, -1)[task][..., None]
        else:
            size = float(eps.shape[-1])

        log_prob = math.gaussian_logprob(eps, lstd)
        scaled_log_prob = log_prob * size
        action = mean + eps * jnp.exp(lstd)
        mean, action, log_prob = math.squash(mean, action, log_prob)
        entropy_scale = scaled_log_prob / (log_prob + 1e-8)
        info = {
            'mean': mean,
            'log_std': lstd,
            'entropy': -log_prob,
            'scaled_entropy': -log_prob * entropy_scale,
        }
        return action, info

    def Q(self, params, z, a, key=None, task=None, return_type: str = 'min',
          target_params=None, detach: bool = False, dropout_key=None):
        """State-action value via the vmapped Q-ensemble.

        return_type: 'min'/'avg' decode a random 2-of-num_q subsample
        (reference world_model.py:186-216); 'all' returns raw logits of every
        head. `target_params` (if given) is the Polyak target Q subtree;
        `detach` stops gradients through the online Q params. `dropout_key`
        enables train-mode dropout with per-member randomness.
        """
        cfg = self.cfg
        if cfg.multitask:
            z = self.task_emb(params, z, task)
        za = jnp.concatenate([z, a], axis=-1)

        if target_params is not None:
            qp = target_params
        elif detach:
            qp = jax.lax.stop_gradient(params['Qs'])
        else:
            qp = params['Qs']

        if dropout_key is not None:
            member_keys = jax.random.split(dropout_key, cfg.num_q)
            out = jax.vmap(
                lambda p, k: layers.mlp_apply(
                    p, za, dropout=cfg.dropout, key=k, training=True,
                    dtype=self.compute_dtype)
            )(qp, member_keys)
        else:
            out = jax.vmap(lambda p: layers.mlp_apply(
                p, za, dtype=self.compute_dtype))(qp)

        if return_type == 'all':
            return out

        qidx = jax.random.permutation(key, cfg.num_q)[:2]
        qsub = math.two_hot_inv(out[qidx], cfg.num_bins, cfg.vmin, cfg.vmax)
        if return_type == 'min':
            return jnp.min(qsub, axis=0)
        return jnp.sum(qsub, axis=0) / 2

    def total_params(self, params) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
