"""Published-artifact interop: reference torch checkpoints + dataset chunks.

The converters must work WITHOUT tensordict installed (this environment), so
the dataset-chunk tests fabricate a TensorDict lookalike under a fake
``tensordict`` module, torch.save it, remove the module, and read it back via
the tolerant unpickler — the exact situation with the published chunks.

Checkpoint tests build a reference-format state_dict tensor-for-tensor (key
scheme of reference tdmpc2/common/world_model.py state_dict + the old-API
flat Q numbering of common/layers.py:167-221) and assert both structural and
NUMERICAL equivalence: a torch forward of a NormedLinear block must match
this repo's ``normed_linear_apply`` on the converted params.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip('torch')

from tdmpc2_tpu.config import Config, parse_cfg
from tdmpc2_tpu.tdmpc2 import TDMPC2
from tdmpc2_tpu.utils import torch_interop

OBS_DIM, ACT_DIM = 10, 4


def make_cfg(**kw):
    cfg = parse_cfg(Config(task='toy'))
    cfg.obs_shape = {'state': (OBS_DIM,)}
    cfg.action_dim = ACT_DIM
    cfg.episode_length = 20
    cfg.enc_dim = 64
    cfg.mlp_dim = 64
    cfg.latent_dim = 32
    cfg.num_q = 3
    cfg.batch_size = 16
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def _torch_mlp_sd(prefix, dims, gen, sd, final_normed=False):
    """Emit reference-style keys for one MLP head: NormedLinear layers
    ({i}.weight/bias/ln.weight/ln.bias) + a final plain Linear or
    NormedLinear (reference layers.py:121-133)."""
    n = len(dims) - 1
    for i in range(n):
        out_d, in_d = dims[i + 1], dims[i]
        sd[f'{prefix}.{i}.weight'] = torch.randn(out_d, in_d, generator=gen) * 0.1
        sd[f'{prefix}.{i}.bias'] = torch.randn(out_d, generator=gen) * 0.1
        last = i == n - 1
        if not last or final_normed:
            sd[f'{prefix}.{i}.ln.weight'] = torch.rand(out_d, generator=gen) + 0.5
            sd[f'{prefix}.{i}.ln.bias'] = torch.randn(out_d, generator=gen) * 0.1


def build_reference_sd(cfg, old_api=False, gen=None):
    """A reference-format WorldModel state_dict with this cfg's geometry."""
    gen = gen or torch.Generator().manual_seed(0)
    sd = {}
    D, A, M = cfg.latent_dim, cfg.action_dim, cfg.mlp_dim
    nb = max(cfg.num_bins, 1)
    enc_dims = [OBS_DIM] + max(cfg.num_enc_layers - 1, 1) * [cfg.enc_dim] + [D]
    _torch_mlp_sd('_encoder.state', enc_dims, gen, sd, final_normed=True)
    _torch_mlp_sd('_dynamics', [D + A, M, M, D], gen, sd, final_normed=True)
    _torch_mlp_sd('_reward', [D + A, M, M, nb], gen, sd)
    _torch_mlp_sd('_pi', [D, M, M, 2 * A], gen, sd)

    # Q ensemble: stacked [num_q, out, in] leaves, layers 0/1 normed, 2 plain
    q_dims = [D + A, M, M, nb]
    for li in range(3):
        out_d, in_d = q_dims[li + 1], q_dims[li]
        sd[f'_Qs.params.{li}.weight'] = torch.randn(
            cfg.num_q, out_d, in_d, generator=gen) * 0.1
        sd[f'_Qs.params.{li}.bias'] = torch.randn(
            cfg.num_q, out_d, generator=gen) * 0.1
        if li < 2:
            sd[f'_Qs.params.{li}.ln.weight'] = torch.rand(
                cfg.num_q, out_d, generator=gen) + 0.5
            sd[f'_Qs.params.{li}.ln.bias'] = torch.randn(
                cfg.num_q, out_d, generator=gen) * 0.1
        sd[f'_target_Qs_params.{li}.weight'] = sd[f'_Qs.params.{li}.weight'] + 0.01
        sd[f'_target_Qs_params.{li}.bias'] = sd[f'_Qs.params.{li}.bias']
        if li < 2:
            sd[f'_target_Qs_params.{li}.ln.weight'] = sd[f'_Qs.params.{li}.ln.weight']
            sd[f'_target_Qs_params.{li}.ln.bias'] = sd[f'_Qs.params.{li}.ln.bias']
    sd['log_std_min'] = torch.tensor(float(cfg.log_std_min))
    sd['log_std_dif'] = torch.tensor(
        float(cfg.log_std_max) - float(cfg.log_std_min))

    if old_api:
        # flatten to the pre-torch.compile key scheme (layers.py:171-192):
        # _Qs.params.<n> with n = 4*layer + {0:w,1:b,2:ln.w,3:ln.b}
        name_map = ['weight', 'bias', 'ln.weight', 'ln.bias']
        flat = {}
        for k, v in sd.items():
            if k.startswith('_Qs.params.'):
                li, kind = k[len('_Qs.params.'):].split('.', 1)
                flat[f'_Qs.params.{4 * int(li) + name_map.index(kind)}'] = v
            elif k.startswith('_target_Qs_params.'):
                li, kind = k[len('_target_Qs_params.'):].split('.', 1)
                flat[f'_target_Qs.params.{4 * int(li) + name_map.index(kind)}'] = v
            else:
                flat[k] = v
        sd = flat
    return sd


def test_convert_reference_checkpoint_structure_and_load():
    cfg = make_cfg()
    agent = TDMPC2(cfg)
    sd = build_reference_sd(cfg)
    params, target = torch_interop.convert_reference_state_dict(
        {'model': sd}, agent.state.params)
    # loads into the live agent and still acts
    agent.load({'model': sd})
    a = agent.act(np.random.randn(OBS_DIM).astype(np.float32), t0=True)
    assert a.shape == (ACT_DIM,) and np.isfinite(a).all()
    # target Qs came from _target_Qs_params, not copied from Qs
    assert not np.allclose(np.asarray(target[0]['w']),
                           np.asarray(params['Qs'][0]['w']))


def test_old_api_flat_q_keys_match_new_api():
    cfg = make_cfg()
    gen = torch.Generator().manual_seed(3)
    sd_new = build_reference_sd(cfg, old_api=False, gen=gen)
    gen = torch.Generator().manual_seed(3)
    sd_old = build_reference_sd(cfg, old_api=True, gen=gen)
    p_new, t_new = torch_interop.convert_reference_state_dict(dict(sd_new))
    p_old, t_old = torch_interop.convert_reference_state_dict(dict(sd_old))
    for a, b in zip((p_new, t_new), (p_old, t_old)):
        flat_a = torch_interop._map_leaves(np.asarray, a)
        flat_b = torch_interop._map_leaves(np.asarray, b)
        import jax
        for la, lb in zip(jax.tree.leaves(flat_a), jax.tree.leaves(flat_b)):
            np.testing.assert_array_equal(la, lb)


def test_converted_normed_linear_matches_torch_forward():
    """Numerical parity: torch Linear+LayerNorm+Mish vs converted params
    through this repo's normed_linear_apply."""
    import jax.numpy as jnp
    from tdmpc2_tpu.models.layers import normed_linear_apply

    cfg = make_cfg()
    sd = build_reference_sd(cfg)
    params, _ = torch_interop.convert_reference_state_dict(dict(sd))
    x = torch.randn(7, cfg.latent_dim + cfg.action_dim,
                    generator=torch.Generator().manual_seed(9))

    w = torch.as_tensor(np.asarray(sd['_dynamics.0.weight']))
    b = torch.as_tensor(np.asarray(sd['_dynamics.0.bias']))
    lw = torch.as_tensor(np.asarray(sd['_dynamics.0.ln.weight']))
    lb = torch.as_tensor(np.asarray(sd['_dynamics.0.ln.bias']))
    y = torch.nn.functional.linear(x, w, b)
    y = torch.nn.functional.layer_norm(y, y.shape[-1:], lw, lb)
    y_torch = torch.nn.functional.mish(y).numpy()

    y_jax = normed_linear_apply(
        {k: jnp.asarray(v) for k, v in params['dynamics'][0].items()},
        jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(y_jax), y_torch, rtol=2e-5, atol=2e-5)


def test_mismatched_architecture_raises_clear_error():
    cfg = make_cfg()
    agent = TDMPC2(cfg)
    bad = make_cfg(mlp_dim=128)
    sd = build_reference_sd(bad)
    with pytest.raises(ValueError, match='shape|layers|structure'):
        torch_interop.convert_reference_state_dict(
            {'model': sd}, agent.state.params)


# ---------------------------------------------------------------------------
# Dataset chunks without tensordict
# ---------------------------------------------------------------------------


class _FakeTensorDict:
    """TensorDict lookalike pickled under the module name 'tensordict'."""

    def __init__(self, source, batch_size=None):
        self._tensordict = source
        self._batch_size = batch_size


_FakeTensorDict.__module__ = 'tensordict'
_FakeTensorDict.__qualname__ = 'TensorDict'


def _fake_tensordict_chunk(tmp_path, n_eps=3, rows=11):
    """torch.save a TensorDict lookalike whose class lives in a fake
    'tensordict' module, then remove the module — unpickling now requires
    the tolerant loader, exactly like the published chunks here."""
    mod = types.ModuleType('tensordict')
    mod.TensorDict = _FakeTensorDict
    sys.modules['tensordict'] = mod
    try:
        data = {
            'obs': torch.randn(n_eps, rows, OBS_DIM),
            'action': torch.randn(n_eps, rows, ACT_DIM),
            'reward': torch.randn(n_eps, rows),
            'task': torch.randint(0, 5, (n_eps, rows)),
        }
        td = _FakeTensorDict(data, batch_size=(n_eps, rows))
        fp = tmp_path / 'chunk_0.pt'
        torch.save(td, fp)
    finally:
        del sys.modules['tensordict']
    return fp, data


def test_read_tensordict_chunk_without_tensordict(tmp_path):
    fp, data = _fake_tensordict_chunk(tmp_path)
    with pytest.raises(Exception):
        torch.load(fp, weights_only=False)  # proves tensordict is required
    out = torch_interop.read_tensordict_chunk(fp)
    assert set(out) == {'obs', 'action', 'reward', 'task'}
    np.testing.assert_allclose(out['obs'], data['obs'].numpy(), rtol=1e-6)
    np.testing.assert_array_equal(out['task'], data['task'].numpy())


def test_convert_pt_to_npz_cli(tmp_path):
    fp, data = _fake_tensordict_chunk(tmp_path)
    out_dir = tmp_path / 'npz'
    out_dir.mkdir(exist_ok=True)
    # 'datasets' collides with the HF package; import the script by path
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'convert_pt_to_npz', '/root/repo/datasets/convert_pt_to_npz.py')
    cvt = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cvt)
    res = cvt.convert_chunk(str(fp), out_dir)
    loaded = np.load(res)
    np.testing.assert_allclose(loaded['obs'], data['obs'].numpy(), rtol=1e-6)
