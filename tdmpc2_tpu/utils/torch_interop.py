"""Interop with the reference's published artifacts (checkpoints, datasets).

The reference ships 300+ trained checkpoints (torch ``state_dict`` pickles,
loaded via reference tdmpc2/tdmpc2.py:81-95) and multi-task datasets as
TensorDict ``.pt`` chunks (reference tdmpc2/trainer/offline_trainer.py:42-65).
This module reads both WITHOUT requiring the ``tensordict``/``torchrl``
packages (absent in this environment):

- :func:`tolerant_torch_load` — ``torch.load`` with an unpickler that
  substitutes inert stub objects for any class whose module is missing, so
  TensorDict containers unpickle into harmless shells around their tensors.
- :func:`extract_named_tensors` — walks the unpickled object graph and
  recovers ``{name: tensor}`` from those shells.
- :func:`convert_reference_state_dict` — maps a reference WorldModel
  state_dict (old or new API key scheme; the old->new renaming mirrors
  reference common/layers.py:167-221 ``api_model_conversion``) onto this
  repo's param pytree layout (models/world_model.py / models/layers.py),
  transposing torch's [out, in] linear weights and OIHW conv weights into
  the [in, out] / HWIO layouts used here.
- :func:`read_tensordict_chunk` — a published dataset chunk -> dict of numpy
  arrays (obs/action/reward/task/...), ready for ``Buffer.load_arrays``.
"""

from __future__ import annotations

import pickle
import types
from typing import Any, Dict, Optional, Tuple

import numpy as np

__all__ = [
    'tolerant_torch_load', 'extract_named_tensors',
    'convert_reference_state_dict', 'load_reference_checkpoint',
    'read_tensordict_chunk',
]


# ---------------------------------------------------------------------------
# Tolerant unpickling
# ---------------------------------------------------------------------------


class _Stub:
    """Inert placeholder for any class unavailable at unpickle time.

    Accepts any constructor args and any ``__setstate__`` payload; everything
    it is given is retained so :func:`extract_named_tensors` can mine the
    object graph for tensors afterwards.
    """

    def __new__(cls, *args, **kwargs):
        obj = object.__new__(cls)
        obj._stub_args = args
        obj._stub_kwargs = kwargs
        return obj

    def __init__(self, *args, **kwargs):  # noqa: D107 — payload kept by __new__
        pass

    def __setstate__(self, state):
        self._stub_state = state

    # some reduce protocols call the restored object (classmethod
    # constructors etc.) — swallow and retain
    def __call__(self, *args, **kwargs):
        child = _Stub(*args, **kwargs)
        child._stub_parent = self
        return child

    def __repr__(self):
        return f'<stub {type(self).__module__}.{type(self).__name__}>'


_stub_cache: Dict[Tuple[str, str], type] = {}


def _stub_class(module: str, name: str) -> type:
    key = (module, name)
    if key not in _stub_cache:
        _stub_cache[key] = type(name, (_Stub,), {'__module__': module})
    return _stub_cache[key]


class _TolerantUnpickler(pickle.Unpickler):
    """Unpickler that substitutes stubs for unimportable classes."""

    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except (ImportError, AttributeError):
            return _stub_class(module, name)


def _pickle_shim() -> types.ModuleType:
    """A pickle-module lookalike for ``torch.load(pickle_module=...)``."""
    shim = types.ModuleType('tolerant_pickle')
    shim.Unpickler = _TolerantUnpickler
    shim.load = lambda f, **kw: _TolerantUnpickler(f).load()
    shim.loads = lambda b, **kw: _TolerantUnpickler(__import__('io').BytesIO(b)).load()
    shim.dump = pickle.dump
    shim.dumps = pickle.dumps
    shim.HIGHEST_PROTOCOL = pickle.HIGHEST_PROTOCOL
    return shim


def tolerant_torch_load(fp) -> Any:
    """``torch.load`` that survives missing ``tensordict``/``torchrl``.

    Tensor storages are restored normally by torch's zip-format reader; only
    the surrounding container classes fall back to stubs.
    """
    import torch
    return torch.load(fp, map_location='cpu', weights_only=False,
                      pickle_module=_pickle_shim())


def extract_named_tensors(obj, _to_numpy: bool = True) -> Dict[str, np.ndarray]:
    """Recover ``{name: array}`` from an unpickled object graph.

    Walks dicts / sequences / stub shells; the FIRST tensor found under each
    string key wins (outermost container takes precedence — TensorDict keeps
    its leaves in an inner ``_tensordict`` dict, so there are no competing
    duplicates in practice).
    """
    import torch
    found: Dict[str, np.ndarray] = {}
    seen = set()

    def walk(o):
        if id(o) in seen:
            return
        seen.add(id(o))
        if isinstance(o, dict):
            for k, v in o.items():
                if isinstance(k, str) and torch.is_tensor(v) and k not in found:
                    found[k] = v.detach().cpu().numpy() if _to_numpy else v
                walk(v)
        elif isinstance(o, (list, tuple, set)):
            for v in o:
                walk(v)
        elif isinstance(o, _Stub):
            walk(o.__dict__)
            walk(list(o._stub_args))
            walk(o._stub_kwargs)
        elif hasattr(o, '__dict__') and not torch.is_tensor(o):
            walk(o.__dict__)

    walk(obj)
    return found


# ---------------------------------------------------------------------------
# Reference checkpoint -> param pytree
# ---------------------------------------------------------------------------

_NAME_MAP = ('weight', 'bias', 'ln.weight', 'ln.bias')
# reference conv() Sequential indices of the four Conv2d layers
# (ShiftAug=0, PixelPreprocess=1, convs at 2/4/6/8 — reference layers.py:136-150)
_CONV_SEQ_IDX = {2: 0, 4: 1, 6: 2, 8: 3}


def _to_np(v) -> np.ndarray:
    if hasattr(v, 'detach'):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _normalize_keys(sd: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Old->new API renaming + tensor-only filtering.

    Mirrors reference common/layers.py:167-221: old flat Q-ensemble keys
    ``_Qs.params.<n>`` map to layer ``n // 4`` and param type
    ``_NAME_MAP[n % 4]``; likewise ``_target_Qs.params.<n>``.
    """
    out: Dict[str, np.ndarray] = {}
    for key, val in sd.items():
        if key.endswith('__batch_size') or key.endswith('__device'):
            continue
        tail = key.rsplit('.', 1)[-1]
        if key.startswith('_Qs.params.') and tail.isdigit():
            n = int(tail)
            out[f'_Qs.params.{n // 4}.{_NAME_MAP[n % 4]}'] = _to_np(val)
        elif key.startswith('_target_Qs.params.') and tail.isdigit():
            n = int(tail)
            out[f'_target_Qs_params.{n // 4}.{_NAME_MAP[n % 4]}'] = _to_np(val)
        else:
            out[key] = _to_np(val)
    return out


def _mlp_from_keys(sd: Dict[str, np.ndarray], prefix: str):
    """Collect ``{prefix}.{i}.*`` into this repo's MLP tuple-of-dicts layout
    (torch Linear weight [out, in] -> 'w' [in, out])."""
    layers = []
    i = 0
    while f'{prefix}.{i}.weight' in sd:
        layer = {'w': np.ascontiguousarray(sd[f'{prefix}.{i}.weight'].T),
                 'b': sd[f'{prefix}.{i}.bias']}
        if f'{prefix}.{i}.ln.weight' in sd:
            layer['ln_w'] = sd[f'{prefix}.{i}.ln.weight']
            layer['ln_b'] = sd[f'{prefix}.{i}.ln.bias']
        layers.append(layer)
        i += 1
    return tuple(layers) if layers else None


def _qs_from_keys(sd: Dict[str, np.ndarray], prefix: str):
    """Collect stacked Q-ensemble params ``{prefix}.{layer}.*``
    ([num_q, out, in] -> 'w' [num_q, in, out])."""
    layers = []
    i = 0
    while f'{prefix}.{i}.weight' in sd:
        layer = {'w': np.ascontiguousarray(
                     sd[f'{prefix}.{i}.weight'].transpose(0, 2, 1)),
                 'b': sd[f'{prefix}.{i}.bias']}
        if f'{prefix}.{i}.ln.weight' in sd:
            layer['ln_w'] = sd[f'{prefix}.{i}.ln.weight']
            layer['ln_b'] = sd[f'{prefix}.{i}.ln.bias']
        layers.append(layer)
        i += 1
    return tuple(layers) if layers else None


def _conv_encoder_from_keys(sd: Dict[str, np.ndarray], prefix: str):
    """Reference conv() Sequential -> tuple of {'w' HWIO, 'b'} layers."""
    out = [None] * len(_CONV_SEQ_IDX)
    for seq_idx, li in _CONV_SEQ_IDX.items():
        w = sd.get(f'{prefix}.{seq_idx}.weight')
        if w is None:
            return None
        # torch OIHW -> lax HWIO
        out[li] = {'w': np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
                   'b': sd[f'{prefix}.{seq_idx}.bias']}
    return tuple(out)


def convert_reference_state_dict(
        sd: Dict[str, Any],
        params_template: Optional[dict] = None) -> Tuple[dict, Any]:
    """Reference WorldModel state_dict -> ``(params, target_Qs)`` pytrees.

    ``sd`` may be the raw checkpoint (``{'model': state_dict}``) or the
    state_dict itself, in either the old or new API key scheme. When
    ``params_template`` (an initialized params pytree) is given, converted
    leaf shapes are validated against it and a clear error names mismatches.
    """
    if 'model' in sd and isinstance(sd['model'], dict):
        sd = sd['model']
    sd = _normalize_keys(sd)

    params: Dict[str, Any] = {}
    encoder: Dict[str, Any] = {}
    state_enc = _mlp_from_keys(sd, '_encoder.state')
    if state_enc:
        encoder['state'] = state_enc
    rgb_enc = _conv_encoder_from_keys(sd, '_encoder.rgb')
    if rgb_enc:
        encoder['rgb'] = rgb_enc
    if not encoder:
        raise ValueError(
            'no encoder keys found — not a reference TD-MPC2 checkpoint? '
            f'(keys: {sorted(sd)[:8]}...)')
    params['encoder'] = encoder
    params['dynamics'] = _mlp_from_keys(sd, '_dynamics')
    params['reward'] = _mlp_from_keys(sd, '_reward')
    params['pi'] = _mlp_from_keys(sd, '_pi')
    params['Qs'] = _qs_from_keys(sd, '_Qs.params')
    term = _mlp_from_keys(sd, '_termination')
    if term:
        params['termination'] = term
    if '_task_emb.weight' in sd:
        params['task_emb'] = {'w': sd['_task_emb.weight']}
    for name in ('dynamics', 'reward', 'pi', 'Qs'):
        if not params[name]:
            raise ValueError(f'checkpoint is missing the {name} head')

    target_Qs = _qs_from_keys(sd, '_target_Qs_params')
    if target_Qs is None:
        target_Qs = jax_tree_copy(params['Qs'])

    if params_template is not None:
        _validate_against(params, params_template)
    return params, target_Qs


def jax_tree_copy(tree):
    return _map_leaves(np.array, tree)


def _map_leaves(fn, tree):
    if isinstance(tree, dict):
        return {k: _map_leaves(fn, v) for k, v in tree.items()}
    if isinstance(tree, tuple):
        return tuple(_map_leaves(fn, v) for v in tree)
    return fn(tree)


def _validate_against(params, template, path='params'):
    if isinstance(template, dict):
        missing = set(template) - set(params or {})
        extra = set(params or {}) - set(template)
        if missing or extra:
            raise ValueError(
                f'{path}: structure mismatch (checkpoint lacks {sorted(missing)}, '
                f'has unexpected {sorted(extra)}) — architecture differs from cfg')
        for k in template:
            _validate_against(params[k], template[k], f'{path}.{k}')
    elif isinstance(template, tuple):
        if len(params) != len(template):
            raise ValueError(
                f'{path}: {len(params)} layers in checkpoint vs '
                f'{len(template)} in model — architecture differs from cfg')
        for i, (p, t) in enumerate(zip(params, template)):
            _validate_against(p, t, f'{path}[{i}]')
    else:
        if tuple(np.shape(params)) != tuple(np.shape(template)):
            raise ValueError(
                f'{path}: shape {np.shape(params)} in checkpoint vs '
                f'{np.shape(template)} in model — architecture differs from cfg')


def load_reference_checkpoint(fp, params_template: Optional[dict] = None):
    """Read a published reference ``.pt`` checkpoint file -> ``(params,
    target_Qs)`` numpy pytrees in this repo's layout."""
    blob = tolerant_torch_load(fp)
    if not isinstance(blob, dict):
        blob = extract_named_tensors(blob)
    return convert_reference_state_dict(blob, params_template)


# ---------------------------------------------------------------------------
# Published dataset chunks
# ---------------------------------------------------------------------------

_CHUNK_KEYS = ('obs', 'action', 'reward', 'terminated', 'task', 'episode')


def read_tensordict_chunk(fp) -> Dict[str, np.ndarray]:
    """A published TensorDict ``.pt`` dataset chunk -> dict of numpy arrays.

    The chunk layout is [n_episodes, episode_rows, ...] per key (reference
    offline_trainer.py:42-65 asserts td.shape[1] == episode_length+1).
    Works without tensordict: the container unpickles into stubs and the
    tensors are mined from the object graph.
    """
    obj = tolerant_torch_load(fp)
    named = extract_named_tensors(obj)
    out = {k: v for k, v in named.items() if k in _CHUNK_KEYS}
    if 'obs' not in out and named:
        # nested obs dict (e.g. {'state': ...}): take the state leaf
        for k, v in named.items():
            if k.endswith('state') and v.ndim >= 2:
                out['obs'] = v
                break
    required = {'obs', 'action', 'reward'}
    if not required <= set(out):
        raise ValueError(
            f'{fp}: recovered keys {sorted(named)} lack {required} — '
            'not a TD-MPC2 dataset chunk?')
    for k, v in out.items():
        if v.dtype == np.float64:
            out[k] = v.astype(np.float32)
    return out
