"""Functional NN building blocks.

Equivalents of the reference's layer zoo (reference: tdmpc2/common/layers.py)
as pure init/apply functions over param pytrees — idiomatic JAX instead of
nn.Module objects. The Q-ensemble is realized as a stacked leading param axis +
`jax.vmap` (the analogue of layers.py:8-33's vmapped Ensemble), which lowers to
batched matmuls on the MXU.

Param layout conventions:
- Linear:       {'w': [in, out], 'b': [out]}
- NormedLinear: {'w': [in, out], 'b': [out], 'ln_w': [out], 'ln_b': [out]}
- MLP:          tuple of layer dicts; the last layer is a plain Linear unless
                the MLP was built with a final activation, in which case it is
                a NormedLinear whose activation is applied by the caller-
                supplied `final_act`.
"""

from __future__ import annotations

import math as _pymath
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Initializers (reference: tdmpc2/common/init.py)
# ---------------------------------------------------------------------------


def trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    """Truncated normal on [-2, 2] (absolute bounds), matching
    torch.nn.init.trunc_normal_(std=0.02) used by the reference (init.py:7)."""
    lower = -2.0 / std
    upper = 2.0 / std
    return std * jax.random.truncated_normal(key, lower, upper, shape, dtype)


def linear_init(key, in_dim: int, out_dim: int, dtype=jnp.float32, zero: bool = False):
    w = jnp.zeros((in_dim, out_dim), dtype) if zero else trunc_normal(key, (in_dim, out_dim), dtype=dtype)
    return {'w': w, 'b': jnp.zeros((out_dim,), dtype)}


def normed_linear_init(key, in_dim: int, out_dim: int, dtype=jnp.float32):
    p = linear_init(key, in_dim, out_dim, dtype)
    p['ln_w'] = jnp.ones((out_dim,), dtype)
    p['ln_b'] = jnp.zeros((out_dim,), dtype)
    return p


def embedding_init(key, num: int, dim: int, dtype=jnp.float32):
    """Uniform(-0.02, 0.02), matching reference init.py:10-11."""
    return {'w': jax.random.uniform(key, (num, dim), dtype, -0.02, 0.02)}


def conv_init(key, kh: int, kw: int, in_ch: int, out_ch: int, dtype=jnp.float32):
    """Kaiming-uniform(a=sqrt(5)) + bias uniform, the torch Conv2d default
    (the reference leaves convs at torch defaults; its weight_init only
    touches nn.Linear/nn.Embedding, init.py:4-11)."""
    kw_, kb_ = jax.random.split(key)
    fan_in = in_ch * kh * kw
    bound = 1.0 / _pymath.sqrt(fan_in)
    # weights layout HWIO for lax.conv_general_dilated
    w = jax.random.uniform(kw_, (kh, kw, in_ch, out_ch), dtype, -bound, bound)
    b = jax.random.uniform(kb_, (out_ch,), dtype, -bound, bound)
    return {'w': w, 'b': b}


# ---------------------------------------------------------------------------
# Activations / normalizers
# ---------------------------------------------------------------------------


def mish(x):
    """x * tanh(softplus(x)) via the identity tanh(log z) = (z²-1)/(z²+1)
    with z = 1 + eˣ: ONE exp + one reciprocal instead of three
    transcendentals (exp, log1p, tanh). The planner's per-step activations
    are VPU-transcendental-bound on TPU (docs/PERFORMANCE.md), so the
    activation is the hot elementwise op. Algebraically exact; the exp
    argument is clamped at 15 — the ratio is already 1.0 in f32 beyond x~8.7, the
    derivative correctly saturates to 1, and the clamp keeps the autodiff
    quotient-rule intermediates (~2z³) far from f32 overflow."""
    z = jnp.exp(jnp.minimum(x, 15.0)) + 1.0
    z2 = z * z
    return x * (z2 - 1.0) / (z2 + 1.0)


def simnorm(x, dim: int):
    """Simplicial normalization: softmax over contiguous groups of `dim`.

    (reference layers.py:74-91)
    """
    shp = x.shape
    x = x.reshape(*shp[:-1], -1, dim)
    x = jax.nn.softmax(x, axis=-1)
    return x.reshape(shp)


def layer_norm(x, w, b, eps: float = 1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


# ---------------------------------------------------------------------------
# Layers
# ---------------------------------------------------------------------------


def linear_apply(p, x, dtype=None):
    """y = x @ w + b. With `dtype` (e.g. bfloat16): cast both matmul operands
    to `dtype` and accumulate in float32 (`preferred_element_type`) — the
    MXU-native mixed-precision contraction. Master weights stay float32; the
    casts are differentiable, so gradients flow back to the f32 params."""
    if dtype is None:
        return x @ p['w'] + p['b']
    y = jax.lax.dot_general(
        x.astype(dtype), p['w'].astype(dtype),
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return y + p['b']


def normed_linear_apply(p, x, act: Callable = mish, dropout: float = 0.0,
                        key=None, training: bool = False, dtype=None):
    """Linear -> (Dropout) -> LayerNorm -> activation.

    Order matches the reference NormedLinear.forward (layers.py:107-111):
    dropout is applied to the linear output, *before* LayerNorm.
    `dtype` selects the matmul compute precision (see linear_apply);
    dropout, LayerNorm and the activation always run in float32.
    """
    x = linear_apply(p, x, dtype=dtype)
    if dropout > 0.0 and training:
        keep = 1.0 - dropout
        mask = jax.random.bernoulli(key, keep, x.shape)
        x = jnp.where(mask, x / keep, 0.0)
    return act(layer_norm(x, p['ln_w'], p['ln_b']))


def mlp_init(key, in_dim: int, mlp_dims: Sequence[int], out_dim: int,
             final_normed: bool = False, zero_final: bool = False,
             dtype=jnp.float32):
    """Init the TD-MPC2 MLP block (reference layers.py:121-133).

    dims = [in] + mlp_dims + [out]; all but the last layer are NormedLinear
    (Mish); the last is a plain Linear, or a NormedLinear when the MLP has a
    final activation (e.g. SimNorm for dynamics/encoder).
    """
    dims = [in_dim] + list(mlp_dims) + [out_dim]
    keys = jax.random.split(key, len(dims) - 1)
    layers = []
    for i in range(len(dims) - 2):
        layers.append(normed_linear_init(keys[i], dims[i], dims[i + 1], dtype))
    if final_normed:
        layers.append(normed_linear_init(keys[-1], dims[-2], dims[-1], dtype))
    else:
        layers.append(linear_init(keys[-1], dims[-2], dims[-1], dtype, zero=zero_final))
    return tuple(layers)


def mlp_apply(params, x, final_act: Optional[Callable] = None,
              dropout: float = 0.0, key=None, training: bool = False,
              dtype=None):
    """Apply the MLP. Dropout (if any) is applied on the first layer only,
    matching reference layers.py:131 (`dropout*(i==0)`). `dtype` selects the
    matmul compute precision for every layer (see linear_apply)."""
    for i, p in enumerate(params[:-1]):
        x = normed_linear_apply(
            p, x,
            dropout=dropout if i == 0 else 0.0,
            key=key, training=training, dtype=dtype)
    last = params[-1]
    if 'ln_w' in last:
        x = normed_linear_apply(last, x, act=final_act or mish, dtype=dtype)
    else:
        x = linear_apply(last, x, dtype=dtype)
        if final_act is not None:
            x = final_act(x)
    return x


# ---------------------------------------------------------------------------
# Ensemble (stacked params + vmap) — reference layers.py:8-33
# ---------------------------------------------------------------------------


def ensemble_init(key, n: int, init_fn: Callable):
    """Initialize `n` independent copies and stack leaves on a leading axis."""
    keys = jax.random.split(key, n)
    members = [init_fn(k) for k in keys]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *members)


def ensemble_apply(apply_fn: Callable, stacked_params, *args, keys=None):
    """vmap `apply_fn` over the leading param axis (shared inputs).

    `keys`, if given, is a [n, 2] array of PRNG keys giving each member its own
    randomness — the analogue of the reference's randomness="different" vmap
    (layers.py:30), needed for per-member Q dropout.
    """
    if keys is None:
        return jax.vmap(lambda p: apply_fn(p, *args))(stacked_params)
    return jax.vmap(lambda p, k: apply_fn(p, *args, key=k))(stacked_params, keys)


# ---------------------------------------------------------------------------
# Pixel path (reference layers.py:36-71, 136-150)
# ---------------------------------------------------------------------------


def pixel_preprocess(x):
    """uint8 [0,255] -> float [-0.5, 0.5] (reference layers.py:62-71)."""
    return x.astype(jnp.float32) / 255.0 - 0.5


def shift_aug(key, x, pad: int = 3):
    """Random ±pad-pixel shift augmentation (reference layers.py:36-59).

    Instead of the reference's grid_sample formulation, we pad (edge-replicate)
    and take a per-image random crop — an exact integer-shift equivalent —
    expressed as two batched `take_along_axis` gathers (rows, then columns).
    A vmapped per-image `dynamic_slice` is ~35x slower on TPU (measured
    188 ms vs 5 ms fwd+bwd at N=1024): XLA lowers N dynamic slices to N
    serialized programs, while the batched gather is one fused kernel.
    x: [N, H, W, C], any dtype (uint8 gathers are 4x cheaper than f32).
    """
    n, h, w, c = x.shape
    padded = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode='edge')
    shifts = jax.random.randint(key, (n, 2), 0, 2 * pad + 1)
    rows = shifts[:, 0][:, None] + jnp.arange(h)[None]   # [N, H]
    cols = shifts[:, 1][:, None] + jnp.arange(w)[None]   # [N, W]
    x = jnp.take_along_axis(padded, rows[:, :, None, None], axis=1)
    return jnp.take_along_axis(x, cols[:, None, :, None], axis=2)


_CONV_SPEC = ((7, 2), (5, 2), (3, 2), (3, 1))  # (kernel, stride) per layer


def conv_output_dim(h: int, w: int, num_channels: int) -> int:
    """Flattened output size of the conv encoder for an h x w input."""
    for k, s in _CONV_SPEC:
        h = (h - k) // s + 1
        w = (w - k) // s + 1
    return h * w * num_channels


def conv_encoder_init(key, in_ch: int, num_channels: int, dtype=jnp.float32):
    """4-layer CNN for 64x64 RGB (reference layers.py:136-150)."""
    keys = jax.random.split(key, len(_CONV_SPEC))
    layers = []
    ch = in_ch
    for k, (ksize, _stride) in zip(keys, _CONV_SPEC):
        layers.append(conv_init(k, ksize, ksize, ch, num_channels, dtype))
        ch = num_channels
    return tuple(layers)


def conv_encoder_apply(params, x, simnorm_dim: int, key=None, training: bool = False,
                       dtype=jnp.float32):
    """x: [N, C, H, W] uint8 (channel-first, reference obs layout) -> [N, D].

    ShiftAug runs only in training mode (torch Dropout-style train/eval
    semantics do not apply to ShiftAug in the reference — it always runs — but
    its randomness matters only during training; we keep it always-on when a
    key is provided for exact parity).

    `dtype` selects the conv compute precision: bfloat16 runs the conv stack
    at the MXU's native width and half the HBM activation traffic (params are
    stored f32 and cast at apply; the SimNorm output is always f32). The aug
    runs on the input's native dtype (uint8 gathers are 4x cheaper).
    """
    x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC (TPU-friendly layout)
    if key is not None:
        x = shift_aug(key, x)
    x = x.astype(dtype) / 255.0 - 0.5
    for p, (_k, stride) in zip(params, _CONV_SPEC):
        x = jax.lax.conv_general_dilated(
            x, p['w'].astype(dtype), window_strides=(stride, stride),
            padding='VALID', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        x = x + p['b'].astype(dtype)
        x = jax.nn.relu(x)
    x = x.reshape(x.shape[0], -1).astype(jnp.float32)
    return simnorm(x, simnorm_dim)
