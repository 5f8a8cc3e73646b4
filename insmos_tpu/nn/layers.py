"""Functional NN primitives: explicit param/state pytrees, no module magic.

Every layer is (init_* -> params[, state], apply -> y[, new_state]).
BatchNorm follows torch semantics (normalize by biased batch variance,
running stats updated as new = (1-m)*old + m*batch with unbiased variance;
reference uses eps=1e-3, momentum=0.01 on sparse/BEV BN — spconv_unet.py:118,
base_bev_backbone.py — and ME defaults eps=1e-5, momentum=0.1 in MotionNet).

Sparse BN is masked: statistics run over valid voxel rows only, which is
exactly what the reference's BatchNorm1d sees (it gets only real voxel rows;
our padding rows must not contaminate the stats).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, -bound, bound)


# ------------------------------------------------------- mixed precision
def cast_compute(params, dtype_str: str | None):
    """Cast matmul/conv weights (float32 leaves with ndim >= 2) to the
    compute dtype; BN scales, biases, and stats stay float32.

    Standard TPU mixed precision: float32 master params, low-precision
    matmul operands, float32 accumulation (every matmul in this package
    passes preferred_element_type=float32). Gradients flow back to the
    float32 masters through the cast's transpose.
    """
    if dtype_str in (None, "float32"):
        return params
    dt = jnp.dtype(dtype_str)
    return jax.tree_util.tree_map(
        lambda a: a.astype(dt)
        if (getattr(a, "ndim", 0) >= 2 and a.dtype == jnp.float32)
        else a,
        params,
    )


def mm(x, w, preferred_element_type=jnp.float32):
    """Matmul in the weight's dtype with f32 accumulation.

    precision is pinned to HIGHEST: measured on the target TPU runtime,
    f32 matmuls at default precision lower to a pathologically slow path
    (~0.1 TF/s vs 18 TF/s at highest — tools/probe_matmul2.py); for bf16
    operands the setting is a no-op.
    """
    return jnp.matmul(
        x.astype(w.dtype),
        w,
        preferred_element_type=preferred_element_type,
        precision="highest",
    )


# ------------------------------------------------------------------ linear
def init_linear(key, cin: int, cout: int, bias: bool = True):
    """torch.nn.Linear default init (kaiming uniform, a=sqrt(5))."""
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(cin)
    p = {"w": _uniform(k1, (cin, cout), bound)}
    if bias:
        p["b"] = _uniform(k2, (cout,), bound)
    return p


def linear(p, x):
    y = mm(x, p["w"])
    return y + p["b"] if "b" in p else y


# ------------------------------------------------------- sparse conv weight
def init_sparse_conv(key, k_volume: int, cin: int, cout: int):
    """(K, Cin, Cout) sparse conv weight, kaiming-uniform over fan_in=K*Cin."""
    bound = 1.0 / math.sqrt(k_volume * cin)
    return {"w": _uniform(key, (k_volume, cin, cout), bound)}


# -------------------------------------------------------------- batch norm
def init_bn(c: int):
    params = {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}
    state = {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))}
    return params, state


def batch_norm(
    p,
    s,
    x,
    *,
    train: bool,
    mask=None,
    momentum: float = 0.01,
    eps: float = 1e-3,
):
    """x: (..., C); mask: broadcastable to x[..., 0] — rows included in stats.

    Returns (y, new_state). In eval mode state passes through unchanged.
    """
    if not train:
        mean, var = s["mean"], s["var"]
        y = (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
        return y, s

    if mask is None:
        axes = tuple(range(x.ndim - 1))
        n = math.prod(x.shape[:-1])
        mean = jnp.mean(x, axis=axes)
        var = jnp.mean((x - mean) ** 2, axis=axes)
        n_arr = jnp.asarray(n, x.dtype)
    else:
        m = mask.astype(x.dtype)[..., None]
        n_arr = jnp.clip(m.sum(), 1.0, None)
        axes = tuple(range(x.ndim - 1))
        mean = (x * m).sum(axis=axes) / n_arr
        var = (((x - mean) ** 2) * m).sum(axis=axes) / n_arr
    y = (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    unbiased = var * n_arr / jnp.clip(n_arr - 1.0, 1.0, None)
    new_state = {
        "mean": (1 - momentum) * s["mean"] + momentum * mean,
        "var": (1 - momentum) * s["var"] + momentum * unbiased,
    }
    return y, new_state


# ---------------------------------------------------------------- 2D convs
def init_conv2d(key, kh: int, kw: int, cin: int, cout: int, bias: bool = False):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(kh * kw * cin)
    p = {"w": _uniform(k1, (kh, kw, cin, cout), bound)}  # HWIO
    if bias:
        p["b"] = _uniform(k2, (cout,), bound)
    return p


def conv2d(p, x, stride: int = 1, padding="SAME"):
    """x: (H, W, C) NHWC single image (batch handled by vmap).

    Runs in the weight's dtype with f32 result (a preferred_element_type
    that differs from the operand dtype breaks the conv VJP — the cotangent
    arrives f32 against a bf16 kernel — so the output is cast instead; the
    TPU MXU accumulates f32 internally either way).
    """
    y = jax.lax.conv_general_dilated(
        x.astype(p["w"].dtype)[None],
        p["w"],
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision="highest",
    )[0].astype(jnp.float32)
    return y + p["b"] if "b" in p else y


def conv2d_transpose(p, x, stride: int = 2):
    """ConvTranspose2d kernel=stride (the BEV deblock): exact upsample."""
    y = jax.lax.conv_transpose(
        x.astype(p["w"].dtype)[None],
        p["w"],
        strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision="highest",
    )[0].astype(jnp.float32)
    return y + p["b"] if "b" in p else y


def relu(x):
    return jnp.maximum(x, 0.0)
