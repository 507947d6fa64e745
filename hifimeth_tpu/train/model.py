"""Trainable DNAModNet in pure JAX (training-mode BatchNorm).

Replicates the reference training architecture (model_cnn.py:8-85): input BN
-> 8x [Conv1d stride-2 pad-1 no-bias, BN, ReLU] -> channel-major flatten ->
FC 256 -> ReLU -> FC 2.  Parameters and batch-norm running state are plain
pytrees; `fold_to_inference` exports the folded-BN parameter layout consumed
by model/cnn.py so trained models drop straight into the call engine.
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5
BN_MOMENTUM = 0.1          # torch BatchNorm1d default

# channel widths / kernel sizes of the in-repo training recipe
# (model_cnn.py:12-29); note the *shipped* CpG/CHG models use ks1=11
DEFAULT_CHANNELS = (128, 128, 128, 96, 96, 96, 64, 64)
DEFAULT_KERNELS = (13, 3, 3, 3, 3, 3, 3, 3)


def _kaiming_uniform(key, shape, fan_in):
    # torch Conv/Linear default init: kaiming_uniform(a=sqrt(5)) ->
    # U(-b, b) with b = sqrt(6 / ((1 + 5) * fan_in)) = 1/sqrt(fan_in)
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def init_params(key, kmer: int = 401, in_features: int = 8,
                channels=DEFAULT_CHANNELS, kernels=DEFAULT_KERNELS):
    """Returns (params, state).  Conv weights are WIO = (K, Cin, Cout)."""
    params: dict[str, Any] = {
        "bn0": {"gamma": jnp.ones(in_features), "beta": jnp.zeros(in_features)},
        "convs": [],
        }
    state: dict[str, Any] = {
        "bn0": {"mean": jnp.zeros(in_features), "var": jnp.ones(in_features)},
        "convs": [],
    }
    cin = in_features
    L = kmer
    for cout, k in zip(channels, kernels):
        key, sub = jax.random.split(key)
        params["convs"].append({
            "w": _kaiming_uniform(sub, (k, cin, cout), cin * k),
            "gamma": jnp.ones(cout),
            "beta": jnp.zeros(cout),
        })
        state["convs"].append({"mean": jnp.zeros(cout), "var": jnp.ones(cout)})
        L = (L + 2 - k) // 2 + 1
        cin = cout
    flat = cin * L
    key, k1, k2, k3, k4 = jax.random.split(key, 5)
    params["fc1"] = {"w": _kaiming_uniform(k1, (flat, 256), flat),
                     "b": _kaiming_uniform(k2, (256,), flat)}
    params["fc2"] = {"w": _kaiming_uniform(k3, (256, 2), 256),
                     "b": _kaiming_uniform(k4, (2,), 256)}
    return params, state


def _bn_train(x, gamma, beta, reduce_axes):
    mean = jnp.mean(x, axis=reduce_axes)
    var = jnp.var(x, axis=reduce_axes)
    inv = jax.lax.rsqrt(var + BN_EPS)
    y = (x - mean) * inv * gamma + beta
    return y, mean, var


def apply_train(params, state, x):
    """Training forward.  x: (B, kmer, feat).  Returns (logits, new_state).

    Batch statistics reduce over (batch, length) per channel; running stats
    update with torch's momentum convention and unbiased variance."""
    n = x.shape[0] * x.shape[1]
    unbias = n / max(n - 1, 1)
    new_state = {"convs": []}

    h, mean, var = _bn_train(x, params["bn0"]["gamma"], params["bn0"]["beta"],
                             reduce_axes=(0, 1))
    new_state["bn0"] = {
        "mean": (1 - BN_MOMENTUM) * state["bn0"]["mean"] + BN_MOMENTUM * mean,
        "var": (1 - BN_MOMENTUM) * state["bn0"]["var"] + BN_MOMENTUM * var * unbias,
    }
    for conv, cstate in zip(params["convs"], state["convs"]):
        h = jax.lax.conv_general_dilated(
            h, conv["w"], window_strides=(2,), padding=[(1, 1)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32)
        n = h.shape[0] * h.shape[1]
        unbias = n / max(n - 1, 1)
        h, mean, var = _bn_train(h, conv["gamma"], conv["beta"], (0, 1))
        new_state["convs"].append({
            "mean": (1 - BN_MOMENTUM) * cstate["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * cstate["var"] + BN_MOMENTUM * var * unbias,
        })
        h = jnp.maximum(h, 0.0)
    B, L, C = h.shape
    h = h.transpose(0, 2, 1).reshape(B, C * L)
    h = jnp.maximum(h @ params["fc1"]["w"] + params["fc1"]["b"], 0.0)
    return h @ params["fc2"]["w"] + params["fc2"]["b"], new_state


def apply_eval(params, state, x):
    """Inference forward with running statistics."""
    def bn(x, p, s):
        inv = jax.lax.rsqrt(s["var"] + BN_EPS)
        return (x - s["mean"]) * inv * p["gamma"] + p["beta"]

    h = bn(x, params["bn0"], state["bn0"])
    for conv, cstate in zip(params["convs"], state["convs"]):
        h = jax.lax.conv_general_dilated(
            h, conv["w"], window_strides=(2,), padding=[(1, 1)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32)
        h = jnp.maximum(bn(h, conv, cstate), 0.0)
    B, L, C = h.shape
    h = h.transpose(0, 2, 1).reshape(B, C * L)
    h = jnp.maximum(h @ params["fc1"]["w"] + params["fc1"]["b"], 0.0)
    return h @ params["fc2"]["w"] + params["fc2"]["b"]


def fold_to_inference(params, state) -> dict:
    """Fold BN into the inference param layout of model/cnn.py."""
    g0 = np.asarray(params["bn0"]["gamma"])
    b0 = np.asarray(params["bn0"]["beta"])
    m0 = np.asarray(state["bn0"]["mean"])
    v0 = np.asarray(state["bn0"]["var"])
    scale0 = g0 / np.sqrt(v0 + BN_EPS)
    out = {"bn0": {"scale": scale0.astype(np.float32),
                   "shift": (b0 - m0 * scale0).astype(np.float32)},
           "convs": []}
    for conv, cstate in zip(params["convs"], state["convs"]):
        w = np.asarray(conv["w"])                  # (K, Cin, Cout)
        g = np.asarray(conv["gamma"])
        m = np.asarray(cstate["mean"])
        v = np.asarray(cstate["var"])
        s = g / np.sqrt(v + BN_EPS)
        out["convs"].append({
            "w": (w * s[None, None, :]).astype(np.float32),
            "b": (np.asarray(conv["beta"]) - m * s).astype(np.float32),
            "stride": 2,
            "pad": (1, 1),
        })
    out["fc1"] = {"w": np.asarray(params["fc1"]["w"]),
                  "b": np.asarray(params["fc1"]["b"])}
    out["fc2"] = {"w": np.asarray(params["fc2"]["w"]),
                  "b": np.asarray(params["fc2"]["b"])}
    return out
