"""DNAModNet in pure JAX.

Architecture replicated from the reference training code
(/root/reference/training/model_cnn.py:8-85): input (B, kmer, 8) ->
channelwise BatchNorm -> 8x [Conv1d stride-2 pad-1, BN, ReLU] -> flatten
(channel-major, matching torch.flatten of (B, C, L)) -> FC 256 -> ReLU -> FC 2.

For inference all BatchNorms are folded: the shipped ONNX artifacts already
fold conv+BN pairs (verified against models/{CpG,CHG,CHH}.onnx), and we fold
the input BN into a per-channel scale/shift.  Parameters are a plain pytree so
the forward is a pure jittable function; layer geometry (kernel sizes,
channel widths, strides) is derived from the imported weights, not hardcoded
-- the shipped models use ks1=11 while the in-repo training script says 13.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .onnx_import import load_onnx_graph

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# Importers


def fold_batchnorm(gamma, beta, mean, var, eps):
    """Return (scale, shift) such that BN(x) == x * scale + shift."""
    scale = gamma / np.sqrt(var + eps)
    return scale.astype(np.float32), (beta - mean * scale).astype(np.float32)


def load_reference_onnx(path: str) -> Params:
    """Import an inference-ready parameter pytree from a reference ONNX file.

    Handles both exporter layouts observed in the shipped models: initializer
    weights + Gemm FCs (CpG/CHG) and Constant-node weights + MatMul/Add FCs
    (CHH).  Conv weights are stored WIO = (K, Cin, Cout) for
    lax.conv_general_dilated with ('NWC','WIO','NWC') dimension numbers.
    """
    inits, nodes = load_onnx_graph(path)
    # Environment mapping tensor names -> ndarray (initializers + constants).
    env = dict(inits)
    for n in nodes:
        if n["op"] == "Constant" and isinstance(n["attrs"].get("value"), np.ndarray):
            env[n["outputs"][0]] = n["attrs"]["value"]

    params: Params = {"convs": []}
    pending_matmul: np.ndarray | None = None
    for n in nodes:
        op = n["op"]
        if op == "BatchNormalization":
            gamma, beta, mean, var = (env[i] for i in n["inputs"][1:5])
            eps = float(n["attrs"].get("epsilon", 1e-5))
            scale, shift = fold_batchnorm(gamma, beta, mean, var, eps)
            params["bn0"] = {"scale": scale, "shift": shift}
        elif op == "Conv":
            w = env[n["inputs"][1]]                      # (Cout, Cin, K)
            b = env[n["inputs"][2]] if len(n["inputs"]) > 2 else np.zeros(w.shape[0], np.float32)
            strides = n["attrs"].get("strides", [1])
            pads = n["attrs"].get("pads", [0, 0])
            params["convs"].append({
                "w": np.ascontiguousarray(w.transpose(2, 1, 0)),  # WIO
                "b": b.astype(np.float32),
                "stride": int(strides[0]),
                "pad": (int(pads[0]), int(pads[1])),
            })
        elif op == "Gemm":
            w = env[n["inputs"][1]]                      # (out, in), transB=1
            if not n["attrs"].get("transB", 0):
                w = w.T
            b = env[n["inputs"][2]]
            key = "fc1" if "fc1" not in params else "fc2"
            params[key] = {"w": np.ascontiguousarray(w.T), "b": b}  # (in, out)
        elif op == "MatMul":
            pending_matmul = env[n["inputs"][1]]          # (in, out) already
        elif op == "Add" and pending_matmul is not None:
            b = env[n["inputs"][1]]
            key = "fc1" if "fc1" not in params else "fc2"
            params[key] = {"w": np.ascontiguousarray(pending_matmul), "b": b}
            pending_matmul = None

    if "fc1" not in params or "fc2" not in params or len(params["convs"]) == 0:
        raise ValueError(f"could not reconstruct DNAModNet layers from {path}")
    return params


def params_to_numpy(params: Params) -> dict[str, np.ndarray]:
    """Flatten a params pytree to a {path: array} dict for npz storage."""
    flat = {}
    flat["bn0.scale"] = np.asarray(params["bn0"]["scale"])
    flat["bn0.shift"] = np.asarray(params["bn0"]["shift"])
    for i, c in enumerate(params["convs"]):
        flat[f"convs.{i}.w"] = np.asarray(c["w"])
        flat[f"convs.{i}.b"] = np.asarray(c["b"])
        flat[f"convs.{i}.stride"] = np.asarray(c["stride"])
        flat[f"convs.{i}.pad"] = np.asarray(c["pad"])
    for k in ("fc1", "fc2"):
        flat[f"{k}.w"] = np.asarray(params[k]["w"])
        flat[f"{k}.b"] = np.asarray(params[k]["b"])
    return flat


def params_from_numpy(flat: dict[str, np.ndarray]) -> Params:
    params: Params = {
        "bn0": {"scale": flat["bn0.scale"], "shift": flat["bn0.shift"]},
        "convs": [],
        "fc1": {"w": flat["fc1.w"], "b": flat["fc1.b"]},
        "fc2": {"w": flat["fc2.w"], "b": flat["fc2.b"]},
    }
    i = 0
    while f"convs.{i}.w" in flat:
        params["convs"].append({
            "w": flat[f"convs.{i}.w"],
            "b": flat[f"convs.{i}.b"],
            "stride": int(flat[f"convs.{i}.stride"]),
            "pad": tuple(int(x) for x in flat[f"convs.{i}.pad"]),
        })
        i += 1
    return params


def save_params_npz(path: str, params: Params) -> None:
    np.savez_compressed(path, **params_to_numpy(params))


def load_params_npz(path: str) -> Params:
    with np.load(path) as z:
        return params_from_numpy({k: z[k] for k in z.files})


# ---------------------------------------------------------------------------
# Forward


def conv_spec(params: Params) -> tuple[tuple[int, int, int], ...]:
    """Static conv geometry (stride, pad_lo, pad_hi) per layer, for use as a
    jit-static argument alongside the traced weight pytree."""
    return tuple((int(c["stride"]), int(c["pad"][0]), int(c["pad"][1]))
                 for c in params["convs"])


def _conv1d_im2col(h: jax.Array, w: jax.Array, stride: int, lo: int,
                   hi: int) -> jax.Array:
    """Strided Conv1d as one big matmul: unfold K strided column slices and
    contract (B*Lo, K*Cin) @ (K*Cin, Cout) on the MXU.  Avoids TPU conv
    lowering overhead for small channel counts."""
    K, Cin, Cout = w.shape
    B, L, C = h.shape
    hp = jnp.pad(h, ((0, 0), (lo, hi), (0, 0)))
    Lo = (L + lo + hi - K) // stride + 1
    cols = [jax.lax.slice(hp, (0, k, 0), (B, k + stride * (Lo - 1) + 1, C),
                          (1, stride, 1)) for k in range(K)]
    patches = jnp.concatenate(cols, axis=-1)          # (B, Lo, K*Cin)
    wmat = w.reshape(K * Cin, Cout)
    return jax.lax.dot_general(patches, wmat, (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def dnamodnet_apply(params: Params, x: jax.Array, *,
                    compute_dtype=jnp.float32,
                    spec: tuple[tuple[int, int, int], ...] | None = None,
                    conv_impl: str = "direct") -> jax.Array:
    """Forward pass: x (B, kmer, feat) float -> logits (B, 2) float32.

    Matches the reference forward (model_cnn.py:76-85) with BN folded.  With
    compute_dtype=bfloat16 the convs/FCs run on the MXU in bf16 with float32
    accumulation (preferred_element_type), which keeps scaled-prob error
    within the u8 quantization bucket in practice.

    `spec` carries the static (stride, pad) conv geometry; when None it is
    derived from the params (only valid outside jit, where stride/pad are
    plain ints).
    """
    if spec is None:
        spec = conv_spec(params)
    bn = params["bn0"]
    h = x.astype(jnp.float32) * jnp.asarray(bn["scale"]) + jnp.asarray(bn["shift"])
    h = h.astype(compute_dtype)
    for conv, (stride, lo, hi) in zip(params["convs"], spec):
        w = jnp.asarray(conv["w"], dtype=compute_dtype)
        K, cin, cout = w.shape
        # "auto": im2col where the channel count is far below the 128-lane
        # MXU width (the first conv has Cin=8; direct lowering pads channels
        # to 128 and wastes 16x the MACs - the dominant cost of this model)
        use_im2col = (conv_impl == "im2col" or
                      (conv_impl == "auto" and cin * K <= 256))
        if use_im2col:
            h = _conv1d_im2col(h, w, stride, lo, hi)
        else:
            h = jax.lax.conv_general_dilated(
                h, w,
                window_strides=(stride,),
                padding=[(lo, hi)],
                dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=jnp.float32,
            )
        h = jnp.maximum(h + jnp.asarray(conv["b"]), 0.0).astype(compute_dtype)
    # torch flattens (B, C, L) channel-major; we carry NWC = (B, L, C).
    B, L, C = h.shape
    h = h.transpose(0, 2, 1).reshape(B, C * L)
    h = h @ jnp.asarray(params["fc1"]["w"], dtype=compute_dtype)
    h = jnp.maximum(h.astype(jnp.float32) + jnp.asarray(params["fc1"]["b"]), 0.0)
    h = h.astype(compute_dtype) @ jnp.asarray(params["fc2"]["w"], dtype=compute_dtype)
    return h.astype(jnp.float32) + jnp.asarray(params["fc2"]["b"])


def logits_to_scaled_probs(logits: jax.Array) -> jax.Array:
    """2-logit -> u8 scaled probability, reproducing the reference conversion
    scaled = min(255, int(255 * softmax_p1)) (mod_batch.cpp:46-64)."""
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p1 = e[..., 1] / (e[..., 0] + e[..., 1])
    v = jnp.floor(255.0 * p1).astype(jnp.int32)
    return jnp.clip(v, 0, 255).astype(jnp.uint8)
