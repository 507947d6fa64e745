import os

import numpy as np
import pytest

from hifimeth_tpu.model.cnn import (dnamodnet_apply, load_params_npz,
                                    load_reference_onnx,
                                    logits_to_scaled_probs, save_params_npz)

MODELS_DIR = os.path.join(os.path.dirname(__file__), "..", "models")
REFERENCE_MODELS = "/root/reference/models"


def _random_features(rng, n):
    x = np.zeros((n, 401, 8), np.float32)
    codes = rng.integers(0, 4, (n, 401))
    x[np.arange(n)[:, None], np.arange(401)[None, :], codes] = 1.0
    x[..., 4:] = rng.random((n, 401, 4), dtype=np.float32)
    return x


def numpy_onnx_forward(path, x):
    """Independent evaluation of the ONNX graph with plain numpy, used as the
    golden check for the JAX forward."""
    from hifimeth_tpu.model.onnx_import import load_onnx_graph

    inits, nodes = load_onnx_graph(path)
    env = dict(inits)
    for n in nodes:
        if n["op"] == "Constant" and isinstance(n["attrs"].get("value"), np.ndarray):
            env[n["outputs"][0]] = n["attrs"]["value"]
    h = x.transpose(0, 2, 1)
    for n in nodes:
        op = n["op"]
        if op == "BatchNormalization":
            g, b, m, v = (env[i] for i in n["inputs"][1:5])
            eps = float(n["attrs"].get("epsilon", 1e-5))
            h = (h - m[:, None]) / np.sqrt(v[:, None] + eps) * g[:, None] + b[:, None]
        elif op == "Conv":
            w = env[n["inputs"][1]]
            bias = env[n["inputs"][2]] if len(n["inputs"]) > 2 else 0
            s = n["attrs"]["strides"][0]
            p = n["attrs"]["pads"][0]
            hp = np.pad(h, ((0, 0), (0, 0), (p, p)))
            K = w.shape[2]
            Lo = (hp.shape[2] - K) // s + 1
            out = np.zeros((hp.shape[0], w.shape[0], Lo), np.float32)
            for k in range(K):
                out += np.einsum("bcl,oc->bol", hp[:, :, k:k + s * Lo:s], w[:, :, k])
            h = out + np.asarray(bias)[:, None]
        elif op == "Relu":
            h = np.maximum(h, 0)
        elif op == "Flatten":
            h = h.reshape(h.shape[0], -1)
        elif op == "Gemm":
            w = env[n["inputs"][1]]
            b = env[n["inputs"][2]]
            if n["attrs"].get("transB", 0):
                w = w.T
            h = h @ w + b
        elif op == "MatMul":
            h = h @ env[n["inputs"][1]]
        elif op == "Add":
            h = h + env[n["inputs"][1]]
    return h


@pytest.mark.parametrize("ctx", ["CpG", "CHG", "CHH"])
def test_jax_forward_matches_onnx_graph(ctx):
    onnx_path = os.path.join(REFERENCE_MODELS, f"{ctx}.onnx")
    if not os.path.exists(onnx_path):
        pytest.skip("reference models not mounted")
    rng = np.random.default_rng(0)
    x = _random_features(rng, 8)
    ref = numpy_onnx_forward(onnx_path, x)
    params = load_reference_onnx(onnx_path)
    got = np.asarray(dnamodnet_apply(params, x))
    assert np.abs(got - ref).max() < 1e-4


@pytest.mark.parametrize("ctx", ["CpG", "CHG", "CHH"])
def test_repo_npz_models_match_reference_onnx(ctx):
    npz_path = os.path.join(MODELS_DIR, f"{ctx}.npz")
    onnx_path = os.path.join(REFERENCE_MODELS, f"{ctx}.onnx")
    if not os.path.exists(onnx_path):
        pytest.skip("reference models not mounted")
    rng = np.random.default_rng(1)
    x = _random_features(rng, 4)
    params = load_params_npz(npz_path)
    ref = numpy_onnx_forward(onnx_path, x)
    got = np.asarray(dnamodnet_apply(params, x))
    assert np.abs(got - ref).max() < 1e-4


def test_params_npz_roundtrip(tmp_path):
    npz_path = os.path.join(MODELS_DIR, "CpG.npz")
    params = load_params_npz(npz_path)
    p2 = tmp_path / "m.npz"
    save_params_npz(p2, params)
    params2 = load_params_npz(p2)
    rng = np.random.default_rng(2)
    x = _random_features(rng, 2)
    a = np.asarray(dnamodnet_apply(params, x))
    b = np.asarray(dnamodnet_apply(params2, x))
    np.testing.assert_array_equal(a, b)


def test_scaled_prob_conversion():
    import jax.numpy as jnp
    # logits chosen so softmax p1 is 0, .5, ~1
    logits = jnp.asarray([[100.0, -100.0], [3.0, 3.0], [-100.0, 100.0]])
    sp = np.asarray(logits_to_scaled_probs(logits))
    assert sp[0] == 0
    assert sp[1] == 127          # floor(255 * 0.5)
    assert sp[2] == 255


def test_bf16_compute_within_one_u8_bucket():
    import jax.numpy as jnp
    params = load_params_npz(os.path.join(MODELS_DIR, "CpG.npz"))
    rng = np.random.default_rng(3)
    x = _random_features(rng, 64)
    f32 = np.asarray(logits_to_scaled_probs(dnamodnet_apply(params, x)))
    bf16 = np.asarray(logits_to_scaled_probs(
        dnamodnet_apply(params, x, compute_dtype=jnp.bfloat16)))
    assert np.abs(f32.astype(int) - bf16.astype(int)).max() <= 3


@pytest.mark.parametrize("ctx", ["CpG", "CHH"])
def test_onnx_export_roundtrip(ctx, tmp_path):
    from hifimeth_tpu.model.cnn import load_reference_onnx
    from hifimeth_tpu.model.onnx_export import export_onnx

    params = load_params_npz(os.path.join(MODELS_DIR, f"{ctx}.npz"))
    out = str(tmp_path / "m.onnx")
    export_onnx(params, out)
    p2 = load_reference_onnx(out)
    rng = np.random.default_rng(5)
    x = _random_features(rng, 4)
    a = np.asarray(dnamodnet_apply(params, x))
    b = np.asarray(dnamodnet_apply(p2, x))
    np.testing.assert_array_equal(a, b)
    # independent numpy evaluation of the exported graph
    c = numpy_onnx_forward(out, x)
    assert np.abs(a - c).max() < 1e-3
