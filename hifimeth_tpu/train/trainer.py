"""Per-context DNAModNet trainer: optax SGD on a device mesh.

Hyperparameters replicate the reference recipe (train.py:29-101): seed 42,
SGD lr=0.1 / weight-decay 1e-5 / momentum 0.9 nesterov, StepLR gamma=0.2 per
epoch, CrossEntropyLoss, batch 512, 3 epochs, checkpoints every 10k steps.
The input pipeline runs the same on-device gather kernel as inference
(features/windows.gather_and_featurize); batches shard over the mesh's
`data` axis and FC layers over `model` (parallel/mesh.py).
"""
from __future__ import annotations

import os
import pickle

import time
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..features.windows import gather_and_featurize
from ..model.cnn import save_params_npz
from ..parallel.mesh import (batch_sharding, make_mesh, shard_tree,
                             train_param_shardings)
from ..utils.logging import log
from .data import FeatureBlob, load_feature_blob
from .model import apply_train, fold_to_inference, init_params


@dataclass
class TrainConfig:
    kmer: int = 401
    batch_size: int = 512
    epochs: int = 3
    lr: float = 0.1
    weight_decay: float = 1e-5
    momentum: float = 0.9
    lr_gamma: float = 0.2
    seed: int = 42
    ckpt_every: int = 10000
    n_model_shards: int = 1
    log_every: int = 100


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int):
    schedule = optax.exponential_decay(
        init_value=cfg.lr, transition_steps=max(steps_per_epoch, 1),
        decay_rate=cfg.lr_gamma, staircase=True)
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.sgd(schedule, momentum=cfg.momentum, nesterov=True),
    )


def make_train_step(optimizer, kmer: int):
    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, state, opt_state, centers, strands, rstart, rend,
                   labels, planes_t):
        x = gather_and_featurize(planes_t, centers, strands, rstart, rend,
                                 kmer_size=kmer)

        def loss_fn(p):
            logits, new_state = apply_train(p, state, x)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
            acc = (jnp.argmax(logits, -1) == labels).mean()
            return loss, (new_state, acc)

        (loss, (new_state, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, loss, acc

    return train_step


def train_context(blob: FeatureBlob, cfg: TrainConfig, model_out: str,
                  ckpt_dir: str | None = None, mesh=None) -> dict:
    mesh = mesh or make_mesh(n_model=cfg.n_model_shards)
    key = jax.random.PRNGKey(cfg.seed)
    params, state = init_params(key, kmer=cfg.kmer)
    p_shard = train_param_shardings(mesh, params)
    params = shard_tree(params, p_shard)
    state = jax.device_put(state)       # replicated (tiny)

    n = blob.n_samples
    steps_per_epoch = n // cfg.batch_size
    optimizer = make_optimizer(cfg, steps_per_epoch)
    opt_state = optimizer.init(params)
    train_step = make_train_step(optimizer, cfg.kmer)

    b_shard = batch_sharding(mesh)
    planes_dev = jax.device_put(blob.planes_t)

    rng = np.random.default_rng(cfg.seed)
    step = 0
    history = []
    t0 = time.time()
    for epoch in range(cfg.epochs):
        order = rng.permutation(n)
        for bi in range(steps_per_epoch):
            idx = order[bi * cfg.batch_size:(bi + 1) * cfg.batch_size]
            centers, strands, rstart, rend, labels = blob.site_arrays(idx)
            args = [jax.device_put(a, b_shard) for a in
                    (centers, strands, rstart, rend, labels.astype(np.int32))]
            params, state, opt_state, loss, acc = train_step(
                params, state, opt_state, *args, planes_dev)
            step += 1
            if step % cfg.log_every == 0 or (bi + 1 == steps_per_epoch):
                loss_v, acc_v = float(loss), float(acc)
                history.append((step, loss_v, acc_v))
                log("epoch %d step %d loss %.4f acc %.4f (%.1f steps/s)",
                    epoch + 1, step, loss_v, acc_v,
                    step / (time.time() - t0))
            if ckpt_dir and step % cfg.ckpt_every == 0:
                save_checkpoint(os.path.join(ckpt_dir, f"{epoch}_{step}.ckpt"),
                                params, state)
        if ckpt_dir:
            save_checkpoint(
                os.path.join(ckpt_dir, f"kmer_{cfg.kmer}_epoch_{epoch + 1}.ckpt"),
                params, state)
    folded = fold_to_inference(jax.device_get(params), jax.device_get(state))
    save_params_npz(model_out, folded)
    log("saved inference model to %s", model_out)
    return {"steps": step, "history": history,
            "final_loss": history[-1][1] if history else None,
            "final_acc": history[-1][2] if history else None}


def save_checkpoint(path, params, state):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump({"params": jax.device_get(params),
                     "state": jax.device_get(state)}, f)


def load_checkpoint(path):
    with open(path, "rb") as f:
        d = pickle.load(f)
    return d["params"], d["state"]


def main(argv) -> int:
    import argparse

    ap = argparse.ArgumentParser(
        "hifimeth-tpu train",
        description="Train a per-context DNAModNet on extracted features "
                    "(reference blob format: features/samples/offsets)")
    ap.add_argument("--feature", required=True)
    ap.add_argument("--train-sample", required=True)
    ap.add_argument("--offsets", required=True)
    ap.add_argument("--model-out", required=True,
                    help="output .npz inference model path")
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--kmer-size", type=int, default=401)
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--epoch", type=int, default=3)
    ap.add_argument("--lr", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--model-shards", type=int, default=1)
    args = ap.parse_args(argv)

    cfg = TrainConfig(kmer=args.kmer_size, batch_size=args.batch_size,
                      epochs=args.epoch, lr=args.lr, seed=args.seed,
                      n_model_shards=args.model_shards)
    log("loading feature blob...")
    blob = load_feature_blob(args.feature, args.train_sample, args.offsets)
    log("%d samples over %d reads", blob.n_samples, len(blob.read_start))
    train_context(blob, cfg, args.model_out, args.ckpt_dir)
    return 0
