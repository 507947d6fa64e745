#!/usr/bin/env python3
"""Ablation profile of the fused kernel via its `stage` gate:
block (conv1+banks) | stage (+site loop) | conv2 (+fixes) | full.
Timing: nb=1 vs nb=8 difference, interleaved best-of, device-reduced
output (returning logits would swamp the timing with tunnel D2H)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/hifimeth_tpu_xla"))

import jax
import jax.numpy as jnp
import numpy as np

from hifimeth_tpu.ops import fused as F


def main():
    from functools import partial

    from hifimeth_tpu.engine.call import default_model_dir
    from hifimeth_tpu.features.windows import featurize_planes_t
    from hifimeth_tpu.model.cnn import load_params_npz
    from hifimeth_tpu.ops.gather import CHUNK_LANES, plan_groups

    cap = 1 << 21
    rng = np.random.default_rng(3)
    planes = np.zeros((5, cap), np.uint8)
    planes[0].fill(255)
    lo_, hi_ = 401, cap - 401
    planes[0, lo_:hi_] = rng.integers(0, 4, hi_ - lo_)
    planes[1:, lo_:hi_] = rng.integers(0, 256, (4, hi_ - lo_))
    feats_t = featurize_planes_t(jnp.asarray(planes))
    np.asarray(jax.jit(jnp.sum)(feats_t))
    prep = F.prepare_fused_params(load_params_npz(
        os.path.join(default_model_dir(), "CpG.npz")))
    SB = 8192
    ngrp = SB // F.GROUP

    @partial(jax.jit, static_argnames=("stage",))
    def fwd(prep, feats_t, bases_b, rels_b, stage):
        def one(batch):
            b, r = batch
            return jnp.sum(F.fused_forward(prep, feats_t, b, r, stage=stage))
        return jnp.sum(jax.lax.map(one, (bases_b, rels_b)))

    def make_chunk(nb):
        n = nb * SB
        span = min(int(n * 3.3), hi_ - lo_)
        centers = np.sort(lo_ + rng.integers(0, span, n)).astype(np.int32)
        bases, rels, _ = plan_groups((centers - 200).astype(np.int32),
                                     F.GROUP, F.BLOCK_LANES, 401, cap,
                                     extent=CHUNK_LANES + 127)
        b128 = (bases // 128) * 128
        rels = rels + (bases - b128)[:, None]
        pad_g = nb * ngrp - len(bases)
        if pad_g > 0:
            b128 = np.concatenate([b128, np.zeros(pad_g, np.int32)])
            rels = np.concatenate([rels, np.zeros((pad_g, F.GROUP), np.int32)])
        return (jnp.asarray(b128[:nb * ngrp].reshape(nb, ngrp)),
                jnp.asarray(rels[:nb * ngrp].reshape(nb, ngrp, F.GROUP)))

    chunks = {nb: make_chunk(nb) for nb in (1, 8)}
    stages = sys.argv[1:] or ["block", "stage", "conv2", "full"]
    for s in stages:
        for nb in (1, 8):
            b, r = chunks[nb]
            np.asarray(fwd(prep, feats_t, b, r, s))      # compile+warm
    times = {s: {1: float("inf"), 8: float("inf")} for s in stages}
    for _ in range(6):
        for s in stages:
            for nb in (1, 8):
                b, r = chunks[nb]
                t0 = time.perf_counter()
                np.asarray(fwd(prep, feats_t, b, r, s))
                times[s][nb] = min(times[s][nb], time.perf_counter() - t0)
    for s in stages:
        t = times[s]
        per = (t[8] - t[1]) / 7
        print(f"{s:6s}: {per*1e3:6.2f} ms/batch", file=sys.stderr)


if __name__ == "__main__":
    main()
