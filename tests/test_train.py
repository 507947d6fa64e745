import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hifimeth_tpu.model.cnn import dnamodnet_apply, load_params_npz
from hifimeth_tpu.train.data import (load_feature_blob, save_feature_blob,
                                     synthetic_blob)
from hifimeth_tpu.train.model import (apply_eval, apply_train,
                                      fold_to_inference, init_params)
from hifimeth_tpu.train.trainer import TrainConfig, train_context


def test_train_model_shapes_and_fold():
    key = jax.random.PRNGKey(0)
    params, state = init_params(key, kmer=401)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 401, 8))
    logits, new_state = apply_train(params, state, x)
    assert logits.shape == (4, 2)
    # after fold, eval-mode forward == folded inference forward
    folded = fold_to_inference(params, state)
    a = np.asarray(apply_eval(params, state, x))
    b = np.asarray(dnamodnet_apply(folded, x))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_train_matches_torch_reference_model():
    """Our training-mode forward must match torch's DNAModNet semantics."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    kmer = 65
    key = jax.random.PRNGKey(0)
    params, state = init_params(key, kmer=kmer,
                                channels=(16, 8), kernels=(5, 3))

    class TorchNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.bn0 = nn.BatchNorm1d(8)
            self.convs = nn.Sequential(
                nn.Conv1d(8, 16, 5, stride=2, padding=1, bias=False),
                nn.BatchNorm1d(16), nn.ReLU(),
                nn.Conv1d(16, 8, 3, stride=2, padding=1, bias=False),
                nn.BatchNorm1d(8), nn.ReLU(),
            )
            X = torch.zeros(1, 8, kmer)
            flat = self.convs(X).view(-1).shape[0]
            self.fc1 = nn.Linear(flat, 256)
            self.fc2 = nn.Linear(256, 2)

        def forward(self, X):
            X = X.permute(0, 2, 1)
            X = self.bn0(X)
            X = self.convs(X)
            X = torch.flatten(X, 1)
            return self.fc2(torch.relu(self.fc1(X)))

    tm = TorchNet()
    with torch.no_grad():
        tm.convs[0].weight.copy_(torch.from_numpy(
            np.asarray(params["convs"][0]["w"]).transpose(2, 1, 0)))
        tm.convs[3].weight.copy_(torch.from_numpy(
            np.asarray(params["convs"][1]["w"]).transpose(2, 1, 0)))
        tm.fc1.weight.copy_(torch.from_numpy(np.asarray(params["fc1"]["w"]).T))
        tm.fc1.bias.copy_(torch.from_numpy(np.asarray(params["fc1"]["b"])))
        tm.fc2.weight.copy_(torch.from_numpy(np.asarray(params["fc2"]["w"]).T))
        tm.fc2.bias.copy_(torch.from_numpy(np.asarray(params["fc2"]["b"])))

    x = np.random.default_rng(3).standard_normal((16, kmer, 8)).astype(np.float32)
    tm.train()
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got, new_state = apply_train(params, state, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)
    # running stats update matches torch momentum convention
    np.testing.assert_allclose(np.asarray(new_state["bn0"]["mean"]),
                               tm.bn0.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["bn0"]["var"]),
                               tm.bn0.running_var.numpy(), rtol=1e-4, atol=1e-5)


def test_blob_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    blob = synthetic_blob(rng, n_reads=5, read_len=100, n_samples=40)
    f, s, o = (str(tmp_path / n) for n in ("feat", "samp", "offs"))
    save_feature_blob(blob, f, s, o)
    blob2 = load_feature_blob(f, s, o)
    np.testing.assert_array_equal(blob.planes_t, blob2.planes_t)
    np.testing.assert_array_equal(blob.qids, blob2.qids)
    np.testing.assert_array_equal(blob.labels, blob2.labels)


def test_training_learns_synthetic_signal(tmp_path):
    rng = np.random.default_rng(1)
    blob = synthetic_blob(rng, n_reads=40, read_len=500, n_samples=4096)
    cfg = TrainConfig(kmer=81, batch_size=256, epochs=3, lr=0.02,
                      log_every=4)
    out = str(tmp_path / "model.npz")
    res = train_context(blob, cfg, out)
    assert res["final_acc"] > 0.85, f"training failed to learn: {res}"
    # exported model is loadable by the inference stack
    params = load_params_npz(out)
    x = np.zeros((2, 81, 8), np.float32)
    logits = np.asarray(dnamodnet_apply(params, x))
    assert logits.shape == (2, 2)


def test_training_sharded_over_mesh(tmp_path):
    """dp x tp mesh: 4 data shards x 2 model shards on 8 CPU devices."""
    from hifimeth_tpu.parallel.mesh import make_mesh
    assert len(jax.devices()) == 8
    rng = np.random.default_rng(2)
    blob = synthetic_blob(rng, n_reads=20, read_len=400, n_samples=1024)
    mesh = make_mesh(n_data=4, n_model=2)
    cfg = TrainConfig(kmer=81, batch_size=256, epochs=1, lr=0.02,
                      n_model_shards=2, log_every=2)
    res = train_context(blob, cfg, str(tmp_path / "m.npz"), mesh=mesh)
    assert res["steps"] == 4
    assert np.isfinite(res["final_loss"])


def test_extract_features_then_train(tmp_path):
    """Full training loop from a mapped kinetics BAM + labels: extract blob,
    train, and get a loadable model (closes the reference's missing
    blob-producer gap)."""
    from hifimeth_tpu.io.bam import BamHeader, BamWriter
    from hifimeth_tpu.io.mmtags import KINETICS_TAGS
    from hifimeth_tpu.tools.extract_features import run_extract_features
    from test_pileup import _simulate_alignment

    rng = np.random.default_rng(4)
    genome = "".join(rng.choice(list("ACGT"), 4000))
    fasta = tmp_path / "r.fa"
    fasta.write_text(f">c1\n{genome}\n")

    recs = []
    from hifimeth_tpu.io.bam import BamRecord
    for i in range(12):
        stored, cigar_str, pos = _simulate_alignment(rng, genome, 0)
        # pad to min length by retrying with longer target is overkill; just
        # lower min_read_size in the call below
        rec = BamRecord(qname=f"rd{i}", flag=0, refid=0, pos=pos, mapq=60)
        rec.set_seq(stored.encode())
        rec.set_cigar_str(cigar_str)
        L = rec.l_seq
        for t in KINETICS_TAGS:
            rec.set_tag(t, "B", ("C", rng.integers(0, 256, L).astype(np.uint8)))
        recs.append(rec)
    recs.sort(key=lambda r: r.pos)
    bam = tmp_path / "k.bam"
    hdr = BamHeader("@HD\tVN:1.6\tSO:coordinate\n", [("c1", len(genome))])
    with BamWriter(bam, hdr) as w:
        for r in recs:
            w.write(r)

    rows = []
    for i, ch in enumerate(genome):
        if ch in "CG":
            if i % 2:
                rows.append(f"c1\t{i}\t{i + 1}\t100\t12\t0")
            else:
                rows.append(f"c1\t{i}\t{i + 1}\t0\t0\t12")
    labels = tmp_path / "l.bed"
    labels.write_text("\n".join(rows) + "\n")

    prefix = str(tmp_path / "blob")
    res = run_extract_features(str(fasta), "CpG", str(labels), str(bam),
                               prefix, min_read_size=50)
    assert res["positives"] + res["negatives"] > 0

    blob = load_feature_blob(f"{prefix}.features", f"{prefix}.samples",
                             f"{prefix}.offsets")
    assert blob.n_samples == res["positives"] + res["negatives"]
    cfg = TrainConfig(kmer=41, batch_size=min(64, blob.n_samples), epochs=1,
                      lr=0.01, log_every=1)
    out = str(tmp_path / "m.npz")
    r = train_context(blob, cfg, out)
    assert np.isfinite(r["final_loss"])
