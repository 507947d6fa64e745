"""`hifimeth-tpu import-model`: convert reference ONNX models to native .npz.

Users migrating from the reference tool point this at its models/ directory
(containing CpG.onnx / CHG.onnx / CHH.onnx, cf. reference mod_main.cpp:69-98);
the converted inference-ready parameter files are written next to a kmer.txt.
"""
from __future__ import annotations

import os
import sys

from ..constants import CONTEXTS, KMER_SIZE
from ..model.cnn import load_reference_onnx, save_params_npz
from ..utils.logging import log


def import_models(src_dir: str, dst_dir: str, contexts=CONTEXTS) -> None:
    os.makedirs(dst_dir, exist_ok=True)
    for ctx in contexts:
        src = os.path.join(src_dir, f"{ctx}.onnx")
        if not os.path.exists(src):
            log("skip %s: %s not found", ctx, src)
            continue
        params = load_reference_onnx(src)
        dst = os.path.join(dst_dir, f"{ctx}.npz")
        save_params_npz(dst, params)
        n = sum(int(p["w"].size + p["b"].size) for p in params["convs"])
        n += int(params["fc1"]["w"].size + params["fc1"]["b"].size)
        n += int(params["fc2"]["w"].size + params["fc2"]["b"].size)
        log("imported %s -> %s (%d params)", src, dst, n)
    kmer_src = os.path.join(src_dir, "kmer.txt")
    kmer = KMER_SIZE
    if os.path.exists(kmer_src):
        with open(kmer_src) as f:
            kmer = int(f.read().strip())
    with open(os.path.join(dst_dir, "kmer.txt"), "w") as f:
        f.write(f"{kmer}\n")


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 2:
        print("USAGE:\n  hifimeth-tpu import-model <reference-model-dir> <output-dir>",
              file=sys.stderr)
        return 1
    import_models(argv[0], argv[1])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
