"""Command-line interface.

Mirrors the reference CLI surface (main.cpp:35-46): call, pileup, corr,
cov2bed, sample, eval - plus framework extras: import-model, read-level-eval,
train, bench.  Flags keep the reference's short names where they exist
(mod_options.cpp, pileup.cpp) with long aliases.
"""
from __future__ import annotations

import sys

from . import __version__
from .utils.logging import log, program_banner, program_info

PROG = "hifimeth-tpu"


def _usage() -> int:
    print(f"""USAGE:
  {PROG} <command> [OPTIONS]

COMMANDS:
  call             Detect single-molecule 5mC (CpG/CHG/CHH) in BAM reads
  pileup           Genome-wide methylation frequency from an aligned mod-BAM
  corr             Pearson correlation between two methylation BED files
  cov2bed          Convert 1-based Bismark .cov to 0-based BED
  sample           Randomly subsample an unmapped kinetics BAM to a coverage
  eval             Extract read-level evaluation samples vs BS-seq labels
  read-level-eval  Score eval output files (accuracy/precision/.../AUC/AP)
  merge-shards     Interleave per-host shard BAMs into global read order
  merge-pileup-shards  Concatenate per-host pileup BED shards
  import-model     Convert reference ONNX models to native .npz
  export-model     Convert a native .npz model back to ONNX
  extract-features Build training feature blobs from BAM + BS-seq labels
  train            Train a per-context DNAModNet on extracted features
  version          Print version

VERSION:
  {__version__}""", file=sys.stderr)
    return 1


def _parse_call(argv):
    from .engine.call import CallConfig
    cfg = CallConfig()
    pos = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a in ("-h", "--help"):
            pos = []          # force the usage branch below
            break
        if a in ("-v", "--version"):
            print(__version__)
            raise SystemExit(0)
        if a in ("-m", "--model-dir"):
            cfg.model_dir = argv[i + 1]; i += 2
        elif a in ("-l", "--min-read-size"):
            cfg.min_read_size = int(argv[i + 1]); i += 2
        elif a in ("-s", "--site-batch"):
            cfg.site_batch = int(argv[i + 1]); i += 2
        elif a in ("-b", "--read-batch-size"):
            cfg.read_batch_size = int(argv[i + 1]); i += 2
        elif a in ("-k", "--keep-kinetics"):
            cfg.keep_kinetics = True; i += 1
        elif a in ("-t", "--threads"):
            cfg.io_threads = int(argv[i + 1]); i += 2
        elif a in ("-c", "--contexts"):
            sel = [c.strip().upper() for c in argv[i + 1].split(",") if c.strip()]
            name_map = {"CPG": "CpG", "CHG": "CHG", "CHH": "CHH"}
            try:
                cfg.contexts = tuple(name_map[c] for c in sel)
            except KeyError:
                raise SystemExit(f"Illegal argument to option '-c': {argv[i + 1]}")
            i += 2
        elif a == "--dtype":
            cfg.compute_dtype = {"f32": "float32", "float32": "float32",
                                 "bf16": "bfloat16", "bfloat16": "bfloat16"}[argv[i + 1]]
            i += 2
        elif a == "--buffer-bases":
            cfg.buffer_bases = int(argv[i + 1]); i += 2
        elif a == "--flush-bases":
            cfg.flush_bases = int(argv[i + 1]); i += 2
        elif a == "--data-parallel":
            cfg.data_parallel = True; i += 1
        elif a == "--feat-channels":
            cfg.feat_channels = int(argv[i + 1]); i += 2
        elif a == "--gather-impl":
            cfg.gather_impl = argv[i + 1]; i += 2
            if cfg.gather_impl not in ("auto", "slice", "folded", "pallas",
                                       "fused"):
                raise SystemExit(
                    f"Illegal argument to option '--gather-impl': "
                    f"{cfg.gather_impl} "
                    f"(expected auto|slice|folded|pallas|fused)")
        elif a == "--sync-emit":
            cfg.async_emit = False; i += 1
        elif a == "--decode-workers":
            cfg.decode_workers = int(argv[i + 1]); i += 2
        elif a == "--stats-json":
            cfg.stats_json = argv[i + 1]; i += 2
        elif a == "--shard":
            shard_str = argv[i + 1]; i += 2
            cfg._shard = shard_str  # parsed in main
        elif a.startswith("-") and len(a) > 1:
            raise SystemExit(f"ERROR: unrecognised option {a}")
        else:
            pos.append(a); i += 1
    if len(pos) != 2:
        print(f"USAGE:\n  {PROG} call [OPTIONS] BAM MOD-BAM\n\n"
              "OPTIONS:\n"
              "  -m DIR   model directory (default: <repo>/models)\n"
              "  -l INT   minimum read length (default 1000)\n"
              "  -s INT   device site-batch size (default 8192)\n"
              "  -b INT   reads per progress batch (default 10000)\n"
              "  -k       keep kinetics tags in output\n"
              "  -c STR   contexts, comma separated (default cpg,chg,chh)\n"
              "  -t INT   IO threads (default 8)\n"
              "  --dtype {f32,bf16}   device compute dtype\n"
              "  --buffer-bases INT   packed device buffer capacity\n"
              "  --flush-bases INT    flush granularity (pallas path; "
              "0 = capacity)\n"
              "  --sync-emit          disable the async emit worker thread\n"
              "  --decode-workers INT decode/site-scan prefetch threads\n"
              "           (-1 auto = cores-1 capped at 4; 0 = inline)\n"
              "  --gather-impl {auto,slice,folded,pallas}\n"
              "           window-fetch path (auto: Pallas group-fetch "
              "kernel on TPU, folded on CPU)",
              file=sys.stderr)
        raise SystemExit(1)
    return cfg, pos


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help", "help"):
        return _usage()
    cmd, rest = argv[0], argv[1:]
    if cmd in ("-v", "--version", "version"):
        print(__version__)
        return 0

    if cmd == "call":
        from .engine.call import run_call
        from .parallel.dist import ShardSpec, init_distributed
        cfg, pos = _parse_call(rest)
        shard = init_distributed()
        shard_str = getattr(cfg, "_shard", None)
        if shard_str:
            pid, nproc = shard_str.split("/")
            shard = ShardSpec(process_id=int(pid), num_processes=int(nproc))
        program_banner(PROG, __version__)
        from .utils.system import dump_parameters
        dump_parameters("call", {
            "model_dir": cfg.resolve_model_dir(),
            "min_read_size": cfg.min_read_size,
            "site_batch": cfg.site_batch,
            "read_batch_size": cfg.read_batch_size,
            "keep_kinetics": int(cfg.keep_kinetics),
            "contexts": ",".join(cfg.contexts),
            "io_threads": cfg.io_threads,
            "compute_dtype": cfg.compute_dtype,
            "gather_impl": cfg.gather_impl,
            "input": pos[0],
            "output": pos[1],
        })
        with program_info(PROG):
            run_call(pos[0], pos[1], cfg, cmdline=" ".join([PROG] + argv),
                     shard=shard)
        return 0

    if cmd == "merge-shards":
        from .parallel.dist import merge_shard_bams
        batch = 10000
        pos = []
        i = 0
        while i < len(rest):
            if rest[i] in ("-b", "--batch-size"):
                batch = int(rest[i + 1]); i += 2
            else:
                pos.append(rest[i]); i += 1
        if len(pos) < 2:
            print(f"USAGE:\n  {PROG} merge-shards [-b batch] out.bam "
                  "shard0.bam shard1.bam ...", file=sys.stderr)
            return 1
        n = merge_shard_bams(pos[0], pos[1:], batch_size=batch)
        log("merged %d records into %s", n, pos[0])
        return 0

    if cmd == "merge-pileup-shards":
        from .quant.pileup import merge_pileup_shards
        if len(rest) != 2:
            print(f"USAGE:\n  {PROG} merge-pileup-shards output-prefix "
                  "n-shards", file=sys.stderr)
            return 1
        merge_pileup_shards(rest[0], int(rest[1]))
        return 0

    if cmd == "pileup":
        from .quant.pileup import PileupConfig, run_pileup
        cfg = PileupConfig()
        pos = []
        i = 0
        while i < len(rest):
            a = rest[i]
            if a in ("-h", "--help"):
                pos = []
                break
            if a in ("-q", "--min-mapq"):
                cfg.min_mapq = int(rest[i + 1]); i += 2
            elif a in ("-f", "--min-identity"):
                cfg.min_identity = float(rest[i + 1]); i += 2
            elif a in ("-t", "--threads"):
                cfg.io_threads = int(rest[i + 1]); i += 2
            elif a.startswith("-") and len(a) > 1:
                raise SystemExit(f"ERROR: unrecognised option {a}")
            else:
                pos.append(a); i += 1
        if len(pos) != 3:
            print(f"USAGE:\n  {PROG} pileup [-q mapQ] [-f identity] [-t threads] "
                  "reference mod-bam output-prefix", file=sys.stderr)
            return 1
        from .parallel.dist import init_distributed
        from .quant.pileup import run_pileup_multihost, run_pileup_parallel
        from .utils.system import dump_parameters
        dump_parameters("pileup", {
            "min_mapq": cfg.min_mapq,
            "min_identity": cfg.min_identity,
            "threads": cfg.io_threads,
            "reference": pos[0],
            "input": pos[1],
            "output_prefix": pos[2],
        })
        shard = init_distributed()
        with program_info(PROG):
            if shard.num_processes > 1:
                # jax.distributed run (JAX_COORDINATOR_ADDRESS et al set):
                # collective pass 2 + per-shard BEDs; finish with
                # `merge-pileup-shards prefix N` on the shared filesystem
                run_pileup_multihost(pos[0], pos[1], pos[2], shard, cfg)
            else:
                run_pileup_parallel(pos[0], pos[1], pos[2], cfg,
                                    workers=cfg.io_threads)
        return 0

    if cmd == "corr":
        from .tools.corr import run_corr
        min_cov = 5
        pos = []
        i = 0
        while i < len(rest):
            if rest[i] in ("-c", "--min-cov"):
                min_cov = int(rest[i + 1]); i += 2
            else:
                pos.append(rest[i]); i += 1
        if len(pos) != 2:
            print(f"USAGE:\n  {PROG} corr [-c min-cov] bed1 bed2", file=sys.stderr)
            return 1
        run_corr(pos[0], pos[1], min_cov)
        return 0

    if cmd == "cov2bed":
        from .tools.cov2bed import run_cov2bed
        if len(rest) != 4:
            print(f"USAGE:\n  {PROG} cov2bed reference context bismark-cov bed",
                  file=sys.stderr)
            return 1
        run_cov2bed(*rest)
        return 0

    if cmd == "sample":
        from .tools.sample import run_sample
        if len(rest) != 4:
            print(f"USAGE:\n  {PROG} sample reference input-bam coverage "
                  "output-bam", file=sys.stderr)
            return 1
        with program_info(PROG):
            run_sample(rest[0], rest[1], int(rest[2]), rest[3])
        return 0

    if cmd == "eval":
        from .tools.evaltool import run_eval
        workers = 1
        pos = []
        i = 0
        while i < len(rest):
            if rest[i] in ("-t", "--workers"):
                workers = int(rest[i + 1]); i += 2
            else:
                pos.append(rest[i]); i += 1
        if len(pos) != 4:
            print(f"USAGE:\n  {PROG} eval [-t workers] reference bismark-bed "
                  "mod-bam output-prefix", file=sys.stderr)
            return 1
        with program_info(PROG):
            run_eval(*pos, workers=workers)
        return 0

    if cmd == "read-level-eval":
        from .tools.read_level_metrics import run_read_level_eval
        if len(rest) != 2:
            print(f"USAGE:\n  {PROG} read-level-eval input-prefix num-evals",
                  file=sys.stderr)
            return 1
        run_read_level_eval(rest[0], int(rest[1]))
        return 0

    if cmd == "import-model":
        from .tools.import_model import main as im_main
        return im_main(rest)

    if cmd == "export-model":
        if len(rest) != 2:
            print(f"USAGE:\n  {PROG} export-model model.npz model.onnx",
                  file=sys.stderr)
            return 1
        from .model.cnn import load_params_npz
        from .model.onnx_export import export_onnx
        params = load_params_npz(rest[0])
        export_onnx(params, rest[1])
        log("exported %s -> %s", rest[0], rest[1])
        return 0

    if cmd == "extract-features":
        from .tools.extract_features import main as ef_main
        with program_info(PROG):
            return ef_main(rest)

    if cmd == "train":
        from .train.train import main as train_main
        return train_main(rest)

    print(f"ERROR: unknown command {cmd!r}", file=sys.stderr)
    return _usage()


if __name__ == "__main__":
    raise SystemExit(main())
