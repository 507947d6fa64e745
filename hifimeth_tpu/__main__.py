from .cli import main

# The __main__ guard is load-bearing: multiprocessing's spawn start method
# (used by `pileup -t N` / `eval -t N` worker pools) re-imports the main
# module in every worker as "__mp_main__"; without the guard each worker
# would re-run the CLI and fork its own pool.
if __name__ == "__main__":
    raise SystemExit(main())
