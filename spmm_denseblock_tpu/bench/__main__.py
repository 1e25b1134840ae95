from spmm_denseblock_tpu.bench.sweeps import main

if __name__ == "__main__":
    raise SystemExit(main())
