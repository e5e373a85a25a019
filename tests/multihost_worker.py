"""Subprocess worker for the real multi-process multihost test.

Launched by tests/test_multihost.py with JAX_PLATFORMS=cpu; runs one
rank of run_multihost against a shared coordinator.
"""

import argparse
import os
import sys


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--base", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--nproc", type=int, required=True)
    p.add_argument("--pid", type=int, required=True)
    p.add_argument("--port", type=int, required=True)
    p.add_argument("--contigs", default="")
    args = p.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    # Must run before anything initializes the XLA backend.
    if args.nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{args.port}",
            num_processes=args.nproc, process_id=args.pid)

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from floria_tpu.options import Options
    from floria_tpu.parallel.multihost import run_multihost

    options = Options(
        bam_file=os.path.join(args.base, "multi.bam"),
        vcf_file=os.path.join(args.base, "multi.vcf"),
        reference_fasta=os.path.join(args.base, "multi.fa"),
        out_dir=args.out, epsilon=0.02, block_length=3000,
        snp_count_filter=10, overwrite=True,
        list_to_phase=[c for c in args.contigs.split(",") if c])
    run_multihost(options, args.nproc, args.pid,
                  coordinator=f"127.0.0.1:{args.port}")


if __name__ == "__main__":
    main()
