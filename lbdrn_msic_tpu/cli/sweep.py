"""Sweep CLI — the reference's run.sh (images x K rate points) as a command.

Reference run.sh:29-40 loops `python encode.py ...; python decode.py ...`
over 13 images x K=1..6 (or 1..11) as separate shell processes; resumability
comes from the per-run log markers.  Same structure here, in-process (every
(image, K) reuses the jit cache instead of paying a fresh process + compile),
with the same resume markers.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

from lbdrn_msic_tpu.cli import decode as decode_cli
from lbdrn_msic_tpu.cli import encode as encode_cli
from lbdrn_msic_tpu.cli.common import add_codec_args


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="LBDRN-MSIC-TPU RD sweep")
    p.add_argument("-i", "--paths", nargs="+", required=True,
                   help="input tif files")
    p.add_argument("-o", "--output_dir", type=str, default="outputs")
    p.add_argument("--k-min", type=int, default=1)
    p.add_argument("--k-max", type=int, default=11)
    p.add_argument("--pipeline", action="store_true",
                   help="cross-job pipelined encoding (codec.encode_pipelined): "
                        "job i+1's transfers/host codecs overlap job i's device "
                        "training; byte-identical streams, device-bound throughput")
    p.add_argument("--batch-experts", action="store_true",
                   help="train (image, K) jobs simultaneously as batched "
                        "experts in one device program (codec.encode_dataset), "
                        "filling the expert axis across images of one shape: "
                        "fastest sweep mode; streams are RD-equivalent (not "
                        "byte-identical) to per-job runs")
    p.add_argument("--retries", type=int, default=0,
                   help="per-(image,K) retry budget for transient failures "
                        "(flaky remote compile / device claim); completed "
                        "halves are skipped via the CLIs' resume markers")
    p.add_argument("--hosts", type=int, default=1,
                   help="partition the (image, K) job list across N cooperating "
                        "processes writing to a shared filesystem — the "
                        "reference's run.sh shell fan-out (run.sh:29-40) made "
                        "first-class; per-run resume markers keep it idempotent")
    p.add_argument("--host-id", type=int, default=None,
                   help="this process's 0-based index among --hosts (default: "
                        "jax.process_index(), so --distributed fills it in)")
    p.add_argument("--distributed", action="store_true",
                   help="initialize jax.distributed from "
                        "JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / "
                        "JAX_PROCESS_ID and take --hosts/--host-id from the "
                        "runtime")
    add_codec_args(p, encode=True)
    args = p.parse_args(argv)

    if args.pipeline or args.batch_experts:
        if args.retries:
            print("[sweep] note: --retries applies to the per-job scheduler "
                  "path only; --pipeline/--batch-experts rely on rerunning "
                  "the sweep (completed jobs resume-skip)", flush=True)
        return _pipelined_sweep(args)

    sched = _scheduler_from_args(args)

    base_flags = []
    for flag, val in [
        ("-sr", args.split_ratio), ("-bc", args.base_channel),
        ("-nl", args.num_layers), ("-D", args.D), ("-prec", args.precision),
        ("-lr", args.lr), ("-bs", args.batch_size), ("-e", args.epochs),
        ("-vd", args.val_duration), ("--seed", args.seed),
        ("--sigma", args.sigma), ("--n-freq", args.n_freq),
        ("--base-codec", args.base_codec), ("--weight-codec", args.weight_codec),
        ("--header-version", args.header_version),
        ("--schedule", args.schedule), ("-g", args.sample_granule),
    ]:
        base_flags += [flag, str(val)]
    for flag, on in [
        ("--use-coords", args.use_coords), ("--embedding", args.embedding),
        ("--no-colors", args.no_colors), ("--abs-colors", args.abs_colors),
        ("-rn", args.randomness), ("--compile-log", args.compile_log),
        ("--bucket", args.bucket),
    ]:
        if on:
            base_flags.append(flag)
    if args.mesh:
        base_flags += ["--mesh", args.mesh]

    from lbdrn_msic_tpu.cli.common import config_from_args

    grid = [
        (path, K)
        for path in args.paths
        for K in range(args.k_min, args.k_max + 1)
    ]

    def work(job):
        path, K = job
        stem = os.path.splitext(os.path.basename(path))[0]
        enc_args = ["-i", path, "-o", args.output_dir, "-K", str(K)] + base_flags
        print(f"[sweep] encode {stem} K={K}")
        encode_cli.main(enc_args)
        cfg = dataclasses.replace(config_from_args(args), K=K)
        run_dir = os.path.join(args.output_dir, cfg.run_name(stem))
        bin_path = os.path.join(run_dir, f"{stem}.bin")
        print(f"[sweep] decode {stem} K={K}")
        dec_flags = ["--mesh", args.mesh] if args.mesh else []
        decode_cli.main(["-i", bin_path, "-org", path] + dec_flags)

    # the encode/decode CLIs are themselves idempotent (log-marker resume),
    # so retried jobs skip completed halves
    sched.run(grid, work, retries=args.retries)
    return 0


def _scheduler_from_args(args):
    """JobScheduler from --hosts/--host-id/--distributed (reference run.sh's
    multi-machine fan-out made first-class, SURVEY §2.3 multi-host row)."""
    from lbdrn_msic_tpu.parallel.distributed import JobScheduler, initialize_cluster

    if getattr(args, "distributed", False):
        initialize_cluster()
        return JobScheduler.from_runtime()
    host_id = args.host_id
    if host_id is None:
        import jax

        host_id = jax.process_index() if args.hosts > 1 else 0
    if not (0 <= host_id < args.hosts):
        raise SystemExit(f"--host-id {host_id} not in [0, {args.hosts})")
    return JobScheduler(num_processes=args.hosts, process_id=host_id)


def _pipelined_sweep(args) -> int:
    import time

    from lbdrn_msic_tpu.cli.common import config_from_args, mesh_from_args
    from lbdrn_msic_tpu.cli.encode import write_encode_outputs
    from lbdrn_msic_tpu.codec import encode_pipelined
    from lbdrn_msic_tpu.io.tiff import read_tiff
    from lbdrn_msic_tpu.utils.logging import RunLogger, run_is_complete

    sched = _scheduler_from_args(args)
    # batch-experts batches a whole image's rate points in one program, so
    # partition by image there; the per-(image, K) pipeline partitions by job
    if args.batch_experts:
        my_paths = sched.mine(args.paths)
        my_jobs = {(p, K) for p in my_paths
                   for K in range(args.k_min, args.k_max + 1)}
    else:
        grid = [(p, K) for p in args.paths
                for K in range(args.k_min, args.k_max + 1)]
        my_jobs = set(sched.mine(grid))
        my_paths = [p for p in args.paths
                    if any((p, K) in my_jobs
                           for K in range(args.k_min, args.k_max + 1))]

    base_cfg = config_from_args(args)
    jobs, meta = [], []
    for path in my_paths:
        stem = os.path.splitext(os.path.basename(path))[0]
        img = None
        for K in range(args.k_min, args.k_max + 1):
            if (path, K) not in my_jobs:
                continue
            cfg = dataclasses.replace(base_cfg, K=K)
            run_dir = os.path.join(args.output_dir, cfg.run_name(stem))
            bin_path = os.path.join(run_dir, f"{stem}.bin")
            if run_is_complete(run_dir, "encode.txt", "Time elapsed") and os.path.exists(bin_path):
                continue
            if img is None:
                img = read_tiff(path)
            jobs.append((img, cfg))
            meta.append((stem, path, run_dir, bin_path))

    if jobs:
        if args.batch_experts:
            from lbdrn_msic_tpu.codec import encode_dataset

            mesh = mesh_from_args(args)
            print(f"[sweep] expert-batched encode of {len(jobs)} jobs"
                  + (f" over mesh {dict(mesh.shape)}" if mesh else ""))
            # experts are (image, K) pairs: same-shape jobs batch together
            # ACROSS images, so few-rate-point dataset encodes still fill
            # the expert axis (VERDICT r3 #2)
            results = encode_dataset(
                jobs, header_version=args.header_version, mesh=mesh,
                bucket=args.bucket,
            )
        else:
            print(f"[sweep] pipelined encode of {len(jobs)} jobs")
            results = encode_pipelined(jobs, bucket=args.bucket)
        for (stem, path, run_dir, bin_path), (stream, stats) in zip(meta, results):
            os.makedirs(run_dir, exist_ok=True)
            log = RunLogger(run_dir, "encode.txt", to_stdout=False)
            write_encode_outputs(
                log, bin_path, stem, stream, stats, time.time() - stats.elapsed
            )
            log.close()

    # decode half, cross-stream pipelined: stream i+1's host base/weight
    # decode + device dispatch overlap stream i's bitplane d2h
    # (codec.decode_pipelined; bit-identical to per-stream decoding)
    from lbdrn_msic_tpu.cli.decode import write_decode_outputs
    from lbdrn_msic_tpu.codec import decode_pipelined_iter

    dec_meta = []
    for path in my_paths:
        stem = os.path.splitext(os.path.basename(path))[0]
        for K in range(args.k_min, args.k_max + 1):
            if (path, K) not in my_jobs:
                continue
            cfg = dataclasses.replace(base_cfg, K=K)
            run_dir = os.path.join(args.output_dir, cfg.run_name(stem))
            if run_is_complete(run_dir, "decode.txt", "bpsp"):
                continue
            dec_meta.append(
                (os.path.join(run_dir, f"{stem}.bin"), path, run_dir)
            )
    if dec_meta:
        t0 = time.time()

        def read_streams():  # lazy: at most two streams in memory
            for bin_path, _, _ in dec_meta:
                print(f"[sweep] decode {os.path.basename(bin_path)}")
                with open(bin_path, "rb") as f:
                    yield f.read()

        for (bin_path, path, run_dir), (rec, dstats) in zip(
            dec_meta, decode_pipelined_iter(read_streams())
        ):
            log = RunLogger(run_dir, "decode.txt", to_stdout=False)
            log.info(f"Binstream: {bin_path}")
            write_decode_outputs(
                log, bin_path, rec, dstats,
                time.time() - dstats.elapsed, org_path=path,
            )
            log.close()
        print(f"[sweep] decoded {len(dec_meta)} streams in "
              f"{time.time() - t0:.2f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
