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
                   help="train every K rate point of an image simultaneously as "
                        "batched experts in one device program "
                        "(codec.encode_rate_points): fastest sweep mode; streams "
                        "are RD-equivalent (not byte-identical) to per-job runs")
    add_codec_args(p, encode=True)
    args = p.parse_args(argv)

    if args.pipeline or args.batch_experts:
        return _pipelined_sweep(args)

    base_flags = []
    for flag, val in [
        ("-sr", args.split_ratio), ("-bc", args.base_channel),
        ("-nl", args.num_layers), ("-D", args.D), ("-prec", args.precision),
        ("-lr", args.lr), ("-bs", args.batch_size), ("-e", args.epochs),
        ("-vd", args.val_duration), ("--seed", args.seed),
        ("--sigma", args.sigma), ("--n-freq", args.n_freq),
        ("--base-codec", args.base_codec), ("--weight-codec", args.weight_codec),
        ("--header-version", args.header_version),
    ]:
        base_flags += [flag, str(val)]
    for flag, on in [
        ("--use-coords", args.use_coords), ("--embedding", args.embedding),
        ("--no-colors", args.no_colors), ("--abs-colors", args.abs_colors),
        ("-rn", args.randomness),
    ]:
        if on:
            base_flags.append(flag)

    from lbdrn_msic_tpu.cli.common import config_from_args

    for path in args.paths:
        stem = os.path.splitext(os.path.basename(path))[0]
        for K in range(args.k_min, args.k_max + 1):
            enc_args = ["-i", path, "-o", args.output_dir, "-K", str(K)] + base_flags
            print(f"[sweep] encode {stem} K={K}")
            encode_cli.main(enc_args)
            cfg = dataclasses.replace(config_from_args(args), K=K)
            run_dir = os.path.join(args.output_dir, cfg.run_name(stem))
            bin_path = os.path.join(run_dir, f"{stem}.bin")
            print(f"[sweep] decode {stem} K={K}")
            decode_cli.main(["-i", bin_path, "-org", path])
    return 0


def _pipelined_sweep(args) -> int:
    import time

    from lbdrn_msic_tpu.cli.common import config_from_args
    from lbdrn_msic_tpu.cli.encode import write_encode_outputs
    from lbdrn_msic_tpu.codec import encode_pipelined
    from lbdrn_msic_tpu.io.tiff import read_tiff
    from lbdrn_msic_tpu.utils.logging import RunLogger, run_is_complete

    base_cfg = config_from_args(args)
    jobs, meta = [], []
    for path in args.paths:
        stem = os.path.splitext(os.path.basename(path))[0]
        img = None
        for K in range(args.k_min, args.k_max + 1):
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
            from lbdrn_msic_tpu.codec import encode_rate_points

            print(f"[sweep] expert-batched encode of {len(jobs)} jobs")
            results = []
            i = 0
            while i < len(jobs):  # group contiguous jobs of the same image
                j = i
                while j < len(jobs) and jobs[j][0] is jobs[i][0]:
                    j += 1
                results += encode_rate_points(
                    jobs[i][0], [c for _, c in jobs[i:j]],
                    header_version=args.header_version,
                )
                i = j
        else:
            print(f"[sweep] pipelined encode of {len(jobs)} jobs")
            results = encode_pipelined(jobs)
        for (stem, path, run_dir, bin_path), (stream, stats) in zip(meta, results):
            os.makedirs(run_dir, exist_ok=True)
            log = RunLogger(run_dir, "encode.txt", to_stdout=False)
            write_encode_outputs(
                log, bin_path, stem, stream, stats, time.time() - stats.elapsed
            )
            log.close()

    for path in args.paths:
        stem = os.path.splitext(os.path.basename(path))[0]
        for K in range(args.k_min, args.k_max + 1):
            cfg = dataclasses.replace(base_cfg, K=K)
            run_dir = os.path.join(args.output_dir, cfg.run_name(stem))
            print(f"[sweep] decode {stem} K={K}")
            decode_cli.main(["-i", os.path.join(run_dir, f"{stem}.bin"), "-org", path])
    return 0


if __name__ == "__main__":
    sys.exit(main())
