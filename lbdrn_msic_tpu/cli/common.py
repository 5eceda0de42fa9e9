"""Shared CLI plumbing: reference-compatible flags -> CodecConfig."""

from __future__ import annotations

import argparse

from lbdrn_msic_tpu.core.config import CodecConfig, FeatureSpec, ModelSpec, TrainSpec


def add_codec_args(p: argparse.ArgumentParser, encode: bool = True):
    """Flag set mirrors reference encode.py:168-196 plus the switches the
    reference keeps in constants.py (here first-class and header-carried)."""
    p.add_argument("--seed", type=int, default=19920517)
    p.add_argument("--compile-log", action="store_true",
                   help="print per-jitted-program compile seconds after the "
                        "run (utils/compile_log) — attributes warm-up cost "
                        "to programs vs the variable remote compile service")
    p.add_argument(
        "--mesh", type=str, default=None, metavar="AXES",
        help="device mesh spec, e.g. 'dp=4', 'ep=8' or 'dp=2,ep=4': dp trains "
             "each tile data-parallel (psum grads over ICI) and row-shards "
             "decode with a halo exchange; ep fans independent K-rate experts "
             "out across devices (sweep --batch-experts)",
    )
    if encode:
        p.add_argument("-rn", "--randomness", action="store_true",
                       help="allow nondeterministic training (reference -rn)")
        p.add_argument("-sr", "--split_ratio", type=int, default=1)
        p.add_argument("-K", "--K", type=int, default=5)
        p.add_argument("-bc", "--base_channel", type=int, default=64)
        p.add_argument("-nl", "--num_layers", type=int, default=2)
        p.add_argument("-D", "--D", type=int, default=2)
        p.add_argument("-prec", "--precision", type=int, default=16)
        p.add_argument("-lr", "--lr", type=float, default=1e-3)
        p.add_argument("-bs", "--batch_size", type=int, default=8192)
        p.add_argument("-e", "--epochs", type=int, default=10)
        p.add_argument("-vd", "--val_duration", type=int, default=1)
        # feature-set switches (reference constants.py:1-14, README.md:50-62)
        p.add_argument("--use-coords", action="store_true")
        p.add_argument("--embedding", action="store_true")
        p.add_argument("--no-colors", action="store_true")
        p.add_argument("--abs-colors", action="store_true",
                       help="disable center subtraction (RELATIVE=False)")
        p.add_argument("--sigma", type=float, default=1.4)
        p.add_argument("--n-freq", type=int, default=12)
        # TPU recipe (new): smooth cosine LR decay instead of the
        # reference's StepLR; typically pairs with more epochs (-e) —
        # the fused step is fast enough that e.g. -e 30 still encodes
        # faster than the reference's default run (validation/RECIPE.md)
        p.add_argument("--schedule", choices=["step", "cosine"],
                       default="step")
        p.add_argument("-g", "--sample-granule", type=int, default=1,
                       help="shuffle g-pixel runs instead of single pixels "
                            "(g=1 = reference semantics; g=8 measured at "
                            "+0.006%% BD-Rate, VALIDATION.md)")
        p.add_argument("--bucket", action="store_true",
                       help="shape-bucketed training: pad each tile to a "
                            "canonical bucket (codec.bucket_dims) with the "
                            "pad masked out, so a heterogeneous dataset "
                            "reuses O(buckets) compiled device programs "
                            "instead of O(shapes) — the remote compile "
                            "service dominates multi-shape sweeps otherwise. "
                            "RD-equivalent, not byte-identical, to exact-"
                            "shape runs")
        # codec selection (new; carried in the v1 header)
        p.add_argument("--base-codec", choices=["jp2", "lpc"], default="jp2")
        p.add_argument("--weight-codec", choices=["fpz", "raw16"], default="fpz")
        p.add_argument("--header-version", type=int, choices=[0, 1], default=1)


def mesh_from_args(args):
    """Parse --mesh 'dp=N[,ep=M]' into a Mesh (None when the flag is unset)."""
    spec = getattr(args, "mesh", None)
    if not spec:
        return None
    axes = {"dp": 1, "ep": 1}
    for part in spec.split(","):
        name, _, val = part.partition("=")
        name = name.strip()
        if name not in axes or not val.strip().isdigit():
            raise SystemExit(f"bad --mesh axis {part!r} (want dp=N / ep=N)")
        axes[name] = int(val)
    from lbdrn_msic_tpu.parallel.shard import make_mesh

    return make_mesh(dp=axes["dp"], ep=axes["ep"])


def config_from_args(args) -> CodecConfig:
    return CodecConfig(
        K=args.K,
        split_ratio=args.split_ratio,
        precision=args.precision,
        model=ModelSpec(base_channel=args.base_channel, num_layers=args.num_layers),
        features=FeatureSpec(
            use_coords=args.use_coords,
            embedding=args.embedding,
            sigma=args.sigma,
            n_freq=args.n_freq,
            use_colors=not args.no_colors,
            relative=not args.abs_colors,
            D=args.D,
        ),
        train=TrainSpec(
            lr=args.lr,
            batch_size=args.batch_size,
            epochs=args.epochs,
            val_every=args.val_duration,
            seed=args.seed,
            schedule=args.schedule,
            sample_granule=args.sample_granule,
        ),
        base_codec=args.base_codec,
        weight_codec=args.weight_codec,
    )
