"""CLI: one entry point for every model preset.

Replaces the reference's 15 per-model scripts (SURVEY.md §2.4) with

    python -m deeplearningrecommendationsystem_tpu.cli.run --model deepfm
    python -m deeplearningrecommendationsystem_tpu.cli.run --model mf --epochs 20
    python -m deeplearningrecommendationsystem_tpu.cli.run --list

The preset table carries each script's hyperparameters; flags override them.
"""

from __future__ import annotations

import argparse
import json

from deeplearningrecommendationsystem_tpu.configs.presets import PRESETS
from deeplearningrecommendationsystem_tpu.experiments import DEFAULT_DATA, run_experiment
from deeplearningrecommendationsystem_tpu.runtime.cache import enable_compilation_cache


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="TPU-native CTR/ranking experiments")
    ap.add_argument("--model", choices=sorted(PRESETS), help="model preset to run")
    ap.add_argument("--list", action="store_true", help="list presets and exit")
    ap.add_argument("--data", default=DEFAULT_DATA, help="path to ml-100k")
    ap.add_argument("--epochs", type=int, help="override preset epochs")
    ap.add_argument("--lr", type=float, help="override learning rate")
    ap.add_argument("--weight-decay", type=float, help="override weight decay")
    ap.add_argument("--k", type=int, help="override ranking cutoff")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--compute-dtype",
        choices=["float32", "bfloat16"],
        help="matmul compute dtype (f32 master weights); default = preset's",
    )
    ap.add_argument(
        "--no-epoch-metrics",
        action="store_true",
        help="skip per-epoch metric tracking (fastest pure-training mode)",
    )
    ap.add_argument("--json", action="store_true", help="emit a JSON summary")
    ap.add_argument(
        "--plot",
        metavar="PATH",
        help="save training-curve figure (GDCF_Final.py:99-117 analogue) to PATH",
    )
    ap.add_argument(
        "--mesh",
        metavar="DATA,MODEL",
        help="device mesh axes, e.g. 4,2 = DP over 4 x row-sharded tables (EP) "
        "over 2 (parallel/ep.py); default single-device",
    )
    ap.add_argument(
        "--ep-strategy",
        choices=["psum", "scatter"],
        default="psum",
        help="EP gather strategy: masked-gather+psum or id-all_gather+psum_scatter",
    )
    ap.add_argument(
        "--train-mode",
        choices=["fullbatch", "minibatch", "sparse", "stream"],
        help="fullbatch = reference parity regime; minibatch = shuffled SGD; "
        "sparse = minibatch with row-sparse embedding updates (mf/deepfm); "
        "stream = host-streamed minibatches with device prefetch "
        "(larger-than-HBM datasets, data/stream.py)",
    )
    ap.add_argument("--batch-size", type=int, help="minibatch/sparse batch size")
    ap.add_argument(
        "--sparse-optimizer", choices=["lazy_adam", "rowwise_adagrad"],
        help="row optimizer for --train-mode sparse",
    )
    ap.add_argument(
        "--augru", action="store_true",
        help="DIEN extension: AUGRU interest-evolution layer (the reference "
        "uses a plain GRU, model/dien.py:47,61)",
    )
    ap.add_argument(
        "--aux-weight", type=float,
        help="DIEN extension: auxiliary next-behavior loss weight (0 = off)",
    )
    ap.add_argument(
        "--fast-gathers", action="store_true",
        help="the bench gather routes on the dense path: one-hot-matmul "
        "forward gathers + one-hot-matmul gather backward (small vocabs; "
        "same math to summation regrouping -- MF_LAYOUT_PROBE.json / "
        "ONEHOT_FWD_PROBE.json measured winners)",
    )
    ap.add_argument("--profile", metavar="DIR", help="capture a jax.profiler trace to DIR")
    ap.add_argument(
        "--debug-nans", action="store_true", help="fail fast on NaNs (numerical sanitizer)"
    )
    args = ap.parse_args(argv)

    enable_compilation_cache()

    if args.list:
        for name, cfg in sorted(PRESETS.items()):
            print(
                f"{name:14s} family={cfg.family:8s} negatives={cfg.negatives} "
                f"lr={cfg.learning_rate} wd={cfg.weight_decay} epochs={cfg.epochs}"
            )
        return 0
    if not args.model:
        ap.error("--model is required (or --list)")

    overrides = {"seed": args.seed}
    if args.epochs is not None:
        overrides["epochs"] = args.epochs
    if args.lr is not None:
        overrides["learning_rate"] = args.lr
    if args.weight_decay is not None:
        overrides["weight_decay"] = args.weight_decay
    if args.k is not None:
        overrides["k"] = args.k
    if args.no_epoch_metrics:
        overrides["track_metrics"] = False
    if args.compute_dtype:
        overrides["compute_dtype"] = (
            None if args.compute_dtype == "float32" else args.compute_dtype
        )
    if args.mesh:
        data_ax, model_ax = (int(v) for v in args.mesh.split(","))
        overrides["mesh_shape"] = (data_ax, model_ax)
        overrides["ep_strategy"] = args.ep_strategy
    if args.train_mode:
        overrides["train_mode"] = args.train_mode
    if args.fast_gathers:
        overrides["matmul_gather_bwd"] = True
        overrides["onehot_gather"] = True
    if args.batch_size:
        overrides["batch_size"] = args.batch_size
    if args.sparse_optimizer:
        overrides["sparse_optimizer"] = args.sparse_optimizer
    if args.augru or args.aux_weight is not None:
        if args.model != "dien":
            ap.error("--augru/--aux-weight are DIEN extensions")
        if args.aux_weight is not None:
            overrides["aux_weight"] = args.aux_weight
        if args.augru:
            kw = dict(PRESETS[args.model].model_kwargs)
            kw["use_augru"] = True
            overrides["model_kwargs"] = kw

    cfg = PRESETS[args.model].replace(**overrides)

    import contextlib

    from deeplearningrecommendationsystem_tpu.runtime.profiler import debug_nans, trace

    stack = contextlib.ExitStack()
    if args.debug_nans:
        stack.enter_context(debug_nans(True))
    if args.profile:
        stack.enter_context(trace(args.profile))
    with stack:
        result = run_experiment(cfg, data_path=args.data, verbose=not args.json)
    if args.plot:
        from deeplearningrecommendationsystem_tpu.runtime.plotting import plot_history

        plot_history(result.history, args.plot, title=f"{result.model} training curves")
        if not args.json:
            print(f"saved training curves to {args.plot}")
    if args.json:
        print(
            json.dumps(
                {
                    "model": result.model,
                    "final": result.final_metrics(),
                    "ranking": result.ranking,
                    "examples_per_sec": result.examples_per_sec,
                    "train_time_s": result.train_time_s,
                }
            )
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
