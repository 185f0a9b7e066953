"""Serving CLI: train (or load) a model preset and serve it over HTTP.

    # train the MF preset for 20 epochs and serve on :8080
    python -m deeplearningrecommendationsystem_tpu.cli.serve --model mf --epochs 20 --port 8080

    # load previously-saved params instead of training
    python -m deeplearningrecommendationsystem_tpu.cli.serve --model mf --checkpoint /path/ck

    curl 'localhost:8080/v1/recommend?user=12&k=10'
    curl -X POST localhost:8080/v1/recommend -d '{"users": [1, 2, 3], "k": 5}'

The reference has no serving runtime (its serving surface is a per-script
``model.recommendation`` print, SURVEY.md §3.5); this daemon is the additive
production path: catalog scores stay resident on device, queries are answered
in milliseconds (`/v1/stats` reports latency percentiles).
"""

from __future__ import annotations

import argparse

from deeplearningrecommendationsystem_tpu.configs.presets import PRESETS
from deeplearningrecommendationsystem_tpu.experiments import DEFAULT_DATA
from deeplearningrecommendationsystem_tpu.runtime.cache import enable_compilation_cache


def build_server(args):
    """Train or load the model, wrap it in a RecommenderServer (not started)."""
    import jax

    from deeplearningrecommendationsystem_tpu.data import MovieLens100K
    from deeplearningrecommendationsystem_tpu.experiments import (
        build_model,
        run_experiment,
    )
    from deeplearningrecommendationsystem_tpu.server import RecommenderServer
    from deeplearningrecommendationsystem_tpu.serving import (
        Recommender,
        ShardedRecommender,
    )

    cfg = PRESETS[args.model]
    if args.epochs is not None:
        cfg = cfg.replace(epochs=args.epochs)
    cfg = cfg.replace(track_metrics=False, seed=args.seed)
    data = MovieLens100K(args.data, seed=args.seed)
    mesh = None
    if args.mesh:
        from deeplearningrecommendationsystem_tpu.parallel import make_mesh

        # validate the model can serve sharded BEFORE the training run:
        # sharded_catalog_topk needs serving_factors (factored scores) or
        # the sparse_tables+spec feature protocol (parallel/serving.py)
        probe_model = build_model(cfg, data)
        if not (
            hasattr(probe_model, "serving_factors")
            or (hasattr(probe_model, "sparse_tables")
                and hasattr(probe_model, "spec"))
        ):
            raise SystemExit(
                f"--mesh: {args.model} cannot serve from sharded tables "
                "(needs serving_factors or the sparse_tables+spec protocol; "
                "sequence models must serve dense -- drop --mesh)"
            )
        data_ax, model_ax = (int(v) for v in args.mesh.split(","))
        mesh = make_mesh(data=data_ax, model=model_ax)
        # EP end to end: train sharded, keep the tables sharded, serve
        # sharded (parallel/serving.py) -- no unshard round-trip
        cfg = cfg.replace(mesh_shape=(data_ax, model_ax), unshard_params=False)

    seen = (
        data.seen_mask(data.train, data.valid, data.test)
        if args.exclude_seen
        else None
    )

    if args.checkpoint:
        from deeplearningrecommendationsystem_tpu.runtime.checkpoint import (
            CheckpointManager,
        )

        model = build_model(cfg, data)
        template = model.init(jax.random.PRNGKey(0))
        mgr = CheckpointManager(args.checkpoint)
        params = mgr.restore(template=template)
        mgr.close()
        if mesh is not None:
            # dense checkpoint -> row-sharded serving layout
            from deeplearningrecommendationsystem_tpu.parallel import (
                shard_model_tables,
            )

            params, _, _ = shard_model_tables(params, mesh)
        # rebuild the same ServingContext run_experiment would have used
        res = run_experiment(cfg.replace(epochs=1), data=data)
        ctx = res.ctx
    else:
        res = run_experiment(cfg, data=data)
        model = build_model(cfg, data)
        params, ctx = res.params, res.ctx

    if mesh is not None:
        rec = ShardedRecommender(model, params, ctx, mesh, seen=seen)
    else:
        rec = Recommender(model, params, ctx, seen=seen)
    return RecommenderServer(rec, host=args.host, port=args.port)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Serve top-K recommendations over HTTP")
    ap.add_argument("--model", choices=sorted(PRESETS), required=True)
    ap.add_argument("--data", default=DEFAULT_DATA)
    ap.add_argument("--epochs", type=int, help="override preset epochs")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--checkpoint", help="load params from this orbax dir instead of training")
    ap.add_argument(
        "--mesh",
        help="device mesh axes 'data,model', e.g. 4,2: train with row-sharded "
        "embedding tables (EP) and serve them SHARDED via ShardedRecommender "
        "-- item rows never leave their shards (factored + feature models; "
        "sequence models must serve dense)",
    )
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument(
        "--no-exclude-seen",
        dest="exclude_seen",
        action="store_false",
        help="do not filter already-interacted items from recommendations",
    )
    args = ap.parse_args(argv)

    enable_compilation_cache()
    server = build_server(args)
    print(f"serving {args.model} on http://{args.host}:{server.port}", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
