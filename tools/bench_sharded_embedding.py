"""Row-sharded embedding at synthetic production scale.

ml-100k tables are tiny (SURVEY.md §7 'hard parts' asks the EP machinery to
be measurable anyway): this sweeps a synthetic vocab (default 1M x 128,
~512 MB f32) and compares the dense single-device gather against the
shard_map masked-gather+psum lookup on a model-axis mesh, for both forward
and forward+backward. On the bundled 8-device virtual CPU mesh this
validates correctness/overheads of the collective program; on a real pod the
same script measures ICI.

    python tools/bench_sharded_embedding.py --vocab 1048576 --dim 128
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("SCALING_REAL_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if os.environ.get("SCALING_REAL_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from deeplearningrecommendationsystem_tpu.parallel import (  # noqa: E402
    make_mesh,
    sharded_gather,
    sharded_gather_scatter,
)
from deeplearningrecommendationsystem_tpu.parallel.mesh import MODEL_AXIS  # noqa: E402


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab", type=int, default=1 << 20)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--model-axis", type=int, default=8)
    args = ap.parse_args()

    mesh = make_mesh(data=jax.device_count() // args.model_axis, model=args.model_axis)
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (args.vocab, args.dim), dtype=jnp.float32)
    ids = jax.random.randint(key, (args.batch,), 0, args.vocab, dtype=jnp.int32)
    table_sharded = jax.device_put(table, NamedSharding(mesh, P(MODEL_AXIS, None)))
    cot = jax.random.normal(key, (args.batch, args.dim))

    dense_fwd = jax.jit(lambda t, i: t[i])
    shard_fwd = jax.jit(lambda t, i: sharded_gather(t, i, mesh))
    dense_bwd = jax.jit(jax.grad(lambda t, i: jnp.vdot(t[i], cot)))
    shard_bwd = jax.jit(jax.grad(lambda t, i: jnp.vdot(sharded_gather(t, i, mesh), cot)))
    scatter_fwd = jax.jit(lambda t, i: sharded_gather_scatter(t, i, mesh))
    scatter_bwd = jax.jit(
        jax.grad(lambda t, i: jnp.vdot(sharded_gather_scatter(t, i, mesh), cot))
    )

    import numpy as np

    np.testing.assert_allclose(
        np.asarray(shard_fwd(table_sharded, ids)), np.asarray(dense_fwd(table, ids)), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(scatter_fwd(table_sharded, ids)), np.asarray(dense_fwd(table, ids)), rtol=1e-6
    )
    results = {
        "vocab": args.vocab,
        "dim": args.dim,
        "batch": args.batch,
        "mesh": dict(mesh.shape),
        "backend": jax.default_backend(),
        "dense_fwd_ms": timeit(dense_fwd, table, ids) * 1e3,
        "sharded_fwd_ms": timeit(shard_fwd, table_sharded, ids) * 1e3,
        "dense_bwd_ms": timeit(dense_bwd, table, ids) * 1e3,
        "sharded_bwd_ms": timeit(shard_bwd, table_sharded, ids) * 1e3,
        "scatter_fwd_ms": timeit(scatter_fwd, table_sharded, ids) * 1e3,
        "scatter_bwd_ms": timeit(scatter_bwd, table_sharded, ids) * 1e3,
        "table_bytes_per_device_sharded": table.nbytes // args.model_axis,
    }
    print(json.dumps(results, indent=2))
    with open("EMBED_SHARD_BENCH.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
