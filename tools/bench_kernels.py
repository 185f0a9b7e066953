"""Microbenchmarks: Pallas kernels vs XLA reference implementations on TPU.

Run:  python tools/bench_kernels.py
Writes KERNEL_BENCH.json with per-kernel timings + speedups and a
speed-of-light estimate (HBM-bandwidth bound) per kernel.
"""

from __future__ import annotations

import json
import zlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deeplearningrecommendationsystem_tpu.runtime.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from deeplearningrecommendationsystem_tpu.ops.attention import (  # noqa: E402
    afm_attention,
    attention_pool,
)
from deeplearningrecommendationsystem_tpu.ops.interactions import pairwise_products  # noqa: E402
from deeplearningrecommendationsystem_tpu.ops.linear import mlp_init  # noqa: E402
from deeplearningrecommendationsystem_tpu.ops.pallas import (  # noqa: E402
    afm_attention_pool_pallas,
    din_attention_pool_pallas,
    gather_rows_pallas,
)

# v5e: ~819 GB/s HBM bandwidth
HBM_GBPS = 819.0


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--only", nargs="+",
        default=["din", "afm", "gather", "topk", "din_train", "afm_train",
                 "onehot"],
        help="kernels to bench: din afm gather topk din_train afm_train onehot",
    )
    args = ap.parse_args()
    try:
        with open("KERNEL_BENCH.json") as f:
            results = json.load(f)
    except FileNotFoundError:
        results = {}
    key = jax.random.PRNGKey(0)

    if "topk" in args.only:
        bench_serving_topk(results, key, "ml100k")
        with open("KERNEL_BENCH.json", "w") as f:
            json.dump(results, f, indent=2)
        bench_serving_topk(results, key, "synthetic")
        with open("KERNEL_BENCH.json", "w") as f:
            json.dump(results, f, indent=2)

    if "onehot" in args.only:
        bench_onehot_grad(results, key)
        with open("KERNEL_BENCH.json", "w") as f:
            json.dump(results, f, indent=2)

    if "din_train" in args.only:
        bench_din_head_train(results, key)
        with open("KERNEL_BENCH.json", "w") as f:
            json.dump(results, f, indent=2)
    if "afm_train" in args.only:
        bench_afm_train(results, key)
        with open("KERNEL_BENCH.json", "w") as f:
            json.dump(results, f, indent=2)

    if "din" not in args.only:
        print(json.dumps(results, indent=2))
        with open("KERNEL_BENCH.json", "w") as f:
            json.dump(results, f, indent=2)
        return

    # --- DIN attention: serving-shaped batch (user-tile x catalog) ---
    B, L, D = 64 * 1682, 10, 64
    k1, k2, k3 = jax.random.split(key, 3)
    hist = jax.random.normal(k1, (B, L, D))
    tgt = jax.random.normal(k2, (B, D))
    att = mlp_init(k3, (3 * D, 128, 64, 1))

    xla = jax.jit(lambda h, t: attention_pool(att, h, t))
    pal = jax.jit(lambda h, t: din_attention_pool_pallas(h, t, att, block_rows=256))
    t_x = timeit(xla, hist, tgt)
    t_p = timeit(pal, hist, tgt)
    bytes_min = hist.nbytes + tgt.nbytes + B * D * 4  # read inputs, write pooled
    results["din_attention"] = {
        "shape": [B, L, D],
        "xla_ms": t_x * 1e3,
        "pallas_ms": t_p * 1e3,
        "speedup": t_x / t_p,
        "sol_ms_hbm_bound": bytes_min / (HBM_GBPS * 1e9) * 1e3,
        "pallas_pct_of_sol": (bytes_min / (HBM_GBPS * 1e9)) / t_p * 100,
    }

    # --- AFM attention: training-shaped batch ---
    B, F, Dm, A = 87909, 6, 128, 64
    k1, k2, k3, k4 = jax.random.split(key, 4)
    fields = jax.random.normal(k1, (B, F, Dm))
    w = jax.random.normal(k2, (Dm, A))
    b = jax.random.normal(k3, (A,))
    h = jax.random.normal(k4, (A, 1))

    xla = jax.jit(lambda e: afm_attention(w, b, h, pairwise_products(e)))
    pal = jax.jit(lambda e: afm_attention_pool_pallas(e, w, b, h, block_rows=256))
    t_x = timeit(xla, fields)
    t_p = timeit(pal, fields)
    bytes_min = fields.nbytes + B * Dm * 4
    results["afm_attention"] = {
        "shape": [B, F, Dm],
        "xla_ms": t_x * 1e3,
        "pallas_ms": t_p * 1e3,
        "speedup": t_x / t_p,
        "sol_ms_hbm_bound": bytes_min / (HBM_GBPS * 1e9) * 1e3,
        "pallas_pct_of_sol": (bytes_min / (HBM_GBPS * 1e9)) / t_p * 100,
    }

    # --- gather: big-vocab lookup ---
    V, Dg, Bg = 262144, 128, 131072
    table = jax.random.normal(key, (V, Dg))
    ids = jax.random.randint(key, (Bg,), 0, V, dtype=jnp.int32)
    xla = jax.jit(lambda t, i: t[i])
    pal = jax.jit(lambda t, i: gather_rows_pallas(t, i, block_rows=1024))
    t_x = timeit(xla, table, ids)
    t_p = timeit(pal, table, ids)
    bytes_min = Bg * Dg * 4 * 2  # read + write each row
    results["gather"] = {
        "shape": [V, Dg, Bg],
        "xla_ms": t_x * 1e3,
        "pallas_ms": t_p * 1e3,
        "speedup": t_x / t_p,
        "sol_ms_hbm_bound": bytes_min / (HBM_GBPS * 1e9) * 1e3,
        "pallas_pct_of_sol": (bytes_min / (HBM_GBPS * 1e9)) / t_p * 100,
    }

    print(json.dumps(results, indent=2))
    with open("KERNEL_BENCH.json", "w") as f:
        json.dump(results, f, indent=2)


def bench_onehot_grad(results, key):
    """Embedding-gather backward: Pallas in-VMEM-mask kernel vs the XLA
    materialized one-hot matmul (ops/pallas/onehot_grad.py). Shapes = the
    zoo's real table cotangents (MF item bf16, FFM item f32, bias table)."""
    from deeplearningrecommendationsystem_tpu.ops.pallas.onehot_grad import (
        onehot_grad,
    )

    for tag, N, V, D, dtype in (
        ("mf_item_bf16", 229359, 1682, 64, jnp.bfloat16),
        ("ffm_item_f32", 69049, 1682, 32, jnp.float32),
        ("bias_user_f32", 87909, 943, 1, jnp.float32),
    ):
        k1, k2 = jax.random.split(jax.random.fold_in(key, zlib.crc32(tag.encode()) % 997), 2)
        ids = jax.random.randint(k1, (N,), 0, V)
        g = jax.random.normal(k2, (N, D)).astype(dtype)

        def xla_bwd(ids, g):
            onehot = (
                ids[:, None]
                == jax.lax.broadcasted_iota(ids.dtype, (1, V), 1)
            ).astype(g.dtype)
            return jax.lax.dot_general(
                onehot, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        xla = jax.jit(xla_bwd)
        pal = jax.jit(lambda ids, g: onehot_grad(ids, g, V))
        t_x = timeit(xla, ids, g)
        t_p = timeit(pal, ids, g)
        # SoL: read ids + g, write [V, D] f32; the XLA path additionally
        # round-trips the [N, V] one-hot through HBM
        bytes_min = ids.nbytes + g.nbytes + V * D * 4
        results[f"onehot_grad_{tag}"] = {
            "shape": [N, V, D],
            "dtype": str(jnp.dtype(dtype)),
            "xla_ms": t_x * 1e3,
            "pallas_ms": t_p * 1e3,
            "speedup": t_x / t_p,
            "sol_ms_hbm_bound": bytes_min / (HBM_GBPS * 1e9) * 1e3,
            "pallas_pct_of_sol": (bytes_min / (HBM_GBPS * 1e9)) / t_p * 100,
        }
        print(f"onehot_grad_{tag}", results[f"onehot_grad_{tag}"], flush=True)


def bench_din_head_train(results, key):
    """Fused DIN head (ops/pallas/din_head.py) vs XLA, FWD+BWD at the real
    training shape (87,909 rows, the reference train split + 30 negs/user;
    VERDICT r2 next #4 done-criterion: >= 1.2x XLA fwd+bwd)."""
    from deeplearningrecommendationsystem_tpu.ops.linear import mlp
    from deeplearningrecommendationsystem_tpu.ops.pallas.din_head import (
        din_head_fused,
    )

    B, L, D = 87909, 10, 64
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    att = mlp_init(k3, (3 * D, 128, 64, 1))
    fc = mlp_init(k4, (2 * D, 256, 128, 1))
    cot = jax.random.normal(k5, (B,))

    def xla_head(att, fc, h, t):
        pooled = attention_pool(att, h, t)
        return mlp(fc, jnp.concatenate([pooled, t], axis=-1))[:, 0]

    for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        hist = jax.random.normal(k1, (B, L, D), dtype)
        tgt = jax.random.normal(k2, (B, D), dtype)
        attc = jax.tree.map(lambda x: x.astype(dtype), att)
        fcc = jax.tree.map(lambda x: x.astype(dtype), fc)

        def make(headfn):
            def fwdbwd(hist, tgt):
                def loss(a, f, h, t):
                    return jnp.sum(headfn(a, f, h, t).astype(jnp.float32) * cot)

                return jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
                    attc, fcc, hist, tgt
                )

            return jax.jit(fwdbwd)

        t_x = timeit(make(xla_head), hist, tgt)
        t_p = timeit(make(din_head_fused), hist, tgt)
        isz = jnp.dtype(dtype).itemsize
        # fwd: read hist+tgt, write logits; bwd: read hist+tgt+g, write grads
        bytes_min = 2 * (hist.nbytes + tgt.nbytes) + B * isz * 2 + (
            hist.size + tgt.size
        ) * 4
        results[f"din_head_train_{tag}"] = {
            "shape": [B, L, D],
            "xla_ms": t_x * 1e3,
            "pallas_ms": t_p * 1e3,
            "speedup": t_x / t_p,
            "sol_ms_hbm_bound": bytes_min / (HBM_GBPS * 1e9) * 1e3,
            "pallas_pct_of_sol": (bytes_min / (HBM_GBPS * 1e9)) / t_p * 100,
        }
        print(f"din_head_train_{tag}", results[f"din_head_train_{tag}"], flush=True)


def bench_afm_train(results, key):
    """Fused AFM attention pool vs XLA, FWD+BWD at the training shape
    (VERDICT r2 weak #6: AFM was the zoo straggler at 0.81M ex/s)."""
    from deeplearningrecommendationsystem_tpu.ops.pallas.afm_attention import (
        afm_attention_pool_fused,
    )

    B, F, Dm, A = 87909, 6, 128, 64
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    fields = jax.random.normal(k1, (B, F, Dm))
    w = jax.random.normal(k2, (Dm, A))
    b = jax.random.normal(k3, (A,))
    h = jax.random.normal(k4, (A, 1))
    cot = jax.random.normal(k5, (B, Dm))

    def make(poolfn):
        def fwdbwd(fields):
            def loss(e, w_, b_, h_):
                return jnp.sum(poolfn(e, w_, b_, h_) * cot)

            return jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(fields, w, b, h)

        return jax.jit(fwdbwd)

    xla_pool = lambda e, w_, b_, h_: afm_attention(  # noqa: E731
        w_, b_, h_, pairwise_products(e)
    )
    t_x = timeit(make(xla_pool), fields)
    t_p = timeit(make(afm_attention_pool_fused), fields)
    bytes_min = 2 * fields.nbytes + B * Dm * 4 * 2 + fields.size * 4
    results["afm_attention_train"] = {
        "shape": [B, F, Dm],
        "xla_ms": t_x * 1e3,
        "pallas_ms": t_p * 1e3,
        "speedup": t_x / t_p,
        "sol_ms_hbm_bound": bytes_min / (HBM_GBPS * 1e9) * 1e3,
        "pallas_pct_of_sol": (bytes_min / (HBM_GBPS * 1e9)) / t_p * 100,
    }
    print("afm_attention_train", results["afm_attention_train"], flush=True)


def bench_serving_topk(results, key, scale: str):
    """Fused score+mask+top-k (ops/pallas/serving_topk.py) vs the XLA path
    (matmul -> mask -> lax.top_k). ml-100k shape and a synthetic catalog."""
    from deeplearningrecommendationsystem_tpu.ops.pallas import topk_serve_matmul

    if scale == "ml100k":
        U, I, D, k = 943, 1682, 64, 50
        tile, chunk = 256, 512
    else:
        U, I, D, k = 2048, 131072, 64, 50
        tile, chunk = 256, 1024
    k1, k2, k3 = jax.random.split(key, 3)
    P = jax.random.normal(k1, (U, D))
    Q = jax.random.normal(k2, (I, D))
    seen = jax.random.uniform(k3, (U, I)) < 0.05

    def xla_fn(P, Q, seen):
        scores = jnp.where(seen, -1e30, P @ Q.T)
        return jax.lax.top_k(scores, k)

    xla = jax.jit(xla_fn)
    pal = jax.jit(
        lambda P, Q, s: topk_serve_matmul(P, Q, s, k=k, tile=tile, chunk=chunk)
    )
    # correctness on-chip before timing
    (xv, xi), (pv, pi) = xla(P, Q, seen), pal(P, Q, seen)
    assert jnp.allclose(xv, pv, atol=1e-4), "serving_topk values mismatch"
    assert jnp.array_equal(xi, pi), "serving_topk indices mismatch"
    t_x = timeit(xla, P, Q, seen)
    t_p = timeit(pal, P, Q, seen)

    # two-stage group-max variant (the large-catalog default, pure XLA)
    from deeplearningrecommendationsystem_tpu.ops.pallas import topk_two_stage

    two = jax.jit(lambda P, Q, s: topk_two_stage(P, Q, s, k=k))
    tv, ti_ = two(P, Q, seen)
    assert jnp.allclose(xv, tv, atol=1e-4), "two_stage values mismatch"
    t_two = timeit(two, P, Q, seen)
    results[f"serving_topk_two_stage_{scale}"] = {
        "shape": [U, I, D, k],
        "xla_ms": t_x * 1e3,
        "two_stage_ms": t_two * 1e3,
        "speedup": t_x / t_two,
    }
    print(f"serving_topk_two_stage_{scale}",
          results[f"serving_topk_two_stage_{scale}"], flush=True)
    # SoL: must read P, Q, seen(int8 on the pallas path) + write [U, k] * 2
    bytes_min = P.nbytes + Q.nbytes + U * I + U * k * 8
    results[f"serving_topk_{scale}"] = {
        "shape": [U, I, D, k],
        "xla_ms": t_x * 1e3,
        "pallas_ms": t_p * 1e3,
        "speedup": t_x / t_p,
        "sol_ms_hbm_bound": bytes_min / (HBM_GBPS * 1e9) * 1e3,
        "pallas_pct_of_sol": (bytes_min / (HBM_GBPS * 1e9)) / t_p * 100,
    }
    print(f"serving_topk_{scale}", results[f"serving_topk_{scale}"], flush=True)


if __name__ == "__main__":
    main()
