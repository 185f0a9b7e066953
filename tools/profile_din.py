"""Where does the DIN train step spend its time? (VERDICT r1 #7: raise MFU.)

Ablation timings of the full-batch DIN training epoch on the real chip:

  * baseline        -- parity config (gather/scatter embedding, f32)
  * matmul_bwd      -- item-table gathers with one-hot-matmul backward
                       (ops/embedding.py::gather_matmul_bwd) instead of TPU's
                       serialized scatter-add
  * bf16 [+matmul_bwd] -- MXU fast path on top
  * no_embed        -- embeddings precomputed outside the step (isolates the
                       gather+scatter cost: baseline - no_embed = embed cost)

Writes DIN_PROFILE.json and prints ex/s + achieved TFLOP/s for each variant.

    python tools/profile_din.py --epochs 50
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deeplearningrecommendationsystem_tpu.runtime.cache import (  # noqa: E402
    enable_compilation_cache,
)

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from deeplearningrecommendationsystem_tpu.data.movielens import MovieLens100K  # noqa: E402
from deeplearningrecommendationsystem_tpu.experiments import DEFAULT_DATA  # noqa: E402
from deeplearningrecommendationsystem_tpu.models import DIN  # noqa: E402
from deeplearningrecommendationsystem_tpu.sampling import NegativeSampler  # noqa: E402
from deeplearningrecommendationsystem_tpu.train import TrainConfig, Trainer  # noqa: E402

OUT = "DIN_PROFILE.json"


def build_batch(data, hist_len=10, n_neg=30, seed=0):
    sampler = NegativeSampler(
        data.seen_mask(data.train, data.valid, data.test), seed=seed
    )
    neg = sampler.sample(n_neg)
    combined = MovieLens100K.concat_splits(data.train, neg)
    hist = data.history_matrix(data.train, hist_len)
    return (
        (jnp.asarray(hist[combined["user"]]), jnp.asarray(combined["item"])),
        jnp.asarray(combined["rating"]),
    )


def time_fit(model, batch, y, epochs, dtype=None):
    trainer = Trainer(
        model,
        TrainConfig(
            learning_rate=1e-3, weight_decay=1e-5, epochs=epochs,
            track_metrics=False, compute_dtype=dtype,
        ),
    )
    rng = jax.random.PRNGKey(0)
    res = trainer.fit(rng, (batch, y))
    jax.block_until_ready(res.params)
    t0 = time.perf_counter()
    res = trainer.fit(rng, (batch, y))
    jax.block_until_ready(res.params)
    dt = time.perf_counter() - t0
    return dt, float(res.history["train_loss"][-1])


class PrecomputedDIN(DIN):
    """DIN whose item embeddings are training-step INPUTS (no gather/scatter
    in the step) -- the difference to baseline is the embedding-path cost."""

    def init(self, key):
        p = super().init(key)
        p.pop("item")
        return p

    def apply(self, params, batch):
        hist_e, target_e = batch  # pre-gathered [B, L, D], [B, D]
        from deeplearningrecommendationsystem_tpu.ops.attention import attention_pool
        from deeplearningrecommendationsystem_tpu.ops.linear import mlp

        pooled = attention_pool(params["att"], hist_e, target_e, None)
        return mlp(params["fc"], jnp.concatenate([pooled, target_e], -1))[:, 0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=50)
    args = ap.parse_args()

    data = MovieLens100K(DEFAULT_DATA, seed=0)
    batch, y = build_batch(data)
    n = int(y.shape[0])
    # fwd+bwd matmul FLOPs per example (att decomp L*(D*128+128*64+64) + fc
    # (128*256+256*128+128)) * 3x for backward, rough
    flops_ex = 3 * 2 * (10 * (64 * 128 + 128 * 64 + 64) + (128 * 256 + 256 * 128 + 128))

    results = {"examples_per_epoch": n, "epochs": args.epochs}
    variants = [
        ("baseline", dict(matmul_gather_bwd=False), None),
        ("matmul_bwd", dict(matmul_gather_bwd=True), None),
        ("bf16", dict(matmul_gather_bwd=False), "bfloat16"),
        ("bf16_matmul_bwd", dict(matmul_gather_bwd=True), "bfloat16"),
    ]
    for name, kw, dtype in variants:
        model = DIN(data.num_items, 64, **kw)
        dt, loss = time_fit(model, batch, y, args.epochs, dtype)
        eps = n * args.epochs / dt
        results[name] = {
            "sec_total": dt,
            "examples_per_sec": eps,
            "achieved_tflops": eps * flops_ex / 1e12,
            "final_loss": loss,
        }
        print(name, f"{eps:,.0f} ex/s  {eps * flops_ex / 1e12:.1f} TFLOP/s "
              f"loss={loss:.4f}", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)

    # no-embed ablation: isolate the gather/scatter cost
    key = jax.random.PRNGKey(1)
    hist_e = jax.random.normal(key, batch[0].shape + (64,), jnp.float32)
    target_e = jax.random.normal(key, (n, 64), jnp.float32)
    model = PrecomputedDIN(data.num_items, 64)
    dt, loss = time_fit(model, (hist_e, target_e), y, args.epochs)
    eps = n * args.epochs / dt
    results["no_embed"] = {
        "sec_total": dt,
        "examples_per_sec": eps,
        "achieved_tflops": eps * flops_ex / 1e12,
        "final_loss": loss,
    }
    print("no_embed", f"{eps:,.0f} ex/s", flush=True)
    base = results["baseline"]["sec_total"]
    results["embed_path_fraction_of_baseline"] = (dt and (base - dt) / base)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
