"""MF epoch ablation: where do MF's ~2 ms/epoch go?

Times 100-epoch scans with parts removed (same shapes/dtypes as bench.py's
mf row: B=229359 pairs, D=64, bf16 compute, f32 master weights, torch-Adam
+ weight decay 1e-5, matmul-gather backward):

  full      value_and_grad + Adam update        (== bench path)
  no_opt    value_and_grad, params never updated
  fwd_only  loss forward only
  empty     scan body is a no-op passthrough

Writes MF_PROFILE.json. Run SOLO on an idle host.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deeplearningrecommendationsystem_tpu.runtime.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from deeplearningrecommendationsystem_tpu.configs.presets import PRESETS  # noqa: E402
from deeplearningrecommendationsystem_tpu.data import MovieLens100K  # noqa: E402
from deeplearningrecommendationsystem_tpu.experiments import (  # noqa: E402
    DEFAULT_DATA,
    build_model,
)
from deeplearningrecommendationsystem_tpu.parallel.ep import (  # noqa: E402
    matmul_gather_backward,
)
from deeplearningrecommendationsystem_tpu.train import TrainConfig, Trainer  # noqa: E402

EPOCHS = 100


def main():
    data = MovieLens100K(DEFAULT_DATA)
    cfg = PRESETS["mf"]
    model = build_model(cfg, data)
    batch, y, _ = bench._train_batch(data, "mf")
    n = int(y.shape[0])
    trainer = Trainer(
        model,
        TrainConfig(
            learning_rate=cfg.learning_rate,
            weight_decay=cfg.weight_decay,
            epochs=EPOCHS,
            track_metrics=False,
            compute_dtype="bfloat16",
            matmul_gather_bwd=True,
        ),
    )

    def checksum(tree):
        return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(tree))

    def make(variant):
        @jax.jit
        def run(key):
            with matmul_gather_backward(True):
                params = model.init(key)
                opt_state = trainer.tx.init(params)

                def body(carry, _):
                    params, opt_state = carry
                    if variant == "empty":
                        return (params, opt_state), jnp.float32(0)
                    if variant == "fwd_only":
                        loss, _ = trainer.loss_fn(params, batch, y)
                        return (params, opt_state), loss
                    if variant == "no_opt":
                        (loss, _), grads = jax.value_and_grad(
                            trainer.loss_fn, has_aux=True
                        )(params, batch, y)
                        # keep grads live without updating params
                        return (params, opt_state), loss + 0.0 * checksum(grads)
                    params, opt_state, loss, _ = trainer.train_step(
                        params, opt_state, batch, y
                    )
                    return (params, opt_state), loss

                (params, opt_state), losses = jax.lax.scan(
                    body, (params, opt_state), None, length=EPOCHS
                )
                return losses[-1] + 0.0 * checksum(params) + 0.0 * checksum(opt_state)

        return run

    out = {}
    for variant in ("full", "no_opt", "fwd_only", "empty"):
        run = make(variant)
        t0 = time.perf_counter()
        final = float(run(jax.random.PRNGKey(0)))
        compile_s = time.perf_counter() - t0
        dt = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            final = float(run(jax.random.PRNGKey(0)))
            dt = min(dt, time.perf_counter() - t0)
        out[variant] = {
            "ms_per_epoch": dt / EPOCHS * 1e3,
            "sec_total": dt,
            "final_value": final,
            "compile_s": compile_s,
        }
        print(variant, out[variant], flush=True)

    out["examples_per_epoch"] = n
    with open("MF_PROFILE.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
