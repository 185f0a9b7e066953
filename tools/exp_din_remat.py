"""Does rematerialization lift DIN training throughput? (HBM-bound step.)

DIN_PROFILE.json showed the step is HBM-bound on [B, L, D]/[B*L, H]
activations (no_embed = 4% MFU). ``jax.checkpoint`` over the forward trades
recompute (cheap, MXU) for not storing/re-reading the big intermediates in
the backward -- the classic fix for bandwidth-bound training. Times
bf16+matmul_bwd DIN with and without remat; appends to DIN_PROFILE.json.
"""

from __future__ import annotations

import dataclasses
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

from deeplearningrecommendationsystem_tpu.data.movielens import MovieLens100K  # noqa: E402
from deeplearningrecommendationsystem_tpu.experiments import DEFAULT_DATA  # noqa: E402
from deeplearningrecommendationsystem_tpu.models import DIN  # noqa: E402
from deeplearningrecommendationsystem_tpu.train import TrainConfig, Trainer  # noqa: E402
from tools.profile_din import build_batch  # noqa: E402


@dataclasses.dataclass
class RematDIN(DIN):
    def apply(self, params, batch):
        return jax.checkpoint(
            lambda p, b: self._apply(p, b, use_pallas=False)
        )(params, batch)


def main():
    epochs = 50
    data = MovieLens100K(DEFAULT_DATA, seed=0)
    batch, y = build_batch(data)
    n = int(y.shape[0])
    results = {}
    for name, cls in (("bf16_matmul_bwd_again", DIN), ("bf16_matmul_bwd_remat", RematDIN)):
        model = cls(data.num_items, 64, matmul_gather_bwd=True)
        trainer = Trainer(
            model,
            TrainConfig(
                learning_rate=1e-3, weight_decay=1e-5, epochs=epochs,
                track_metrics=False, compute_dtype="bfloat16",
            ),
        )
        rng = jax.random.PRNGKey(0)
        res = trainer.fit(rng, (batch, y))
        jax.block_until_ready(res.params)
        t0 = time.perf_counter()
        res = trainer.fit(rng, (batch, y))
        jax.block_until_ready(res.params)
        dt = time.perf_counter() - t0
        results[name] = {
            "sec_total": dt,
            "examples_per_sec": n * epochs / dt,
            "final_loss": float(res.history["train_loss"][-1]),
        }
        print(name, f"{n * epochs / dt:,.0f} ex/s loss={results[name]['final_loss']:.4f}",
              flush=True)

    try:
        with open("DIN_PROFILE.json") as f:
            prof = json.load(f)
    except FileNotFoundError:
        prof = {}
    prof.update(results)
    with open("DIN_PROFILE.json", "w") as f:
        json.dump(prof, f, indent=2)
    print("wrote DIN_PROFILE.json")


if __name__ == "__main__":
    main()
