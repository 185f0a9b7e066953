"""Probe: FFM's pair math in the [D, B] orientation.

FFM's epoch is 15 pairwise dot-products over num_vector=32 lanes: in the
shipped [B, 32] orientation every elementwise+reduce op uses 32 of 128 VPU
lanes (4x waste). The MF layout probe showed the [D, B] orientation (reduce
along sublanes, B lanes saturated) was worth ~8% on D=64; at D=32 the lane
waste is larger, so the upside should be too. Variant: every field embedding
computed as ``table.T @ x.T`` / ``table.T @ onehot.T`` -> [D, B]; the 15
pair products reduce over axis 0; the LR part unchanged. Same math
(exact-row one-hot extraction + identical reduction terms).

Full 100-epoch bench-configuration runs vs the shipped default (one-hot
route). Run SOLO. Writes FFM_LAYOUT_PROBE.json.
"""

from __future__ import annotations

import dataclasses
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
from deeplearningrecommendationsystem_tpu.experiments import DEFAULT_DATA  # noqa: E402
from deeplearningrecommendationsystem_tpu.features import ML100K_SPEC  # noqa: E402
from deeplearningrecommendationsystem_tpu.models import FFM  # noqa: E402
from deeplearningrecommendationsystem_tpu.models.ffm import PAIRS  # noqa: E402
from deeplearningrecommendationsystem_tpu.ops.linear import linear  # noqa: E402
from deeplearningrecommendationsystem_tpu.train import TrainConfig, Trainer  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "FFM_LAYOUT_PROBE.json")


def _onehot_T(ids, vocab, dtype):
    # [V, B] one-hot, built directly in the transposed orientation
    return (
        jax.lax.broadcasted_iota(ids.dtype, (vocab, 1), 0) == ids[None, :]
    ).astype(dtype)


@dataclasses.dataclass
class FFMTransposedCompute(FFM):
    """Same params, epoch computed in [D, B] orientation."""

    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        spec = self.spec
        user, item, age, gender, occupation, genre = spec.split(x)
        t = params["tables"]
        dt = x.dtype

        emb = {}
        for domain in ("user", "item"):
            emb[("age", domain)] = t[f"age.{domain}"].T @ age.T  # [D, B]
            emb[("gender", domain)] = t[f"gender.{domain}"].T @ gender.T
            emb[("occupation", domain)] = t[f"occupation.{domain}"].T @ occupation.T
            emb[("genre", domain)] = t[f"genre.{domain}"].T @ genre.T
            emb[("user_id", domain)] = t[f"user_id.{domain}"].T @ _onehot_T(
                user, spec.num_users, dt
            )
            emb[("item_id", domain)] = t[f"item_id.{domain}"].T @ _onehot_T(
                item, spec.num_items, dt
            )

        cross = jnp.zeros((x.shape[0],), dtype=x.dtype)
        for lf, ld, rf, rd in PAIRS:
            cross = cross + jnp.sum(emb[(lf, ld)] * emb[(rf, rd)], axis=0)

        lr = params["lr"]
        dense_plus_cross = spec.dense(x) + cross[:, None]
        logits = (
            (lr["user_bias"].T @ _onehot_T(user, spec.num_users, dt)).T
            + (lr["item_bias"].T @ _onehot_T(item, spec.num_items, dt)).T
            + linear(lr["wide"], dense_plus_cross)
        )
        return logits[:, 0]


def run(model, data, batch, y, onehot_route: bool):
    cfg = PRESETS["ffm"]
    trainer = Trainer(
        model,
        TrainConfig(
            learning_rate=cfg.learning_rate,
            weight_decay=cfg.weight_decay,
            epochs=bench.EPOCHS,
            track_metrics=False,
            matmul_gather_bwd=True,
            onehot_gather=onehot_route,
        ),
    )
    rng = jax.random.PRNGKey(0)
    res = trainer.fit(rng, (batch, y))
    jax.block_until_ready(res.params)
    dt = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        res = trainer.fit(rng, (batch, y))
        float(res.history["_param_checksum"][-1])
        dt = min(dt, time.perf_counter() - t0)
    return {
        "sec_total": dt,
        "ms_per_epoch": dt / bench.EPOCHS * 1e3,
        "examples_per_sec": y.shape[0] * bench.EPOCHS / dt,
        "final_loss": float(res.history["train_loss"][-1]),
    }


def main():
    data = MovieLens100K(DEFAULT_DATA, seed=0)
    batch, y, _ = bench._train_batch(data, "ffm")
    out = {}
    out["default_onehot"] = run(FFM(ML100K_SPEC), data, batch, y, True)
    print("default_onehot", out["default_onehot"], flush=True)
    out["transposed_compute"] = run(
        FFMTransposedCompute(ML100K_SPEC), data, batch, y, False
    )
    out["transposed_compute"]["speedup_vs_default"] = (
        out["default_onehot"]["sec_total"]
        / out["transposed_compute"]["sec_total"]
    )
    print("transposed_compute", out["transposed_compute"], flush=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
