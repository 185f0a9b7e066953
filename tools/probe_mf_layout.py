"""Probe: steer XLA's in-scan gather/one-hot emitter choice for MF by LAYOUT.

VERDICT r4 next #3. The r4 device trace pins MF's 1.64 ms epoch at 0.85 ms
forward gathers (~12x off HBM bandwidth for 29 MB) + 0.7 ms backward
convolution-emitter — and BOTH ops run at ~0.03 ms as isolated programs
(layout-dependent emitter choice). Pallas replacements lost to the
~0.3-0.5 ms in-scan call overhead (PALLAS_GATHER_PROBE / MF_FUSED_PROBE);
the unprobed lever is making XLA itself pick the fast emitter INSIDE the
scan. Variants (each a full 100-epoch bench-configuration training run,
bf16 + single-sync checksum timing):

* ``baseline``      — table[ids] rows-gather fwd + one-hot-matmul bwd (the
                      shipped default, matmul_gather_bwd)
* ``onehot_fwd``    — BOTH directions as one-hot matmuls: fwd
                      ``(ids == iota) @ table`` rides the same fused
                      compare->dot stream r4 proved XLA handles well on the
                      backward (ONEHOT_GRAD_PROBE), no native gather at all
* ``transposed``    — tables stored [D, V]; fwd gathers COLUMNS (lane axis),
                      bwd scatters columns — a different gather emitter
* ``transposed_oh`` — [D, V] storage with one-hot matmuls both ways
                      (``table @ onehot.T``)

Writes MF_LAYOUT_PROBE.json. Run SOLO on an idle host. If a variant clears
>=1.3x end-to-end, it should graduate into models/mf.py (and be tried on
FFM/NeuralCF); if none does, the root cause note goes to CLAUDE.md.
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
from deeplearningrecommendationsystem_tpu.models import MatrixFactorization  # noqa: E402
from deeplearningrecommendationsystem_tpu.ops.linear import embedding_init  # noqa: E402
from deeplearningrecommendationsystem_tpu.train import TrainConfig, Trainer  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "MF_LAYOUT_PROBE.json")


def _onehot(ids: jnp.ndarray, vocab: int, dtype) -> jnp.ndarray:
    return (
        ids[:, None] == jax.lax.broadcasted_iota(ids.dtype, (1, vocab), 1)
    ).astype(dtype)


@dataclasses.dataclass
class MFOneHotFwd:
    """[V, D] tables; BOTH gather directions as one-hot matmuls."""

    num_users: int
    num_items: int
    embedding_dim: int = 64

    def init(self, key):
        ku, ki = jax.random.split(key)
        return {
            "user": embedding_init(ku, self.num_users, self.embedding_dim),
            "item": embedding_init(ki, self.num_items, self.embedding_dim),
        }

    def apply(self, params, batch):
        users, items = batch
        dt = params["user"].dtype
        pe = _onehot(users, self.num_users, dt) @ params["user"]
        qe = _onehot(items, self.num_items, dt) @ params["item"]
        return jnp.sum(pe * qe, axis=-1)


@dataclasses.dataclass
class MFTransposed:
    """Tables stored [D, V]; forward gathers COLUMNS along the lane axis."""

    num_users: int
    num_items: int
    embedding_dim: int = 64
    onehot: bool = False  # one-hot matmul both ways instead of column gather

    def init(self, key):
        ku, ki = jax.random.split(key)
        return {
            "user": embedding_init(ku, self.num_users, self.embedding_dim).T,
            "item": embedding_init(ki, self.num_items, self.embedding_dim).T,
        }

    def apply(self, params, batch):
        users, items = batch
        if self.onehot:
            dt = params["user"].dtype
            pe = params["user"] @ _onehot(users, self.num_users, dt).T  # [D, B]
            qe = params["item"] @ _onehot(items, self.num_items, dt).T
        else:
            pe = params["user"][:, users]  # [D, B]
            qe = params["item"][:, items]
        return jnp.sum(pe * qe, axis=0)


@dataclasses.dataclass
class MFOneHotFwdT:
    """Standard [V, D] params, but the epoch computes in the [D, B]
    orientation: ``table.T @ onehot.T`` (the tiny per-epoch table transpose
    stays in-scan) and reduces the factor product along SUBLANES with B
    lanes -- probing whether transposed_oh's edge is the compute
    orientation, not the storage layout (storage change would break EP
    row-sharding / checkpoints / serving_factors)."""

    num_users: int
    num_items: int
    embedding_dim: int = 64

    def init(self, key):
        ku, ki = jax.random.split(key)
        return {
            "user": embedding_init(ku, self.num_users, self.embedding_dim),
            "item": embedding_init(ki, self.num_items, self.embedding_dim),
        }

    def apply(self, params, batch):
        users, items = batch
        dt = params["user"].dtype
        pe = params["user"].T @ _onehot(users, self.num_users, dt).T  # [D, B]
        qe = params["item"].T @ _onehot(items, self.num_items, dt).T
        return jnp.sum(pe * qe, axis=0)


def run(model, matmul_bwd: bool, data, batch, y):
    cfg = PRESETS["mf"]
    trainer = Trainer(
        model,
        TrainConfig(
            learning_rate=cfg.learning_rate,
            weight_decay=cfg.weight_decay,
            epochs=bench.EPOCHS,
            track_metrics=False,
            compute_dtype="bfloat16",
            matmul_gather_bwd=matmul_bwd,
        ),
    )
    rng = jax.random.PRNGKey(0)
    res = trainer.fit(rng, (batch, y))  # compile + warm
    jax.block_until_ready(res.params)
    dt = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        res = trainer.fit(rng, (batch, y))
        float(res.history["_param_checksum"][-1])  # single-sync (CLAUDE.md r2/r4)
        dt = min(dt, time.perf_counter() - t0)
    n = int(y.shape[0])
    return {
        "sec_total": dt,
        "ms_per_epoch": dt / bench.EPOCHS * 1e3,
        "examples_per_sec": n * bench.EPOCHS / dt,
        "final_loss": float(res.history["train_loss"][-1]),
    }


def main():
    data = MovieLens100K(DEFAULT_DATA, seed=0)
    batch, y, _ = bench._train_batch(data, "mf")
    U, I = data.num_users, data.num_items
    variants = {
        "baseline": (MatrixFactorization(U, I, 64), True),
        "onehot_fwd": (MFOneHotFwd(U, I, 64), False),
        "transposed": (MFTransposed(U, I, 64), False),
        "transposed_oh": (MFTransposed(U, I, 64, onehot=True), False),
        "onehot_fwd_T": (MFOneHotFwdT(U, I, 64), False),
    }
    try:
        out = json.load(open(OUT))
    except FileNotFoundError:
        out = {}
    only = sys.argv[1:] or list(variants)
    for name in only:
        model, mbwd = variants[name]
        out[name] = run(model, mbwd, data, batch, y)
        if "baseline" in out:
            out[name]["speedup_vs_baseline"] = (
                out["baseline"]["sec_total"] / out[name]["sec_total"]
            )
        print(name, out[name], flush=True)
        with open(OUT, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps({k: v.get("speedup_vs_baseline") for k, v in out.items()}))


if __name__ == "__main__":
    main()
