"""Weak-scaling harness: DP throughput at 1..N devices.

On a TPU pod slice this measures real ICI allreduce scaling; the bundled
environment has ONE physical chip, so by default this runs on an N-device
virtual CPU mesh -- which validates the sharded program and the scaling
HARNESS, not silicon performance. Run on a pod with JAX_PLATFORMS unset to
get real numbers (≥85% weak-scaling efficiency is the north-star target).

    python tools/bench_scaling.py --devices 1 2 4 8
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
import numpy as np  # noqa: E402

from deeplearningrecommendationsystem_tpu.features import ML100K_SPEC  # noqa: E402
from deeplearningrecommendationsystem_tpu.models import DeepFM  # noqa: E402
from deeplearningrecommendationsystem_tpu.parallel import make_mesh, pad_and_shard  # noqa: E402
from deeplearningrecommendationsystem_tpu.train import TrainConfig, Trainer  # noqa: E402


def fake_batch(n, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.integers(0, 943, n).astype(np.float32)[:, None]
    i = rng.integers(0, 1682, n).astype(np.float32)[:, None]
    age = rng.random((n, 1), dtype=np.float32)
    gender = np.eye(2, dtype=np.float32)[rng.integers(0, 2, n)]
    occ = np.eye(21, dtype=np.float32)[rng.integers(0, 21, n)]
    genre = (rng.random((n, 19)) < 0.2).astype(np.float32)
    x = np.concatenate([u, i, age, gender, occ, genre], axis=1)
    y = (rng.random(n) < 0.5).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


def measure(n_devices: int, per_device_batch: int, epochs: int) -> float:
    mesh = make_mesh(data=n_devices, model=1, devices=jax.devices()[:n_devices])
    model = DeepFM(ML100K_SPEC, hidden_units=(256, 128, 1), embedding_dim=64)
    trainer = Trainer(model, TrainConfig(learning_rate=1e-3, epochs=epochs, track_metrics=False))
    n = per_device_batch * n_devices  # weak scaling: batch grows with devices
    x, y = fake_batch(n)
    batch, labels, weights = pad_and_shard(x, y, mesh)

    res = trainer.fit(jax.random.PRNGKey(0), (batch, labels), weights={"train": weights})
    jax.block_until_ready(res.params)
    t0 = time.perf_counter()
    res = trainer.fit(jax.random.PRNGKey(0), (batch, labels), weights={"train": weights})
    jax.block_until_ready(res.params)
    dt = time.perf_counter() - t0
    return n * epochs / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", nargs="+", type=int, default=[1, 2, 4, 8])
    ap.add_argument("--per-device-batch", type=int, default=16384)
    ap.add_argument("--epochs", type=int, default=20)
    args = ap.parse_args()

    results = {}
    base = None
    for nd in args.devices:
        if nd > jax.device_count():
            print(f"skip {nd} (only {jax.device_count()} devices)")
            continue
        eps = measure(nd, args.per_device_batch, args.epochs)
        per_dev = eps / nd
        if base is None:
            base = per_dev
        results[nd] = {
            "examples_per_sec": eps,
            "per_device": per_dev,
            "weak_scaling_efficiency": per_dev / base,
        }
        print(
            f"{nd} devices: {eps:,.0f} ex/s total, {per_dev:,.0f}/device, "
            f"efficiency {per_dev / base:.1%}"
        )
    # analytic v5e model of the same step (runtime/scaling_model.py): XLA's
    # compiled cost analysis for compute/HBM + ring-allreduce ICI term, so a
    # real pod run lands next to its expected curve in this JSON
    from deeplearningrecommendationsystem_tpu.runtime.scaling_model import (
        grad_bytes_of,
        predict_weak_scaling,
        program_costs,
    )

    model = DeepFM(ML100K_SPEC, hidden_units=(256, 128, 1), embedding_dim=64)
    trainer = Trainer(
        model, TrainConfig(learning_rate=1e-3, epochs=1, track_metrics=False)
    )
    x, y = fake_batch(args.per_device_batch)
    params = model.init(jax.random.PRNGKey(0))
    opt_state = trainer.tx.init(params)
    try:
        costs = program_costs(
            lambda p, o, b, yy: trainer.train_step(p, o, b, yy),
            params, opt_state, x, y,
        )
        gbytes = grad_bytes_of(params)
        predicted = {
            nd: predict_weak_scaling(
                costs["flops"], costs["hbm_bytes"], gbytes, nd
            )
            for nd in args.devices
        }
    except Exception as e:  # noqa: BLE001 -- cost analysis is backend-dependent
        costs, predicted = {"error": str(e)[:200]}, {}

    payload = {
        "backend": jax.default_backend(),
        "results": results,
        "per_device_step_cost_analysis": costs,
        "v5e_model_predicted": predicted,
    }
    if jax.default_backend() == "cpu":
        payload["note"] = (
            "virtual CPU mesh: all devices share this host's "
            f"{os.cpu_count()} core(s), so weak-scaling efficiency here is "
            "bounded by ~cores/devices and does NOT predict TPU ICI scaling; "
            "it validates the sharded program only. Run with SCALING_REAL_TPU=1 "
            "on a pod slice for real numbers."
        )
        print(payload["note"])
    with open("SCALING.json", "w") as f:
        json.dump(payload, f, indent=2)


if __name__ == "__main__":
    main()
