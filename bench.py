"""Benchmark: training examples/s/chip on ml-100k, vs the torch-CPU reference.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "examples/s/chip", "vs_baseline": N, ...}

The headline value is DeepFM examples/s/chip; ``vs_baseline`` is the
geometric-mean speedup over the measured reference throughput across the
ENTIRE model zoo (every model with a measured torch-CPU row in
BASELINE_MEASURED.json, tools/measure_reference_baseline.py). Timing covers
the full-batch training loop (the same work the reference's train_loop does),
warm-compiled, whole multi-epoch scan on device.
"""

from __future__ import annotations

import json
import os
import time

from deeplearningrecommendationsystem_tpu.runtime.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from deeplearningrecommendationsystem_tpu.configs.presets import PRESETS  # noqa: E402
from deeplearningrecommendationsystem_tpu.data import MovieLens100K  # noqa: E402
from deeplearningrecommendationsystem_tpu.experiments import (  # noqa: E402
    DEFAULT_DATA,
    _split_rows_60_20_20,
    build_model,
)
from deeplearningrecommendationsystem_tpu.sampling import NegativeSampler  # noqa: E402
from deeplearningrecommendationsystem_tpu.train import TrainConfig, Trainer  # noqa: E402

# Fallback reference throughput (examples/s) when BASELINE_MEASURED.json is
# absent; the measured file always wins.
REFERENCE_FALLBACK = {"deepfm": 14581.0, "din": 17364.0, "mf": 614883.0}

EPOCHS = 100

# Mixed precision per model: bf16 (MXU matmuls, f32 master weights) is used
# only where a full reference-hyperparameter run proved quality parity
# (BF16_QUALITY.json): MF exact (+0.0000 auc_raw), NeuralCF +0.0001 with
# matching R@50/NDCG (r5), DIN/DIEN within seed variance.
# The full-batch feature models LOSE ~0.09-0.15 auc_raw in bf16 -- few huge
# GD steps round away the mean gradient -- and stay f32 (r5 re-confirmed on
# the previously untested rows: deepcross -0.103, deepcrossing -0.096,
# afm -0.149).
COMPUTE_DTYPE = {
    "din": "bfloat16",
    "mf": "bfloat16",
    "dien": "bfloat16",
    "neuralcf": "bfloat16",
}

# r5: one-hot-matmul FORWARD gathers (TrainConfig.onehot_gather) for the
# models where the zoo probe measured a win (ONEHOT_FWD_PROBE.json: ffm
# 1.78x, deepcrossing 1.26x, deepfm 1.12x, dien 1.12x, nfm 1.11x, widedeep
# 1.08x, din 1.02-1.04x across three settle windows; neutral-or-loss rows
# keep the default route). Same math -- XLA fuses the compare-generated
# one-hot into the dot stream instead of the slow native in-scan gather
# emitter (MF_LAYOUT_PROBE.json root cause).
ONEHOT_GATHER = {"ffm", "deepfm", "widedeep", "nfm", "deepcrossing", "dien",
                 "din"}

ZOO = (
    "lr", "mf", "neuralcf", "ffm", "widedeep", "deepfm", "nfm", "afm",
    "pnn", "deepcross", "deepcrossing", "autorec", "i-autorec", "din", "dien",
)


def _load_reference():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    ref = dict(REFERENCE_FALLBACK)
    try:
        with open(path) as f:
            measured = json.load(f)
        for name, row in measured.items():
            if isinstance(row, dict) and "examples_per_sec" in row:
                ref[name] = float(row["examples_per_sec"])
    except FileNotFoundError:
        pass
    return ref


def _train_batch(data: MovieLens100K, name: str, indirect: bool = True):
    """(batch, labels, weights) replicating the reference script's training
    tensors (SURVEY.md §2.4 negatives; §3 pipelines). ``indirect=False``
    forces the standard (non-deduped) batch layout for DIN/DIEN."""
    cfg = PRESETS[name]
    if cfg.family == "matrix":
        sampler = NegativeSampler(data.seen_mask(data.data), seed=0)
        negatives = sampler.sample(cfg.global_negatives)
        matrix = data.rating_matrix(negatives, item_major=cfg.item_major)
        tr, _, _ = _split_rows_60_20_20(matrix.shape[0], 0)
        m = jnp.asarray(matrix[tr])
        return m, m, (m != 0.5).astype(jnp.float32)
    sampler = NegativeSampler(
        data.seen_mask(data.train, data.valid, data.test), seed=0
    )
    neg = sampler.sample(cfg.negatives[0])
    combined = MovieLens100K.concat_splits(data.train, neg)
    y = jnp.asarray(combined["rating"])
    if cfg.family == "feature":
        return jnp.asarray(data.feature_matrix(combined)), y, None
    if cfg.family == "pair":
        return (jnp.asarray(combined["user"]), jnp.asarray(combined["item"])), y, None
    if cfg.family == "seq":
        hist = data.history_matrix(data.train, cfg.hist_len)
        if indirect and name in ("din", "dien"):
            # indirect-hist batch (models/din.py::indirect_hist, ported to
            # DIEN in r5): the epoch repeats each user's identical history
            # row ~93x, so the model gathers it once per USER; 1.69x the
            # standard DIN path (DIN_8M_PROBE.json), quality at parity
            # (DIN_INDIRECT_QUALITY.json / DIEN_INDIRECT_QUALITY.json)
            return (
                (
                    jnp.asarray(hist),
                    jnp.asarray(combined["user"]),
                    jnp.asarray(combined["item"]),
                ),
                y,
                None,
            )
        return (
            (jnp.asarray(hist[combined["user"]]), jnp.asarray(combined["item"])),
            y,
            None,
        )
    raise ValueError(cfg.family)


def measure(name: str, data: MovieLens100K, reference: dict) -> dict:
    cfg = PRESETS[name]
    if name == "afm":
        # fused pairwise-attention kernel fwd+bwd: the [B, 15, D] pair tensor
        # never reaches HBM (9.4x the XLA path, KERNEL_BENCH.json)
        cfg = cfg.replace(
            model_kwargs=dict(cfg.model_kwargs, fused_attention=True)
        )
    if name in ("din", "dien"):
        # per-user history dedup (see _train_batch's seq branch)
        cfg = cfg.replace(model_kwargs=dict(cfg.model_kwargs, indirect_hist=True))
    if name == "mf":
        # r5 layout-probe winner: [D, B]-orientation one-hot-matmul epoch,
        # 1.47x / 172.7M ex/s, loss bit-identical (MF_LAYOUT_PROBE.json)
        cfg = cfg.replace(model_kwargs=dict(cfg.model_kwargs, onehot_epoch=True))
    model = build_model(cfg, data)
    if name == "lr":
        # whole-epoch fused kernel: fwd + BCE grad + weight grad + Adam in
        # ONE Pallas call per epoch (ops/pallas/lr_epoch.py; exact trainer
        # semantics, oracle-tested)
        batch, y, _ = _train_batch(data, name)
        n = int(y.shape[0])

        # whole run (init + widen one-hot build + epoch scan) as ONE cached
        # jitted program: repeated timed runs skip Python retracing and the
        # eager per-call dispatches (same fix as Trainer._run)
        @jax.jit
        def lr_run(key):
            params = model.init(key)
            p, losses = model.fast_fit(params, batch, y, EPOCHS, cfg.learning_rate)
            # one sync scalar: its VALUE is the final epoch loss, but it
            # data-depends on the FINAL weight update too (the relay can
            # report donated-aliased buffers ready before writes land,
            # CLAUDE.md r2) -- so ONE fetch both returns the loss and blocks
            # on every updated buffer, with no extra relay roundtrip
            checksum = sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(p))
            return p, losses, losses[-1] + 0.0 * checksum

        def run_lr():
            _, _, sync = lr_run(jax.random.PRNGKey(0))
            return float(sync)

        final_loss = run_lr()  # compile + warm
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            final_loss = run_lr()
            dt = min(dt, time.perf_counter() - t0)
        out = {
            "compute_dtype": "float32",
            "examples_per_epoch": n,
            "sec_total": dt,
            "examples_per_sec": n * EPOCHS / dt,
            "final_loss": final_loss,
        }
        if name in reference:
            out["speedup_vs_reference"] = out["examples_per_sec"] / reference[name]
        return out
    trainer = Trainer(
        model,
        TrainConfig(
            learning_rate=cfg.learning_rate,
            weight_decay=cfg.weight_decay,
            epochs=EPOCHS,
            track_metrics=False,
            compute_dtype=COMPUTE_DTYPE.get(name),
            # every id-table gather's backward as a one-hot MXU matmul:
            # bit-identical gradients, no serialized TPU scatters
            # (parallel/ep.py::matmul_gather_backward)
            matmul_gather_bwd=True,
            # measured winners also run the FORWARD as a one-hot matmul
            # (see ONEHOT_GATHER above)
            onehot_gather=name in ONEHOT_GATHER,
        ),
    )
    batch, y, w = _train_batch(data, name)
    weights = {"train": w} if w is not None else None
    rng = jax.random.PRNGKey(0)

    res = trainer.fit(rng, (batch, y), weights=weights)  # compile + warm
    jax.block_until_ready(res.params)
    # best of 3: relay executions are occasionally inflated 2-10x by
    # transient relay/compile-queue state (CLAUDE.md); the fastest clean run
    # is the program's actual speed. Retraced-free reruns (Trainer._run) make
    # extra timed runs cheap. The ONLY sync is fetching _param_checksum -- a
    # scalar the compiled run derives from EVERY final param and optimizer
    # buffer -- because this relay can report donated-aliased outputs ready
    # before their writes land (CLAUDE.md r2 timing rule), and each extra
    # fetch/block roundtrip costs ~30 ms here.
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        res = trainer.fit(rng, (batch, y), weights=weights)
        float(res.history["_param_checksum"][-1])
        dt = min(dt, time.perf_counter() - t0)

    # examples per epoch: rated entries for the masked-matrix family
    # (matching the reference loop's loss terms), rows otherwise
    n = int(np.sum(np.asarray(w))) if w is not None else int(y.shape[0])
    eps = n * EPOCHS / dt
    out = {
        "compute_dtype": COMPUTE_DTYPE.get(name) or "float32",
        "examples_per_epoch": n,
        "sec_total": dt,
        "examples_per_sec": eps,
        "final_loss": float(res.history["train_loss"][-1]),
    }
    if name in reference:
        out["speedup_vs_reference"] = eps / reference[name]
    return out


def main() -> None:
    reference = _load_reference()
    data = MovieLens100K(DEFAULT_DATA, seed=0)
    # absorb process-level first-execution overhead (plugin init, cache
    # warmup) on a throwaway run so the first zoo model isn't penalized
    try:
        measure("mf", data, {})
    except Exception:  # noqa: BLE001
        pass
    details = {}
    for name in ZOO:
        try:
            details[name] = measure(name, data, reference)
        except Exception as e:  # noqa: BLE001 -- one model must not kill the bench
            details[name] = {"error": f"{type(e).__name__}: {e}"[:300]}

    speedups = [
        d["speedup_vs_reference"]
        for d in details.values()
        if "speedup_vs_reference" in d
    ]
    geo = float(np.exp(np.mean(np.log(speedups)))) if speedups else 0.0

    # Per-model details go to a side file; the driver captures only the LAST
    # stdout line, which must be the compact headline (VERDICT r2 weak #1).
    # Roofline fields (tools/roofline.py, artifact of record ROOFLINE.json)
    # are carried over so a bench re-run doesn't drop them.
    root = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(root, "ROOFLINE.json")) as f:
            roofline = json.load(f)
        for name, r in roofline.items():
            if name in details and "error" not in details[name]:
                details[name].update(
                    {k: r[k] for k in ("flops", "hbm_bytes", "pct_hbm_sol", "mfu")}
                )
    except FileNotFoundError:
        pass
    with open(os.path.join(root, "BENCH_DETAILS.json"), "w") as f:
        json.dump(details, f, indent=1, sort_keys=True)

    print(
        json.dumps(
            {
                "metric": (
                    "train_examples_per_sec_per_chip (DeepFM ml-100k full-batch; "
                    f"vs_baseline = geomean speedup over the measured torch-CPU "
                    f"reference across {len(speedups)} models; per-model rows "
                    "in BENCH_DETAILS.json)"
                ),
                "value": round(
                    details.get("deepfm", {}).get(
                        "examples_per_sec",
                        max(
                            (d.get("examples_per_sec", 0.0) for d in details.values()),
                            default=0.0,
                        ),
                    ),
                    1,
                ),
                "unit": "examples/s/chip",
                "vs_baseline": round(geo, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
