"""Zoo-wide roofline/MFU accounting (VERDICT r4 next #6).

For every preset: one training epoch's FLOPs and HBM bytes from XLA's OWN
compiled cost analysis (``jit(train_step).lower().compile().cost_analysis()``
on the TPU backend -- the real program, not hand counts), joined with the
measured epoch time from ``BENCH_DETAILS.json``, giving

  * ``hbm_sol_ms``  = bytes / 819 GB/s   (v5e HBM speed-of-light)
  * ``pct_hbm_sol`` = hbm_sol_ms / measured epoch ms
  * ``mfu``         = flops / (epoch_s * peak_flops[dtype])

so "is it actually fast or just faster than torch-CPU" has a number for all
15 models, not 3 (docs/performance.md had LR/DIN/dense-Adam only).

Caveats recorded with the data: the cost model is the STANDALONE one-epoch
step (the shipped program scans it; in-scan layouts can differ -- the r4 MF
trace showed a 12x emitter gap for exactly this reason), and models whose
shipped path is a fused Pallas kernel (LR whole-run, AFM attention) are
analyzed on the equivalent XLA step (same math; custom-call FLOPs are opaque
to the analyzer).

Writes ROOFLINE.json, merges the fields into BENCH_DETAILS.json rows, and
regenerates the ``<!-- gen:roofline -->`` table in docs/performance.md
(gated by tests/test_docs_consistency.py). Compile-only: safe to run without
exclusive chip time, but each fresh lowering costs ~20-60 s on the relay.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deeplearningrecommendationsystem_tpu.runtime.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402

import bench  # noqa: E402
from deeplearningrecommendationsystem_tpu.configs.presets import PRESETS  # noqa: E402
from deeplearningrecommendationsystem_tpu.data import MovieLens100K  # noqa: E402
from deeplearningrecommendationsystem_tpu.experiments import (  # noqa: E402
    DEFAULT_DATA,
    build_model,
)
from deeplearningrecommendationsystem_tpu.train import TrainConfig, Trainer  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HBM_GBPS = 819e9  # v5e
# TRUE chip peaks (v5e: 197 TFLOP/s bf16, f32 at half rate) -- MFU is
# flops / (time * true_peak), so 100% is the physical MXU limit; the
# de-rated "sustained" constants live in runtime/scaling_model.py instead.
PEAK = {"float32": 98.5e12, "bfloat16": 197e12}
KERNEL_PATH = {  # models whose SHIPPED path replaces this XLA step
    "lr": "whole-run fused Pallas kernel (ops/pallas/lr_epoch.py)",
    "afm": "fused Pallas attention fwd+bwd (ops/pallas/afm_attention.py)",
}


def analyze(name: str, data: MovieLens100K) -> dict:
    cfg = PRESETS[name]
    if name in ("din", "dien"):
        cfg = cfg.replace(model_kwargs=dict(cfg.model_kwargs, indirect_hist=True))
    if name == "mf":
        cfg = cfg.replace(model_kwargs=dict(cfg.model_kwargs, onehot_epoch=True))
    model = build_model(cfg, data)
    trainer = Trainer(
        model,
        TrainConfig(
            learning_rate=cfg.learning_rate,
            weight_decay=cfg.weight_decay,
            epochs=1,
            track_metrics=False,
            compute_dtype=bench.COMPUTE_DTYPE.get(name),
            matmul_gather_bwd=True,
            onehot_gather=name in bench.ONEHOT_GATHER,
        ),
    )
    batch, y, w = bench._train_batch(data, name)
    params = model.init(jax.random.PRNGKey(0))
    opt_state = trainer.tx.init(params)

    from deeplearningrecommendationsystem_tpu.parallel.ep import (
        matmul_gather_backward,
        onehot_gather_fwd,
    )

    def step(p, o):
        p2, o2, loss, _ = trainer.train_step(p, o, batch, y, w)
        return p2, o2, loss

    import contextlib

    stack = contextlib.ExitStack()
    if name in bench.ONEHOT_GATHER:
        stack.enter_context(onehot_gather_fwd())
    stack.enter_context(matmul_gather_backward())
    with stack:
        compiled = jax.jit(step).lower(params, opt_state).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return {
        "flops": float(ca.get("flops", 0.0)),
        "hbm_bytes": float(ca.get("bytes accessed", 0.0)),
    }


def render_table(roofline: dict) -> str:
    """Rendered by tools/gen_readme.py::render_roofline so the docs test can
    re-render it without importing jax."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "gen_readme",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "gen_readme.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.render_roofline(roofline)


def main():
    data = MovieLens100K(DEFAULT_DATA, seed=0)
    details = json.load(open(os.path.join(ROOT, "BENCH_DETAILS.json")))
    try:
        roofline = json.load(open(os.path.join(ROOT, "ROOFLINE.json")))
    except FileNotFoundError:
        roofline = {}
    only = sys.argv[1:] or list(bench.ZOO)
    for name in only:
        costs = analyze(name, data)
        d = details[name]
        epoch_s = d["sec_total"] / bench.EPOCHS
        dtype = d.get("compute_dtype", "float32")
        sol_ms = costs["hbm_bytes"] / HBM_GBPS * 1e3
        row = {
            **costs,
            "epoch_ms": epoch_s * 1e3,
            "compute_dtype": dtype,
            "hbm_sol_ms": sol_ms,
            "pct_hbm_sol": sol_ms / (epoch_s * 1e3),
            "mfu": costs["flops"] / (epoch_s * PEAK[dtype]),
            "headroom_ms": epoch_s * 1e3 - sol_ms,
        }
        if name in KERNEL_PATH:
            row["shipped_path"] = KERNEL_PATH[name]
        roofline[name] = row
        print(name, {k: round(v, 4) if isinstance(v, float) else v
                     for k, v in row.items()}, flush=True)
        with open(os.path.join(ROOT, "ROOFLINE.json"), "w") as f:
            json.dump(roofline, f, indent=1, sort_keys=True)

    # merge into BENCH_DETAILS rows (VERDICT asked for fields there too)
    for name, r in roofline.items():
        if name in details:
            details[name].update(
                {k: r[k] for k in ("flops", "hbm_bytes", "pct_hbm_sol", "mfu")}
            )
    with open(os.path.join(ROOT, "BENCH_DETAILS.json"), "w") as f:
        json.dump(details, f, indent=1, sort_keys=True)

    # regenerate the docs table
    path = os.path.join(ROOT, "docs", "performance.md")
    text = open(path).read()
    block = render_table(roofline)
    pat = re.compile(r"(<!-- gen:roofline -->\n).*?(<!-- /gen:roofline -->)", re.S)
    assert pat.search(text), "docs/performance.md lost the roofline markers"
    text = pat.sub(lambda m: m.group(1) + block + "\n" + m.group(2), text)
    open(path, "w").write(text)
    print("roofline table regenerated")


if __name__ == "__main__":
    main()
