"""Host-streamed vs on-device-scan minibatch training at production scale.

`SCALE_CTR_BENCH.json` measures chained steps inside ONE compiled scan with
all batches device-resident — the fastest shape, but it assumes the epoch's
data fits in HBM. The streaming path (`data/stream.py` ->
`fit_stream_sparse`) keeps the dataset in HOST memory and feeds a jitted
step per batch with prefetch. This benchmark quantifies what that costs at
the same 5.2M-row / batch-65536 / rowwise-AdaGrad config: per-step H2D
traffic is trivial (~0.8 MB), so the gap is per-step dispatch, which jax's
async dispatch pipelines against compute.

Timing: checksum fetched once at the END (data-depends on all final table
bytes, CLAUDE.md r2 rule); per-step losses stay on device.

    python tools/bench_stream.py [--steps 50]

Writes STREAM_BENCH.json. Run solo on an idle host.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deeplearningrecommendationsystem_tpu.runtime.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from deeplearningrecommendationsystem_tpu.data.stream import prefetch_to_device  # noqa: E402
from deeplearningrecommendationsystem_tpu.train.sparse import (  # noqa: E402
    RowwiseAdagradState,
    sparse_table_update,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=4 << 20)
    ap.add_argument("--items", type=int, default=1 << 20)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--lr", type=float, default=0.05)
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    ku, ki = jax.random.split(key)
    scale = 1.0 / jnp.sqrt(args.dim)
    params = {
        "user": jax.random.normal(ku, (args.users, args.dim), jnp.float32) * scale,
        "item": jax.random.normal(ki, (args.items, args.dim), jnp.float32) * scale,
    }
    states = {
        "user": RowwiseAdagradState.init(args.users),
        "item": RowwiseAdagradState.init(args.items),
    }

    # host-resident dataset: steps x batch uniform ids (worst case for dedup)
    rng = np.random.default_rng(0)
    host = [
        (
            rng.integers(0, args.users, args.batch).astype(np.int32),
            rng.integers(0, args.items, args.batch).astype(np.int32),
            (rng.random(args.batch) < 0.5).astype(np.float32),
        )
        for _ in range(args.steps)
    ]

    @jax.jit
    def step(params, states, u, i, y):
        def loss_fn(u_rows, i_rows):
            logits = jnp.sum(u_rows * i_rows, axis=-1)
            return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, y))

        loss, (gu, gi) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            params["user"][u], params["item"][i]
        )
        user, su = sparse_table_update(params["user"], states["user"], u, gu, args.lr)
        item, si = sparse_table_update(params["item"], states["item"], i, gi, args.lr)
        return {"user": user, "item": item}, {"user": su, "item": si}, loss

    @jax.jit
    def checksum(params, states):
        return sum(jnp.sum(x) for x in jax.tree.leaves((params, states)))

    def run():
        nonlocal params, states
        losses = []
        for u, i, y in prefetch_to_device(iter(host), size=2):
            params, states, loss = step(params, states, u, i, y)
            losses.append(loss)
        return float(checksum(params, states)), losses

    t0 = time.perf_counter()
    run()  # compile + warm
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    _, losses = run()
    dt = (time.perf_counter() - t0) / args.steps

    scan_ms = None
    try:
        with open("SCALE_CTR_BENCH.json") as f:
            sc = json.load(f)
        for k, v in sc.items():
            if isinstance(v, dict) and v.get("config", {}).get("users") == args.users:
                scan_ms = v.get("rowwise_adagrad", {}).get("step_ms")
    except FileNotFoundError:
        pass

    out = {
        "config": {
            "users": args.users, "items": args.items, "dim": args.dim,
            "batch": args.batch, "steps": args.steps,
            "optimizer": "rowwise_adagrad",
        },
        "streamed_step_ms": dt * 1e3,
        "compile_plus_first_epoch_s": compile_s,
        "h2d_bytes_per_step": args.batch * 12,
        "on_device_scan_step_ms_same_config": scan_ms,
        "final_loss": float(losses[-1]),
        "note": (
            "streamed = host numpy -> prefetch_to_device(2) -> one jitted "
            "step per batch; scan = SCALE_CTR_BENCH's fully device-resident "
            "chained program. The delta is per-step dispatch on this "
            "host-mediated relay, hidden partly by async dispatch."
        ),
    }
    with open("STREAM_BENCH.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
