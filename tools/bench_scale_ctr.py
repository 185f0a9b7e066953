"""Production-vocab minibatch CTR training: dense vs sparse embedding updates.

ml-100k's tables (943/1682 rows) hide the cost structure that dominates real
CTR workloads, where tables have 10^6-10^9 rows. This benchmark trains a
synthetic large-vocab MF/two-tower CTR step on one chip and compares:

  * dense   — ``jax.grad`` w.r.t. the full tables + dense Adam (the naive
              scale-up of the reference's ``torch.optim.Adam`` regime,
              scripts/mf.py:66): every step reads/writes params + grads +
              both moment buffers for the ENTIRE vocab.
  * lazy-adam / rowwise-adagrad — ``train/sparse.py``: grad w.r.t. the
              gathered rows only, sort-based dedup, optimizer touches only
              the batch's rows. Step cost scales with batch, not vocab.

Run on the real chip (first compile of each program takes ~20-60 s on the
relay; warm runs are fast):

    python tools/bench_scale_ctr.py --users 4194304 --items 1048576 \
        --dim 64 --batch 65536 --steps 50

Writes SCALE_CTR_BENCH.json. Ids are drawn uniformly (worst case for dedup;
production id streams are power-law, which only helps the sparse path).
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
import optax  # noqa: E402

from deeplearningrecommendationsystem_tpu.train.optim import torch_adam  # noqa: E402
from deeplearningrecommendationsystem_tpu.train.sparse import (  # noqa: E402
    LazyAdamState,
    RowwiseAdagradState,
    sparse_table_update,
)


def _loss(u_rows, i_rows, y):
    logits = jnp.sum(u_rows * i_rows, axis=-1)
    return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, y))


def make_dense_step(tx):
    def step(params, opt_state, u, i, y):
        def loss_fn(p):
            return _loss(p["user"][u], p["item"][i], y)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_sparse_step(lr):
    def step(params, states, u, i, y):
        loss, (gu, gi) = jax.value_and_grad(_loss, argnums=(0, 1))(
            params["user"][u], params["item"][i], y
        )
        user, su = sparse_table_update(params["user"], states["user"], u, gu, lr)
        item, si = sparse_table_update(params["item"], states["item"], i, gi, lr)
        return {"user": user, "item": item}, {"user": su, "item": si}, loss

    return step


def run(step, params, state, batches, steps):
    """Time ``steps`` chained optimizer steps inside ONE compiled program.

    Two prior versions of this harness under-measured on the remote-relay
    backend: (a) per-dispatch timing with one final ``block_until_ready(loss)``
    measured dispatch, and (b) even a single scan program with losses fetched
    returned before the DONATED table buffers' writes landed (dense Adam
    "ran" at 170x physical HBM bandwidth both times). The fix: fetch a
    full-table CHECKSUM, making the returned scalar a data dependency of
    every updated byte. Donation still aliases the multi-GB tables in place.
    """
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    nbatch = len(batches)

    def bench(params, state, stacked):
        def body(carry, k):
            params, state, acc = carry
            u, i, y = jax.tree.map(lambda x: x[k % nbatch], stacked)
            params, state, loss = step(params, state, u, i, y)
            return (params, state, acc + loss), loss

        (params, state, _), losses = jax.lax.scan(
            body, (params, state, jnp.zeros(())), jnp.arange(steps)
        )
        checksum = sum(jnp.sum(leaf) for leaf in jax.tree.leaves((params, state)))
        return params, state, losses, checksum

    fn = jax.jit(bench, donate_argnums=(0, 1))
    t0 = time.perf_counter()
    params, state, losses, checksum = fn(params, state, stacked)
    float(checksum)  # host fetch blocks until every table write landed
    compile_s = time.perf_counter() - t0
    # timed run (buffers were donated; reuse the returned ones)
    t0 = time.perf_counter()
    params, state, losses, checksum = fn(params, state, stacked)
    float(checksum)
    dt = (time.perf_counter() - t0) / steps
    loss = float(losses[-1])
    del params, state
    return dt, compile_s, loss


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=4 << 20)
    ap.add_argument("--items", type=int, default=1 << 20)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--skip-dense", action="store_true")
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    ku, ki, kb = jax.random.split(key, 3)
    scale = 1.0 / jnp.sqrt(args.dim)

    def init_params():
        return {
            "user": jax.random.normal(ku, (args.users, args.dim), jnp.float32) * scale,
            "item": jax.random.normal(ki, (args.items, args.dim), jnp.float32) * scale,
        }

    nbatch = 4
    batches = []
    for s in range(nbatch):
        k1, k2, k3, kb = jax.random.split(jax.random.fold_in(kb, s), 4)
        batches.append(
            (
                jax.random.randint(k1, (args.batch,), 0, args.users),
                jax.random.randint(k2, (args.batch,), 0, args.items),
                (jax.random.uniform(k3, (args.batch,)) < 0.5).astype(jnp.float32),
            )
        )
    jax.block_until_ready(batches)

    vocab_rows = args.users + args.items
    table_gb = vocab_rows * args.dim * 4 / 1e9
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_CTR_BENCH.json",
    )
    try:
        with open(out_path) as f:
            all_results = json.load(f)
        if "config" in all_results:  # migrate single-config format
            all_results = {}
    except FileNotFoundError:
        all_results = {}
    results = {
        "config": vars(args) | {"backend": jax.default_backend()},
        "table_gb_f32": round(table_gb, 3),
    }

    # Dense-Adam bytes per step: params+grads+m+v each read, params+m+v
    # written => ~7 full-table passes (+ batch-side work, negligible).
    modes = []
    if not args.skip_dense:
        modes.append(("dense_adam", "dense"))
    modes += [("lazy_adam", "lazy"), ("rowwise_adagrad", "adagrad")]

    for name, kind in modes:
        params = init_params()
        if kind == "dense":
            tx = torch_adam(0.01)
            state = tx.init(params)
            step = make_dense_step(tx)
        elif kind == "lazy":
            state = {
                "user": LazyAdamState.init(args.users, args.dim),
                "item": LazyAdamState.init(args.items, args.dim),
            }
            step = make_sparse_step(0.01)
        else:
            state = {
                "user": RowwiseAdagradState.init(args.users),
                "item": RowwiseAdagradState.init(args.items),
            }
            step = make_sparse_step(0.01)
        try:
            jax.block_until_ready((params, state))
            dt, compile_s, loss = run(step, params, state, batches, args.steps)
        except Exception as e:  # noqa: BLE001 -- the capacity demo's point:
            # dense Adam's 2-extra-table moment state cannot physically fit
            # HBM at vocabs the row-state optimizers handle with MBs
            del params, state
            results[name] = {
                "fits": False,
                "error": f"{type(e).__name__}: {e}"[:300],
            }
            print(name, "OOM/failed:", results[name]["error"][:120], flush=True)
            continue
        results[name] = {
            "fits": True,
            "step_ms": round(dt * 1e3, 3),
            "examples_per_sec": round(args.batch / dt, 1),
            "compile_s": round(compile_s, 1),
            "final_loss": round(loss, 4),
        }
        if kind == "dense":
            results[name]["full_table_passes_hbm_gbps"] = round(
                7 * table_gb / dt, 1
            )
        print(name, results[name], flush=True)

    if results.get("dense_adam", {}).get("fits") and "lazy_adam" in results:
        results["speedup_vs_dense"] = {
            "lazy_adam": round(
                results["dense_adam"]["step_ms"] / results["lazy_adam"]["step_ms"], 2
            ),
            "rowwise_adagrad": round(
                results["dense_adam"]["step_ms"]
                / results["rowwise_adagrad"]["step_ms"], 2
            ),
        }
    key = f"users{args.users}_items{args.items}_dim{args.dim}_batch{args.batch}"
    all_results[key] = results
    with open(out_path, "w") as f:
        json.dump(all_results, f, indent=2)
    print(json.dumps({key: results}))


if __name__ == "__main__":
    main()
