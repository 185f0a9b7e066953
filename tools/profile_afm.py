"""AFM training-step anatomy: ablate components to locate the epoch cost.

The fused attention kernel measures 10.4 ms fwd+bwd in isolation
(KERNEL_BENCH.json afm_attention_train) yet the full AFM epoch is ~60 ms --
this times full-batch epochs for ablated variants to find the rest.
Writes AFM_PROFILE.json.

    python tools/profile_afm.py
"""

from __future__ import annotations

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

from deeplearningrecommendationsystem_tpu.models import AFM  # noqa: E402
from deeplearningrecommendationsystem_tpu.models.common import linear_part  # noqa: E402
from deeplearningrecommendationsystem_tpu.ops.embedding import embed_fields  # noqa: E402
from deeplearningrecommendationsystem_tpu.ops.linear import linear  # noqa: E402
from deeplearningrecommendationsystem_tpu.ops.pallas.afm_attention import (  # noqa: E402
    afm_attention_pool_fused,
)
from deeplearningrecommendationsystem_tpu.train import TrainConfig, Trainer  # noqa: E402

B = 87909
EPOCHS = 50


def batch():
    rng = np.random.default_rng(0)
    x = np.zeros((B, 45), np.float32)
    x[:, 0] = rng.integers(0, 943, B)
    x[:, 1] = rng.integers(0, 1682, B)
    x[:, 2] = rng.random(B)
    x[np.arange(B), 3 + rng.integers(0, 2, B)] = 1
    x[np.arange(B), 5 + rng.integers(0, 21, B)] = 1
    x[np.arange(B), 26 + rng.integers(0, 19, B)] = 1
    y = (rng.random(B) < 0.5).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


class _Ablated(AFM):
    """AFM variants with pieces disabled (set class attrs)."""

    skip_wide = False
    skip_cross = False
    skip_embed = False

    def _apply(self, params, x, use_pallas):  # noqa: ARG002
        if self.skip_embed:
            fields = jnp.broadcast_to(
                x[:, :1, None], (x.shape[0], 6, self.embedding_dim)
            )
        else:
            e = embed_fields(params["tables"], x, self.spec)
            age = x[:, self.spec.age_col : self.spec.age_col + 1]
            age_b = jnp.broadcast_to(age, (x.shape[0], self.embedding_dim))
            fields = jnp.stack(
                [e["user"], e["item"], age_b, e["gender"], e["occupation"], e["genre"]],
                axis=1,
            )
        if self.skip_cross:
            pooled = jnp.mean(fields, axis=1)
        else:
            pooled = afm_attention_pool_fused(
                fields, params["att_w"], params["att_b"], params["att_h"]
            )
        out = linear(params["att_out"], pooled)
        if not self.skip_wide:
            out = out + linear_part(params["wide"], x, self.spec)
        return out[:, 0]


def timed(model, x, y, matmul_bwd=True):
    tr = Trainer(
        model,
        TrainConfig(epochs=EPOCHS, track_metrics=False, matmul_gather_bwd=matmul_bwd),
    )
    res = tr.fit(jax.random.PRNGKey(0), (x, y))
    jax.block_until_ready(res.params)
    # best of 2: the first post-warm run per program can hit a retrace +
    # relay-compile stall (CLAUDE.md) and read 100x high
    dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        res = tr.fit(jax.random.PRNGKey(0), (x, y))
        cks = float(
            sum(jnp.sum(jnp.abs(p.astype(jnp.float32))) for p in jax.tree.leaves(res.params))
        )
        assert np.isfinite(cks)
        dt = min(dt, time.perf_counter() - t0)
    return dt / EPOCHS * 1e3  # ms/epoch


def main():
    x, y = batch()
    out = {}

    def record(name, **attrs):
        m = _Ablated(fused_attention=True)
        for k, v in attrs.items():
            setattr(m, k, v)
        out[name] = round(timed(m, x, y), 3)
        print(name, out[name], "ms/epoch", flush=True)

    record("full")
    record("no_wide", skip_wide=True)
    record("no_cross", skip_cross=True)
    record("no_embed", skip_embed=True)
    record("cross_only", skip_wide=True, skip_embed=True)
    m = AFM(fused_attention=False)
    out["full_xla_attention"] = round(timed(m, x, y), 3)
    print("full_xla_attention", out["full_xla_attention"], flush=True)
    m = AFM(fused_attention=True)
    out["full_scatter_bwd"] = round(timed(m, x, y, matmul_bwd=False), 3)
    print("full_scatter_bwd", out["full_scatter_bwd"], flush=True)

    with open("AFM_PROFILE.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote AFM_PROFILE.json")


if __name__ == "__main__":
    main()
