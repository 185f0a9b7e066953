"""EP end-to-end: train with row-sharded tables, serve WITHOUT unsharding.

The production regime for vocabs that outgrow one chip's HBM: the sparse
trainer keeps the embedding tables row-sharded over the mesh's 'model' axis
(``unshard=False``), and ``ShardedRecommender`` answers top-K queries with a
per-shard local top-k + a tiny [U, m*k] candidate exchange — the item table
never leaves its shards, and the lists are identical to the dense path
(tests/test_sharded_serving.py proves list-equality).

Runs anywhere: with no TPU pod it forces an 8-device virtual CPU mesh.

    python examples/sharded_serving.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if not os.environ.get("SHARDED_EXAMPLE_REAL_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if not os.environ.get("SHARDED_EXAMPLE_REAL_TPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from deeplearningrecommendationsystem_tpu.data import MovieLens100K
from deeplearningrecommendationsystem_tpu.experiments import DEFAULT_DATA
from deeplearningrecommendationsystem_tpu.models import (
    MatrixFactorization,
    ServingContext,
)
from deeplearningrecommendationsystem_tpu.parallel import make_mesh
from deeplearningrecommendationsystem_tpu.serving import ShardedRecommender
from deeplearningrecommendationsystem_tpu.train import (
    TrainConfig,
    Trainer,
    fit_minibatch_sparse,
)


def main() -> None:
    n = len(jax.devices())
    model_axis = 4 if n % 4 == 0 else (2 if n % 2 == 0 else 1)
    mesh = make_mesh(data=n // model_axis, model=model_axis)
    print(f"mesh: {dict(mesh.shape)} over {jax.default_backend()} devices")

    data = MovieLens100K(DEFAULT_DATA, seed=0)
    train = data.train
    pair = (jnp.asarray(train["user"]), jnp.asarray(train["item"]))
    y = jnp.asarray(train["rating"])

    model = MatrixFactorization(data.num_users, data.num_items, embedding_dim=32)
    trainer = Trainer(
        model, TrainConfig(learning_rate=0.01, epochs=3, track_metrics=False)
    )
    # row-sparse updates + EP row-sharded tables, and KEEP them sharded
    res = fit_minibatch_sparse(
        trainer, jax.random.PRNGKey(0), (pair, y), batch_size=8192,
        mesh=mesh, optimizer="rowwise_adagrad", unshard=False,
    )
    print(
        "final loss:", float(res.history["train_loss"][-1]),
        "| item table:", res.params["item"].shape, res.params["item"].sharding,
    )

    ctx = ServingContext(
        user_features=jnp.asarray(data.user_features),
        item_features=jnp.asarray(data.item_features),
    )
    rec = ShardedRecommender(
        model, res.params, ctx, mesh, seen=data.seen_mask(train)
    )
    top10 = rec.top_k(10, users=[0, 1, 2])
    print("top-10 for users 0-2 (item table never unsharded):")
    print(np.asarray(top10))


if __name__ == "__main__":
    main()
