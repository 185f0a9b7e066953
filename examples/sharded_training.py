"""Data-parallel + embedding-sharded training on a device mesh.

Runs anywhere: with no TPU pod it forces an 8-device virtual CPU mesh, which
exercises the exact same GSPMD program (batch sharded over the 'data' axis,
user/item embedding tables row-sharded over the 'model' axis, gradient
allreduce + all-gather inserted by XLA). On a real slice, drop the env
forcing and the same code scales over ICI.

    python examples/sharded_training.py
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
from jax.sharding import NamedSharding, PartitionSpec as P

from deeplearningrecommendationsystem_tpu.data import MovieLens100K
from deeplearningrecommendationsystem_tpu.experiments import DEFAULT_DATA
from deeplearningrecommendationsystem_tpu.features import ML100K_SPEC
from deeplearningrecommendationsystem_tpu.models import DeepFM
from deeplearningrecommendationsystem_tpu.parallel import (
    make_mesh,
    pad_and_shard,
    shard_table,
)
from deeplearningrecommendationsystem_tpu.parallel.mesh import MODEL_AXIS
from deeplearningrecommendationsystem_tpu.sampling import NegativeSampler
from deeplearningrecommendationsystem_tpu.train import TrainConfig, Trainer


def main() -> None:
    n = len(jax.devices())
    model_axis = 2 if n % 2 == 0 and n >= 2 else 1
    mesh = make_mesh(data=n // model_axis, model=model_axis)
    print(f"mesh: {dict(mesh.shape)} over {jax.default_backend()} devices")

    data = MovieLens100K(DEFAULT_DATA, seed=0)
    sampler = NegativeSampler(data.seen_mask(data.train, data.valid, data.test), seed=0)
    combined = MovieLens100K.concat_splits(data.train, sampler.sample(10))
    x = jnp.asarray(data.feature_matrix(combined))
    y = jnp.asarray(combined["rating"])

    model = DeepFM(ML100K_SPEC, hidden_units=(128, 64, 1), embedding_dim=32)
    trainer = Trainer(model, TrainConfig(learning_rate=1e-3, weight_decay=1e-5))
    params = model.init(jax.random.PRNGKey(0))

    # EP: row-shard the big id tables over the model axis (shard_table
    # zero-pads 943/1682 rows up to the axis size); replicate the rest
    repl = NamedSharding(mesh, P())
    sharded_names = set()
    for name in ("user", "item"):
        params["tables"][name] = shard_table(params["tables"][name], mesh)
        sharded_names.add(name)
    params = {
        k: (
            {n: (t if n in sharded_names else jax.device_put(t, repl))
             for n, t in v.items()}
            if k == "tables"
            else jax.tree.map(lambda a: jax.device_put(a, repl), v)
        )
        for k, v in params.items()
    }

    # DP: shard the batch over the data axis (zero-weight padding keeps the
    # loss bit-identical to the unsharded run)
    batch, labels, weights = pad_and_shard(x, y, mesh)
    opt_state = trainer.tx.init(params)

    @jax.jit
    def step(params, opt_state, batch, labels, weights):
        return trainer.train_step(params, opt_state, batch, labels, weights)

    for i in range(5):
        params, opt_state, loss, _ = step(params, opt_state, batch, labels, weights)
        print(f"step {i}: loss={float(loss):.4f}")

    print("user table sharding:", params["tables"]["user"].sharding)


if __name__ == "__main__":
    main()
