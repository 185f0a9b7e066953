"""Pure-functional dense primitives with torch-compatible initialization.

Models in this framework are plain pytrees of arrays + jit-compiled apply
functions -- no module system, no tracing magic, trivially shardable with
``NamedSharding``. Initialization matches the reference so optimization
dynamics are comparable:

* embeddings: Xavier/Glorot normal (reference uses ``xavier_normal_`` on every
  table, e.g. model/mf.py:20-21),
* linear layers: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and bias
  (torch's ``nn.Linear`` default: kaiming_uniform(a=sqrt(5)) reduces to the
  same bound).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp


def embedding_init(key: jax.Array, num: int, dim: int, dtype=jnp.float32) -> jax.Array:
    """Xavier-normal [num, dim] embedding table."""
    std = (2.0 / (num + dim)) ** 0.5
    return std * jax.random.normal(key, (num, dim), dtype=dtype)


def linear_init(key: jax.Array, d_in: int, d_out: int, bias: bool = True, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    bound = 1.0 / (d_in**0.5)
    p = {"w": jax.random.uniform(kw, (d_in, d_out), dtype, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (d_out,), dtype, -bound, bound)
    return p


def linear(p, x: jax.Array) -> jax.Array:
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def mlp_init(key: jax.Array, dims: Sequence[int], dtype=jnp.float32) -> List[dict]:
    """A stack of linear layers with dims [d0, d1, ..., dn]."""
    keys = jax.random.split(key, len(dims) - 1)
    return [
        linear_init(k, d_in, d_out, dtype=dtype)
        for k, d_in, d_out in zip(keys, dims[:-1], dims[1:])
    ]


def relu_stack(layers: List[dict], x: jax.Array) -> jax.Array:
    """Linear -> ReLU applied for EVERY layer (including the last).

    This is the reference's tower pattern (e.g. model/widedeep.py:51-57,
    model/deepcross.py:21-31): the final layer's output is also ReLU'd.
    """
    for p in layers:
        x = jax.nn.relu(linear(p, x))
    return x


def mlp(layers: List[dict], x: jax.Array, final_activation: bool = False) -> jax.Array:
    """Linear -> ReLU between layers; last layer linear unless requested."""
    for p in layers[:-1]:
        x = jax.nn.relu(linear(p, x))
    x = linear(layers[-1], x)
    if final_activation:
        x = jax.nn.relu(x)
    return x
