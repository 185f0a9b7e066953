"""FFM: field-aware factorization machine over 6 fields x 2 domains.

Capability parity with reference model/ffm.py:7-98: each of the six fields
(age, gender, occupation, genre, user-id, item-id) owns TWO latent tables --
a "user-domain" and an "item-domain" vector -- and the 15 field-pair dot
products combine specific domain sides. The reference's exact (and sometimes
unconventional) domain pairings (model/ffm.py:62-80) are kept verbatim, as is
its quirk of ADDING the scalar cross sum to every raw dense feature before
the LR linear layer (model/ffm.py:84-86).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from deeplearningrecommendationsystem_tpu.features import FeatureSpec, ML100K_SPEC
from deeplearningrecommendationsystem_tpu.models.base import (
    ServingContext,
    catalog_scores_from_features,
)
from deeplearningrecommendationsystem_tpu.models.common import linear_part_init
from deeplearningrecommendationsystem_tpu.ops.linear import embedding_init, linear
from deeplearningrecommendationsystem_tpu.parallel.ep import gather_rows

# (left_field, left_domain, right_field, right_domain) for the 15 pair dots,
# in the reference's order (model/ffm.py:62-80).
PAIRS = (
    ("age", "user", "gender", "user"),
    ("age", "user", "occupation", "user"),
    ("age", "item", "genre", "user"),
    ("age", "user", "user_id", "user"),
    ("age", "item", "item_id", "user"),
    ("gender", "user", "occupation", "user"),
    ("gender", "item", "genre", "user"),
    ("gender", "user", "user_id", "user"),
    ("gender", "item", "item_id", "user"),
    ("occupation", "item", "genre", "user"),
    ("occupation", "user", "user_id", "user"),
    ("occupation", "item", "item_id", "user"),
    ("genre", "user", "user_id", "item"),
    ("genre", "item", "item_id", "item"),
    ("user_id", "item", "item_id", "user"),
)


@dataclasses.dataclass
class FFM:
    spec: FeatureSpec = ML100K_SPEC
    num_vector: int = 32  # latent dimension of the field-aware vectors

    def init(self, key: jax.Array) -> dict:
        sizes = {
            "age": 1,
            "gender": self.spec.num_genders,
            "occupation": self.spec.num_occupations,
            "genre": self.spec.num_genres,
            "user_id": self.spec.num_users,
            "item_id": self.spec.num_items,
        }
        ks = jax.random.split(key, 2 * len(sizes) + 1)
        tables = {}
        i = 0
        for field, n in sizes.items():
            for domain in ("user", "item"):
                tables[f"{field}.{domain}"] = embedding_init(ks[i], n, self.num_vector)
                i += 1
        return {"tables": tables, "lr": linear_part_init(ks[-1], self.spec)}

    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        spec = self.spec
        user, item, age, gender, occupation, genre = spec.split(x)
        t = params["tables"]

        emb = {}
        for domain in ("user", "item"):
            emb[("age", domain)] = age @ t[f"age.{domain}"]
            emb[("gender", domain)] = gender @ t[f"gender.{domain}"]
            emb[("occupation", domain)] = occupation @ t[f"occupation.{domain}"]
            emb[("genre", domain)] = genre @ t[f"genre.{domain}"]
            emb[("user_id", domain)] = gather_rows(t[f"user_id.{domain}"], user)
            emb[("item_id", domain)] = gather_rows(t[f"item_id.{domain}"], item)

        cross = jnp.zeros((x.shape[0],), dtype=x.dtype)
        for lf, ld, rf, rd in PAIRS:
            cross = cross + jnp.sum(emb[(lf, ld)] * emb[(rf, rd)], axis=-1)

        lr = params["lr"]
        dense_plus_cross = spec.dense(x) + cross[:, None]  # reference quirk
        logits = (
            gather_rows(lr["user_bias"], user)
            + gather_rows(lr["item_bias"], item)
            + linear(lr["wide"], dense_plus_cross)
        )
        return logits[:, 0]

    # serving catalog scorer runs with one-hot-matmul gathers (measured
    # winner, 2.83x -- serving.onehot_serving_scope / ONEHOT_SERVING_PROBE)
    onehot_serving = True

    def score_catalog(self, params: dict, ctx: ServingContext) -> jnp.ndarray:
        return catalog_scores_from_features(self.apply, params, ctx)
