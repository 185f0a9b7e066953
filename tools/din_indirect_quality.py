"""Quality gate for the indirect-hist training path (DIN: VERDICT r3 #3;
DIEN: VERDICT r4 #2). Usage: python tools/din_indirect_quality.py [din|dien]

``indirect_hist`` computes mathematically identical forwards (the history
embedding values are bit-equal; only the table-gradient summation GROUPING
differs, and bf16 rounds differently under the regrouping), so quality must
be revalidated end-to-end: train DIN at the reference hyperparameters with
the standard path and the indirect path (both bf16 + matmul-bwd, the bench
configuration), then compare per-epoch loss trajectories, final auc_raw per
split, and ranking@50 under the UNCHANGED serving path.

Writes {DIN,DIEN}_INDIRECT_QUALITY.json. Run solo (quality, not timing --
host contention is fine).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deeplearningrecommendationsystem_tpu.runtime.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from deeplearningrecommendationsystem_tpu.configs.presets import PRESETS  # noqa: E402
from deeplearningrecommendationsystem_tpu.data import MovieLens100K  # noqa: E402
from deeplearningrecommendationsystem_tpu.eval.pointwise import true_auc  # noqa: E402
from deeplearningrecommendationsystem_tpu.eval.ranking import ranking_metrics  # noqa: E402
from deeplearningrecommendationsystem_tpu.eval.recommend import (  # noqa: E402
    score_ranking,
    seen_to_tail,
)
from deeplearningrecommendationsystem_tpu.experiments import (  # noqa: E402
    DEFAULT_DATA,
    build_model,
)
from deeplearningrecommendationsystem_tpu.models.base import ServingContext  # noqa: E402
from deeplearningrecommendationsystem_tpu.sampling import NegativeSampler  # noqa: E402
from deeplearningrecommendationsystem_tpu.train import TrainConfig, Trainer  # noqa: E402


def main():
    which = (sys.argv[1] if len(sys.argv) > 1 else "din").lower()
    assert which in ("din", "dien"), which
    data = MovieLens100K(DEFAULT_DATA, seed=0)
    cfg = PRESETS[which]
    sampler = NegativeSampler(
        data.seen_mask(data.train, data.valid, data.test), seed=0
    )
    splits = {}
    for name, split, n_neg in (
        ("train", data.train, cfg.negatives[0]),
        ("valid", data.valid, cfg.negatives[1]),
        ("test", data.test, cfg.negatives[2]),
    ):
        neg = sampler.sample(n_neg)
        combined = MovieLens100K.concat_splits(split, neg)
        hist_u = data.history_matrix(split, cfg.hist_len)
        splits[name] = {
            "hist_u": jnp.asarray(hist_u),
            "user": jnp.asarray(combined["user"]),
            "item": jnp.asarray(combined["item"]),
            "y": jnp.asarray(combined["rating"]),
        }

    def train(indirect: bool):
        kw = dict(cfg.model_kwargs, indirect_hist=True) if indirect else cfg.model_kwargs
        model = build_model(cfg.replace(model_kwargs=kw), data)
        trainer = Trainer(
            model,
            TrainConfig(
                learning_rate=cfg.learning_rate,
                weight_decay=cfg.weight_decay,
                epochs=cfg.epochs,
                track_metrics=False,
                compute_dtype="bfloat16",
                matmul_gather_bwd=True,
            ),
        )
        s = splits["train"]
        if indirect:
            batch = (s["hist_u"], s["user"], s["item"])
        else:
            batch = (s["hist_u"][s["user"]], s["item"])
        res = trainer.fit(jax.random.PRNGKey(cfg.seed), (batch, s["y"]))
        return model, res

    model_std, res_std = train(False)
    model_ind, res_ind = train(True)

    out = {"epochs": cfg.epochs}
    l_std = np.asarray(res_std.history["train_loss"], np.float64)
    l_ind = np.asarray(res_ind.history["train_loss"], np.float64)
    out["loss_trajectory_max_abs_delta"] = float(np.max(np.abs(l_std - l_ind)))
    out["final_loss"] = {"standard": float(l_std[-1]), "indirect": float(l_ind[-1])}

    # eval with the UNCHANGED standard apply/serving on each run's params
    for tag, res in (("standard", res_std), ("indirect", res_ind)):
        aucs = {}
        for name in ("train", "valid", "test"):
            s = splits[name]
            logits = model_std.apply(
                res.params, (s["hist_u"][s["user"]], s["item"])
            )
            aucs[name] = float(true_auc(s["y"], jax.nn.sigmoid(logits)))
        out[f"auc_raw_{tag}"] = aucs
        ctx = ServingContext(
            user_features=jnp.asarray(data.user_features),
            item_features=jnp.asarray(data.item_features),
            history=jnp.asarray(data.history_matrix(data.data, cfg.hist_len)),
        )
        scores = model_std.score_catalog(res.params, ctx)
        rec_all = score_ranking(scores)
        seen = data.seen_mask(data.train, data.valid)
        rec = seen_to_tail(rec_all, jnp.asarray(seen))
        reals = data.itemid_matrix(data.test)
        n_seen = np.asarray(
            (data.itemid_matrix(data.train) >= 0).sum(1)
            + (data.itemid_matrix(data.valid) >= 0).sum(1)
        )
        m = ranking_metrics(jnp.asarray(reals), rec, 50, n_seen=jnp.asarray(n_seen))
        out[f"test_ranking_{tag}"] = {k: float(v) for k, v in m.items()}

    with open(f"{which.upper()}_INDIRECT_QUALITY.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
