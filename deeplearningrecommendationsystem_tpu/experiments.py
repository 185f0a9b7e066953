"""End-to-end experiment runner: one function per reference entry script.

Reproduces the per-model pipelines of the reference's ``scripts/`` directory
(SURVEY.md §3): load ml-100k -> sample per-split negatives -> build full-batch
tensors -> train N epochs with per-epoch train/valid/test metrics -> score the
full catalog -> ranking@k on valid and test with seen-item exclusion.

Family mapping (SURVEY.md §2.4):
* 'feature' -- 45-col models (lr, ffm, widedeep, deepfm, nfm, afm, pnn,
  deepcross(DCN), deepcrossing), pattern of scripts/lr.py
* 'pair'    -- (user, item) id models (mf, neuralcf), pattern of scripts/mf.py
* 'seq'     -- behavior-sequence models (din, dien), pattern of scripts/din.py
* 'matrix'  -- masked autoencoders (autorec, i-autorec),
  pattern of scripts/autorec.py

DIN/DIEN serving uses the reference's FULL variable-length history semantics
(model/din.py:55-66) by default via the bucketed static-shape scorer
(models/base.py::catalog_scores_full_history, oracle-tested); set
``full_history_serving=False`` for the fixed training-window variant.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deeplearningrecommendationsystem_tpu.configs.presets import PRESETS, ExperimentConfig
from deeplearningrecommendationsystem_tpu.data.movielens import MovieLens100K, Split
from deeplearningrecommendationsystem_tpu.eval.ranking import ranking_metrics
from deeplearningrecommendationsystem_tpu.eval.recommend import (
    full_ranking,
    score_ranking,
    seen_to_tail,
)
from deeplearningrecommendationsystem_tpu.models import (
    AFM,
    AutoRec,
    DCN,
    DeepCrossing,
    DeepFM,
    DIEN,
    DIN,
    FFM,
    LogisticRegression,
    MatrixFactorization,
    NeuralCF,
    NFM,
    PNN,
    ServingContext,
    WideDeep,
)
from deeplearningrecommendationsystem_tpu.sampling import NegativeSampler
from deeplearningrecommendationsystem_tpu.train import TrainConfig, Trainer

DEFAULT_DATA = "/root/reference/dataset_example/ml-100k"


def build_model(cfg: ExperimentConfig, data: MovieLens100K):
    kw = cfg.model_kwargs
    U, I = data.num_users, data.num_items
    registry = {
        "lr": lambda: LogisticRegression(data.spec, **kw),
        "mf": lambda: MatrixFactorization(U, I, **kw),
        "neuralcf": lambda: NeuralCF(U, I, **kw),
        "ffm": lambda: FFM(data.spec, **kw),
        "widedeep": lambda: WideDeep(data.spec, **kw),
        "deepfm": lambda: DeepFM(data.spec, **kw),
        "nfm": lambda: NFM(data.spec, **kw),
        "afm": lambda: AFM(data.spec, **kw),
        "pnn": lambda: PNN(data.spec, **kw),
        "deepcross": lambda: DCN(data.spec, **kw),
        "deepcrossing": lambda: DeepCrossing(data.spec, **kw),
        "autorec": lambda: AutoRec(num_input=I, **kw),
        "i-autorec": lambda: AutoRec(num_input=U, **kw),
        "din": lambda: DIN(I, **kw),
        "dien": lambda: DIEN(I, **kw),
    }
    return registry[cfg.model]()


@dataclasses.dataclass
class ExperimentResult:
    model: str
    params: Any
    history: Dict[str, np.ndarray]
    ranking: Dict[str, Dict[str, float]]
    train_examples: int
    epochs: int
    train_time_s: float
    extras: Dict[str, float] = dataclasses.field(default_factory=dict)
    ctx: Any = None  # ServingContext used for the ranking eval (serving reuse)

    @property
    def examples_per_sec(self) -> float:
        return self.train_examples * self.epochs / max(self.train_time_s, 1e-9)

    def final_metrics(self) -> Dict[str, float]:
        out = {
            k: float(v[-1]) for k, v in self.history.items() if not k.startswith("_")
        }
        out.update(self.extras)
        return out


def _combined(split: Split, negatives: Split) -> Split:
    return MovieLens100K.concat_splits(split, negatives)


def _seq_batch(data: MovieLens100K, split: Split, combined: Split, hist_len: int):
    """history rows for a combined split, taken from THAT split's positives
    (reference scripts/din.py:55-63 builds train/valid/test histories from
    their own splits)."""
    hist_matrix = data.history_matrix(split, hist_len)  # [U, L]
    hist = hist_matrix[combined["user"]]
    return (jnp.asarray(hist), jnp.asarray(combined["item"])), jnp.asarray(
        combined["rating"]
    )


def _split_rows_60_20_20(n: int, seed: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Row-index split mirroring the reference's two-stage train_test_split
    (scripts/autorec.py:34-35): 20% test, then 25% of the rest as valid."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    n_test = int(n * 0.2)
    test = perm[:n_test]
    rest = perm[n_test:]
    n_valid = int(len(rest) * 0.25)
    return rest[n_valid:], rest[:n_valid], test


def run_experiment(
    cfg: ExperimentConfig,
    data: Optional[MovieLens100K] = None,
    data_path: str = DEFAULT_DATA,
    verbose: bool = False,
) -> ExperimentResult:
    if data is None:
        data = MovieLens100K(data_path, seed=cfg.seed)
    model = build_model(cfg, data)
    mesh = None
    if cfg.mesh_shape is not None:
        from deeplearningrecommendationsystem_tpu.parallel import make_mesh

        mesh = make_mesh(data=cfg.mesh_shape[0], model=cfg.mesh_shape[1])
    aux_loss_fn = None
    if cfg.aux_weight > 0:
        assert cfg.model == "dien", "aux_weight is the DIEN auxiliary-loss hook"
        # fused path: logits + aux in one forward, sharing the extractor-GRU
        # scan (models/dien.py::apply_with_aux)
        aux_loss_fn = "model"
    trainer = Trainer(
        model,
        TrainConfig(
            learning_rate=cfg.learning_rate,
            weight_decay=cfg.weight_decay,
            epochs=cfg.epochs,
            track_metrics=cfg.track_metrics,
            compute_dtype=cfg.compute_dtype,
            mesh=mesh,
            ep_strategy=cfg.ep_strategy,
            unshard_params=cfg.unshard_params,
            matmul_gather_bwd=cfg.matmul_gather_bwd,
            onehot_gather=cfg.onehot_gather,
        ),
        aux_loss_fn=aux_loss_fn,
        aux_weight=cfg.aux_weight,
    )
    rng = jax.random.PRNGKey(cfg.seed)

    ctx = ServingContext(
        user_features=jnp.asarray(data.user_features),
        item_features=jnp.asarray(data.item_features),
    )
    weights = None
    autorec_rows = None

    if cfg.family == "matrix":
        # global negatives before splitting (scripts/autorec.py:24-27)
        sampler = NegativeSampler(data.seen_mask(data.data), seed=cfg.seed)
        negatives = sampler.sample(cfg.global_negatives)
        matrix = data.rating_matrix(negatives, item_major=cfg.item_major)
        tr, va, te = _split_rows_60_20_20(matrix.shape[0], cfg.seed)
        autorec_rows = (tr, va, te)
        m = jnp.asarray(matrix)
        batches = {
            name: (m[rows], m[rows]) for name, rows in (("train", tr), ("valid", va), ("test", te))
        }
        weights = {
            name: (batches[name][0] != 0.5).astype(jnp.float32) for name in batches
        }
        ctx = dataclasses.replace(ctx, rating_matrix=m)
        train_examples = int(weights["train"].sum())
    else:
        excluded = data.seen_mask(data.train, data.valid, data.test)
        sampler = NegativeSampler(excluded, seed=cfg.seed)
        batches = {}
        for name, split, n_neg in (
            ("train", data.train, cfg.negatives[0]),
            ("valid", data.valid, cfg.negatives[1]),
            ("test", data.test, cfg.negatives[2]),
        ):
            neg = sampler.sample(n_neg)
            combined = _combined(split, neg)
            if cfg.family == "feature":
                batch = jnp.asarray(data.feature_matrix(combined))
                batches[name] = (batch, jnp.asarray(combined["rating"]))
            elif cfg.family == "pair":
                batches[name] = (
                    (jnp.asarray(combined["user"]), jnp.asarray(combined["item"])),
                    jnp.asarray(combined["rating"]),
                )
            elif cfg.family == "seq":
                batches[name] = _seq_batch(data, split, combined, cfg.hist_len)
                if name == "train" and cfg.aux_weight > 0:
                    # aux-loss negatives: per example, hist_len items this
                    # user never interacted with (uniform, resampled where
                    # they collide with seen pairs)
                    users = np.asarray(combined["user"])
                    rng_np = np.random.default_rng(cfg.seed + 17)
                    neg = rng_np.integers(
                        0, data.num_items, (len(users), cfg.hist_len)
                    )
                    for _ in range(4):
                        bad = excluded[users[:, None], neg]
                        if not bad.any():
                            break
                        neg = np.where(
                            bad,
                            rng_np.integers(0, data.num_items, neg.shape),
                            neg,
                        )
                    (h, t), y = batches[name]
                    batches[name] = ((h, t, jnp.asarray(neg)), y)
            else:
                raise ValueError(cfg.family)
        train_examples = len(batches["train"][1])
        if cfg.family == "seq":
            ctx = dataclasses.replace(
                ctx, history=jnp.asarray(data.history_matrix(data.data, cfg.hist_len))
            )
            if cfg.full_history_serving:
                # reference serving scores each user's COMPLETE unpadded
                # history (scripts/din.py:99-100 -> model/din.py:55-66)
                padded = data.itemid_matrix(data.data)
                ctx = dataclasses.replace(
                    ctx, full_histories=[row[row >= 0] for row in padded]
                )

    # ---- DP: pad each split to the data-axis size, zero-weight pad rows ----
    # (fullbatch only: the minibatch/sparse paths draw their own batches, and
    # zero-weight padding has no meaning there)
    if mesh is not None and mesh.shape["data"] > 1 and cfg.train_mode == "fullbatch":
        from deeplearningrecommendationsystem_tpu.parallel import pad_and_shard

        sharded_weights: Dict[str, jnp.ndarray] = {}
        for name in batches:
            b, y = batches[name]
            b, y, w = pad_and_shard(b, y, mesh, (weights or {}).get(name))
            batches[name] = (b, y)
            sharded_weights[name] = w
        weights = sharded_weights

    # ---- train (one compiled scan over all epochs) ----
    t0 = time.perf_counter()
    if cfg.train_mode == "fullbatch":
        result = trainer.fit(
            rng,
            batches["train"],
            valid=batches["valid"],
            test=batches["test"],
            weights=weights,
        )
    elif cfg.train_mode == "minibatch":
        from deeplearningrecommendationsystem_tpu.train.minibatch import fit_minibatch

        assert cfg.family != "matrix", "minibatch mode: masked-matrix family N/A"
        result = fit_minibatch(
            trainer, rng, batches["train"], batch_size=cfg.batch_size
        )
    elif cfg.train_mode == "stream":
        from deeplearningrecommendationsystem_tpu.train.minibatch import fit_stream

        assert cfg.family != "matrix", "stream mode: masked-matrix family N/A"
        # dataset stays in HOST memory; StreamingLoader shuffles + prefetches
        b, y = batches["train"]
        host_train = (jax.tree.map(np.asarray, b), np.asarray(y))
        sharding = None
        if mesh is not None and mesh.shape["data"] > 1:
            from jax.sharding import NamedSharding, PartitionSpec

            sharding = NamedSharding(mesh, PartitionSpec("data"))
        result = fit_stream(
            trainer, rng, host_train, batch_size=cfg.batch_size,
            sharding=sharding, seed=cfg.seed,
        )
    elif cfg.train_mode == "sparse":
        from deeplearningrecommendationsystem_tpu.train import fit_minibatch_sparse

        result = fit_minibatch_sparse(
            trainer,
            rng,
            batches["train"],
            batch_size=cfg.batch_size,
            optimizer=cfg.sparse_optimizer,
            mesh=mesh,
            ep_strategy=cfg.ep_strategy,
            unshard=cfg.unshard_params,
        )
    else:
        raise ValueError(cfg.train_mode)
    jax.block_until_ready(result.params)
    train_time = time.perf_counter() - t0

    # ---- serving + ranking eval ----
    ranking: Dict[str, Dict[str, float]] = {}
    if getattr(result, "ep_heights", None):
        # tables left row-sharded (unshard_params=False): the dense catalog
        # scorer cannot run -- serve via ShardedRecommender
        # (parallel/serving.py); ranking eval is skipped by design.
        return ExperimentResult(
            model=cfg.model,
            params=result.params,
            history={k: np.asarray(v) for k, v in result.history.items()},
            ranking=ranking,
            train_examples=train_examples,
            epochs=cfg.epochs,
            train_time_s=train_time,
            extras=result.extras,
            ctx=ctx,
        )
    scores = model.score_catalog(result.params, ctx)
    if cfg.family == "matrix":
        # no seen-item filtering in the reference AutoRec eval
        # (scripts/autorec.py:64-78); actual = ALL interactions, rows split.
        actual_all = data.itemid_matrix(data.data)
        rec = np.asarray(full_ranking(scores, jnp.zeros(scores.shape, dtype=bool)))
        if cfg.item_major:
            # I-AutoRec trains on ITEM rows but evaluates per-user: the
            # reference transposes the score matrix and re-splits the 943
            # USER rows with the same seed (scripts/i-autorec.py:61-70).
            _, va, te = _split_rows_60_20_20(data.num_users, cfg.seed)
        else:
            _, va, te = autorec_rows
        for name, rows in (("valid", va), ("test", te)):
            for k_cut, suffix in ((cfg.k, ""), (10, "@10")):
                m = ranking_metrics(
                    jnp.asarray(actual_all[rows]), jnp.asarray(rec[rows]), k_cut
                )
                ranking[name + suffix] = {k_: float(v) for k_, v in m.items()}
    else:
        reals = {
            "train": data.itemid_matrix(data.train),
            "valid": data.itemid_matrix(data.valid),
            "test": data.itemid_matrix(data.test),
        }
        counts = {
            name: np.asarray((reals[name] >= 0).sum(1)) for name in reals
        }
        # one float sort of the catalog scores; per-split lists are stable
        # boolean partitions of it (= the reference's remove_itemid applied
        # to the sorted list, eval/recommend.py::seen_to_tail)
        rec_all = score_ranking(scores)
        for name, others in (("valid", ("train", "test")), ("test", ("train", "valid"))):
            seen = data.seen_mask(*(getattr(data, o) for o in others))
            rec = seen_to_tail(rec_all, jnp.asarray(seen))
            n_seen = counts[others[0]] + counts[others[1]]
            for k_cut, suffix in ((cfg.k, ""), (10, "@10")):
                m = ranking_metrics(
                    jnp.asarray(reals[name]), rec, k_cut, n_seen=jnp.asarray(n_seen)
                )
                ranking[name + suffix] = {k_: float(v) for k_, v in m.items()}

    history = {k: np.asarray(v) for k, v in result.history.items()}
    out = ExperimentResult(
        model=cfg.model,
        params=result.params,
        history=history,
        ranking=ranking,
        train_examples=train_examples,
        epochs=cfg.epochs,
        train_time_s=train_time,
        extras=result.extras,
        ctx=ctx,
    )
    if verbose:
        from deeplearningrecommendationsystem_tpu.runtime.logging import print_report

        print_report(out, k=cfg.k)
    return out


def run_preset(name: str, **overrides) -> ExperimentResult:
    cfg = PRESETS[name].replace(**overrides) if overrides else PRESETS[name]
    return run_experiment(cfg)
