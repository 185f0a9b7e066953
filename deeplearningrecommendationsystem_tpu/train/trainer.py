"""Full-batch / minibatch trainer compiled as a single XLA program.

The reference trains full-batch: one optimizer step per epoch over the entire
(positives + sampled negatives) set, evaluating train/valid/test pointwise
metrics every epoch (trainer/trainer.py:23-146). The TPU-native redesign
keeps those semantics but compiles the WHOLE multi-epoch loop into one
``lax.scan``: no per-epoch dispatch, no host sync, metrics accumulated on
device and returned as stacked [epochs, ...] arrays.

Parity details preserved:
* train metrics use the PRE-update forward pass of that epoch (the reference
  reuses ``predictions_train`` computed before ``optimizer.step()``,
  trainer/trainer.py:30-39);
* valid/test metrics use the post-update params (valid/test loops run after
  the step, e.g. scripts/mf.py:71-74);
* loss is BCE; models emit logits and the trainer applies
  sigmoid-cross-entropy-with-logits (same function as sigmoid + BCELoss,
  numerically stable);
* the masked-matrix mode reproduces ``train_loop2`` (trainer/trainer.py:81-113)
  with a weight mask instead of dynamic boolean indexing.

Sharding: pass ``mesh`` + a batch PartitionSpec to shard the epoch batch over
the data axis; params are replicated (or row-sharded via parallel/embedding).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from deeplearningrecommendationsystem_tpu.eval.pointwise import pointwise_metrics
from deeplearningrecommendationsystem_tpu.parallel.ep import (
    embedding_partitioning,
    matmul_gather_backward,
    onehot_gather_fwd,
    pallas_gather_mm,
    shard_model_tables,
    unshard_model_tables,
)
from deeplearningrecommendationsystem_tpu.parallel.mesh import MODEL_AXIS
from deeplearningrecommendationsystem_tpu.train.optim import torch_adam

Batch = Any  # model-specific pytree: [B,45] features | (u,i) | (hist,target) | matrix


@dataclasses.dataclass
class TrainConfig:
    learning_rate: float = 1e-3
    weight_decay: float = 0.0
    epochs: int = 100
    track_metrics: bool = True  # per-epoch train/valid/test metrics (parity mode)
    # mixed precision: cast float params + batch to this dtype for the
    # forward/backward pass (f32 master weights, f32 loss); 'bfloat16' puts
    # the matmuls on the MXU's fast path. None = pure f32 (parity mode).
    compute_dtype: Optional[str] = None
    # EP: a ('data', 'model') Mesh routes every id-table gather through the
    # explicit shard_map collectives of parallel/embedding.py (tables
    # row-sharded over the model axis; SURVEY.md §2.5). None = dense tables.
    mesh: Any = None
    ep_strategy: str = "psum"  # 'psum' | 'scatter' (parallel/ep.py)
    # False = leave tables row-sharded (vocab-padded) after fit for the
    # sharded serving path (parallel/serving.py) -- at production vocabs a
    # replicated table is exactly what does not fit on one chip. The sharded
    # heights come back in TrainResult.ep_heights.
    unshard_params: bool = True
    # dense-path gathers backward as one-hot MXU matmuls instead of TPU's
    # serialized scatter-add (parallel/ep.py::matmul_gather_backward);
    # bit-identical gradients, single-chip small-vocab fast path
    matmul_gather_bwd: bool = False
    # dense-path gathers via the Pallas mask-matmul kernels in BOTH
    # directions (parallel/ep.py::pallas_gather_mm): v5e has no gather
    # hardware, so fwd table[ids] runs ~12x off HBM bandwidth natively;
    # bit-identical forward, f32-accumulated backward. Small vocabs only.
    # Takes precedence over matmul_gather_bwd.
    pallas_gather: bool = False
    # dense-path gathers as one-hot XLA matmuls in BOTH directions
    # (parallel/ep.py::onehot_gather_fwd): the r5 layout-probe winner -- XLA
    # fuses the compare-generated one-hot into the dot stream, dodging the
    # slow native in-scan gather emitter (MF 1.36x end-to-end,
    # MF_LAYOUT_PROBE.json). Small vocabs (<= 8192 rows) only; takes
    # precedence over matmul_gather_bwd on qualifying tables.
    onehot_gather: bool = False


def _cast_floats(tree, dtype):
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, tree)


@dataclasses.dataclass
class TrainResult:
    params: Any
    history: Dict[str, jnp.ndarray]  # each entry [epochs]
    extras: Dict[str, float] = dataclasses.field(default_factory=dict)
    opt_state: Any = None  # final optimizer state, for checkpoint/resume
    # original (pre-padding) vocab per sharded table path, set when params
    # are left row-sharded (unshard_params=False / unshard=False) so the
    # sharded serving path knows the true vocab heights
    ep_heights: Any = None
    # extras holds final-params-only metrics (true AUC per split): the sort it
    # needs is kept out of the epoch scan for TPU compile-time sanity.

    def last(self) -> Dict[str, float]:
        out = {
            k: float(v[-1]) for k, v in self.history.items() if not k.startswith("_")
        }
        out.update(self.extras)
        return out


def _bce_with_logits(logits, labels, weights=None):
    losses = optax.sigmoid_binary_cross_entropy(logits, labels)
    if weights is None:
        return jnp.mean(losses)
    w = weights.astype(losses.dtype)
    return jnp.sum(losses * w) / jnp.maximum(jnp.sum(w), 1.0)


class Trainer:
    """Drives a model's full-batch training with jit-compiled epoch scans.

    ``aux_loss_fn`` (optional) adds an auxiliary term to the BCE as
    ``loss = bce + aux_weight * aux`` -- the composite-loss hook used by the
    DIEN auxiliary loss extension (absent in the reference,
    /root/reference/model/dien.py:47,61). Two forms:

    * the string ``"model"``: the model's ``apply_with_aux(params, batch) ->
      (logits, aux)`` computes both in one traced forward, sharing the
      extractor-GRU scan (models/dien.py::apply_with_aux) -- the fast path;
    * a callable ``aux_loss_fn(params, batch) -> scalar`` evaluated alongside
      ``model.apply`` (generic, possibly duplicating work).
    """

    def __init__(self, model, config: TrainConfig, aux_loss_fn=None, aux_weight=1.0):
        self.model = model
        self.config = config
        self.tx = torch_adam(config.learning_rate, config.weight_decay)
        # jit-cached whole-run scans, keyed on the config fields that are
        # baked into the trace (TrainConfig is a mutable dataclass: mutating
        # trainer.config between fits must rebuild, not silently reuse)
        self._run_cache: Dict[Any, Any] = {}
        self.fused_aux = aux_loss_fn == "model"
        self.aux_loss_fn = None if self.fused_aux else aux_loss_fn
        self.aux_weight = aux_weight

    # -- single step (also used by benchmarks and the sharded path) --------
    def loss_fn(self, params, batch: Batch, labels, weights=None):
        dt = self.config.compute_dtype
        p, b = (
            (_cast_floats(params, dt), _cast_floats(batch, dt))
            if dt
            else (params, batch)
        )
        aux = None
        if self.fused_aux:
            logits, aux = self.model.apply_with_aux(p, b)
        else:
            logits = self.model.apply(p, b)
        logits = logits.astype(jnp.float32)
        loss = _bce_with_logits(logits, labels, weights)
        if aux is not None:
            loss = loss + self.aux_weight * aux.astype(jnp.float32)
        if self.aux_loss_fn is not None:
            loss = loss + self.aux_weight * self.aux_loss_fn(params, batch)
        return loss, logits

    def train_step(self, params, opt_state, batch: Batch, labels, weights=None):
        (loss, logits), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
            params, batch, labels, weights
        )
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, logits

    # -- full training run as one scan -------------------------------------
    def fit(
        self,
        rng: jax.Array,
        train: Tuple[Batch, jnp.ndarray],
        valid: Optional[Tuple[Batch, jnp.ndarray]] = None,
        test: Optional[Tuple[Batch, jnp.ndarray]] = None,
        weights: Optional[Dict[str, jnp.ndarray]] = None,
        params: Any = None,
        opt_state: Any = None,
    ) -> TrainResult:
        """Train for ``config.epochs`` full-batch epochs.

        ``weights`` maps split name ('train'/'valid'/'test') to a mask array
        for the AutoRec masked-matrix mode; None = all samples count.
        ``params``/``opt_state`` resume from a checkpoint (both restored =
        deterministic continuation with intact Adam moments).
        """
        cfg = self.config
        weights = weights or {}
        if params is None:
            params = self.model.init(rng)

        # EP: row-shard the id tables over the mesh's model axis and activate
        # the gather_rows routing for everything traced below (the scan, the
        # per-epoch eval applies, and the post-scan extras).
        ep_cfg = None
        self.ep_table_heights = {}
        if cfg.mesh is not None and cfg.mesh.shape.get(MODEL_AXIS, 1) > 1:
            params, ep_cfg, self.ep_table_heights = shard_model_tables(
                params, cfg.mesh, cfg.ep_strategy
            )
        if opt_state is None:
            opt_state = self.tx.init(params)

        track = cfg.track_metrics

        def split_metrics(prefix, logits, labels, w):
            m = pointwise_metrics(
                labels, jax.nn.sigmoid(logits), w, include_auc_raw=False
            )
            m = {f"{prefix}_{k}": v for k, v in m.items()}
            m[f"{prefix}_loss"] = _bce_with_logits(logits, labels, w)
            return m

        # Every config field the trace closes over is in the cache key; jit
        # itself handles arg shapes/dtypes.
        run_key = (
            cfg.epochs,
            track,
            cfg.compute_dtype,
            cfg.matmul_gather_bwd,
            cfg.pallas_gather,
            cfg.onehot_gather,
            cfg.ep_strategy,
            id(cfg.mesh),
        )
        self._run = self._run_cache.get(run_key)
        if self._run is None:
            # The whole multi-epoch run is ONE jitted program, cached on the
            # Trainer: lax.scan compiles the epoch body once, and repeated
            # fit calls (benchmark reruns, campaigns over same-shape data)
            # skip Python retracing entirely -- on the 2-core host, retracing
            # a DIN-sized scan body costs ~1.2 s of host CPU per call,
            # dominating sub-2 s training runs.
            def run(params, opt_state, train, valid, test, weights):
                train_batch, train_y = train

                def epoch(carry, _):
                    params, opt_state = carry
                    params_new, opt_state_new, loss, logits = self.train_step(
                        params, opt_state, train_batch, train_y, weights.get("train")
                    )
                    metrics = {"train_loss": loss}
                    if track:
                        metrics.update(
                            {
                                k: v
                                for k, v in split_metrics(
                                    "train", logits, train_y, weights.get("train")
                                ).items()
                                if k != "train_loss"
                            }
                        )
                        for name, split in (("valid", valid), ("test", test)):
                            if split is not None:
                                b, y = split
                                lg = self.model.apply(params_new, b)
                                metrics.update(
                                    split_metrics(name, lg, y, weights.get(name))
                                )
                    return (params_new, opt_state_new), metrics

                carry, history = jax.lax.scan(
                    epoch, (params, opt_state), None, length=cfg.epochs
                )
                # Scalar checksum data-depending on EVERY final param AND
                # optimizer buffer: on this relay, donated-aliased outputs
                # can report ready before their writes land (CLAUDE.md r2),
                # so timing harnesses fetch THIS one scalar as their only
                # sync (an extra fetch roundtrip costs ~30 ms here). Shaped
                # [1] so TrainResult.last()'s v[-1] indexing works.
                leaves = [
                    jnp.sum(x.astype(jnp.float32))
                    for x in jax.tree.leaves(carry)
                    if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
                ]
                history["_param_checksum"] = jnp.stack(leaves).sum()[None]
                return carry, history

            self._run = self._run_cache[run_key] = jax.jit(run)

        # The EP / matmul-bwd contexts only need to be live while TRACING
        # (routing is baked into the compiled program); both are derived from
        # the per-instance config, so the cached trace stays valid.
        import contextlib

        stack = contextlib.ExitStack()
        stack.enter_context(embedding_partitioning(ep_cfg))
        if cfg.pallas_gather:
            stack.enter_context(pallas_gather_mm())
        if cfg.onehot_gather:
            stack.enter_context(onehot_gather_fwd())
        if cfg.matmul_gather_bwd:
            stack.enter_context(matmul_gather_backward())
        with stack:
            (params, opt_state), history = self._run(
                params, opt_state, train, valid, test, weights
            )

            extras: Dict[str, float] = {}
            if track:
                from deeplearningrecommendationsystem_tpu.eval.pointwise import true_auc

                for name, split in (("train", train), ("valid", valid), ("test", test)):
                    if split is None:
                        continue
                    b, y = split
                    probs = jax.nn.sigmoid(self.model.apply(params, b))
                    extras[f"{name}_auc_raw"] = float(
                        true_auc(y, probs, weights.get(name))
                    )
        if ep_cfg is not None and cfg.unshard_params:
            # dense serving layout: strip vocab padding, replicate
            params = unshard_model_tables(params, self.ep_table_heights)
        return TrainResult(
            params=params,
            history=history,
            extras=extras,
            opt_state=opt_state,
            ep_heights=(
                self.ep_table_heights
                if ep_cfg is not None and not cfg.unshard_params
                else None
            ),
        )
