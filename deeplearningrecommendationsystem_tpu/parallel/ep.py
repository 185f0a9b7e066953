"""EP dispatch: route every id-table gather through the sharded strategies.

The reference keeps whole embedding tables on one device and updates them
with dense Adam (model/mf.py:16-17, scripts/mf.py:66). Here a single context
flag turns every id-table lookup in every model into a row-sharded collective
gather (parallel/embedding.py) with zero model-code changes: models call
:func:`gather_rows` instead of ``table[ids]``, and the active
:class:`EmbeddingPartitioning` decides -- statically, at trace time -- whether
that is a plain dense gather (single chip, or a small replicated side table
like gender/occupation) or a shard_map collective over the mesh's model axis.

Table identification is by leaf name: :data:`EP_TABLE_KEYS` lists the pytree
dict keys that hold user/item-vocab tables across the model zoo (user, item,
gmf_user, ..., user_id.user, ...). :func:`shard_model_tables` row-shards
exactly those leaves (padding the vocab to the axis size) and registers the
padded heights with the context so :func:`gather_rows` recognises them.

Used by train.Trainer (TrainConfig.mesh + ep_strategy) and
experiments.run_experiment (ExperimentConfig.mesh_shape).
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Any, Dict, FrozenSet, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from deeplearningrecommendationsystem_tpu.parallel.embedding import (
    shard_table,
    sharded_gather,
    sharded_gather_scatter,
)
from deeplearningrecommendationsystem_tpu.parallel.mesh import MODEL_AXIS

# Dict keys (leaf names) that hold a user/item-vocab embedding table anywhere
# in the zoo's param trees. Everything else (MLP weights, small field tables
# like gender[2]/occupation[21]/genre[19]) stays replicated.
EP_TABLE_KEYS: FrozenSet[str] = frozenset(
    {
        "user", "item",                                    # mf, din/dien ('item'), field tables
        "gmf_user", "gmf_item", "mlp_user", "mlp_item",    # neuralcf
        "user_bias", "item_bias",                          # every wide/linear part
        "user_id.user", "user_id.item", "item_id.user", "item_id.item",  # ffm
    }
)


@dataclasses.dataclass(frozen=True)
class EmbeddingPartitioning:
    """Active EP policy: which mesh, which strategy, which table heights."""

    mesh: Mesh
    strategy: str = "psum"  # 'psum' | 'scatter'
    # padded leading dims of the tables that were actually row-sharded;
    # gather_rows treats any other height as a replicated table.
    sharded_heights: FrozenSet[int] = frozenset()

    def routes(self, table: jnp.ndarray) -> bool:
        return (
            self.mesh.shape[MODEL_AXIS] > 1
            and table.ndim == 2
            and table.shape[0] in self.sharded_heights
        )


_ACTIVE: Optional[EmbeddingPartitioning] = None


@contextlib.contextmanager
def embedding_partitioning(cfg: Optional[EmbeddingPartitioning]):
    """Scope under which gather_rows routes matching tables through EP.

    Tracing happens inside the scope, so compiled programs keep the routing
    decision permanently; the context only needs to wrap trace/compile time.
    """
    global _ACTIVE
    prev = _ACTIVE
    _ACTIVE = cfg
    try:
        yield cfg
    finally:
        _ACTIVE = prev


def active_partitioning() -> Optional[EmbeddingPartitioning]:
    return _ACTIVE


_MATMUL_BWD = False
_PALLAS_GATHER_MM = False
_ONEHOT_FWD = False


@contextlib.contextmanager
def onehot_gather_fwd(enable: bool = True):
    """Scope under which DENSE gather_rows runs as a one-hot MXU matmul in
    BOTH directions (ops/embedding.py::gather_onehot). r5 MF layout probe:
    the native in-scan row gather is the layout victim the r4 trace found
    (~12x off HBM bandwidth), while XLA fuses compare-generated one-hots
    into dot streams -- MF gained 1.36-1.47x end-to-end. Small vocabs only
    (<= 8192 rows; larger tables fall back to the native/matmul-bwd path).
    Takes precedence over matmul_gather_backward; EP-routed tables are
    unaffected."""
    global _ONEHOT_FWD
    prev = _ONEHOT_FWD
    _ONEHOT_FWD = enable
    try:
        yield
    finally:
        _ONEHOT_FWD = prev


@contextlib.contextmanager
def pallas_gather_mm(enable: bool = True):
    """Scope under which the DENSE gather_rows path uses the Pallas
    mask-matmul kernels for BOTH directions (ops/pallas/gather_mm.py): fwd
    ``mask @ table`` on the MXU, bwd the in-VMEM-mask accumulation. TPU v5e
    has no gather hardware -- the native row-gather runs ~12x off HBM
    bandwidth (r4 MF trace: 0.42 ms for a 29 MB result) and the one-hot
    backward lowers to a slow VPU convolution emitter inside training loops.
    Small-vocab tables only (the ml-100k zoo qualifies); takes precedence
    over matmul_gather_backward. EP-routed tables are unaffected."""
    global _PALLAS_GATHER_MM
    prev = _PALLAS_GATHER_MM
    _PALLAS_GATHER_MM = enable
    try:
        yield
    finally:
        _PALLAS_GATHER_MM = prev


@contextlib.contextmanager
def matmul_gather_backward(enable: bool = True):
    """Scope under which the DENSE gather_rows path uses the one-hot-matmul
    backward (ops/embedding.gather_matmul_bwd) instead of TPU's serialized
    scatter-add. Bit-identical gradients (tests/test_kernels.py); the right
    default for small vocabs on a single chip -- every feature model's
    user/item bias and embedding tables qualify on ml-100k. EP-routed tables
    are unaffected (their backward is the shard_map transpose)."""
    global _MATMUL_BWD
    prev = _MATMUL_BWD
    _MATMUL_BWD = enable
    try:
        yield
    finally:
        _MATMUL_BWD = prev


def gather_rows(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """``table[ids]`` routed through the active EP strategy (if any).

    Static dispatch: the branch is chosen while tracing, from shapes and the
    context -- no runtime cost on the dense path.
    """
    cfg = _ACTIVE
    if cfg is None or not cfg.routes(table):
        # mask-matmul kernels build a [block, vocab] mask in VMEM; beyond a
        # few thousand rows that mask no longer fits / crawls, so the route
        # is gated to small vocabs (the ml-100k zoo) and falls back to the
        # native path for anything larger (ADVICE r4).
        if _PALLAS_GATHER_MM and table.shape[0] <= 4096:
            from deeplearningrecommendationsystem_tpu.ops.pallas.gather_mm import (
                gather_rows_mm_pallas,
            )

            return gather_rows_mm_pallas(table, ids)
        if _ONEHOT_FWD and table.shape[0] <= 8192:
            from deeplearningrecommendationsystem_tpu.ops.embedding import (
                gather_onehot,
            )

            return gather_onehot(table, ids)
        if _MATMUL_BWD:
            from deeplearningrecommendationsystem_tpu.ops.embedding import (
                gather_matmul_bwd,
            )

            return gather_matmul_bwd(table, ids)
        return table[ids]
    flat = ids.reshape(-1)
    m = cfg.mesh.shape[MODEL_AXIS]
    if cfg.strategy == "scatter" and flat.shape[0] % m == 0:
        out = sharded_gather_scatter(table, flat, cfg.mesh)
    else:
        out = sharded_gather(table, flat, cfg.mesh)
    return out.reshape(ids.shape + (table.shape[1],))


def _is_table_path(path) -> bool:
    for entry in reversed(path):
        if isinstance(entry, jax.tree_util.DictKey):
            return str(entry.key) in EP_TABLE_KEYS
    return False


def shard_model_tables(
    params: Any, mesh: Mesh, strategy: str = "psum"
) -> Tuple[Any, EmbeddingPartitioning, Dict[str, int]]:
    """Row-shard every EP_TABLE_KEYS leaf of ``params`` over the model axis.

    Returns ``(params, cfg, orig_heights)`` where ``cfg`` is ready for
    :func:`embedding_partitioning` and ``orig_heights`` maps the flattened
    key-path string to the pre-padding vocab so :func:`unshard_model_tables`
    can restore exact shapes for serving.
    """
    heights: set = set()
    orig: Dict[str, int] = {}

    def maybe_shard(path, leaf):
        if not (hasattr(leaf, "ndim") and leaf.ndim == 2 and _is_table_path(path)):
            return leaf
        sharded = shard_table(leaf, mesh)
        orig[jax.tree_util.keystr(path)] = leaf.shape[0]
        heights.add(sharded.shape[0])
        return sharded

    params = jax.tree_util.tree_map_with_path(maybe_shard, params)
    cfg = EmbeddingPartitioning(
        mesh=mesh, strategy=strategy, sharded_heights=frozenset(heights)
    )
    return params, cfg, orig


def unshard_model_tables(params: Any, orig_heights: Dict[str, int]) -> Any:
    """Strip vocab padding and replicate -- the dense serving layout."""

    def restore(path, leaf):
        key = jax.tree_util.keystr(path)
        if key in orig_heights:
            return jax.device_put(leaf[: orig_heights[key]])
        return leaf

    return jax.tree_util.tree_map_with_path(restore, params)
