"""Optimizers with reference-matching semantics.

Every reference script trains with ``torch.optim.Adam(lr, weight_decay)``
(e.g. scripts/mf.py:66). Torch Adam's ``weight_decay`` is classic L2 added to
the gradient BEFORE the moment estimates (not AdamW's decoupled decay), so the
equivalent optax chain puts ``add_decayed_weights`` ahead of the Adam
transform. Defaults (b1=.9, b2=.999, eps=1e-8) already agree.
"""

from __future__ import annotations

import optax


def torch_adam(learning_rate: float, weight_decay: float = 0.0) -> optax.GradientTransformation:
    if weight_decay:
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.adam(learning_rate),
        )
    return optax.adam(learning_rate)
