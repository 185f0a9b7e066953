"""I-AutoRec SAME-SUBSET eval (VERDICT r3 next #2 / missing #1).

The r3 comparison was polluted: the reference evaluates ranking on a FIXED
user subset (sklearn ``train_test_split(random_state=42)``,
/root/reference/scripts/i-autorec.py:34-35,61-70 -- membership depends only
on n and the seed), while our quality campaign re-drew the eval subset per
seed, so the bands measured different user populations (our test NDCG@50
0.560-0.638 vs reference 0.611-0.617, PARITY.md).

The clean experiment: run OUR i-autorec with the reference's EXACT fixed
splits -- both the item-row training split of the [I, U] rating matrix and
the user-row eval split use sklearn's random_state=42 permutation -- while
varying only the model seed (init + negative draws), exactly like the
reference campaign (tools/run_reference_quality.py varied torch seeds over
fixed sklearn splits). Writes IAUTOREC_SAME_SUBSET.json.

Run: python tools/iautorec_same_subset.py [n_seeds]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deeplearningrecommendationsystem_tpu.runtime.cache import enable_compilation_cache

enable_compilation_cache()

import numpy as np  # noqa: E402
from sklearn.model_selection import train_test_split  # noqa: E402

from deeplearningrecommendationsystem_tpu import experiments  # noqa: E402
from deeplearningrecommendationsystem_tpu.configs.presets import PRESETS  # noqa: E402


def sklearn_42_rows(n: int, seed: int):
    """(train, valid, test) row indices exactly as the reference's two-stage
    train_test_split(random_state=42) produces them -- membership depends only
    on n, NOT on our campaign seed (which is deliberately ignored here)."""
    idx = np.arange(n)
    train_valid, test = train_test_split(idx, test_size=0.2, random_state=42)
    train, valid = train_test_split(train_valid, test_size=0.25, random_state=42)
    return train, valid, test


def main():
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    # Patch the campaign's split to the reference's fixed membership: affects
    # BOTH the [I, U] matrix's item-row training split and the user-row eval
    # split (the reference fixes both with the same seed 42).
    experiments._split_rows_60_20_20 = sklearn_42_rows

    rows = []
    for seed in range(n_seeds):
        cfg = PRESETS["i-autorec"].replace(seed=seed, track_metrics=False)
        res = experiments.run_experiment(cfg)
        rows.append(
            {
                "seed": seed,
                "test_ndcg@50": res.ranking["test"]["ndcg"],
                "test_recall@50": res.ranking["test"]["recall"],
                "valid_ndcg@50": res.ranking["valid"]["ndcg"],
                "valid_recall@50": res.ranking["valid"]["recall"],
            }
        )
        print(rows[-1], flush=True)

    ndcg = [r["test_ndcg@50"] for r in rows]
    out = {
        "protocol": (
            "our i-autorec preset (reference hyperparameters), trained/evaled "
            "on the reference's exact fixed sklearn random_state=42 splits; "
            "only the model seed (init + negative sampling) varies -- same "
            "campaign design as the reference's 4-seed run"
        ),
        "rows": rows,
        "test_ndcg@50": {
            "min": min(ndcg),
            "max": max(ndcg),
            "mean": float(np.mean(ndcg)),
            "n": len(ndcg),
        },
        "reference_band_same_subset": {
            "min": 0.611,
            "max": 0.617,
            "mean": 0.614,
            "n": 4,
            "source": "QUALITY_BANDS.json (reference scripts run as-is, fixed sklearn-42 subset)",
        },
    }
    with open("IAUTOREC_SAME_SUBSET.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["test_ndcg@50"], indent=2))


if __name__ == "__main__":
    main()
