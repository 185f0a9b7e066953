"""Probe: Pallas in-VMEM-mask embedding backward vs the XLA one-hot matmul.

Runs bench.measure (full 100-epoch training, single-sync checksum timing)
for the models whose backward is dominated by materialized one-hot traffic,
with ops.embedding._PALLAS_ONEHOT_GRAD toggled off/on. Run SOLO on an idle
host. Writes ONEHOT_GRAD_PROBE.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deeplearningrecommendationsystem_tpu.runtime.cache import enable_compilation_cache

enable_compilation_cache()

import bench  # noqa: E402
from deeplearningrecommendationsystem_tpu.data import MovieLens100K  # noqa: E402
from deeplearningrecommendationsystem_tpu.experiments import DEFAULT_DATA  # noqa: E402
import deeplearningrecommendationsystem_tpu.ops.embedding as emb  # noqa: E402

MODELS = ("mf", "ffm", "neuralcf", "deepfm", "widedeep", "dien")


def main():
    data = MovieLens100K(DEFAULT_DATA)
    reference = bench._load_reference()
    out = {}
    for name in MODELS:
        row = {}
        for flag in (False, True):
            emb._PALLAS_ONEHOT_GRAD = flag
            r = bench.measure(name, data, reference)
            row["pallas" if flag else "xla"] = {
                "sec_total": r["sec_total"],
                "examples_per_sec": r["examples_per_sec"],
                "final_loss": r["final_loss"],
                "speedup_vs_reference": r.get("speedup_vs_reference"),
            }
            print(name, flag, r["sec_total"], r["final_loss"], flush=True)
        row["speedup_pallas_vs_xla"] = (
            row["xla"]["sec_total"] / row["pallas"]["sec_total"]
        )
        out[name] = row
    with open("ONEHOT_GRAD_PROBE.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v["speedup_pallas_vs_xla"] for k, v in out.items()}))


if __name__ == "__main__":
    main()
