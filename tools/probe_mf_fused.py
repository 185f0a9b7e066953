import json, sys, time
sys.path.insert(0, "/root/repo")
from deeplearningrecommendationsystem_tpu.runtime.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
import os; os.chdir("/root/repo")
import bench
from deeplearningrecommendationsystem_tpu.configs.presets import PRESETS
from deeplearningrecommendationsystem_tpu.data import MovieLens100K
from deeplearningrecommendationsystem_tpu.experiments import DEFAULT_DATA, build_model

EPOCHS = 100
data = MovieLens100K(DEFAULT_DATA)
cfg = PRESETS["mf"]
model = build_model(cfg, data)
batch, y, _ = bench._train_batch(data, "mf")
n = int(y.shape[0])
out = {}
for cd in ("bfloat16", "float32"):
    @jax.jit
    def run(key, cd=cd):
        params = model.init(key)
        p, losses = model.fast_fit(params, batch, y, EPOCHS, cfg.learning_rate,
                                   weight_decay=cfg.weight_decay, compute_dtype=cd)
        checksum = sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(p))
        return losses[-1] + 0.0 * checksum
    t0 = time.perf_counter(); final = float(run(jax.random.PRNGKey(0))); c = time.perf_counter()-t0
    dt = float("inf")
    for _ in range(5):
        t0 = time.perf_counter(); final = float(run(jax.random.PRNGKey(0))); dt = min(dt, time.perf_counter()-t0)
    out[cd] = {"ms_per_epoch": dt/EPOCHS*1e3, "examples_per_sec": n*EPOCHS/dt,
               "final_loss": final, "compile_s": c}
    print(cd, out[cd], flush=True)
json.dump(out, open(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "MF_FUSED_PROBE.json"), "w"), indent=1)
