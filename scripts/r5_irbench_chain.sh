#!/bin/bash
# Round-5 IR evaluation chain: waits for the training chain, exports the
# base-size maxsim checkpoint to its own dir, then runs the widened
# (1000-query) IR bench for (a) the maxsim-trained base encoder and (b) the
# large (12L/d1024) encoder.  Results land in data/irbench_r5_base and
# data/irbench_r5_large; packaging/IRBENCH_r05.json assembly is a separate,
# human-reviewed step.
set -u
cd /root/repo

# The rerank variant scores ~160 candidates x 1000 queries; a larger
# device token-state cache (1024 entries ~ 1.5 GB HBM on the otherwise
# idle chip) turns repeat candidates into score-only dispatches.
export RAGLITE_TPU_RERANK_CACHE=1024

while [ ! -f /tmp/r5_chain_done ]; do sleep 30; done

# Export base maxsim checkpoint (fp16) to a non-packaged dir for the A/B.
JAX_PLATFORMS=cpu python - > /tmp/r5_export_base_maxsim.log 2>&1 <<'EOF'
import json, os, sys
sys.path.insert(0, '/root/repo')
import numpy as np
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from raglite_tpu.models.transformer import load_npz_encoder, save_npz_encoder
src = "/root/repo/data/encoder_train_base/maxsim.npz"
out = "/root/repo/data/encoder_train_base/export_maxsim"
os.makedirs(out, exist_ok=True)
cfg, params, _ = load_npz_encoder(src, dtype=jnp.float16)
save_npz_encoder(out + "/encoder.npz", params, cfg, dtype=np.float16)
open(out + "/tokenizer.json", "w").write(
    open("/root/repo/data/encoder_train_base/tokenizer.json").read())
open(out + "/config.json", "w").write(
    json.dumps({**cfg, "pad_token_id": 0, "bos_token_id": 1, "eos_token_id": 2}))
print("exported", src, "->", out)
EOF

python scripts/semantic_ir_bench.py \
  --docs 2122 --queries 1000 --adapter-queries 1000 --skip-hash \
  --embedder flax:/root/repo/data/encoder_train_base/export_maxsim \
  --workdir data/irbench_r5_base \
  > /tmp/r5_irbench_base.log 2>&1

python scripts/semantic_ir_bench.py \
  --docs 2122 --queries 1000 --adapter-queries 1000 --skip-hash \
  --embedder flax:/root/repo/data/encoder_train_large/export \
  --workdir data/irbench_r5_large \
  > /tmp/r5_irbench_large.log 2>&1

echo done > /tmp/r5_irbench_done
