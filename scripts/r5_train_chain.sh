#!/bin/bash
# Round-5 large-encoder phase chain: waits for the in-flight contrastive run,
# then hardneg -> maxsim -> export (to data/encoder_train_large/export, NOT the
# packaged encoder dir), then the base-size maxsim phase so the packaged
# default encoder's token head is trained too (VERDICT r4 task #2).
set -u
cd /root/repo

wait_pid() {
  local pid=$1
  while kill -0 "$pid" 2>/dev/null; do sleep 20; done
}

if [ -f /tmp/r5_train.pid ]; then
  wait_pid "$(cat /tmp/r5_train.pid)"
fi

if [ ! -f data/encoder_train_large/contrastive.npz ]; then
  echo "contrastive checkpoint missing; aborting chain" >&2
  exit 1
fi

python scripts/train_encoder.py --phase hardneg --size large --batch 128 \
  > /tmp/r5_hardneg_large.log 2>&1 || exit 1
python scripts/train_encoder.py --phase maxsim --size large --batch 48 \
  > /tmp/r5_maxsim_large.log 2>&1 || exit 1

# Export the large checkpoint to its own dir (fp16), leaving the packaged
# 64M encoder untouched until an IR-bench A/B justifies replacing it.
JAX_PLATFORMS=cpu python - > /tmp/r5_export_large.log 2>&1 <<'EOF'
import json, os, sys
sys.path.insert(0, '/root/repo')
import numpy as np
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from raglite_tpu.models.transformer import load_npz_encoder, save_npz_encoder
src = "/root/repo/data/encoder_train_large/maxsim.npz"
out = "/root/repo/data/encoder_train_large/export"
os.makedirs(out, exist_ok=True)
cfg, params, _ = load_npz_encoder(src, dtype=jnp.float16)
save_npz_encoder(out + "/encoder.npz", params, cfg, dtype=np.float16)
open(out + "/tokenizer.json", "w").write(
    open("/root/repo/data/encoder_train_large/tokenizer.json").read())
open(out + "/config.json", "w").write(
    json.dumps({**cfg, "pad_token_id": 0, "bos_token_id": 1, "eos_token_id": 2}))
print("exported", src, "->", out, os.path.getsize(out + "/encoder.npz") / 1e6, "MB")
EOF

# Base-size maxsim phase: trains the packaged encoder's token geometry.
python scripts/train_encoder.py --phase maxsim --size base --batch 64 \
  > /tmp/r5_maxsim_base.log 2>&1 || exit 1

echo "chain done" > /tmp/r5_chain_done
