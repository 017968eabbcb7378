"""Export a trained npz encoder checkpoint to HF safetensors layout.

Converts a directory (or .npz file) written by
``raglite_tpu.models.transformer.save_npz_encoder`` into a standard
HF-layout directory (``model.safetensors`` + ``config.json`` +
``tokenizer.json``) loadable through the same ``load_safetensors_encoder``
path that ingests real XLM-R/BERT-family checkpoints (HF-gold parity tested
in tests/test_pretrained_loaders.py).  This is the zero-egress demonstration
of the reference's "bring your own encoder" default (bge-m3,
/root/reference/src/raglite/_config.py:50-64): the exported checkpoint is a
genuine safetensors encoder consumed end-to-end by ``flax:<dir>``.

Usage:
  python scripts/export_hf_encoder.py --src data/encoder_train_large/maxsim.npz \
      --tokenizer data/encoder_train_large/tokenizer.json \
      --out data/encoder_train_large/export_hf
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--src", required=True, help="npz checkpoint (file or dir with encoder.npz)")
    parser.add_argument("--tokenizer", default=None, help="tokenizer.json (default: next to src)")
    parser.add_argument("--out", required=True, help="output HF-layout directory")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from raglite_tpu.models.transformer import load_npz_encoder, save_hf_encoder

    src = args.src
    if os.path.isdir(src):
        src = os.path.join(src, "encoder.npz")
    tok = args.tokenizer or os.path.join(os.path.dirname(src), "tokenizer.json")
    cfg, params, _ = load_npz_encoder(src, dtype=jnp.float16)
    save_hf_encoder(args.out, params, cfg, tokenizer_json=tok)
    size = os.path.getsize(os.path.join(args.out, "model.safetensors")) / 1e6
    print(f"exported {src} -> {args.out} ({size:.1f} MB model.safetensors)")


if __name__ == "__main__":
    main()
