"""orbax model checkpointing roundtrips (models/checkpoint.py).

Reference analogue: llama.cpp GGUF weight loading (_litellm.py:96-148);
here weights are JAX pytrees checkpointed with orbax.
"""

import numpy as np


def test_decoder_checkpoint_roundtrip(tmp_path) -> None:
    from raglite_tpu.models.decoder import JaxChatLLM

    llm = JaxChatLLM("tiny", seed=3)
    llm.save_checkpoint(str(tmp_path / "dec"))
    restored = JaxChatLLM(f"ckpt:{tmp_path / 'dec'}")
    assert restored.cfg == llm.cfg
    a = llm.complete([{"role": "user", "content": "hi"}], max_tokens=8)
    b = restored.complete([{"role": "user", "content": "hi"}], max_tokens=8)
    assert a.content == b.content  # greedy decode from identical weights


def test_encoder_checkpoint_roundtrip(tmp_path) -> None:
    from raglite_tpu.models.encoder import TransformerEncoder

    encoder = TransformerEncoder("tiny", seed=5)
    encoder.save_checkpoint(str(tmp_path / "enc"))
    restored = TransformerEncoder(f"ckpt:{tmp_path / 'enc'}")
    original = encoder.embed(["the speed of light"])
    roundtrip = restored.embed(["the speed of light"])
    np.testing.assert_allclose(original, roundtrip, rtol=1e-5)
