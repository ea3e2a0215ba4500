"""Shared gates for serving-time length bucketing (serve.CodecServer).

One home for the padding-exactness rules so the live codec
(serve.LiveCodec), the deployment-artifact writer (deploy.save_artifact),
and the artifact loader (deploy.DeployedCodec) cannot drift apart:

- ``tail_exact_gate``: causal, non-normalizing, single-frame models —
  right-zero-padding can change at most the final code frame / final hop
  of audio (every layer is causal; padding differences live only in each
  layer's last-window completion, whose causal cone is the last frame).
- ``exact_gate``: additionally ``pad_mode='constant'`` on BOTH encoder
  and decoder — then the padding an unpadded encode would add to complete
  its last window is zeros too (ops/pad.py), so code indices are
  identical and wavs agree to per-shape XLA compilation fp noise.
- ``pad_min_samples``: the reflect-pad short-input horizon. Below it some
  layer's input is shorter than its own padding and the reference's
  short-input reflect guard (reference conv.py:94-97: extra zero pad
  before the reflect) makes that layer's semantics length-dependent —
  padding then changes outputs beyond the final frame. Constant-pad
  models have no such guard (0). Returns -1 when the streaming walker
  cannot analyze the architecture (bucketing is then refused).
"""


def tail_exact_gate(causal: bool, normalize: bool, segment) -> bool:
    return bool(causal) and not normalize and segment is None


def exact_gate(causal: bool, normalize: bool, segment,
               encoder_pad_mode: str, decoder_pad_mode: str) -> bool:
    return (tail_exact_gate(causal, normalize, segment)
            and encoder_pad_mode == 'constant'
            and decoder_pad_mode == 'constant')


def pad_min_samples(model) -> int:
    if (model.encoder.pad_mode == 'constant'
            and model.decoder.pad_mode == 'constant'):
        return 0
    try:
        from .streaming import StreamingCodec
        return int(StreamingCodec(model).min_first_chunk_samples)
    except Exception:   # non-streamable architecture
        return -1
