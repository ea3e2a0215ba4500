"""encodec_pytorch_tpu — a TPU-native (JAX/XLA/Pallas) neural audio codec framework.

A from-scratch rebuild of the capabilities of the reference PyTorch EnCodec
trainer (Madhudorai/encodec-pytorch): SEANet encoder/decoder with an LSTM
bottleneck, residual vector quantization with EMA codebooks, an MS-STFT GAN
discriminator with a gradient-balancing loss combiner, data-parallel training
over a `jax.sharding.Mesh`, and a byte-compatible `.ecdc` arithmetic-coded
bitstream.

Design stance (see SURVEY.md §7): pure-functional models (flax.linen for the
neural nets, explicit state pytrees for the quantizer), a single jitted SPMD
train step, static shapes everywhere on the device path, and host-side layers
for data/bitstream/eval.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (keeps `import encodec_pytorch_tpu` light)."""
    import importlib
    if name in ('EncodecModel', 'MODELS', 'encodec_model_24khz',
                'encodec_model_48khz', 'my_encodec_model', 'encodec_model_bw'):
        return getattr(importlib.import_module('.models', __name__), name)
    if name == 'compress':
        # the submodule itself (functions live on it: compress.compress, ...)
        return importlib.import_module('.compress', __name__)
    if name in ('decompress', 'compress_to_file', 'decompress_from_file'):
        return getattr(importlib.import_module('.compress', __name__), name)
    if name == 'load_config':
        return importlib.import_module('.config', __name__).load_config
    if name in ('DeployedCodec', 'save_artifact'):
        return getattr(importlib.import_module('.deploy', __name__), name)
    if name in ('CodecServer', 'LiveCodec', 'StreamingServer'):
        return getattr(importlib.import_module('.serve', __name__), name)
    raise AttributeError(name)
