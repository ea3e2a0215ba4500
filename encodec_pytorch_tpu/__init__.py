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
