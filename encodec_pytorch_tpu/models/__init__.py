"""Model families: SEANet codec nets, EnCodec assembly, MS-STFT discriminator,
streaming-transformer entropy LM."""

from .seanet import SEANetEncoder, SEANetDecoder, SEANetResnetBlock  # noqa: F401
