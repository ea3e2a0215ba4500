"""Model families: SEANet codec nets, EnCodec assembly, MS-STFT discriminator,
streaming-transformer entropy LM."""

from .seanet import SEANetEncoder, SEANetDecoder, SEANetResnetBlock  # noqa: F401
from .model import (  # noqa: F401
    EncodecModel,
    MODELS,
    encodec_model_24khz,
    encodec_model_48khz,
    encodec_model_bw,
    my_encodec_model,
    variables_from_torch_state_dict,
)
from .msstftd import MultiScaleSTFTDiscriminator, DiscriminatorSTFT  # noqa: F401
