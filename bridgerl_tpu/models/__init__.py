from .dual_vqvae import DualMotionVQVAE, init_model
from .layers import (
    ConvDecoder,
    ConvEncoder,
    NoDownsampleDecoder,
    NoDownsampleEncoder,
    PositionalEncoding,
    ResBlock1D,
    TransformerBlock,
    TransformerMotionDecoder,
    TransformerMotionEncoder,
    sinusoidal_pe,
)
