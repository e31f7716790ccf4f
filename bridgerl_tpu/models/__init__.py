from .dual_vqvae import DualMotionVQVAE, init_model
from .token_prior import (
    MotionTokenPrior,
    PriorConfig,
    codes_to_grid,
    grid_to_codes,
    prior_loss,
    sample_grids,
)
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
