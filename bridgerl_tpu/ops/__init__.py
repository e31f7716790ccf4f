from .codebook import (
    assignment_stats,
    get_nearest_codes_backend,
    nearest_codes,
    nearest_codes_xla,
    quantize_lookup,
    set_nearest_codes_backend,
)
from .quantizers import (
    FSQ,
    LFQ,
    HybridVQ,
    IdentityVQ,
    ResidualVQ,
    VectorQuantizer,
    dcr_from_counts,
    make_quantizer,
    perplexity_from_counts,
    ste,
    unique_count,
)
