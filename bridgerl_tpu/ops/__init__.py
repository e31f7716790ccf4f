from .code_decode import (
    code_vocab_sizes,
    decode_codes,
    denormalize_codes,
    fsq_codes_to_values,
    fsq_index_range,
    lfq_codes_to_signs,
    normalize_codes,
)
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
