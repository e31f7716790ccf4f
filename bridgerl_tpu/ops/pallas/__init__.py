from .vq_kernel import (
    nearest_codes_auto,
    nearest_codes_pallas,
    use_pallas_backend,
    use_xla_backend,
)
