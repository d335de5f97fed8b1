"""Utilities: configuration, profiling/metrics, load separation, native
host kernels."""

from pgdrome_tpu.utils.pgd_config import PGDConfig
from pgdrome_tpu.utils.profiling import trace, EnrichmentMetrics
from pgdrome_tpu.utils.separation import separate, separate_rank1, separation_error
from pgdrome_tpu.utils import native

__all__ = [
    "PGDConfig",
    "trace",
    "EnrichmentMetrics",
    "separate",
    "separate_rank1",
    "separation_error",
    "native",
]
