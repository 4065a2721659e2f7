from .scanner import scan_dataset, create_sample_lists, Sample  # noqa: F401
from .loader import (  # noqa: F401
    load_sample_arrays,
    CachedDataset,
    build_cached_dataset,
)
