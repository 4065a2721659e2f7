from .resize import (  # noqa: F401
    resize_bilinear,
    resize_nearest,
    upsample2x_align_corners,
)
