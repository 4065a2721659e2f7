from .blocks import DoubleConv, AttentionGate  # noqa: F401
from .siamese_unet import SiameseUNet  # noqa: F401
from .pix2pix import UNetGenerator, NLayerDiscriminator  # noqa: F401
