from .plateau import ReduceLROnPlateau  # noqa: F401
from .siamese import SiameseTrainer  # noqa: F401
from .gan import GANTrainer  # noqa: F401
