from .plateau import EarlyStopping, ReduceLROnPlateau  # noqa: F401
from .siamese import SiameseTrainer  # noqa: F401
from .gan import GANTrainer  # noqa: F401
