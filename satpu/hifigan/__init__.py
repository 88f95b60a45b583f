from . import trainer  # noqa: F401
from .trainer import GanTrainState, gan_train_step, init_gan_state  # noqa: F401
