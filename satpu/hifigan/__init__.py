from . import trainer  # noqa: F401
from .trainer import (GanTrainState, init_gan_state, make_gan_eval_step,  # noqa: F401
                      make_gan_train_step, restore_gan_state)
