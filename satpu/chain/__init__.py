from . import fst  # noqa: F401
from . import objf  # noqa: F401
from . import trainer  # noqa: F401
from . import dataset  # noqa: F401
from .objf import DenominatorGraph, chain_objf_and_grad, compute_chain_objf  # noqa: F401
from .trainer import (  # noqa: F401
    ChainTrainOpts,
    ChainTrainState,
    init_chain_state,
    make_chain_optimizer,
    make_chain_train_step,
)
