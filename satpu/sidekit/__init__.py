from . import archi  # noqa: F401
from . import loss  # noqa: F401
from . import nn  # noqa: F401
from . import pooling  # noqa: F401
from . import preprocessor  # noqa: F401
from . import scoring  # noqa: F401
from . import xvector  # noqa: F401
from .xvector import EcapaXVector, ResNetXVector, XVectorConfig, build_xvector  # noqa: F401
from . import dataset  # noqa: F401
from . import trainer  # noqa: F401
