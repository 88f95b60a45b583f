from . import tdnnf  # noqa: F401
from . import asrbn  # noqa: F401
from . import hifigan  # noqa: F401
from . import anonymizer  # noqa: F401
from . import convert  # noqa: F401
from .asrbn import TDNNFNet, TDNNFNetConfig  # noqa: F401
from .anonymizer import AnonymizationNet, AnonymizerConfig  # noqa: F401
from .hifigan import CoreHifiGan, CoreHifiGanConfig  # noqa: F401
