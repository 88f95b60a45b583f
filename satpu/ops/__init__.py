from . import fbank as _fbank_mod  # noqa: F401
from . import cmvn  # noqa: F401
from . import mel  # noqa: F401
from .fbank import fbank, mel_banks, num_frames  # noqa: F401
from .cmvn import global_cmvn, utt_cmvn, utt_cmvn_keep_zeros  # noqa: F401
from .mel import librosa_mel_basis, mel_spectrogram  # noqa: F401
from . import yaapt as yaapt_mod  # noqa: F401
from .yaapt import yaapt  # noqa: F401
