"""satpu — a TPU-native (JAX/XLA/Pallas) speaker-anonymization framework.

A from-scratch rebuild of the capabilities of deep-privacy/SA-toolkit
(reference layout documented in SURVEY.md) designed for TPU hardware:

- ``satpu.ops``     jittable DSP + compute kernels (fbank, mel, YAAPT F0, CMVN,
                    LF-MMI forward-backward, VQ) — the XLA/Pallas compute path.
- ``satpu.models``  flax.linen model zoo (TDNN-F, HiFi-GAN, ECAPA/ResNet).
- ``satpu.chain``   LF-MMI ("chain") ASR training stack.
- ``satpu.hifigan`` HiFi-GAN voice-conversion training stack.
- ``satpu.sidekit`` x-vector ASV training + privacy scoring stack.
- ``satpu.parallel`` jax.sharding mesh utilities (data/model parallel pjit).
- ``satpu.utils``   kaldi-style data-dir IO, ark/scp IO, config, checkpoints.
- ``satpu.bin``     CLI entry points (anonymize, ...).

Reference parity notes cite files in /root/reference (e.g. satools/satools/...).
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("SATPU_DEVICE", "").lower() == "cpu":
    # The axon TPU plugin ignores JAX_PLATFORMS=cpu, so SATPU_DEVICE=cpu is
    # the supported way to pin satpu CLIs to the host CPU backend (e.g. when
    # the TPU tunnel is unavailable or for deterministic f32 runs).
    import jax as _jax

    _jax.config.update("jax_default_device", _jax.devices("cpu")[0])

from . import utils  # noqa: F401
from . import ops  # noqa: F401
from . import models  # noqa: F401
from . import parallel  # noqa: F401
