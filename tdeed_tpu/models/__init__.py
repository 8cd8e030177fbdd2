from tdeed_tpu.models.tdeed import TDEED  # noqa: F401
from tdeed_tpu.models.regnet import RegNetY  # noqa: F401
from tdeed_tpu.models.sgp import EDSGPMixer, SGPBlock, SGPMixer  # noqa: F401
