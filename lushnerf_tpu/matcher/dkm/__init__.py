"""JAX port of the DKMv3 dense matcher (frozen, inference-only).

The reference uses GIM's DKMv3 (gim/dkm/models/model_zoo/DKMv3.py) to
produce dense correspondences for the CTE loss.  This package reimplements
the exercised inference path in JAX:

  * ResNet50 feature pyramid (resnet.py)
  * GP coarse flow regression + DFN decoding + ConvRefiners (blocks.py)
  * coarse-to-fine Decoder + symmetric RegressionMatcher.match (matcher.py)

Weights convert directly from the torch checkpoint (`gim_dkm_100h.ckpt`)
via `convert.from_torch_state_dict`; parameters are stored under their
torch state-dict names so conversion is a dtype cast.
"""

from lushnerf_tpu.matcher.dkm.matcher import DKMMatcher, dkm_match
