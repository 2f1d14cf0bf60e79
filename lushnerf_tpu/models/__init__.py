"""Model families: NeRF scene MLPs, SND noise MLP, RBK blur kernel, tonemap,
and the composed LuSh-NeRF model."""

from lushnerf_tpu.models.mlp import MLPConfig, init_nerf_mlp, apply_nerf_mlp
from lushnerf_tpu.models.rbk import RBKConfig, init_rbk, apply_rbk, rbk_weighted_sum
from lushnerf_tpu.models.tonemap import init_tonemap, apply_tonemap
