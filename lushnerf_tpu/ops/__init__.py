"""Pure geometry / sampling / compositing primitives (JAX).

Each op documents the reference convention it matches (file:line refers to
the PyTorch reference at /root/reference)."""

from lushnerf_tpu.ops.encoding import PositionalEncoding, posenc
from lushnerf_tpu.ops.rays import get_rays, ndc_rays
from lushnerf_tpu.ops.se3 import exp_so3, exp_se3, se3_warp
from lushnerf_tpu.ops.sampling import linear_z_vals, stratify_z_vals, sample_pdf
from lushnerf_tpu.ops.compositing import raw2outputs
