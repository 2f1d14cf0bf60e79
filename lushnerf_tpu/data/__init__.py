"""Host-side data layer: LLFF loading, low-light preprocessing, frequency
masks, and ray-dataset construction (numpy; feeds the jitted train step)."""

from lushnerf_tpu.data.llff import load_llff_data
from lushnerf_tpu.data.freq_mask import frequency_mask, get_masks_for_images
from lushnerf_tpu.data.rays import build_ray_dataset, RayDataset
