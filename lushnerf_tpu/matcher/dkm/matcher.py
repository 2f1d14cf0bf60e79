"""DKMv3 coarse-to-fine Decoder + symmetric RegressionMatcher.match.

Mirrors Decoder.forward (DKMv3.py:979-1059) with the shipped config
(scales 32..1, GP+DFN at {32,16}, ConvRefiner at {16,8,4,2,1}, proj at
{32,16}, detach=True) and RegressionMatcher.match (:1218-1308) with
symmetric matching and the (640, 1120) two-pass upsample scheme used by
LuSh (run_lushnerf.py:349).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lushnerf_tpu.matcher.dkm.blocks import (
    REFINER_CFG,
    conv_refiner_forward,
    dfn_forward,
    gp_forward,
)
from lushnerf_tpu.matcher.dkm.nn import conv2d, interpolate_bilinear, meshgrid_coords
from lushnerf_tpu.matcher.dkm.resnet import resnet50_pyramid

DFN_DIM = 384
COARSE_SCALES = (32, 16)


def decoder_forward(
    params,
    f1: Dict[int, jnp.ndarray],
    f2: Dict[int, jnp.ndarray],
    upsample: bool = False,
    dense_flow: Optional[jnp.ndarray] = None,
    dense_certainty: Optional[jnp.ndarray] = None,
):
    """Coarse-to-fine flow estimation over the pyramid."""
    all_scales = ["32", "16", "8", "4", "2", "1"] if not upsample else ["8", "4", "2", "1"]
    sizes = {s: f1[s].shape[-2:] for s in f1}
    h, w = sizes[1]
    b = f1[1].shape[0]
    coarsest = int(all_scales[0])

    old_stuff = jnp.zeros((b, DFN_DIM, *sizes[coarsest]), f1[coarsest].dtype)
    if not upsample:
        coords = meshgrid_coords(*sizes[coarsest])
        dense_flow = jnp.broadcast_to(
            jnp.transpose(coords, (2, 0, 1))[None], (b, 2, *sizes[coarsest])
        )
        dense_certainty = 0.0
    else:
        dense_flow = interpolate_bilinear(dense_flow, sizes[coarsest])
        dense_certainty = interpolate_bilinear(dense_certainty, sizes[coarsest])

    dense_corresps: Dict[int, Dict[str, jnp.ndarray]] = {}
    for scale in all_scales:
        ins = int(scale)
        f1_s, f2_s = f1[ins], f2[ins]
        if scale in ("16", "32"):
            f1_s = conv2d(params, f"decoder.proj.{scale}", f1_s)
            f2_s = conv2d(params, f"decoder.proj.{scale}", f2_s)

        if ins in COARSE_SCALES:
            old_stuff = interpolate_bilinear(old_stuff, sizes[ins])
            new_stuff = gp_forward(params, f"decoder.gps.{scale}", f1_s, f2_s)
            dense_flow, dense_certainty, old_stuff = dfn_forward(
                params, "decoder.embedding_decoder", new_stuff, f1_s, old_stuff, scale
            )

        if scale in REFINER_CFG:
            delta_certainty, displacement = conv_refiner_forward(
                params, f"decoder.conv_refiner.{scale}", f1_s, f2_s, dense_flow, scale
            )
            dense_flow = jnp.stack(
                (
                    dense_flow[:, 0] + ins * displacement[:, 0] / (4 * w),
                    dense_flow[:, 1] + ins * displacement[:, 1] / (4 * h),
                ),
                axis=1,
            )
            dense_certainty = dense_certainty + delta_certainty

        dense_corresps[ins] = {
            "dense_flow": dense_flow,
            "dense_certainty": dense_certainty,
        }
        if scale != "1":
            dense_flow = interpolate_bilinear(dense_flow, sizes[ins // 2])
            dense_certainty = interpolate_bilinear(dense_certainty, sizes[ins // 2])
            # detach=True (inference graphs are already grad-free)
            dense_flow = jax.lax.stop_gradient(dense_flow)
            dense_certainty = jax.lax.stop_gradient(dense_certainty)
    return dense_corresps


def _forward_symmetric(params, query, support, upsample=False, corresps=None):
    """forward_symmetric (DKMv3.py:1203-1211): one encoder pass over the
    concatenated batch, support pyramid with swapped halves."""
    X = jnp.concatenate([query, support], axis=0)
    pyramid = resnet50_pyramid(params, X)
    f_q = pyramid
    f_s = {
        s: jnp.concatenate(
            [f[f.shape[0] // 2 :], f[: f.shape[0] // 2]], axis=0
        )
        for s, f in pyramid.items()
    }
    kwargs = {}
    if corresps is not None:
        kwargs = dict(
            dense_flow=corresps["dense_flow"],
            dense_certainty=corresps["dense_certainty"],
        )
    return decoder_forward(params, f_q, f_s, upsample=upsample, **kwargs)


def dkm_match_from_pyramids(params, pyr_q, pyr_s):
    """Single-direction (query -> support) two-pass match for a batch of
    B pairs whose encoder pyramids are PRECOMPUTED.

    pyr_q / pyr_s: {stride: [B, C, h, w]} feature pyramids of the query /
    support view of each pair.  Returns (flow [B, hs, ws, 2] in [-1, 1],
    certainty [B, hs, ws]).

    Equivalence to the reference's symmetric match(): the decoder has no
    cross-batch coupling (convs / frozen BN / per-image GP solve), so the
    query half of the symmetric batch computes exactly this.  LuSh keeps
    ONLY that half (run_lushnerf.py:757-770 reads the first W columns) and
    matches every ORDERED pair anyway, so the support direction of pair
    (k, v) is recomputed as the query direction of pair (v, k) — running
    one direction per ordered pair halves the decoder work with identical
    consumed outputs.  Caching per-view pyramids further replaces the
    1,682 per-rematch ResNet passes of the pairwise path with V
    (VERDICT r3 weak #4 / next #4).
    """
    hs, ws = pyr_q[1].shape[-2:]
    corresps = decoder_forward(params, pyr_q, pyr_s)

    low_res_certainty = interpolate_bilinear(corresps[16]["dense_certainty"], (hs, ws))
    low_res_certainty = 0.5 * low_res_certainty * (low_res_certainty < 0)

    corresps = decoder_forward(
        params, pyr_q, pyr_s, upsample=True,
        dense_flow=corresps[1]["dense_flow"],
        dense_certainty=corresps[1]["dense_certainty"],
    )

    flow = jnp.transpose(corresps[1]["dense_flow"], (0, 2, 3, 1))  # [B, hs, ws, 2]
    certainty = corresps[1]["dense_certainty"] - low_res_certainty
    certainty = jax.nn.sigmoid(certainty)[:, 0]
    wrong = jnp.sum((jnp.abs(flow) > 1).astype(jnp.int32), axis=-1) > 0
    certainty = jnp.where(wrong, 0.0, certainty)
    flow = jnp.clip(flow, -1, 1)
    return flow, certainty


def dkm_match(params, im0: jnp.ndarray, im1: jnp.ndarray, hs: int = 640, ws: int = 1120):
    """RegressionMatcher.match (symmetric, upsample_preds) for one pair.

    im0, im1: [3, H, W] float in [0,1] (no ImageNet normalization — the
    reference's match() path feeds raw tensors to the encoder).
    Returns (warp [hs, 2*ws, 4], certainty [hs, 2*ws]).
    """
    query = interpolate_bilinear(im0[None], (hs, ws))
    support = interpolate_bilinear(im1[None], (hs, ws))

    corresps = _forward_symmetric(params, query, support)

    low_res_certainty = interpolate_bilinear(corresps[16]["dense_certainty"], (hs, ws))
    # factor * cert * (cert < cert_clamp=0): only negative low-res logits
    # subtract (DKMv3.py:1258-1262)
    low_res_certainty = 0.5 * low_res_certainty * (low_res_certainty < 0)

    # second (upsample) pass at the target resolution, seeded by the finest
    # flow of the first pass (:1264-1271)
    corresps = _forward_symmetric(
        params, query, support, upsample=True, corresps=corresps[1]
    )

    query_to_support = jnp.transpose(corresps[1]["dense_flow"], (0, 2, 3, 1))
    dense_certainty = corresps[1]["dense_certainty"] - low_res_certainty

    coords = meshgrid_coords(hs, ws)
    query_coords = jnp.broadcast_to(coords[None], (2, hs, ws, 2))
    dense_certainty = jax.nn.sigmoid(dense_certainty)
    wrong = jnp.sum((jnp.abs(query_to_support) > 1).astype(jnp.int32), axis=-1) > 0
    dense_certainty = jnp.where(wrong[:, None], 0.0, dense_certainty)
    query_to_support = jnp.clip(query_to_support, -1, 1)

    qts, stq = query_to_support[:1], query_to_support[1:]
    q_warp = jnp.concatenate([query_coords[:1], qts], axis=-1)
    s_warp = jnp.concatenate([stq, query_coords[:1]], axis=-1)
    warp = jnp.concatenate([q_warp, s_warp], axis=2)  # [1, hs, 2ws, 4]
    certainty = jnp.concatenate(
        [dense_certainty[:1], dense_certainty[1:]], axis=3
    )[:, 0]
    return warp[0], certainty[0]


@dataclasses.dataclass
class DKMMatcher:
    """Matcher-protocol adapter running the JAX DKMv3 port.

    max_columns: host-side column subsample per pair (the reference keeps
    all hs*ws columns in a ~10 GB device tensor; uniform subsampling
    preserves the train-time 32-column uniform draw distribution).
    """

    params: Dict[str, jnp.ndarray]
    hs: int = 640
    ws: int = 1120
    max_columns: int = 65536
    # ordered pairs per decoder launch in match_many.  2 fits a v5e's
    # 16 GiB HBM at the production (640, 1120) shape (the full-res
    # ConvRefiner activations dominate; 4 needs ~24 GiB); raise on
    # larger-HBM chips.
    pair_batch: int = 2
    # conv input precision (f32 accumulation).  bf16 is available and
    # sub-pixel-equivalent (tests/test_dkm.py::test_dkm_bf16_matches_f32)
    # but measured NEUTRAL at the production shape — the decoder is
    # gather/VPU-bound (grid_sample + windowed local correlation), not
    # MXU-conv-bound — so the parity-tested f32 path stays the default.
    conv_dtype: str = "float32"
    _jitted: object = None
    _jitted_encode: object = None
    _jitted_batch: object = None

    @classmethod
    def from_pretrained(cls, ckpt_path: Optional[str] = None, **kw) -> "DKMMatcher":
        import os

        from lushnerf_tpu.matcher.dkm.convert import load_torch_checkpoint

        ckpt_path = ckpt_path or os.environ.get("LUSHNERF_DKM_CKPT")
        if not ckpt_path or not os.path.exists(ckpt_path):
            raise FileNotFoundError(
                "DKM checkpoint not found; set LUSHNERF_DKM_CKPT or pass "
                "ckpt_path (reference weights: gim_dkm_100h.ckpt)"
            )
        return cls(params=load_torch_checkpoint(ckpt_path), **kw)

    def match(self, img0: np.ndarray, img1: np.ndarray):
        if self._jitted is None:
            from lushnerf_tpu.matcher.dkm.nn import set_conv_dtype

            set_conv_dtype(self.conv_dtype)  # read at trace time
            self._jitted = jax.jit(
                lambda p, a, b: dkm_match(p, a, b, self.hs, self.ws)
            )
        a = jnp.asarray(img0.transpose(2, 0, 1), jnp.float32)
        b = jnp.asarray(img1.transpose(2, 0, 1), jnp.float32)
        warp, certainty = self._jitted(self.params, a, b)
        H, W = img0.shape[:2]
        # LuSh takes the first W columns (the query half at its image
        # width) and converts to pixel coords (run_lushnerf.py:757-770)
        matches = np.asarray(warp[:, : self.ws]).reshape(-1, 4)
        cert = np.asarray(certainty[:, : self.ws]).reshape(-1)
        kpts0 = np.stack(
            [W * (matches[:, 0] + 1) / 2, H * (matches[:, 1] + 1) / 2], -1
        )
        kpts1 = np.stack(
            [W * (matches[:, 2] + 1) / 2, H * (matches[:, 3] + 1) / 2], -1
        )
        if self.max_columns and len(cert) > self.max_columns:
            idx = np.linspace(0, len(cert) - 1, self.max_columns).astype(int)
            kpts0, kpts1, cert = kpts0[idx], kpts1[idx], cert[idx]
        return kpts0.astype(np.float32), kpts1.astype(np.float32), cert.astype(np.float32)

    # ------------------------------------------------------------------
    # cached many-pair path (the rematch fast path)
    # ------------------------------------------------------------------

    def _to_kpts(self, flow: np.ndarray, cert: np.ndarray, H: int, W: int):
        """[hs, ws, 2] flow + [hs, ws] certainty -> (kpts0, kpts1, cert)
        in the image's pixel coords, exactly as match() post-processes."""
        coords = np.asarray(meshgrid_coords(self.hs, self.ws))  # [hs, ws, 2]
        matches = np.concatenate([coords, flow], axis=-1).reshape(-1, 4)
        c = cert.reshape(-1)
        kpts0 = np.stack(
            [W * (matches[:, 0] + 1) / 2, H * (matches[:, 1] + 1) / 2], -1
        )
        kpts1 = np.stack(
            [W * (matches[:, 2] + 1) / 2, H * (matches[:, 3] + 1) / 2], -1
        )
        if self.max_columns and len(c) > self.max_columns:
            idx = np.linspace(0, len(c) - 1, self.max_columns).astype(int)
            kpts0, kpts1, c = kpts0[idx], kpts1[idx], c[idx]
        return kpts0.astype(np.float32), kpts1.astype(np.float32), c.astype(np.float32)

    def match_many(self, images: np.ndarray, pairs):
        """Match an explicit list of ordered (k, v) pairs over a view set.

        images: [V, H, W, 3] float32.  Returns (kpts [n_pairs, P, 4],
        certainty [n_pairs, P]) — the same values the per-pair match()
        loop produces for the query direction, at ~V encoder passes +
        n_pairs/pair_batch single-direction decoder launches instead of
        n_pairs full symmetric passes (see dkm_match_from_pyramids).
        """
        if self._jitted_encode is None:
            from lushnerf_tpu.matcher.dkm.nn import set_conv_dtype

            set_conv_dtype(self.conv_dtype)  # read at trace time
            self._jitted_encode = jax.jit(
                lambda p, im: resnet50_pyramid(
                    p, interpolate_bilinear(im[None], (self.hs, self.ws))
                )
            )
            self._jitted_batch = jax.jit(dkm_match_from_pyramids)

        H, W = images.shape[1:3]
        needed = sorted({k for k, v in pairs} | {v for k, v in pairs})
        pyr = {}
        for vi in needed:  # V encoder passes, cached on device
            im = jnp.asarray(images[vi].transpose(2, 0, 1), jnp.float32)
            pyr[vi] = self._jitted_encode(self.params, im)

        pb = max(1, self.pair_batch)
        kpts_l, cert_l = [], []
        for lo in range(0, len(pairs), pb):
            chunk = list(pairs[lo : lo + pb])
            n_real = len(chunk)
            while len(chunk) < pb:  # pad to the jitted batch size
                chunk.append(chunk[-1])
            pyr_q = {s: jnp.concatenate([pyr[k][s] for k, _ in chunk]) for s in pyr[chunk[0][0]]}
            pyr_s = {s: jnp.concatenate([pyr[v][s] for _, v in chunk]) for s in pyr[chunk[0][0]]}
            flow, cert = self._jitted_batch(self.params, pyr_q, pyr_s)
            flow, cert = np.asarray(flow), np.asarray(cert)
            for bi in range(n_real):
                k0, k1, c = self._to_kpts(flow[bi], cert[bi], H, W)
                kpts_l.append(np.concatenate([k0, k1], -1))
                cert_l.append(c)
        return np.stack(kpts_l), np.stack(cert_l)
