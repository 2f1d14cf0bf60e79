"""Matcher interface + correspondence tables for the CTE loss.

Reference behavior (run_lushnerf.py:291-292, 745-774): every 20k iters the
frozen DKMv3 matcher is run over every ordered pair of *rendered* training
views at 640x1120; per pair it stores, for every pixel column of the first
W columns, the matched keypoints of both views (`Align_Matrix[k, v, :, :4]
= [x0, y0, x1, y1]`) and a certainty (`Align_Mask`, bool-degenerate quirk
documented in SURVEY.md).  The full f32 tensor is ~9.7 GB GPU-resident.

TPU-native design: tables live HOST-side as numpy (the per-iteration
consistency pass samples only 32 columns, run_lushnerf.py:963); each step
uploads just the [V, n_pix, 4] gathered slice.  The matcher itself is
pluggable:

  * `PrecomputedMatcher` — tables from an .npz (offline matching; valid
    because the matcher is frozen, SURVEY.md §2.2 plan)
  * `lushnerf_tpu.matcher.dkm.DKMMatcher` — the JAX DKMv3 port
"""

from __future__ import annotations

import dataclasses
from typing import Protocol, Tuple

import numpy as np


@dataclasses.dataclass
class MatchTables:
    """Dense correspondences between all ordered train-view pairs.

    kpts: [V, V, P, 4] float32 — (x0, y0, x1, y1) per column, pixel coords.
    certainty: [V, V, P] float32.
    The reference's P is H*W of the match resolution; P here is whatever
    the matcher produced (columns are sampled uniformly at train time
    either way).
    """

    kpts: np.ndarray
    certainty: np.ndarray

    @property
    def num_views(self) -> int:
        return self.kpts.shape[0]

    @property
    def num_columns(self) -> int:
        return self.kpts.shape[2]

    def sample_anchor(self, rng: np.random.Generator, n_pix: int):
        """Pick a random anchor view + n_pix random columns; return the
        per-view matched pixel coords and certainties
        (Render_Aligned_Pixel, models/lushnerf.py:959-967)."""
        anchor = int(rng.integers(0, self.num_views))
        cols = rng.integers(0, self.num_columns, size=n_pix)
        kp = self.kpts[anchor][:, cols]  # [V, n_pix, 4]
        cert = self.certainty[anchor][:, cols]  # [V, n_pix]
        # pixel coords in each target view are the second keypoint pair
        return anchor, kp[..., 2:4], cert

    def save(self, path):
        np.savez_compressed(path, kpts=self.kpts, certainty=self.certainty)

    @classmethod
    def load(cls, path) -> "MatchTables":
        z = np.load(path)
        return cls(kpts=z["kpts"].astype(np.float32), certainty=z["certainty"].astype(np.float32))

    @classmethod
    def zeros(cls, num_views: int, num_columns: int) -> "MatchTables":
        """Empty tables (the reference starts from zeros and fills at the
        first rematch; zeros give zero certainty => zero loss)."""
        return cls(
            kpts=np.zeros((num_views, num_views, num_columns, 4), np.float32),
            certainty=np.zeros((num_views, num_views, num_columns), np.float32),
        )


class Matcher(Protocol):
    def match(self, img0: np.ndarray, img1: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """img: [H, W, 3] float32 in [0,1].  Returns (kpts0 [P,2],
        kpts1 [P,2], certainty [P]) in pixel coordinates."""
        ...


@dataclasses.dataclass
class GridStubMatcher:
    """Identity-grid matcher for dry runs and scale tests (config
    `matcher = stub`).

    Returns a uniform pixel grid matched to the SAME coordinates in the
    other view with constant certainty.  For small-baseline forward-facing
    bursts this approximates the true correspondence (parallax of a few
    pixels), so the CTE loss becomes a mild cross-view color-consistency
    prior — enough to exercise the full consist/rematch machinery at
    scale without pretrained DKM weights.  Deterministic and
    content-independent, hence trivially identical across hosts."""

    n_points: int = 256
    certainty: float = 0.9

    def match(self, img0, img1):
        h, w = img0.shape[:2]
        g = int(np.ceil(np.sqrt(self.n_points)))
        xs = (np.arange(g) + 0.5) * w / g
        ys = (np.arange(g) + 0.5) * h / g
        gx, gy = np.meshgrid(xs, ys)
        k0 = np.stack([gx.ravel(), gy.ravel()], -1)[: self.n_points].astype(np.float32)
        return k0, k0.copy(), np.full(self.n_points, self.certainty, np.float32)


@dataclasses.dataclass
class PrecomputedMatcher:
    """Serves matches from precomputed tables (frozen-matcher semantics)."""

    tables: MatchTables
    _k: int = 0
    _v: int = 0

    def match(self, img0, img1):
        raise NotImplementedError(
            "PrecomputedMatcher serves whole tables; use .tables directly"
        )


def match_pairs(matcher: Matcher, images: np.ndarray, pairs):
    """Run the matcher over an explicit list of ordered (k, v) view pairs.

    Returns (kpts [n_pairs, P, 4], certainty [n_pairs, P]).  This is the
    work unit for striping a rematch across processes: each host matches
    its subset of the V*V pairs and the results are allgathered back into
    full [V, V, ...] tables (trainer.rematch)."""
    first = None
    kpts_l, cert_l = [], []
    for (k, v) in pairs:
        k0, k1, c = matcher.match(images[k], images[v])
        if first is None:
            first = len(c)
        elif len(c) != first:
            # a fixed-resolution matcher (DKM) always returns the same
            # count; anything else would silently index-misalign the
            # [V, V, P] tables, so fail loudly
            raise ValueError(
                f"matcher returned {len(c)} columns for pair ({k},{v}), "
                f"expected {first} (all pairs must match in column count)"
            )
        kpts_l.append(np.concatenate([k0, k1], -1))
        cert_l.append(c)
    return (
        np.stack(kpts_l).astype(np.float32),
        np.stack(cert_l).astype(np.float32),
    )


def build_match_tables(matcher: Matcher, images: np.ndarray) -> MatchTables:
    """Run the matcher over every ordered view pair (the reference's
    rematch pass, run_lushnerf.py:747-774).  Single-process path; the
    trainer stripes the pair loop across hosts via match_pairs."""
    V = images.shape[0]
    pairs = [(k, v) for k in range(V) for v in range(V)]
    kpts, cert = match_pairs(matcher, images, pairs)
    P = kpts.shape[1]
    return MatchTables(
        kpts=kpts.reshape(V, V, P, 4),
        certainty=cert.reshape(V, V, P),
    )
