"""Image kernels U1–U6: beam analysis as pure-numpy functions wrapped
in Arrow-batched ``mapInPandas`` plumbing.

Reference (cited per function): the beam-analysis math of
src/processstep_calc_beam_flux_and_transmissions.py:24-145 (coverage
ellipse), src/processstep_determine_beam_center.py:52-63 (weighted
centroid), src/utilities.py:112-175 (image prep + main-feature
labeling), src/processstep_make_beam_mask.py:27-35 (circular mask).

scikit-image is not available here, so the morphological pieces
(connected components, small-object removal) are implemented directly
in numpy — same semantics (4-connectivity, size thresholds), no
external deps. Everything is per-image and embarrassingly parallel:
Spark sees one row per image, Arrow moves the pixel arrays in columnar
batches, and each task processes its partition's images with zero
shuffle.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

EIGER_MAX_VALID = 2.0e7


# ---------------------------------------------------------------------------
# U6/P1/P2/F5 — image preparation
# ---------------------------------------------------------------------------
def prepare_eiger_image(arr: np.ndarray) -> np.ndarray:
    """F5+P1 — zero invalid pixels (outside [0, 2e7]) then reduce any
    extra leading dimensions by mean → guaranteed 2-D float image
    (src/utilities.py:112-134)."""
    img = np.asarray(arr, dtype="float64")
    img = np.where((img >= 0) & (img <= EIGER_MAX_VALID), img, 0.0)
    while img.ndim > 2:
        img = img.mean(axis=0)
    return img


# ---------------------------------------------------------------------------
# U1 — main-feature labeling (numpy connected components)
# ---------------------------------------------------------------------------
def _label_4conn(binary: np.ndarray) -> tuple[np.ndarray, int]:
    """Two-pass union-find connected-components labeling,
    4-connectivity (replaces skimage.measure.label)."""
    h, w = binary.shape
    labels = np.zeros((h, w), dtype=np.int64)
    parent = [0]  # parent[0] unused sentinel

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nxt = 1
    for i in range(h):
        for j in range(w):
            if not binary[i, j]:
                continue
            up = labels[i - 1, j] if i > 0 else 0
            left = labels[i, j - 1] if j > 0 else 0
            if up == 0 and left == 0:
                parent.append(nxt)
                labels[i, j] = nxt
                nxt += 1
            elif up and left:
                ru, rl = find(up), find(left)
                labels[i, j] = min(ru, rl)
                parent[max(ru, rl)] = min(ru, rl)
            else:
                labels[i, j] = up or left
    # second pass: resolve + compact
    remap: dict[int, int] = {}
    out = np.zeros_like(labels)
    for i in range(h):
        for j in range(w):
            if labels[i, j]:
                r = find(labels[i, j])
                if r not in remap:
                    remap[r] = len(remap) + 1
                out[i, j] = remap[r]
    return out, len(remap)


def label_main_feature(img: np.ndarray, min_size: int = 20) -> np.ndarray:
    """U1 — boolean mask of the dominant beam feature
    (src/utilities.py:137-175): threshold at max(1, mean), drop
    connected components smaller than ``min_size``, keep the largest
    remaining component. Raises if nothing survives (the reference
    errors on 0 features, :173)."""
    threshold = max(1.0, float(img.mean()))
    binary = img > threshold
    labels, n = _label_4conn(binary)
    if n == 0:
        raise ValueError("no feature found above threshold")
    sizes = np.bincount(labels.ravel())[1:]  # skip background
    keep = np.flatnonzero(sizes >= min_size) + 1
    if keep.size == 0:
        raise ValueError(f"no feature of at least {min_size} px")
    largest = keep[np.argmax(sizes[keep - 1])]
    return labels == largest


# ---------------------------------------------------------------------------
# U2/A8 — weighted centroid & moments
# ---------------------------------------------------------------------------
def weighted_centroid(img: np.ndarray,
                      mask: np.ndarray | None = None) -> tuple[float, float]:
    """U2 — intensity-weighted center of mass (row, col), optionally
    restricted to a mask (src/processstep_determine_beam_center.py:52-63)."""
    w = img if mask is None else np.where(mask, img, 0.0)
    total = w.sum()
    if total <= 0:
        raise ValueError("zero total intensity")
    rows, cols = np.indices(img.shape)
    return float((rows * w).sum() / total), float((cols * w).sum() / total)


def weighted_covariance(img: np.ndarray) -> tuple[float, float, np.ndarray]:
    """A8 — weighted central second moments → 2x2 covariance matrix
    (src/processstep_calc_beam_flux_and_transmissions.py:43-81)."""
    cy, cx = weighted_centroid(img)
    w = img / img.sum()
    rows, cols = np.indices(img.shape)
    dy, dx = rows - cy, cols - cx
    cov = np.array([
        [(w * dy * dy).sum(), (w * dy * dx).sum()],
        [(w * dy * dx).sum(), (w * dx * dx).sum()],
    ])
    return cy, cx, cov


def beam_shape(cov: np.ndarray) -> tuple[float, float, float]:
    """U4 — (sigma_minor, sigma_major, theta) from the covariance
    eigendecomposition, closed-form for 2x2
    (src/processstep_calc_beam_shape_info.py:31-103)."""
    a, b, c = cov[0, 0], cov[0, 1], cov[1, 1]
    tr, det = a + c, a * c - b * b
    disc = math.sqrt(max(tr * tr / 4 - det, 0.0))
    l1, l2 = tr / 2 + disc, tr / 2 - disc  # l1 >= l2
    theta = 0.5 * math.atan2(2 * b, a - c)
    return math.sqrt(max(l2, 0.0)), math.sqrt(max(l1, 0.0)), theta


# ---------------------------------------------------------------------------
# U3 — coverage-ellipse beam analysis
# ---------------------------------------------------------------------------
def coverage_ellipse_mask(img: np.ndarray, k: float) -> np.ndarray:
    """k·σ Mahalanobis ellipse mask around the weighted centroid."""
    cy, cx, cov = weighted_covariance(img)
    inv = np.linalg.inv(cov + 1e-12 * np.eye(2))
    rows, cols = np.indices(img.shape)
    dy, dx = rows - cy, cols - cx
    d2 = inv[0, 0] * dy * dy + 2 * inv[0, 1] * dy * dx + inv[1, 1] * dx * dx
    return d2 <= k * k


def dynamic_beam_analysis(img: np.ndarray, *, coverage: float = 0.997,
                          k_lo: float = 0.5, k_hi: float = 5.0,
                          steps: int = 8) -> dict:
    """U3 — bisection-refined coverage ellipse
    (src/processstep_calc_beam_flux_and_transmissions.py:24-145): find k
    in [0.5, 5] (8 bisection steps) such that the k·σ ellipse contains
    ``coverage`` of total intensity; return centroid, shape, mask and
    intensity stats."""
    total = float(img.sum())
    if total <= 0:
        raise ValueError("zero total intensity")
    cy, cx, cov = weighted_covariance(img)
    lo, hi = k_lo, k_hi
    mask = coverage_ellipse_mask(img, hi)
    for _ in range(steps):
        mid = (lo + hi) / 2
        mask = coverage_ellipse_mask(img, mid)
        if float(img[mask].sum()) / total >= coverage:
            hi = mid
        else:
            lo = mid
    mask = coverage_ellipse_mask(img, hi)
    sig_minor, sig_major, theta = beam_shape(cov)
    region = float(img[mask].sum())
    return {
        "com_y": cy, "com_x": cx,
        "sigma_minor": sig_minor, "sigma_major": sig_major, "theta": theta,
        "region_intensity": region, "total_intensity": total,
        "achieved_coverage": region / total, "k": hi, "mask": mask,
    }


# ---------------------------------------------------------------------------
# U5/P12 — circular mask
# ---------------------------------------------------------------------------
def circular_mask(shape: tuple[int, int], center: tuple[float, float],
                  radius: float) -> np.ndarray:
    """Boolean disk of ``radius`` at ``center`` over ``shape``
    (src/processstep_make_beam_mask.py:27-35)."""
    rows, cols = np.indices(shape)
    dy, dx = rows - center[0], cols - center[1]
    return dy * dy + dx * dx <= radius * radius


# ---------------------------------------------------------------------------
# Spark plumbing: one row per image in, one row of beam stats out.
# ---------------------------------------------------------------------------
BEAM_STATS_SCHEMA = T.StructType([
    T.StructField("batch", T.LongType()),
    T.StructField("repetition", T.IntegerType()),
    T.StructField("com_y", T.DoubleType()),
    T.StructField("com_x", T.DoubleType()),
    T.StructField("sigma_minor", T.DoubleType()),
    T.StructField("sigma_major", T.DoubleType()),
    T.StructField("theta", T.DoubleType()),
    T.StructField("region_intensity", T.DoubleType()),
    T.StructField("total_intensity", T.DoubleType()),
    T.StructField("achieved_coverage", T.DoubleType()),
])


def beam_analysis(images: DataFrame, *, image_col: str = "image",
                  height_col: str = "height",
                  width_col: str = "width") -> DataFrame:
    """Run U3 over a DataFrame of flattened images.

    Input: (batch, repetition, image: array<double> row-major, height,
    width). Arrow moves pixel batches columnar; each task loops its
    partition's images in numpy — no shuffle, scales linearly with
    image count.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rec in pdf.itertuples(index=False):
                img = np.asarray(
                    getattr(rec, image_col), dtype="float64").reshape(
                        int(getattr(rec, height_col)),
                        int(getattr(rec, width_col)))
                img = prepare_eiger_image(img)
                try:
                    r = dynamic_beam_analysis(img)
                except ValueError:
                    continue  # zero-intensity images are quarantined upstream
                out.append({
                    "batch": rec.batch, "repetition": rec.repetition,
                    "com_y": r["com_y"], "com_x": r["com_x"],
                    "sigma_minor": r["sigma_minor"],
                    "sigma_major": r["sigma_major"], "theta": r["theta"],
                    "region_intensity": r["region_intensity"],
                    "total_intensity": r["total_intensity"],
                    "achieved_coverage": r["achieved_coverage"],
                })
            yield pd.DataFrame(
                out, columns=[f.name for f in BEAM_STATS_SCHEMA])

    cols = ["batch", "repetition", image_col, height_col, width_col]
    return images.select(*cols).mapInPandas(run, BEAM_STATS_SCHEMA)
