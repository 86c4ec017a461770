"""Shared parameter semantics for every roll_* operator.

Mirrors the reference's argument contract (SURVEY.md §2.1; reference
``R/roll.R:113-114``, ``inst/include/roll_check.h``):

- ``width``     trailing window size in rows (>= 1). Expanding series =
                ``width >= n`` (the reference's degenerate case).
- ``weights``   per-slot weights aligned by LAG FROM THE CURRENT ROW:
                the newest row always gets ``weights[-1]``, the row k
                steps back gets ``weights[-1-k]`` (reference offline
                kernels read ``arma_weights[n - count - 1]``,
                ``roll_vec.h:556``). May be longer than ``width``; only
                the last ``width`` entries can ever be touched.
- ``min_obs``   minimum non-missing observations in the window, else
                the output is NULL. Defaults to ``width`` (complete
                windows); ``min_obs=1`` gives partial/expanding output.
- ``complete_obs``  for multi-column ops: exclude a row from EVERY
                column's window when ANY input column is missing
                (reference ``src/roll.cpp:103-125``).
- ``na_restore``    if True, the output at a missing input position is
                NULL regardless of window state (reference passthrough
                ``roll_vec.h:497-501``).
- ``online``    algorithm hint. The Spark engine picks the physical
                strategy itself (Catalyst WindowExec for equal weights,
                Arrow kernels otherwise); ``online`` is honoured inside
                the Arrow path the same way the reference honours it:
                equal/exponential weights -> O(1)-per-row recursion,
                arbitrary weights -> offline recompute.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

EPS = float(np.finfo(np.float64).eps)  # arma::datum::eps
SQRT_EPS = float(np.sqrt(np.finfo(np.float64).eps))


def classify_weights(weights: np.ndarray | None) -> str:
    """Classify a weights vector: 'equal' | 'exponential' | 'arbitrary'.

    Port of the reference's lambda detection (``roll_check.h:50-94``):
    equal weights or a constant successive ratio admit the O(1)
    online recursion; anything else falls back to offline recompute.
    """
    if weights is None:
        return "equal"
    w = np.asarray(weights, dtype=np.float64)
    if w.size == 0:
        return "equal"
    if np.any(w <= 0):
        return "arbitrary"
    if np.allclose(w, w[-1]):
        return "equal" if np.isclose(w[-1], 1.0) else "exponential"
    if w.size == 1:
        return "exponential"
    ratios = w[:-1] / w[1:]
    if np.allclose(ratios, ratios[0]):
        return "exponential"
    return "arbitrary"


@dataclass(frozen=True)
class RollSpec:
    """One operator invocation's shared parameters."""

    width: int
    weights: tuple[float, ...] | None = None
    min_obs: int | None = None  # None -> width
    complete_obs: bool = False
    na_restore: bool = False
    online: bool = True
    center: bool = True
    scale: bool = False
    p: float = 0.5  # quantile only
    # skew guard for the Arrow path: series longer than this are split
    # into overlap-padded chunks (operators.chunked) so one giant
    # conversation cannot pin a single task; None = one task per series
    max_group_rows: int | None = None
    extra: dict = field(default_factory=dict, compare=False)

    def __post_init__(self) -> None:
        if self.width < 1:
            raise ValueError("width must be a positive integer")
        if self.max_group_rows is not None and self.max_group_rows <= self.width:
            raise ValueError("max_group_rows must exceed width")
        if self.min_obs is not None and self.min_obs < 1:
            raise ValueError("min_obs must be a positive integer")
        if not (0.0 <= self.p <= 1.0):
            raise ValueError("p must be in [0, 1]")
        if self.weights is not None:
            w = np.asarray(self.weights, dtype=np.float64)
            if w.size < self.width:
                raise ValueError(
                    f"weights must have length >= width ({w.size} < {self.width})"
                )

    @property
    def effective_min_obs(self) -> int:
        return self.width if self.min_obs is None else self.min_obs

    def weight_array(self) -> np.ndarray:
        """The last ``width`` weights, oldest-slot-first (slot width-1 = newest)."""
        if self.weights is None:
            return np.ones(self.width, dtype=np.float64)
        return np.asarray(self.weights, dtype=np.float64)[-self.width :]

    @property
    def weight_kind(self) -> str:
        return classify_weights(
            None if self.weights is None else np.asarray(self.weights)
        )

    @property
    def is_equal_weight(self) -> bool:
        return self.weight_kind == "equal"
