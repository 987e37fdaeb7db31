"""Robust orientation index, vectorized.

Semantics match GEOS ``CGAlgorithmsDD::orientationIndex``
(``src/algorithm/CGAlgorithmsDD.cpp:54-79``): a fast floating filter
(Ozaki et al. error bound, ``include/geos/algorithm/CGAlgorithmsDD.h:97-111``)
decides almost every lane; uncertain lanes fall back to exact
arithmetic. GEOS uses double-double; we use Python integer-exact
rationals on the (rare) fallback lanes, which yields the identical
sign (the DD path is itself exact for this determinant of
double differences).

Returns +1 (counter-clockwise / left), -1 (clockwise / right), 0
(collinear).
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np

# Ozaki et al. filter coefficient, as in the reference
_FILTER_COEFF = 3.3306690621773724e-16


def orientation_filter(
    pax, pay, pbx, pby, pcx, pcy
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized filter. Returns (index, uncertain_mask).

    index is valid where uncertain_mask is False.
    """
    pax = np.asarray(pax, dtype=np.float64)
    pay = np.asarray(pay, dtype=np.float64)
    pbx = np.asarray(pbx, dtype=np.float64)
    pby = np.asarray(pby, dtype=np.float64)
    pcx = np.asarray(pcx, dtype=np.float64)
    pcy = np.asarray(pcy, dtype=np.float64)
    detleft = (pax - pcx) * (pby - pcy)
    detright = (pay - pcy) * (pbx - pcx)
    det = detleft - detright
    err = np.abs(detleft + detright) * _FILTER_COEFF
    certain = np.abs(det) >= err
    idx = np.sign(det).astype(np.int8)
    return idx, ~certain


def _orientation_exact(pax, pay, pbx, pby, pcx, pcy) -> int:
    ax, ay = Fraction(float(pax)), Fraction(float(pay))
    bx, by = Fraction(float(pbx)), Fraction(float(pby))
    cx, cy = Fraction(float(pcx)), Fraction(float(pcy))
    det = (bx - ax) * (cy - by) - (by - ay) * (cx - bx)
    return (det > 0) - (det < 0)


def orientation_index(pax, pay, pbx, pby, pcx, pcy) -> np.ndarray:
    """Robust orientation of c relative to directed segment a->b.

    Vectorized; exact fallback only on filter-failure lanes.
    Note the exact path uses the GEOS *DD* determinant form
    (b-a) x (c-b), not (b-a) x (c-a); both have the same sign set but
    we keep the reference's form for bit-identical tie behavior.
    """
    idx, uncertain = orientation_filter(pax, pay, pbx, pby, pcx, pcy)
    if idx.ndim == 0:
        if uncertain:
            return np.int8(
                _orientation_exact(pax, pay, pbx, pby, pcx, pcy)
            )
        return idx
    if uncertain.any():
        pax, pay, pbx, pby, pcx, pcy = np.broadcast_arrays(
            np.asarray(pax, dtype=np.float64),
            np.asarray(pay, dtype=np.float64),
            np.asarray(pbx, dtype=np.float64),
            np.asarray(pby, dtype=np.float64),
            np.asarray(pcx, dtype=np.float64),
            np.asarray(pcy, dtype=np.float64),
        )
        where = np.flatnonzero(uncertain)
        flat = idx.ravel()
        for k in where:
            flat[k] = _orientation_exact(
                pax.flat[k], pay.flat[k], pbx.flat[k],
                pby.flat[k], pcx.flat[k], pcy.flat[k],
            )
    return idx
