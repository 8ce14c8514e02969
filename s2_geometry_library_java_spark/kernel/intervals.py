"""R1 / S1 interval algebra backing LatLngRect (C2).

Scalar ports of the reference's interval classes — the rect operators are
trivial once these exist, exactly as the reference notes
(S2LatLngRectTest.java:126-128):

* R1Interval (R1Interval.java): closed interval on the line; empty is
  [1, 0] (any lo > hi).
* S1Interval (S1Interval.java): closed interval on the unit circle,
  endpoints in [-pi, pi]; lo > hi means the interval wraps through pi.
  EMPTY is [pi, -pi], FULL is [-pi, pi]; the value -pi appears only in
  FULL. Union/intersection follow the reference's shorter-result tie
  rules bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

PI = float(np.pi)
_2PI = 2.0 * PI
_DBL_EPS = float(np.finfo(np.float64).eps)


def positive_distance(a: float, b: float) -> float:
    """Distance from a to b counterclockwise in [0, 2*pi)
    (S1Interval.positiveDistance: exact at endpoint coincidence)."""
    d = b - a
    if d >= 0:
        return d
    return (b + PI) - (a - PI)


def _ieee_rem(x: float) -> float:
    """IEEE remainder by 2*pi (round-half-even quotient)."""
    return float(x - _2PI * np.round(x / _2PI))


@dataclass(frozen=True)
class R1Interval:
    lo: float
    hi: float

    @staticmethod
    def empty() -> "R1Interval":
        return R1Interval(1.0, 0.0)

    @staticmethod
    def from_point_pair(p1: float, p2: float) -> "R1Interval":
        return R1Interval(min(p1, p2), max(p1, p2))

    def is_empty(self) -> bool:
        return self.lo > self.hi

    def center(self) -> float:
        return 0.5 * (self.lo + self.hi)

    def length(self) -> float:
        return self.hi - self.lo

    def contains_point(self, p: float) -> bool:
        return self.lo <= p <= self.hi

    def interior_contains_point(self, p: float) -> bool:
        return self.lo < p < self.hi

    def contains(self, y: "R1Interval") -> bool:
        if y.is_empty():
            return True
        return y.lo >= self.lo and y.hi <= self.hi

    def interior_contains(self, y: "R1Interval") -> bool:
        if y.is_empty():
            return True
        return y.lo > self.lo and y.hi < self.hi

    def intersects(self, y: "R1Interval") -> bool:
        if self.lo <= y.lo:
            return y.lo <= self.hi and y.lo <= y.hi
        return self.lo <= y.hi and self.lo <= self.hi

    def interior_intersects(self, y: "R1Interval") -> bool:
        return y.lo < self.hi and self.lo < y.hi and self.lo < self.hi and y.lo <= y.hi

    def add_point(self, p: float) -> "R1Interval":
        if self.is_empty():
            return R1Interval(p, p)
        return R1Interval(min(self.lo, p), max(self.hi, p))

    def expanded(self, margin: float) -> "R1Interval":
        if self.is_empty():
            return self
        return R1Interval(self.lo - margin, self.hi + margin)

    def union(self, y: "R1Interval") -> "R1Interval":
        if self.is_empty():
            return y
        if y.is_empty():
            return self
        return R1Interval(min(self.lo, y.lo), max(self.hi, y.hi))

    def intersection(self, y: "R1Interval") -> "R1Interval":
        return R1Interval(max(self.lo, y.lo), min(self.hi, y.hi))


@dataclass(frozen=True)
class S1Interval:
    lo: float
    hi: float

    @staticmethod
    def _checked(lo: float, hi: float) -> "S1Interval":
        """fromEndpointsChecked: -pi endpoints normalize to pi unless the
        interval is FULL/EMPTY-shaped (S1Interval.java:199-214)."""
        if lo == -PI and hi != PI:
            lo = PI
        if hi == -PI and lo != PI:
            hi = PI
        return S1Interval(lo, hi)

    @staticmethod
    def empty() -> "S1Interval":
        return S1Interval(PI, -PI)

    @staticmethod
    def full() -> "S1Interval":
        return S1Interval(-PI, PI)

    @staticmethod
    def from_point(p: float) -> "S1Interval":
        if p == -PI:
            p = PI
        return S1Interval(p, p)

    @staticmethod
    def from_point_pair(p1: float, p2: float) -> "S1Interval":
        if p1 == -PI:
            p1 = PI
        if p2 == -PI:
            p2 = PI
        if positive_distance(p1, p2) <= PI:
            return S1Interval(p1, p2)
        return S1Interval(p2, p1)

    def is_valid(self) -> bool:
        return (
            abs(self.lo) <= PI
            and abs(self.hi) <= PI
            and not (self.lo == -PI and self.hi != PI)
            and not (self.hi == -PI and self.lo != PI)
        )

    def is_full(self) -> bool:
        return self.lo == -PI and self.hi == PI

    def is_empty(self) -> bool:
        return self.lo == PI and self.hi == -PI

    def is_inverted(self) -> bool:
        return self.lo > self.hi

    def center(self) -> float:
        c = 0.5 * (self.lo + self.hi)
        if not self.is_inverted():
            return c
        return c + PI if c <= 0 else c - PI

    def length(self) -> float:
        length = self.hi - self.lo
        if length >= 0:
            return length
        length += _2PI
        return length if length > 0 else -1.0

    def complement(self) -> "S1Interval":
        if self.lo == self.hi:
            return S1Interval.full()
        return S1Interval._checked(self.hi, self.lo)

    def complement_center(self) -> float:
        if self.lo != self.hi:
            return self.complement().center()
        return self.hi + PI if self.hi <= 0 else self.hi - PI

    def fast_contains(self, p: float) -> bool:
        if self.is_inverted():
            return (p >= self.lo or p <= self.hi) and not self.is_empty()
        return self.lo <= p <= self.hi

    def contains_point(self, p: float) -> bool:
        if p == -PI:
            p = PI
        return self.fast_contains(p)

    def interior_contains_point(self, p: float) -> bool:
        if p == -PI:
            p = PI
        if self.is_inverted():
            return p > self.lo or p < self.hi
        return (self.lo < p < self.hi) or self.is_full()

    def contains(self, y: "S1Interval") -> bool:
        if self.is_inverted():
            if y.is_inverted():
                return y.lo >= self.lo and y.hi <= self.hi
            return (y.lo >= self.lo or y.hi <= self.hi) and not self.is_empty()
        if y.is_inverted():
            return self.is_full() or y.is_empty()
        return y.lo >= self.lo and y.hi <= self.hi

    def interior_contains(self, y: "S1Interval") -> bool:
        if self.is_inverted():
            if not y.is_inverted():
                return y.lo > self.lo or y.hi < self.hi
            return (y.lo > self.lo and y.hi < self.hi) or y.is_empty()
        if y.is_inverted():
            return self.is_full() or y.is_empty()
        return (y.lo > self.lo and y.hi < self.hi) or self.is_full()

    def intersects(self, y: "S1Interval") -> bool:
        if self.is_empty() or y.is_empty():
            return False
        if self.is_inverted():
            return y.is_inverted() or y.lo <= self.hi or y.hi >= self.lo
        if y.is_inverted():
            return y.lo <= self.hi or y.hi >= self.lo
        return y.lo <= self.hi and y.hi >= self.lo

    def interior_intersects(self, y: "S1Interval") -> bool:
        if self.is_empty() or y.is_empty() or self.lo == self.hi:
            return False
        if self.is_inverted():
            return y.is_inverted() or y.lo < self.hi or y.hi > self.lo
        if y.is_inverted():
            return y.lo < self.hi or y.hi > self.lo
        return (y.lo < self.hi and y.hi > self.lo) or self.is_full()

    def add_point(self, p: float) -> "S1Interval":
        if p == -PI:
            p = PI
        if self.fast_contains(p):
            return self
        if self.is_empty():
            return S1Interval.from_point(p)
        dlo = positive_distance(p, self.lo)
        dhi = positive_distance(self.hi, p)
        if dlo < dhi:
            return S1Interval(p, self.hi)
        return S1Interval(self.lo, p)

    def clamp_point(self, p: float) -> float:
        if p == -PI:
            p = PI
        if self.fast_contains(p):
            return p
        dlo = positive_distance(p, self.lo)
        dhi = positive_distance(self.hi, p)
        return self.lo if dlo < dhi else self.hi

    def expanded(self, margin: float) -> "S1Interval":
        if margin >= 0:
            if self.is_empty():
                return self
            if self.length() + 2 * margin + 2 * _DBL_EPS >= _2PI:
                return S1Interval.full()
        else:
            if self.is_full():
                return self
            if self.length() + 2 * margin - 2 * _DBL_EPS <= 0:
                return S1Interval.empty()
        lo = _ieee_rem(self.lo - margin)
        hi = _ieee_rem(self.hi + margin)
        if lo <= -PI:
            lo = PI
        return S1Interval(lo, hi)

    def union(self, y: "S1Interval") -> "S1Interval":
        if y.is_empty():
            return self
        if self.fast_contains(y.lo):
            if self.fast_contains(y.hi):
                if not self.contains(y):
                    return S1Interval.full()
                return self
            return S1Interval(self.lo, y.hi)
        if self.fast_contains(y.hi):
            return S1Interval(y.lo, self.hi)
        if self.is_empty() or y.fast_contains(self.lo):
            return y
        dlo = positive_distance(y.hi, self.lo)
        dhi = positive_distance(self.hi, y.lo)
        if dlo < dhi:
            return S1Interval(y.lo, self.hi)
        return S1Interval(self.lo, y.hi)

    def intersection(self, y: "S1Interval") -> "S1Interval":
        if y.is_empty():
            return S1Interval.empty()
        if self.fast_contains(y.lo):
            if self.fast_contains(y.hi):
                # shorter of the two on double coverage
                if y.length() < self.length():
                    return S1Interval._checked(y.lo, y.hi)
                return self
            return S1Interval._checked(y.lo, self.hi)
        if self.fast_contains(y.hi):
            return S1Interval._checked(self.lo, y.hi)
        if not y.fast_contains(self.lo):
            return S1Interval.empty()
        return self

    def approx_equals(self, y: "S1Interval", max_error: float = 1e-15) -> bool:
        if self.is_empty():
            return y.length() <= 2 * max_error
        if y.is_empty():
            return self.length() <= 2 * max_error
        if self.is_full():
            return y.length() >= 2 * (PI - max_error)
        if y.is_full():
            return self.length() >= 2 * (PI - max_error)
        return (
            abs(_ieee_rem(y.lo - self.lo)) <= max_error
            and abs(_ieee_rem(y.hi - self.hi)) <= max_error
            and abs(self.length() - y.length()) <= 2 * max_error
        )
