"""R1Interval (closed real interval) and S1Interval (circular interval).

From-scratch re-implementation of the reference semantics
(R1Interval.php:6-278, S1Interval.php:3-289), including the parts the PHP
port only carries as commented Java (S1Interval contains/interiorContains,
S1Interval.php:126-180).  Conventions:

- R1: empty iff lo > hi; canonical empty = (1, 0).
- S1: bounds in [-pi, pi]; lo > hi means the interval wraps through pi
  (S1Interval.php:89-92); full = [-pi, pi]; empty = [pi, -pi];
  -pi is internally normalised to pi.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

M_PI = math.pi


def _drem(x, y):
    """IEEE remainder (reference S2::IEEEremainder, S2.php:4-6)."""
    return math.remainder(x, y)


@dataclass(frozen=True)
class R1Interval:
    lo: float
    hi: float

    @staticmethod
    def empty() -> "R1Interval":
        return R1Interval(1.0, 0.0)

    @staticmethod
    def from_point(p: float) -> "R1Interval":
        return R1Interval(p, p)

    @staticmethod
    def from_point_pair(p1: float, p2: float) -> "R1Interval":
        if p1 <= p2:
            return R1Interval(p1, p2)
        return R1Interval(p2, p1)

    def is_empty(self) -> bool:
        return self.lo > self.hi

    def get_center(self) -> float:
        return 0.5 * (self.lo + self.hi)

    def get_length(self) -> float:
        return self.hi - self.lo

    def contains(self, p: float) -> bool:
        return self.lo <= p <= self.hi

    def interior_contains(self, p: float) -> bool:
        return self.lo < p < self.hi

    def contains_interval(self, y: "R1Interval") -> bool:
        if y.is_empty():
            return True
        return y.lo >= self.lo and y.hi <= self.hi

    def interior_contains_interval(self, y: "R1Interval") -> bool:
        if y.is_empty():
            return True
        return y.lo > self.lo and y.hi < self.hi

    def intersects(self, y: "R1Interval") -> bool:
        if self.lo <= y.lo:
            return y.lo <= self.hi and y.lo <= y.hi
        return self.lo <= y.hi and self.lo <= self.hi

    def interior_intersects(self, y: "R1Interval") -> bool:
        return (y.lo < self.hi and self.lo < y.hi and self.lo < self.hi
                and y.lo <= y.hi)

    def add_point(self, p: float) -> "R1Interval":
        if self.is_empty():
            return R1Interval.from_point(p)
        if p < self.lo:
            return R1Interval(p, self.hi)
        if p > self.hi:
            return R1Interval(self.lo, p)
        return self

    def expanded(self, radius: float) -> "R1Interval":
        if self.is_empty():
            return self
        return R1Interval(self.lo - radius, self.hi + radius)

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
    def make(lo: float, hi: float) -> "S1Interval":
        """Normalise -pi endpoints to pi (reference ctor, S1Interval.php:18-37)."""
        if lo == -M_PI and hi != M_PI:
            lo = M_PI
        if hi == -M_PI and lo != M_PI:
            hi = M_PI
        return S1Interval(lo, hi)

    @staticmethod
    def empty() -> "S1Interval":
        return S1Interval(M_PI, -M_PI)

    @staticmethod
    def full() -> "S1Interval":
        return S1Interval(-M_PI, M_PI)

    @staticmethod
    def from_point(p: float) -> "S1Interval":
        if p == -M_PI:
            p = M_PI
        return S1Interval(p, p)

    @staticmethod
    def from_point_pair(p1: float, p2: float) -> "S1Interval":
        """Minimal interval containing both points (S1Interval spec)."""
        if p1 == -M_PI:
            p1 = M_PI
        if p2 == -M_PI:
            p2 = M_PI
        if S1Interval._positive_distance(p1, p2) <= M_PI:
            return S1Interval(p1, p2)
        return S1Interval(p2, p1)

    @staticmethod
    def _positive_distance(a: float, b: float) -> float:
        d = b - a
        if d >= 0:
            return d
        return (b + M_PI) - (a - M_PI)

    def is_full(self) -> bool:
        return self.hi - self.lo == 2 * M_PI

    def is_empty(self) -> bool:
        return self.lo - self.hi == 2 * M_PI

    def is_inverted(self) -> bool:
        return self.lo > self.hi

    def is_valid(self) -> bool:
        return (abs(self.lo) <= M_PI and abs(self.hi) <= M_PI
                and not (self.lo == -M_PI and self.hi != M_PI)
                and not (self.hi == -M_PI and self.lo != M_PI))

    def get_center(self) -> float:
        c = 0.5 * (self.lo + self.hi)
        if not self.is_inverted():
            return c
        return c + M_PI if c <= 0 else c - M_PI

    def get_length(self) -> float:
        length = self.hi - self.lo
        if length >= 0:
            return length
        length += 2 * M_PI
        return length if length > 0 else -1.0

    def contains(self, p: float) -> bool:
        """Reference spec: S1Interval.php:126-146 (commented Java)."""
        if p == -M_PI:
            p = M_PI
        return self.fast_contains(p)

    def fast_contains(self, p: float) -> bool:
        if self.is_inverted():
            return (p >= self.lo or p <= self.hi) and not self.is_empty()
        return self.lo <= p <= self.hi

    def interior_contains(self, p: float) -> bool:
        if p == -M_PI:
            p = M_PI
        if self.is_inverted():
            return p > self.lo or p < self.hi
        return (self.lo < p < self.hi) or self.is_full()

    def contains_interval(self, y: "S1Interval") -> bool:
        if self.is_inverted():
            if y.is_inverted():
                return y.lo >= self.lo and y.hi <= self.hi
            return (y.lo >= self.lo or y.hi <= self.hi) and not self.is_empty()
        if y.is_inverted():
            return self.is_full() or y.is_empty()
        return y.lo >= self.lo and y.hi <= self.hi

    def interior_contains_interval(self, y: "S1Interval") -> bool:
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
        if p == -M_PI:
            p = M_PI
        if self.fast_contains(p):
            return self
        if self.is_empty():
            return S1Interval.from_point(p)
        d_lo = S1Interval._positive_distance(p, self.lo)
        d_hi = S1Interval._positive_distance(self.hi, p)
        if d_lo < d_hi:
            return S1Interval(p, self.hi)
        return S1Interval(self.lo, p)
        # (ties go to extending hi, matching the reference's < comparison)

    def expanded(self, radius: float) -> "S1Interval":
        if radius == 0:
            return self
        if self.is_empty():
            return self
        if self.get_length() + 2 * radius >= 2 * M_PI - 1e-15:
            return S1Interval.full()
        lo = _drem(self.lo - radius, 2 * M_PI)
        hi = _drem(self.hi + radius, 2 * M_PI)
        if lo == -M_PI:
            lo = M_PI
        return S1Interval(lo, hi)

    def union(self, y: "S1Interval") -> "S1Interval":
        if y.is_empty():
            return self
        if self.fast_contains(y.lo):
            if self.fast_contains(y.hi):
                if self.contains_interval(y):
                    return self
                return S1Interval.full()
            return S1Interval(self.lo, y.hi)
        if self.fast_contains(y.hi):
            return S1Interval(y.lo, self.hi)
        if self.is_empty() or y.fast_contains(self.lo):
            return y
        d_lo = S1Interval._positive_distance(y.hi, self.lo)
        d_hi = S1Interval._positive_distance(self.hi, y.lo)
        if d_lo < d_hi:
            return S1Interval(y.lo, self.hi)
        return S1Interval(self.lo, y.hi)

    def intersection(self, y: "S1Interval") -> "S1Interval":
        if y.is_empty():
            return S1Interval.empty()
        if self.fast_contains(y.lo):
            if self.fast_contains(y.hi):
                if y.get_length() < self.get_length():
                    return y
                return self
            return S1Interval(y.lo, self.hi)
        if self.fast_contains(y.hi):
            return S1Interval(self.lo, y.hi)
        if y.fast_contains(self.lo):
            return self
        return S1Interval.empty()
