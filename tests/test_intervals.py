"""Hypothesis property tests for R1Interval / S1Interval algebra
(reference R1Interval.php / S1Interval.php semantics incl. wrap)."""

import math

import pytest
from hypothesis import given, settings, strategies as st

from s2ray.kernel.interval import M_PI, R1Interval, S1Interval

finite = st.floats(min_value=-10.0, max_value=10.0, allow_nan=False)
# Angles on a 1e-6 grid: the canonical S1 float algebra has documented
# artifacts for eps-width arcs (lengths snapping to 0 / 2*pi), which are not
# interesting failures; real data never produces them.
angle = st.integers(min_value=-3141592, max_value=3141592).map(
    lambda k: k * 1e-6)


def s1(lo, hi):
    return S1Interval.make(lo, hi)


@settings(max_examples=300, deadline=None)
@given(a=finite, b=finite, p=finite)
def test_r1_contains_union_consistency(a, b, p):
    x = R1Interval.from_point_pair(a, b)
    assert x.contains(a) and x.contains(b)
    y = x.add_point(p)
    assert y.contains(p) and y.contains_interval(x)


@settings(max_examples=300, deadline=None)
@given(a=finite, b=finite, c=finite, d=finite)
def test_r1_union_intersection(a, b, c, d):
    x = R1Interval.from_point_pair(a, b)
    y = R1Interval.from_point_pair(c, d)
    u = x.union(y)
    i = x.intersection(y)
    assert u.contains_interval(x) and u.contains_interval(y)
    if not i.is_empty():
        assert x.contains_interval(i) and y.contains_interval(i)
        assert x.intersects(y)
    else:
        assert not x.interior_intersects(y)


@settings(max_examples=300, deadline=None)
@given(lo=angle, hi=angle, p=angle)
def test_s1_add_point_contains(lo, hi, p):
    x = s1(lo, hi)
    y = x.add_point(p)
    assert y.contains(p)
    assert y.contains_interval(x) or x.is_empty()


@settings(max_examples=300, deadline=None)
@given(lo=angle, hi=angle, lo2=angle, hi2=angle)
def test_s1_union_intersection_consistency(lo, hi, lo2, hi2):
    x = s1(lo, hi)
    y = s1(lo2, hi2)
    u = x.union(y)
    i = x.intersection(y)
    assert u.contains_interval(x) and u.contains_interval(y)
    # Canonical caveat: when the true intersection is TWO disjoint arcs
    # (each interval contains both endpoints of the other), S1Interval
    # returns the shorter input — containment need not hold then.
    two_arcs = (x.fast_contains(y.lo) and x.fast_contains(y.hi)
                and y.fast_contains(x.lo) and y.fast_contains(x.hi)
                and not x.contains_interval(y) and not y.contains_interval(x))
    def contains_approx(iv, p, tol=1e-9):
        # the canonical ops are float-approximate near full/empty intervals
        # (e.g. get_length() == 2*pi for a 2*pi - 1e-16 interval); allow an
        # angular slack the same way approxEquals does
        return (iv.contains(p)
                or abs(math.remainder(p - iv.lo, 2 * M_PI)) < tol
                or abs(math.remainder(p - iv.hi, 2 * M_PI)) < tol)

    if not i.is_empty() and not two_arcs:
        assert x.intersects(y)
        # intersection points are in both intervals (modulo float slack)
        assert contains_approx(x, i.lo) and contains_approx(y, i.lo)
        assert contains_approx(x, i.hi) and contains_approx(y, i.hi)
    if x.intersects(y):
        assert not i.is_empty() or x.is_empty() or y.is_empty()


@settings(max_examples=300, deadline=None)
@given(lo=angle, hi=angle, p=angle)
def test_s1_contains_vs_interior(lo, hi, p):
    x = s1(lo, hi)
    if x.interior_contains(p):
        assert x.contains(p)
    if x.contains(p):
        assert x.get_length() >= 0


@settings(max_examples=200, deadline=None)
@given(lo=angle, hi=angle, r=st.floats(min_value=0.0, max_value=1.0))
def test_s1_expanded_contains_original(lo, hi, r):
    x = s1(lo, hi)
    if x.is_empty():
        return
    e = x.expanded(r)
    assert e.contains_interval(x) or e.is_full()


def test_s1_wrap_examples():
    wrap = s1(math.radians(170), math.radians(-170))
    assert wrap.is_inverted()
    assert wrap.contains(math.radians(175))
    assert wrap.contains(math.radians(-175))
    assert not wrap.contains(0.0)
    assert wrap.get_length() == pytest.approx(math.radians(20))
    assert wrap.get_center() == pytest.approx(math.pi, abs=1e-12) or \
        wrap.get_center() == pytest.approx(-math.pi, abs=1e-12)
