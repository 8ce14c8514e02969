"""Exact coverage-interval comparisons for S2Builder's Voronoi site
exclusion (S2Predicates.getVoronoiSiteExclusion semantics).

The float path (builder._coverage_intervals) computes each candidate
site's coverage interval on the edge XY as angles; containment decisions
within ~1e-15 of a tie are at the mercy of rounding. This module decides
exactly those comparisons with rational arithmetic over the given float
coordinates (every double is a rational), the same escalate-on-tie
strategy as the reference's triage -> exact predicate cascade.

Formulation. Points of the great circle through x towards y are
parametrized Q(s) = x + s*w with w = y*(x.x) - x*(x.y) (rational; w.x = 0
holds EXACTLY in rationals), s = tan(theta)*|x|/|w| monotone in the arc
angle theta on (-pi/2, pi/2). Site P covers Q(s) (chord^2 <= r2) iff

    2*(P.Q) >= (2 - r2)*|P||Q|   (and P.Q > 0)
    <=> E_P(s) := 4*(P.Q)^2 - c2*(P.P)*(Q.Q) >= 0,  c2 = (2 - r2)^2

with Q.Q = x.x + s^2*(w.w) (no cross term) so E_P is the concave quadratic

    E_P(s) = A s^2 + B s + C,
    A = 4*b^2 - c2*(P.P)*(w.w) < 0,  B = 8*a*b,  C = 4*a^2 - c2*(P.P)*(x.x),
    a = P.x, b = P.w.

Coverage is the root interval [s-, s+]; interval-endpoint comparisons
between two sites reduce to rational sign tests plus comparisons of
quadratic surds, decided exactly by the classic repeated-squaring case
analysis (sign of p + q*sqrt(D1) + r*sqrt(D2)).

Clamping to the edge span [x, y] never materializes the irrational s_max:
"entry clamped at x" is coverage of the rational point x, "exit clamped
at y" is coverage of the rational point y.

Scope: exact decisions assume the edge spans less than a half circle on
the s-parametrized side (theta_max < pi/2) — always true for snap-chain
sub-edges under a small snap radius; longer edges keep the float
decision (documented in builder.py).
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np

__all__ = ["exact_contains", "Site"]


def _vec(p) -> tuple[Fraction, Fraction, Fraction]:
    return (Fraction(float(p[0])), Fraction(float(p[1])), Fraction(float(p[2])))


def _dot(u, v) -> Fraction:
    return u[0] * v[0] + u[1] * v[1] + u[2] * v[2]


def _cross(u, v):
    return (
        u[1] * v[2] - u[2] * v[1],
        u[2] * v[0] - u[0] * v[2],
        u[0] * v[1] - u[1] * v[0],
    )


def _sign(x: Fraction) -> int:
    return (x > 0) - (x < 0)


def _sign_p_q_sqrt(p: Fraction, q: Fraction, D: Fraction) -> int:
    """Sign of p + q*sqrt(D), D >= 0, exactly."""
    if D == 0 or q == 0:
        return _sign(p)
    if p == 0:
        return _sign(q)
    sp, sq = _sign(p), _sign(q)
    if sp == sq:
        return sp
    t = p * p - q * q * D
    if t == 0:
        return 0
    return sp if t > 0 else sq


def _sign_two_surds(
    p: Fraction, q: Fraction, D1: Fraction, r: Fraction, D2: Fraction
) -> int:
    """Sign of p + q*sqrt(D1) + r*sqrt(D2), D1, D2 >= 0, exactly."""
    if D2 == 0 or r == 0:
        return _sign_p_q_sqrt(p, q, D1)
    if D1 == 0 or q == 0:
        return _sign_p_q_sqrt(p, r, D2)
    su = _sign_p_q_sqrt(p, q, D1)  # sign of u = p + q*sqrt(D1)
    sv = _sign(r)  # sign of v = r*sqrt(D2)
    if su == 0:
        return sv
    if su == sv:
        return su
    # opposite signs: sign(u + v) = su iff u^2 > v^2
    # u^2 - v^2 = (p^2 + q^2*D1 - r^2*D2) + 2pq*sqrt(D1)
    t = _sign_p_q_sqrt(p * p + q * q * D1 - r * r * D2, 2 * p * q, D1)
    if t == 0:
        return 0
    return su if t > 0 else sv


class Site:
    """Exact coverage state of one site on edge (x, y) with chord^2 radius
    r2: quadratic coefficients, discriminant, and clamp flags."""

    def __init__(self, P, x, y, w, c2: Fraction):
        P = _vec(P)
        pp = _dot(P, P)
        a = _dot(P, x)
        b = _dot(P, w)
        self.A = 4 * b * b - c2 * pp * _dot(w, w)
        self.B = 8 * a * b
        self.C = 4 * a * a - c2 * pp * _dot(x, x)
        self.D = self.B * self.B - 4 * self.A * self.C
        # coverage of the rational endpoints (entry/exit clamps)
        self.cov_x = a > 0 and self.C >= 0
        py = _dot(P, y)
        self.cov_y = py > 0 and 4 * py * py - c2 * pp * _dot(y, y) >= 0

    def empty(self, x, y, w, n) -> bool:
        """No covered point in the edge span [x, y]."""
        if self.cov_x or self.cov_y:
            return False
        if self.D < 0 or self.A >= 0:
            # A >= 0 only for degenerate P ~ parallel to w: outside scope,
            # treat as empty (the float path never keeps such sites)
            return True
        # concave parabola negative at both clamped ends: covered points
        # exist in-span iff the vertex s_v = B / (-2A) lies strictly
        # inside (0, s_max): s_v > 0 <=> B > 0 (A < 0), and Q(s_v) is
        # before y along the arc <=> (Q(s_v) x y) . n > 0 with n = x X y
        if self.B <= 0:
            return True
        sv = self.B / (-2 * self.A)
        q = (x[0] + sv * w[0], x[1] + sv * w[1], x[2] + sv * w[2])
        return _dot(_cross(q, y), n) <= 0


def _entry_le(si: Site, sj: Site) -> bool:
    """entry(si) <= entry(sj) on the clamped edge span."""
    if sj.cov_x:
        return si.cov_x  # entry_j clamped at 0
    if si.cov_x:
        return True
    # both entries are the smaller roots s- = (-B + sqrt(D)) / (2A), A<0;
    # multiplying by 4*Ai*Aj > 0:  s-_i <= s-_j  <=>
    # 0 <= (2AjBi - 2AiBj) + 2Ai*sqrt(Dj) - 2Aj*sqrt(Di)
    p = 2 * sj.A * si.B - 2 * si.A * sj.B
    return _sign_two_surds(p, 2 * si.A, sj.D, -2 * sj.A, si.D) >= 0


def _exit_ge(si: Site, sj: Site) -> bool:
    """exit(si) >= exit(sj) on the clamped edge span."""
    if sj.cov_y:
        return si.cov_y  # exit_j clamped at the far end
    if si.cov_y:
        return True
    # larger roots s+ = (-B - sqrt(D)) / (2A), A<0; s+_j <= s+_i  <=>
    # 0 <= (2AiBj - 2AjBi) - 2Aj*sqrt(Di) + 2Ai*sqrt(Dj)
    p = 2 * si.A * sj.B - 2 * sj.A * si.B
    return _sign_two_surds(p, -2 * sj.A, si.D, 2 * si.A, sj.D) >= 0


def exact_contains(Pi, Pj, x_pt, y_pt, r_chord2: float) -> bool:
    """Exactly decide: does site Pi's coverage interval on edge (x, y)
    (chord^2 radius r_chord2, clamped to the edge span) contain Pj's?

    Mirrors the float convention of builder._voronoi_filter: a non-empty
    interval contains an empty one; an empty interval contains only empty
    ones."""
    x = _vec(x_pt)
    y = _vec(y_pt)
    # w = (x X y) X x = y*(x.x) - x*(x.y): exact tangent, w.x == 0
    xx = _dot(x, x)
    xy = _dot(x, y)
    w = (y[0] * xx - x[0] * xy, y[1] * xx - x[1] * xy, y[2] * xx - x[2] * xy)
    n = _cross(x, y)
    c = 2 - Fraction(float(r_chord2))
    c2 = c * c
    si = Site(Pi, x, y, w, c2)
    sj = Site(Pj, x, y, w, c2)
    if sj.empty(x, y, w, n):
        return True
    if si.empty(x, y, w, n):
        return False
    return _entry_le(si, sj) and _exit_ge(si, sj)
