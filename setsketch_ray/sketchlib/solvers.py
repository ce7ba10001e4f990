"""Scalar root-finding and 1-D minimization, pure Python.

The reference uses boost.math's ``toms748_solve`` (cardinality ML estimator,
``/root/reference/c++/sketch.hpp:363``), ``bisect`` (deprecated joint ML,
``sketch.hpp:206``) and ``brent_find_minima`` (joint ML estimators,
``sketch.hpp:499``, ``595``).  scipy is not available in this environment, so
we implement the classic textbook algorithms (Brent 1973) from scratch.
"""

from __future__ import annotations

import math

_GOLDEN_SECTION = 0.3819660112501051  # (3 - sqrt(5)) / 2


def brentq(f, a: float, b: float, xtol: float = 1e-12, rtol: float = 4e-16,
           maxiter: int = 200) -> float:
    """Find a root of f in [a, b] (f(a), f(b) must have opposite signs).

    Classic Brent root bracketing: inverse quadratic interpolation with
    bisection fallback.
    """
    fa, fb = f(a), f(b)
    if fa == 0.0:
        return a
    if fb == 0.0:
        return b
    if fa * fb > 0:
        raise ValueError(f"root not bracketed: f({a})={fa}, f({b})={fb}")
    c, fc = a, fa
    d = e = b - a
    for _ in range(maxiter):
        if fb * fc > 0:
            c, fc = a, fa
            d = e = b - a
        if abs(fc) < abs(fb):
            a, b, c = b, c, b
            fa, fb, fc = fb, fc, fb
        tol1 = 2.0 * rtol * abs(b) + 0.5 * xtol
        xm = 0.5 * (c - b)
        if abs(xm) <= tol1 or fb == 0.0:
            return b
        if abs(e) >= tol1 and abs(fa) > abs(fb):
            s = fb / fa
            if a == c:
                p = 2.0 * xm * s
                q = 1.0 - s
            else:
                q = fa / fc
                r = fb / fc
                p = s * (2.0 * xm * q * (q - r) - (b - a) * (r - 1.0))
                q = (q - 1.0) * (r - 1.0) * (s - 1.0)
            if p > 0:
                q = -q
            p = abs(p)
            if 2.0 * p < min(3.0 * xm * q - abs(tol1 * q), abs(e * q)):
                e, d = d, p / q
            else:
                d = xm
                e = d
        else:
            d = xm
            e = d
        a, fa = b, fb
        if abs(d) > tol1:
            b += d
        else:
            b += tol1 if xm > 0 else -tol1
        fb = f(b)
    return b


def brent_minimize(f, a: float, b: float, tol: float = 1.4901161193847656e-08,
                   maxiter: int = 200) -> float:
    """Minimize f on [a, b]; returns the argmin (Brent's method: golden
    section + successive parabolic interpolation).

    Stand-in for boost ``brent_find_minima`` used by ``estimateJointNew``
    (``sketch.hpp:499-519``).
    """
    x = w = v = a + _GOLDEN_SECTION * (b - a)
    fx = fw = fv = f(x)
    d = e = 0.0
    for _ in range(maxiter):
        m = 0.5 * (a + b)
        tol1 = tol * abs(x) + 1e-12
        tol2 = 2.0 * tol1
        if abs(x - m) <= tol2 - 0.5 * (b - a):
            break
        use_golden = True
        if abs(e) > tol1:
            # parabolic fit through x, w, v
            r = (x - w) * (fx - fv)
            q = (x - v) * (fx - fw)
            p = (x - v) * q - (x - w) * r
            q = 2.0 * (q - r)
            if q > 0:
                p = -p
            q = abs(q)
            if abs(p) < abs(0.5 * q * e) and q * (a - x) < p < q * (b - x):
                e, d = d, p / q
                u = x + d
                if (u - a) < tol2 or (b - u) < tol2:
                    d = tol1 if x < m else -tol1
                use_golden = False
        if use_golden:
            e = (b if x < m else a) - x
            d = _GOLDEN_SECTION * e
        u = x + (d if abs(d) >= tol1 else (tol1 if d > 0 else -tol1))
        fu = f(u)
        if fu <= fx:
            if u < x:
                b = x
            else:
                a = x
            v, w, x = w, x, u
            fv, fw, fx = fw, fx, fu
        else:
            if u < x:
                a = u
            else:
                b = u
            if fu <= fw or w == x:
                v, w = w, u
                fv, fw = fw, fu
            elif fu <= fv or v == x or v == w:
                v, fv = u, fu
    return x


def bisect(f, a: float, b: float, maxiter: int = 200) -> float:
    """Bisection to machine precision (mirrors the boost ``bisect`` usage with
    a zero-tolerance terminator in ``sketch.hpp:206-240``)."""
    fa = f(a)
    for _ in range(maxiter):
        m = 0.5 * (a + b)
        if m == a or m == b:
            break
        fm = f(m)
        if fm == 0.0:
            return m
        if (fa < 0) == (fm < 0):
            a, fa = m, fm
        else:
            b = m
    return 0.5 * (a + b)
