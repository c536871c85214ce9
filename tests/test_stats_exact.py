"""Mathematical-premise tests for the exact-fixed-point statistics
entries: the catalog claims (in docstrings) that certain grid/floor
constructions equal the textbook estimators exactly — prove the
claims on random inputs so future edits can't silently break them."""

from fractions import Fraction

import numpy as np
import pytest


def _pava_fractions(p, n):
    """Reference pool-adjacent-violators on exact rationals."""
    res = []
    blocks = [[Fraction(int(pi), int(ni)), int(pi), int(ni), 1] for pi, ni in zip(p, n)]
    out = []
    for b in blocks:
        out.append(b)
        while len(out) >= 2 and out[-2][0] > out[-1][0]:
            v2, p2, n2, c2 = out.pop()
            v1, p1, n1, c1 = out.pop()
            out.append([Fraction(p1 + p2, n1 + n2), p1 + p2, n1 + n2, c1 + c2])
    for v, bp, bn, c in out:
        res.extend([v] * c)
    return res


def _minimax_grid(p, n, g=1_000_000):
    """The entry's construction: gridded range means, suffix min,
    prefix max — floor((P_j - P_{i-1}) * g / (N_j - N_{i-1}))."""
    k = len(p)
    cp = np.concatenate([[0], np.cumsum(p)])
    cn = np.concatenate([[0], np.cumsum(n)])
    fitted = []
    for kk in range(1, k + 1):
        best = None
        for i in range(1, kk + 1):
            inner = min(
                (int(cp[j] - cp[i - 1]) * g) // int(cn[j] - cn[i - 1])
                for j in range(kk, k + 1)
            )
            best = inner if best is None else max(best, inner)
        fitted.append(best)
    return fitted


@pytest.mark.parametrize("seed", range(5))
def test_isotonic_minimax_grid_equals_floor_of_true_pava(seed):
    """floor-to-grid commutes with min/max, so the declarative
    minimax on gridded means must equal floor(true rational PAVA) —
    the exact claim isotonic_calibration_minimax's docstring makes."""
    rng = np.random.default_rng(seed)
    k = int(rng.integers(2, 12))
    n = rng.integers(1, 20, size=k)
    p = np.array([rng.integers(0, ni + 1) for ni in n])
    true = _pava_fractions(p, n)
    grid = _minimax_grid(p, n)
    assert len(true) == len(grid)
    for t, g in zip(true, grid):
        assert g == (t.numerator * 1_000_000) // t.denominator


def test_theil_sen_grid_slope_is_floor_of_rational_slope():
    """The offset trick ((dc*1e6 + OFF*dh) // dh - OFF) must equal
    floor(dc*1e6/dh) for negative dc too — the nonnegative-operand
    construction theil_sen_hourly_trend relies on."""
    OFF = 10**12
    rng = np.random.default_rng(0)
    for _ in range(500):
        dc = int(rng.integers(-10**5, 10**5))
        dh = int(rng.integers(1, 720))
        got = (dc * 10**6 + OFF * dh) // dh - OFF
        import math

        assert got == math.floor(Fraction(dc * 10**6, dh))


def test_theil_sen_median_slope_resists_planted_outlier():
    """Breakdown property on the entry's own arithmetic: corrupting
    one point drags the OLS slope but not the pairwise-median."""
    h = np.arange(50)
    c = 10 * h + 3  # perfect trend, slope 10
    pairs = [
        ((int(c[j]) - int(c[i])) * 10**6) // int(h[j] - h[i])
        for i in range(50)
        for j in range(i + 1, 50)
    ]
    sen_clean = int(np.sort(pairs)[(len(pairs) - 1) // 2])
    c2 = c.copy()
    c2[25] += 100000  # one wild hour
    pairs2 = [
        ((int(c2[j]) - int(c2[i])) * 10**6) // int(h[j] - h[i])
        for i in range(50)
        for j in range(i + 1, 50)
    ]
    sen_out = int(np.sort(pairs2)[(len(pairs2) - 1) // 2])
    ols_clean = np.polyfit(h, c, 1)[0]
    ols_out = np.polyfit(h, c2, 1)[0]
    assert sen_clean == 10_000_000
    assert abs(sen_out - sen_clean) <= 1  # median unmoved (grid ulp)
    # one wild point shifts the OLS slope by ~0.5e5/Sxx ≈ 4.8 units —
    # 6 orders of magnitude more than the Sen median moved
    assert abs(ols_out - ols_clean) > 1


def test_mad_cross_multiplied_rule_matches_float_rule():
    """d*6745 > mad*30000 must agree with |x-med| > 3*(mad/0.6745)
    wherever the float rule is unambiguous."""
    rng = np.random.default_rng(1)
    for _ in range(200):
        d = int(rng.integers(0, 10**6))
        mad = int(rng.integers(1, 10**5))
        exact = d * 6745 > mad * 30000
        flt = d > 3.0 * mad / 0.6745
        if abs(d * 6745 - mad * 30000) > 10:  # away from the boundary
            assert exact == flt


def test_ks_rejection_cross_multiplication_matches_float():
    """dn^2*1e6 > 1844164*(n1+n2)*n1*n2  <=>  D > 1.358*sqrt((n1+n2)/(n1*n2))."""
    rng = np.random.default_rng(2)
    for _ in range(200):
        n1 = int(rng.integers(10, 5000))
        n2 = int(rng.integers(10, 5000))
        dn = int(rng.integers(0, n1 * n2 + 1))
        exact = dn * dn * 1_000_000 > 1_844_164 * (n1 + n2) * n1 * n2
        D = dn / (n1 * n2)
        crit = np.sqrt(1.844164 * (n1 + n2) / (n1 * n2))
        if abs(D - crit) > 1e-9:
            assert exact == (D > crit)


def test_wilcoxon_z2_clearing_matches_textbook():
    """(4W+ - n(n+1))^2 * 1e6 // (n(n+1)(2n+1)*2//3) must floor-match
    z^2 = (W+ - n(n+1)/4)^2 / (n(n+1)(2n+1)/24) — the ADVICE-r7 class
    bug (an 8//3 denominator, z^2 4x too small) was invisible to the
    oracle gate because both engines shared the formula, so pin the
    value against an independent rational computation here."""
    # the advisor's concrete counterexample first
    n, w = 3, 6
    num = (4 * w - n * (n + 1)) ** 2 * 1_000_000
    den = n * (n + 1) * (2 * n + 1) * 2 // 3
    assert num // den == 2_571_428  # true z^2 = 2.5714…, NOT 0.6428…
    rng = np.random.default_rng(7)
    for _ in range(200):
        n = int(rng.integers(1, 500))
        w = int(rng.integers(0, n * (n + 1) // 2 + 1))
        num = (4 * w - n * (n + 1)) ** 2 * 1_000_000
        den = n * (n + 1) * (2 * n + 1) * 2 // 3
        # n(n+1)(2n+1) is divisible by 3, so den is exact (no floor
        # loss) and the quotient is floor(true z^2 * 1e6) exactly
        assert n * (n + 1) * (2 * n + 1) % 3 == 0
        true = Fraction((4 * w - n * (n + 1)) ** 2 * 1_000_000 * 3,
                        n * (n + 1) * (2 * n + 1) * 2)
        assert num // den == true.numerator // true.denominator
        z2 = Fraction(w) - Fraction(n * (n + 1), 4)
        z2 = z2 * z2 / Fraction(n * (n + 1) * (2 * n + 1), 24)
        assert num // den == (z2.numerator * 1_000_000) // z2.denominator


def test_mann_whitney_z2_clearing_matches_textbook():
    """(2U1 - n1n2)^2 * 3e6 // (n1*n2*(N+1)) must floor-match
    z^2 = (U1 - n1n2/2)^2 / (n1n2(N+1)/12) exactly (the denominator
    clears with no residue, so the quotient is floor(z^2 * 1e6))."""
    rng = np.random.default_rng(11)
    for _ in range(200):
        n1 = int(rng.integers(1, 400))
        n2 = int(rng.integers(1, 400))
        u1 = int(rng.integers(0, n1 * n2 + 1))
        num = (2 * u1 - n1 * n2) ** 2 * 3_000_000
        den = n1 * n2 * (n1 + n2 + 1)
        z2 = (Fraction(u1) - Fraction(n1 * n2, 2)) ** 2 / Fraction(
            n1 * n2 * (n1 + n2 + 1), 12
        )
        assert num // den == (z2.numerator * 1_000_000) // z2.denominator


def test_cramer_von_mises_rank_form_matches_ecdf_definition():
    """Anderson's rank form T = U/(nmN) - (4nm-1)/(6N), with
    U = n*sum((r_i - i)^2) + m*sum((s_j - j)^2), must equal the ECDF
    definition T = (nm/N^2) * sum over ALL pooled points of
    (F_n - G_m)^2 — on exact rationals, distinct samples."""
    rng = np.random.default_rng(13)
    for _ in range(50):
        n = int(rng.integers(2, 40))
        m = int(rng.integers(2, 40))
        vals = rng.choice(10_000, size=n + m, replace=False)
        x = np.sort(vals[:n])
        y = np.sort(vals[n:])
        pooled = np.sort(vals)
        pos = {v: k + 1 for k, v in enumerate(pooled)}
        r = [pos[v] for v in x]
        s = [pos[v] for v in y]
        U = n * sum((ri - (i + 1)) ** 2 for i, ri in enumerate(r)) + m * sum(
            (sj - (j + 1)) ** 2 for j, sj in enumerate(s)
        )
        T_rank = Fraction(U, n * m * (n + m)) - Fraction(
            4 * n * m - 1, 6 * (n + m)
        )
        xs, ys = set(x.tolist()), set(y.tolist())
        acc = Fraction(0)
        fn = gm = 0
        for v in pooled:
            if v in xs:
                fn += 1
            if v in ys:
                gm += 1
            acc += (Fraction(fn, n) - Fraction(gm, m)) ** 2
        T_ecdf = Fraction(n * m, (n + m) ** 2) * acc
        assert T_rank == T_ecdf
        # and the cleared single-fraction form used by both engines
        num = 6 * U - n * m * (4 * n * m - 1)
        den = 6 * n * m * (n + m)
        assert Fraction(num, den) == T_rank


def test_brown_forsythe_doubled_median_scale_invariance():
    """brown_forsythe_variance's premise: F computed from
    z' = |2y - m2| (m2 = sum of the two middle order statistics, or
    2x the single middle) equals F computed from the textbook
    z = |y - median| exactly — because z' = 2z elementwise and the
    F ratio is scale-invariant.  Verified on exact rationals."""
    rng = np.random.default_rng(17)
    for _ in range(50):
        k = int(rng.integers(2, 5))
        groups = [
            sorted(int(v) for v in rng.integers(0, 10_000, size=rng.integers(2, 30)))
            for _ in range(k)
        ]

        def f_stat(zs):
            n_tot = sum(len(z) for z in zs)
            s = [sum(z) for z in zs]
            q = [sum(v * v for v in z) for z in zs]
            sb = sum(Fraction(si * si, len(z)) for si, z in zip(s, zs))
            ssb = sb - Fraction(sum(s) ** 2, n_tot)
            ssw = sum(q) - sb
            if ssw == 0:
                return None
            return (ssb * (n_tot - k)) / (ssw * (k - 1))

        z_half, z_double = [], []
        for g in groups:
            n = len(g)
            lo, hi = g[(n + 1) // 2 - 1], g[(n + 2) // 2 - 1]
            m2 = lo + hi if n % 2 == 0 else 2 * g[n // 2]
            assert Fraction(m2, 2) == (
                Fraction(g[n // 2 - 1] + g[n // 2], 2)
                if n % 2 == 0
                else Fraction(g[n // 2])
            )
            z_half.append([abs(Fraction(2 * v - m2, 2)) for v in g])
            z_double.append([abs(2 * v - m2) for v in g])
        f1, f2 = f_stat(z_half), f_stat(z_double)
        assert f1 == f2  # scale invariance: the doubling cancels


def test_jackknife_variance_clearing_identity():
    """jackknife_block_variance's premise: for integer grid means t_i,
    (g-1)/g * sum((t_i - tbar)^2) == ((g*Q - T^2) * (g-1)) / g^2
    exactly (Q = sum t^2, T = sum t) — the moment identity the entry
    floors once on each side of."""
    rng = np.random.default_rng(19)
    for _ in range(100):
        g = int(rng.integers(2, 40))
        t = [int(v) for v in rng.integers(0, 10**9, size=g)]
        T, Q = sum(t), sum(v * v for v in t)
        tbar = Fraction(T, g)
        lhs = Fraction(g - 1, g) * sum((Fraction(v) - tbar) ** 2 for v in t)
        rhs = Fraction((g * Q - T * T) * (g - 1), g * g)
        assert lhs == rhs
