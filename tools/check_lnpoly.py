#!/usr/bin/env python3
"""Cross-engine bit-exactness check for the portable polynomial ln.

graft.functions.TextFunctions.lnPoly claims: any IEEE-754 engine
evaluating the same expression tree over the same positive integer
produces the SAME double bit pattern (the property every hash-path score
in the repo now rests on instead of libm ln). This script replays the
expression in pure Python floats AND through DuckDB's evaluator (the
oracle engine) and compares raw bit patterns; LnPolySpec pins the JVM
side against the same plain-IEEE replica.

Usage: check_lnpoly.py [n_random]   (default 5000)
"""
import sys, struct, math, random
import duckdb


def lnpoly_py(n: int) -> float:
    e = n.bit_length() - 1
    m = float(n) / float(1 << e)
    z = (m - 1.0) / (m + 1.0)
    z2 = z * z
    poly = 1.0 + z2 * (0.3333333333333333 + z2 * (0.2 + z2 * (
        0.14285714285714285 + z2 * (0.1111111111111111 + z2 * (
            0.09090909090909091 + z2 * 0.07692307692307693)))))
    return float(e) * 0.6931471805599453 + 2.0 * z * poly


def lnpoly_sql(n: str) -> str:
    """Mirror of TextFunctions.lnPolySql — keep in sync."""
    e = f"(length(bin(CAST(({n}) AS BIGINT))) - 1)"
    m = f"(CAST(({n}) AS DOUBLE) / CAST((1::BIGINT << {e}) AS DOUBLE))"
    z = f"(({m} - 1.0) / ({m} + 1.0))"
    z2 = f"({z} * {z})"
    poly = (f"(1.0 + {z2} * (0.3333333333333333 + {z2} * (0.2 + {z2} * "
            f"(0.14285714285714285 + {z2} * (0.1111111111111111 + {z2} * "
            f"(0.09090909090909091 + {z2} * 0.07692307692307693))))))")
    return f"(CAST({e} AS DOUBLE) * 0.6931471805599453 + 2.0 * {z} * {poly})"


def main() -> int:
    n_random = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    random.seed(20260814)
    vals = ([1, 2, 3, 5, 7, 100, 12345, 999983, 2**40 - 7, 2**52 - 1]
            + [random.randrange(1, 2**50) for _ in range(n_random)])
    con = duckdb.connect()
    bad = 0
    maxerr = 0.0
    for n in vals:
        d = con.execute(f"SELECT {lnpoly_sql(str(n))}").fetchone()[0]
        p = lnpoly_py(n)
        if struct.pack('<d', d) != struct.pack('<d', p):
            bad += 1
            if bad <= 5:
                print(f"BIT MISMATCH n={n}: duckdb={d.hex()} py={p.hex()}")
        maxerr = max(maxerr, abs(p - math.log(n)))
    print(f"bit-mismatches: {bad}/{len(vals)}; max |lnPoly - ln| = {maxerr:.3e}")
    return 1 if bad or maxerr > 2e-8 else 0


if __name__ == "__main__":
    sys.exit(main())
