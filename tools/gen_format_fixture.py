#!/usr/bin/env python3
"""Generate the formatter parity fixture for FormatPropertySpec.

Ground truth = the reference's cell formatter semantics
(reference alphastats/reports.py:539-553): None -> "-", nan/inf -> "-",
rounded = round(value, 2); rounded == 0 -> "0"; else str(rounded)
(CPython shortest-repr float formatting).

Output: gzip TSV, one case per line:
    <16-hex-char IEEE-754 bits> TAB <expected string> TAB <mode>
mode:
  exact  — Reports.formatValue must equal the expected string byte-for-byte
  value  — |round(x,2)| >= 1e16: Python switches to scientific notation with
           a spelling Java does not reproduce (documented divergence in
           formatValue); the spec asserts VALUE equality instead — both
           spellings must parse back to the identical double.

Driver-side python3 only (fixture generation), like tools/check_oracle.py.
"""
import gzip
import math
import random
import struct


def expected(v: float) -> str:
    if math.isnan(v) or math.isinf(v):
        return "-"
    r = round(v, 2)
    if r == 0:
        return "0"
    return str(r)


def bits(v: float) -> str:
    return struct.pack(">d", v).hex()


def main() -> None:
    rng = random.Random(20260815)
    cases = []

    def add(v: float) -> None:
        e = expected(v)
        mode = "exact"
        if e != "-":
            r = round(v, 2)
            if r != 0 and abs(r) >= 1e16:
                mode = "value"
        cases.append((bits(v), e, mode))

    # pinned edges: binary-half vectors, zeros, boundaries, extremes
    for v in [2.675, 0.015, 0.005, -0.004, 0.025, -0.025, 2.665, 1.005,
              0.0, -0.0, 0.004999999999999999, -0.005000000000000001,
              9999999.994999999, 10000000.57, 1e7, 1e7 - 0.005, 1e16,
              1e16 - 2.0, 1.2345678901234567e16, 5e-324, -5e-324, 1e-300,
              -1e-300, 2.0 ** 46, 2.0 ** 46 + 0.255, float("nan"),
              float("inf"), float("-inf"), 1.7976931348623157e308]:
        add(v)

    # uniform magnitudes
    for _ in range(15000):
        add(rng.uniform(-1000.0, 1000.0))
    # percent-scale report cells
    for _ in range(10000):
        add(rng.uniform(-100.0, 100.0) * rng.choice([1.0, 100.0]))
    # near-half grid: k/1000 with trailing 5 — the HALF_EVEN stress band
    for _ in range(10000):
        k = rng.randrange(-10_000_000, 10_000_000)
        add((k * 10 + 5) / 1000.0)
    # large magnitudes across the 1e7 (Java E-notation) and 1e16 (Python
    # scientific) thresholds
    for _ in range(10000):
        add(rng.uniform(-1.0, 1.0) * 10.0 ** rng.uniform(5, 18))
    # tiny + subnormal: everything rounds to "0"
    for _ in range(5000):
        add(rng.uniform(-1.0, 1.0) * 10.0 ** rng.uniform(-320, -3))
    for _ in range(2000):
        add(5e-324 * rng.randrange(1, 1 << 52) * rng.choice([1.0, -1.0]))
    # random bit patterns (inf/nan included -> "-")
    for _ in range(8000):
        raw = rng.getrandbits(64)
        (v,) = struct.unpack(">d", struct.pack(">Q", raw))
        add(v)

    with gzip.open("src/test/resources/format_fixture.tsv.gz", "wt") as f:
        for b, e, m in cases:
            f.write(f"{b}\t{e}\t{m}\n")
    n_value = sum(1 for _, _, m in cases if m == "value")
    print(f"{len(cases)} cases ({n_value} value-mode)")


if __name__ == "__main__":
    main()
