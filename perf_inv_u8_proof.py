#!/usr/bin/env python
"""Exhaustive proof for the device-side inverse_transform uint8 twin.

Host reference (utils/images.py inverse_transform, reference
utils.py:300-314): ``(((float64(x) + 1) / 2) * 255).astype(uint8)`` —
three exactly-rounded f64 ops then a truncating cast.

Candidate device twin: float32-only error-free transformations
(TwoSum for x+1, Dekker product for the *255), so the truncation
decision is taken on the EXACT real value (plus a noise margin smaller
than the input lattice's distance-to-integer, absorbed by a threshold).

This script enumerates EVERY float32 in [-1, 1] (~2.13e9 values — the
whole domain of a tanh output) and compares the f32 twin against the
f64 host path bit-for-bit.  Zero mismatches = the twin is exact on the
entire input domain; no sampling argument needed.
"""

import numpy as np
import sys
import time

F1 = np.float32(1.0)
HALF = np.float32(0.5)
C = np.float32(255.0)
SPLIT = np.float32(4097.0)          # 2**12 + 1 Dekker split constant
THRESH = np.float32(-2.0 ** -33)


def host(x32):
    return (((x32.astype(np.float64) + 1.0) / 2.0) * 255.0).astype(np.uint8)


def twin_f32(x):
    """Pure-f32 twin; op-for-op what the jnp version runs."""
    # TwoSum(x, 1): s + e == x + 1 exactly
    s = x + F1
    bp = s - x
    e = (x - (s - bp)) + (F1 - bp)
    h_h = s * HALF                   # exact (power of two)
    h_l = e * HALF
    # Dekker product h_h * 255: P1 + P2 == h_h*255 exactly
    c = h_h * SPLIT
    a_hi = c - (c - h_h)
    a_lo = h_h - a_hi
    P1 = h_h * C
    P2 = (a_hi * C - P1) + a_lo * C
    # Dekker product h_l * 255 (the tail's own exact product)
    c2 = h_l * SPLIT
    b_hi = c2 - (c2 - h_l)
    b_lo = h_l - b_hi
    q_h = h_l * C
    q_l = (b_hi * C - q_h) + b_lo * C
    # truncation decision on kk + r, r ~= exact_total - kk
    k = np.trunc(P1)
    f = P1 - k                       # exact: fractional bits of P1
    up = f > HALF
    g = np.where(up, f - F1, f)
    kk = np.where(up, k + F1, k)
    r = ((g + P2) + q_h) + q_l
    out = kk - (r < THRESH).astype(np.float32)
    return np.clip(out, 0.0, 255.0).astype(np.uint8)


def enumerate_domain():
    # float32 bit patterns: [0,1] = 0x00000000..0x3F800000,
    # [-1,-0] = 0x80000000..0xBF800000
    ranges = [(0x00000000, 0x3F800001), (0x80000000, 0xBF800001)]
    chunk = 1 << 24
    total = 0
    bad = 0
    t0 = time.time()
    for lo, hi in ranges:
        for c0 in range(lo, hi, chunk):
            bits = np.arange(c0, min(c0 + chunk, hi), dtype=np.uint64)
            x = bits.astype(np.uint32).view(np.float32)
            got = twin_f32(x)
            want = host(x)
            ne = got != want
            n = int(ne.sum())
            if n:
                bad += n
                idx = np.flatnonzero(ne)[:5]
                for i in idx:
                    print(f"MISMATCH x={x[i]!r} bits={hex(int(bits[i]))} "
                          f"twin={got[i]} host={want[i]}", file=sys.stderr)
            total += x.size
    dt = time.time() - t0
    print(f"enumerated {total} float32 values in [-1,1] in {dt:.0f}s: "
          f"{bad} mismatches")
    return bad


if __name__ == "__main__":
    sys.exit(1 if enumerate_domain() else 0)
