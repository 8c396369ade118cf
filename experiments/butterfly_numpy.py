"""NumPy validation of butterfly (log-shift) monotone compaction.

Claim: a partial permutation with strictly increasing destinations and
sources (dst_i <= src_i, i.e., left-moving) can be routed by processing
displacement bits from LSB to MSB: at stage k, every element whose
remaining displacement has bit k set moves left by 2^k.  No two elements
ever collide.  This replaces scatter for "move segment-end values to their
segment index" in the Pallas encode kernel.
"""
import numpy as np

rng = np.random.default_rng(0)


def butterfly_compact(vals, marks, dest, size_out, stages):
    """vals/marks/dest: (n,) arrays. Marked element i must land at dest[i]
    (dest strictly increasing over marked, dest[i] <= i). Returns
    (out_vals, out_valid) of length n (caller slices to size_out)."""
    n = vals.shape[0]
    v = vals.copy()
    valid = marks.astype(bool).copy()
    disp = np.where(valid, np.arange(n) - dest, 0)
    for k in range(stages):
        bit = 1 << k
        move = valid & ((disp & bit) != 0)
        # element at j+bit moves to j
        src_move = np.roll(move, -bit)
        src_v = np.roll(v, -bit)
        src_disp = np.roll(disp, -bit)
        src_valid = np.roll(valid, -bit)
        incoming = src_move & src_valid
        stay = valid & ~move
        collision = incoming & stay
        if collision.any():
            return None, None
        v = np.where(incoming, src_v, np.where(stay, v, 0))
        disp = np.where(incoming, src_disp - bit, np.where(stay, disp, 0))
        valid = incoming | stay
    return v, valid


def trial(n=1024, n_marks=None):
    n_marks = n_marks or rng.integers(1, n // 2)
    src = np.sort(rng.choice(n, size=n_marks, replace=False))
    # destinations: strictly increasing, dest[i] <= src[i]
    dest = np.zeros(n_marks, dtype=np.int64)
    for i in range(n_marks):
        lo = dest[i - 1] + 1 if i else 0
        hi = src[i]
        if lo > hi:
            return True  # infeasible draw; skip
        dest[i] = rng.integers(lo, hi + 1)
    vals = rng.integers(0, 1 << 16, size=n)
    marks = np.zeros(n, dtype=bool)
    marks[src] = True
    dest_full = np.zeros(n, dtype=np.int64)
    dest_full[src] = dest
    out, valid = butterfly_compact(vals, marks, dest_full, n, stages=int(np.log2(n)))
    if out is None:
        print(f"COLLISION n={n} marks={n_marks}")
        return False
    expect = np.zeros(n, dtype=np.int64)
    expect_valid = np.zeros(n, dtype=bool)
    expect[dest] = vals[src]
    expect_valid[dest] = True
    ok = np.array_equal(out[expect_valid], expect[expect_valid]) and np.array_equal(valid, expect_valid)
    if not ok:
        print(f"MISMATCH n={n} marks={n_marks}")
    return ok


fails = 0
for t in range(2000):
    if not trial():
        fails += 1
        if fails > 5:
            break
print("fails:", fails, "/2000")

# Also the exact encode use-case: d0 staircase with steps <= 1
for t in range(500):
    n = 1024
    lens = rng.integers(1, 25, size=n)
    off = np.concatenate([[0], np.cumsum(lens)[:-1]])
    d0 = off >> 5
    marks = np.zeros(n, dtype=bool)
    marks[:-1] = d0[1:] > d0[:-1]
    marks[-1] = True
    dest_full = np.where(marks, d0, 0)
    vals = np.cumsum(rng.integers(0, 1 << 16, size=n))
    out, valid = butterfly_compact(vals, marks, dest_full, n, stages=10)
    if out is None:
        print("COLLISION in staircase case"); break
    src = np.flatnonzero(marks)
    ok = np.array_equal(out[d0[src]], vals[src])
    if not ok:
        print("STAIRCASE MISMATCH"); break
else:
    print("staircase: all ok")
