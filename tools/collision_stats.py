"""Analytic hash-collision statistics: brick-granularity vs per-corner.

The brick encoder hashes at brick granularity (ops/brick_grid.py docstring);
a collision aliases a whole 4x4x4 corner block, and features are C0-
discontinuous across brick boundaries at hashed (fine) levels. The
reference hashes per corner at 2^log2_hashmap_size slots
(hash_encoder_half.py:66-103): collisions decorrelate per corner.

This measures, WITHOUT training, on thin-geometry occupancy sets (sphere
shell / textured-cloud-like noise shell — the adversarial regime from the
round-1 verdict): per level,

  * occupied bricks / corners (the live working set),
  * collision rate = 1 - unique(slots)/live  (for brick rows at
    max_table_rows and for reference corners at 2^21),
  * boundary exposure = fraction of occupied cells with >= 1 face
    neighbor in a DIFFERENT brick (where brick aliasing shows as a seam).

Usage: python tools/collision_stats.py [--rows 16384] [--log2 21]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

PRIMES = (1, 2654435761, 805459861)


def hash3(coords, n_slots):
    c = coords.astype(np.uint32)
    h = (c[:, 0] * np.uint32(PRIMES[0])
         ^ c[:, 1] * np.uint32(PRIMES[1])
         ^ c[:, 2] * np.uint32(PRIMES[2]))
    return h % np.uint32(n_slots)


def occupied_cells(res, kind, rng):
    """Cell coords of a thin occupied set at lattice resolution `res`."""
    n = 400_000
    if kind == "shell":
        p = rng.normal(size=(n, 3))
        p /= np.linalg.norm(p, axis=1, keepdims=True)
        r = 0.35 + 0.002 * rng.standard_normal(n)[:, None]  # thin shell
        x = 0.5 + p * r
    else:  # "cloud": scattered thin filaments
        t = rng.uniform(0, 2 * np.pi, n)
        k = rng.integers(0, 40, n)
        x = 0.5 + 0.4 * np.stack([
            np.cos(t + k), np.sin(1.7 * t + 0.3 * k), np.sin(t) * np.cos(k)
        ], axis=1) * rng.uniform(0.6, 1.0, n)[:, None]
    cells = np.unique(np.clip((x * res).astype(np.int64), 0, res - 1), axis=0)
    return cells


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16384)
    ap.add_argument("--log2", type=int, default=21)
    ap.add_argument("--kind", choices=("shell", "cloud"), default="shell")
    args = ap.parse_args()
    rng = np.random.default_rng(0)

    from cednerf_tpu.ops.hash_grid import level_resolution, level_scale
    import math
    n_levels, base, maxr = 8, 16, 4096
    log_b = math.log(maxr / base) / (n_levels - 1)

    print(f"kind={args.kind} rows={args.rows} ref_slots=2^{args.log2}")
    print(f"{'lvl':>3} {'res':>5} {'cells':>8} {'bricks':>8} "
          f"{'brick_coll':>10} {'corner_coll':>11} {'boundary%':>9}")
    for lvl in range(n_levels):
        res = level_resolution(level_scale(lvl, log_b, base))
        cells = occupied_cells(res, args.kind, rng)
        bricks = np.unique(cells // 3, axis=0)
        nb = (res + 2) // 3
        if nb ** 3 <= args.rows:  # dense level: exact, no hashing
            print(f"{lvl:>3} {res:>5} {len(cells):>8} {len(bricks):>8} "
                  f"{'dense':>10} {'dense':>11} {'-':>9}")
            continue
        brick_slots = hash3(bricks, args.rows)
        brick_coll = 1.0 - len(np.unique(brick_slots)) / len(bricks)
        # reference: 8 corners per occupied cell, per-corner hashing
        offs = np.stack(np.meshgrid([0, 1], [0, 1], [0, 1],
                                    indexing="ij"), -1).reshape(8, 3)
        corners = np.unique(
            (cells[:, None, :] + offs[None]).reshape(-1, 3), axis=0)
        c_slots = hash3(corners, 1 << args.log2)
        c_coll = 1.0 - len(np.unique(c_slots)) / len(corners)
        # boundary exposure: occupied cells with a face neighbor in
        # another brick (seam candidates under brick aliasing)
        exposed = np.zeros(len(cells), bool)
        cset = set(map(tuple, cells.tolist()))
        for ax in range(3):
            for d in (-1, 1):
                nb_cells = cells.copy()
                nb_cells[:, ax] += d
                diff_brick = (nb_cells[:, ax] // 3) != (cells[:, ax] // 3)
                has_nb = np.fromiter(
                    (tuple(c) in cset for c in nb_cells.tolist()),
                    bool, len(cells))
                exposed |= diff_brick & has_nb
        print(f"{lvl:>3} {res:>5} {len(cells):>8} {len(bricks):>8} "
              f"{brick_coll:>10.3f} {c_coll:>11.3f} "
              f"{100 * exposed.mean():>8.1f}%")


if __name__ == "__main__":
    main()
