"""Photonic-crystal band diagram (the role of the reference's bundled MPB,
python/examples/mpb_*): TM/TE bands of the classic square lattice of
eps = 8.9 alumina rods, r/a = 0.2 (Joannopoulos ch. 5)."""

import numpy as np
import meep_nl_tpu as mp


def main():
    rods = [mp.Cylinder(radius=0.2, material=mp.Medium(epsilon=8.9))]
    n_seg = 8
    kpath = [(0.5 * i / n_seg, 0, 0) for i in range(n_seg + 1)]
    kpath += [(0.5, 0.5 * i / n_seg, 0) for i in range(1, n_seg + 1)]
    kpath += [(0.5 * (n_seg - i) / n_seg,) * 2 + (0,)
              for i in range(1, n_seg + 1)]

    ms = mp.ModeSolver(num_bands=6, k_points=kpath, geometry=rods,
                       n_g=13, resolution=64)
    tm = ms.run_tm()
    te = ms.run_te()
    gap = mp.retrieve_gap(tm, 1)
    print(f"TM gap between bands 1-2: {gap:.1f}%  "
          f"({tm[:, 0].max():.4f} .. {tm[:, 1].min():.4f})")
    print(f"TE gap between bands 1-2: {mp.retrieve_gap(te, 1):.1f}%")
    print("\n k-index  TM band1  TM band2  TE band1")
    for i in range(0, len(kpath), 4):
        print(f"  {i:3d}     {tm[i, 0]:.4f}    {tm[i, 1]:.4f}"
              f"    {te[i, 0]:.4f}")
    return tm, te


if __name__ == "__main__":
    main()
