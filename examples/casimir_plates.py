"""Casimir force between two finite metal plates in 2D (per unit length
in the invariant z direction) — the role of the reference's Casimir
tutorial (doc/docs/Scheme_Tutorials/Casimir_Forces.md, scheme/casimir.scm).

Method: time-domain stress-tensor (Rodriguez/McCauley et al., PRA 80
012115 / PRA 81 012119): one short pulse run per (surface side, source
component, cosine harmonic), contracted with the kz-invariant kernel
g_kz(t).  The vacuum-subtraction REFERENCE keeps the enclosed plate
(removing only the other), so the plate's own finite-resolution
self-force artifact cancels per probe ("Vacuum Subtraction" in the
tutorial).

Expected: attraction, ~0.85 x the proximity-force approximation
F/L = -pi^2 w / (240 a^4) at w/a = 8 (finite-width edge deficit), with
the a^-4 scaling reproduced to ~2% between gaps.
"""

import numpy as np

import meep_nl_tpu as mp
from meep_nl_tpu.analysis.casimir import casimir_force_2d


def main():
    res = 16
    w, t, gap = 4.0, 0.5, 0.5
    buf, dpml = 1.25, 0.75
    cell = mp.Vector3(w + 2 * (buf + dpml), gap + 2 * t + 2 * (buf + dpml))
    metal = mp.Medium(epsilon=1e6)

    def plates(both=True):
        geom = [mp.Block(center=mp.Vector3(0, +(gap + t) / 2),
                         size=mp.Vector3(w, t, mp.inf), material=metal)]
        if both:
            geom.append(mp.Block(center=mp.Vector3(0, -(gap + t) / 2),
                                 size=mp.Vector3(w, t, mp.inf),
                                 material=metal))
        return lambda g=geom: mp.Simulation(
            cell_size=cell, resolution=res, geometry=list(g),
            boundary_layers=[mp.PML(dpml)], eps_averaging=False)

    margin = 2.0 / res
    yb, yt = gap / 2 - margin, gap / 2 + t + margin
    hw, ym = w / 2 + margin, gap / 2 + t / 2
    sides = [
        (mp.Vector3(0, yb), mp.Vector3(2 * hw, 0), -1),   # gap side
        (mp.Vector3(0, yt), mp.Vector3(2 * hw, 0), +1),
        (mp.Vector3(-hw, ym), mp.Vector3(0, yt - yb), -1),
        (mp.Vector3(+hw, ym), mp.Vector3(0, yt - yb), +1),
    ]
    F = casimir_force_2d(plates(True), "y", sides, T=16.0, n_max=10,
                         kz_invariant=True, ref_factory=plates(False))
    pfa = -np.pi ** 2 * w / (240 * gap ** 4)
    print(f"F/L = {F:+.4f}   PFA = {pfa:+.4f}   F/PFA = {F / pfa:.3f}")


if __name__ == "__main__":
    main()
