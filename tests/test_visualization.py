"""Visualization smoke tests (utils/visualization.py; reference
python/visualization.py plot2D/Animate2D)."""

import matplotlib
matplotlib.use("Agg")

import numpy as np
import pytest

import meep_nl_tpu as mp


def _sim():
    sim = mp.Simulation(
        cell_size=mp.Vector3(6, 4), resolution=10,
        geometry=[mp.Block(mp.Vector3(2, 1, mp.inf),
                           material=mp.Medium(epsilon=12))],
        sources=[mp.Source(mp.GaussianSource(frequency=0.8, fwidth=0.3),
                           component=mp.Ez, center=mp.Vector3(-2, 0))],
        boundary_layers=[mp.PML(0.8)])
    return sim


def test_plot2d(tmp_path):
    import matplotlib.pyplot as plt
    sim = _sim()
    sim.run(until=10)
    ax = mp.plot2D(sim, fields=mp.Ez)
    fig = ax.figure if hasattr(ax, "figure") else plt.gcf()
    out = tmp_path / "plot2d.png"
    fig.savefig(str(out))
    assert out.stat().st_size > 1000
    plt.close("all")


def test_animate2d(tmp_path):
    import matplotlib.pyplot as plt
    sim = _sim()
    anim = mp.Animate2D(sim, fields=mp.Ez)
    sim.run(mp.at_every(2.0, anim), until=8)
    assert len(anim.frames) >= 3
    plt.close("all")


def test_plot_fields_2d(tmp_path):
    import matplotlib.pyplot as plt
    sim = _sim()
    sim.run(until=8)
    fig, ax = plt.subplots()
    mp.plot2D(sim, ax=ax)
    mp.plot_fields(sim, ax=ax, fields=mp.Ez)
    out = tmp_path / "pf2d.png"
    fig.savefig(str(out))
    assert out.stat().st_size > 1000
    plt.close("all")


def _sim3d():
    return mp.Simulation(
        cell_size=mp.Vector3(3, 3, 3), resolution=8,
        geometry=[mp.Sphere(radius=0.7, material=mp.Medium(epsilon=12))],
        sources=[mp.Source(mp.GaussianSource(frequency=0.8, fwidth=0.3),
                           component=mp.Ez, center=mp.Vector3(-1, 0, 0))],
        boundary_layers=[mp.PML(0.5)])


def test_plot_fields_3d_plane(tmp_path):
    import matplotlib.pyplot as plt
    sim = _sim3d()
    sim.run(until=4)
    ax = mp.plot_fields(sim, fields=mp.Ez,
                        output_plane=(mp.Vector3(), mp.Vector3(3, 3, 0)))
    out = tmp_path / "pf3d.png"
    ax.figure.savefig(str(out))
    assert out.stat().st_size > 1000
    plt.close("all")


def test_plot3d(tmp_path):
    import matplotlib.pyplot as plt
    sim = _sim3d()
    out = tmp_path / "p3d.png"
    res = mp.plot3D(sim, save_to_image=True, image_name=str(out))
    assert out.stat().st_size > 1000
    plt.close("all")
