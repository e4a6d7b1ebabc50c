"""Visualization: plot2D / plot_fields essentials
(analog of python/visualization.py:838-1063).

Renders the epsilon structure, source/monitor overlays, and field snapshots
with matplotlib.  Kept dependency-light: everything comes from the Simulation
accessors (get_epsilon / get_array)."""

from __future__ import annotations

from typing import Any, Optional

import numpy as np


def plot2D(sim, fields: Optional[str] = None, ax=None,
           field_alpha: float = 0.6, show_sources: bool = True,
           show_monitors: bool = True, output_plane=None):
    """2D structure + optional field overlay (visualization.py plot2D)."""
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots()
    sim.init_sim()
    gv = sim.gv
    if gv.ndim != 2:
        raise NotImplementedError("plot2D supports 2d cells (plot3d later)")
    eps = np.asarray(sim.get_epsilon())
    x0, y0 = gv.origin
    sx, sy = gv.size
    extent = [x0, x0 + sx, y0, y0 + sy]
    ax.imshow(eps.T, origin="lower", extent=extent, cmap="binary",
              interpolation="none")
    if fields is not None:
        arr = np.asarray(sim.get_array(component=fields))
        arr = np.real(arr)
        vmax = np.abs(arr).max() or 1.0
        ax.imshow(arr.T, origin="lower", extent=extent, cmap="RdBu",
                  alpha=field_alpha, vmin=-vmax, vmax=vmax,
                  interpolation="none")
    if show_sources:
        for s in sim.sources:
            c = s.center
            if s.size is None or (s.size.x == 0 and s.size.y == 0):
                ax.plot([c.x], [c.y], "rx")
            else:
                ax.plot([c.x - s.size.x / 2, c.x + s.size.x / 2],
                        [c.y - s.size.y / 2, c.y + s.size.y / 2], "r-")
    if show_monitors:
        for spec in sim._dft_specs:
            (a0, b0), (a1, b1) = spec.region[:2]
            xs = x0 + (np.array([a0, b0]) + 0.5) * gv.dx
            ys = y0 + (np.array([a1, b1]) + 0.5) * gv.dx
            ax.plot([xs[0], xs[1]], [ys[0], ys[0]], "b-", lw=0.8, alpha=0.3)
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    return ax


class Animate2D:
    """Collect field frames during run blocks (visualization.py:1388)."""

    def __init__(self, sim, fields: str, interval_steps: int = 10):
        self.sim = sim
        self.fields = fields
        self.interval = interval_steps
        self.frames = []

    def grab(self):
        self.frames.append(np.array(self.sim.get_array(component=self.fields)))

    def __call__(self, sim=None):
        """Step-function protocol: usable directly in
        sim.run(at_every(dt, animate), ...) like the reference's
        Animate2D."""
        if sim is not None:
            self.sim = sim
        self.grab()

    def to_mp4(self, path: str, fps: int = 10):
        import matplotlib.pyplot as plt
        import matplotlib.animation as animation

        fig, ax = plt.subplots()
        vmax = max(np.abs(f).max() for f in self.frames) or 1.0
        im = ax.imshow(self.frames[0].T, origin="lower", cmap="RdBu",
                       vmin=-vmax, vmax=vmax)

        def update(i):
            im.set_data(self.frames[i].T)
            return [im]

        ani = animation.FuncAnimation(fig, update, frames=len(self.frames))
        if path.endswith(".mp4") and not animation.FFMpegWriter.isAvailable():
            # no ffmpeg in this environment: Pillow can only write GIFs
            path = path[:-4] + ".gif"
        ani.save(path, fps=fps)
        plt.close(fig)
        return path

    # the reference's Animate2D exposes to_gif as well
    def to_gif(self, path: str, fps: int = 10):
        return self.to_mp4(path if path.endswith(".gif")
                           else path + ".gif", fps=fps)
