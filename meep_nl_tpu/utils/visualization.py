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


def plot_fields(sim, ax=None, fields=None, output_plane=None,
                field_parameters: Optional[dict] = None):
    """Field-only overlay on an existing axes (visualization.py:838
    plot_fields): plots Re(component) over the cell (2D) or over a 2D
    cross-section `output_plane = (center, size)` of a 3D cell (size has
    exactly one zero entry)."""
    import matplotlib.pyplot as plt

    if fields is None:
        return ax
    if ax is None:
        _, ax = plt.subplots()
    sim.init_sim()
    gv = sim.gv
    fp = dict(alpha=0.6, cmap="RdBu", interpolation="none")
    fp.update(field_parameters or {})
    post = fp.pop("post_process", np.real)

    if gv.ndim == 2:
        arr = post(np.asarray(sim.get_array(component=fields)))
        x0, y0 = gv.origin
        sx, sy = gv.size
        extent = [x0, x0 + sx, y0, y0 + sy]
        labels = ("x", "y")
    elif gv.ndim == 3:
        if output_plane is None:
            raise ValueError("3D cells need output_plane=(center, size) "
                             "with one zero size entry")
        center, size = output_plane
        sz = [size.x, size.y, size.z] if hasattr(size, "x") else list(size)
        flat = [i for i, s in enumerate(sz) if s == 0]
        if len(flat) != 1:
            raise ValueError("output_plane size needs exactly one zero")
        arr = np.asarray(sim.get_array(component=fields, center=center,
                                       size=size))
        arr = post(np.squeeze(arr, axis=flat[0]))
        keep = [i for i in range(3) if i != flat[0]]
        cc = [center.x, center.y, center.z] if hasattr(center, "x") \
            else list(center)
        extent = []
        for i in keep:
            extent += [cc[i] - sz[i] / 2, cc[i] + sz[i] / 2]
        labels = tuple("xyz"[i] for i in keep)
    else:
        raise NotImplementedError("plot_fields supports 2d/3d cells")
    vmax = np.abs(arr).max() or 1.0
    ax.imshow(arr.T, origin="lower", extent=extent, vmin=-vmax, vmax=vmax,
              **fp)
    ax.set_xlabel(labels[0])
    ax.set_ylabel(labels[1])
    return ax


def plot3D(sim, save_to_image: bool = False, image_name: str = "sim.png",
           max_voxels: int = 48 ** 3, **kwargs):
    """3D structure render (visualization.py:1063 plot3D).  The reference
    draws vispy marching-cubes isosurfaces; here the default backend is
    matplotlib voxels (always available, downsampled to <= max_voxels),
    with the vispy path used when the package is importable."""
    sim.init_sim()
    gv = sim.gv
    if gv.ndim != 3:
        raise ValueError("plot3D needs a 3D cell")
    eps = np.asarray(sim.get_epsilon())
    bg = float(np.real(getattr(sim.default_material, "epsilon", 1.0)))

    try:
        import vispy  # noqa: F401
        return _plot3d_vispy(sim, eps, bg, save_to_image, image_name,
                             **kwargs)
    except ImportError:
        pass

    import matplotlib.pyplot as plt

    # downsample so voxel rendering stays tractable
    step = max(1, int(np.ceil((eps.size / max_voxels) ** (1 / 3))))
    e = eps[::step, ::step, ::step]
    filled = np.abs(e - bg) > 1e-3
    fig = plt.figure()
    ax = fig.add_subplot(projection="3d")
    if filled.any():
        levels = np.unique(np.round(e[filled], 2))
        cmap = plt.get_cmap("viridis")
        colors = np.zeros(filled.shape + (4,))
        for i, lv in enumerate(levels):
            m = filled & (np.round(e, 2) == lv)
            colors[m] = cmap((i + 1) / (len(levels) + 1))
            colors[m, 3] = 0.5
        ax.voxels(filled, facecolors=colors, edgecolor=None)
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    ax.set_zlabel("z")
    if save_to_image:
        fig.savefig(image_name, dpi=120)
        plt.close(fig)
        return image_name
    return ax


def _plot3d_vispy(sim, eps, bg, save_to_image, image_name, **kwargs):
    """vispy marching-cubes backend matching the reference's plot3D."""
    from vispy.scene import SceneCanvas
    from vispy.scene.visuals import Mesh
    from skimage.measure import marching_cubes

    canvas = SceneCanvas(keys="interactive", bgcolor="white")
    view = canvas.central_widget.add_view()
    view.camera = "turntable"
    for lv in np.unique(np.round(np.abs(eps), 2)):
        if abs(lv - bg) < 1e-3:
            continue
        mask = (np.round(np.abs(eps), 2) == lv).astype(float)
        verts, faces, _, _ = marching_cubes(mask, 0.5)
        view.add(Mesh(verts, faces))
    if save_to_image:
        img = canvas.render()
        import imageio
        imageio.imwrite(image_name, img)
        return image_name
    canvas.show()
    return canvas


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
