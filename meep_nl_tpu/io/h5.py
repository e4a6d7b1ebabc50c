"""HDF5 field output (role of src/h5file.cpp + src/h5fields.cpp).

Single-process h5py writes of field/epsilon arrays and DFT monitor data;
the reference's parallel-HDF5 slab writes map to host-gathered arrays here
(device-to-host is the analog of the rank gather)."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def output_hdf5(sim, components: Sequence[str], fname: str,
                center=None, size=None):
    """Write field component arrays to an HDF5 file
    (fields::output_hdf5, meep.hpp:1797)."""
    import h5py

    sim.init_sim()
    with h5py.File(fname, "w") as f:
        for c in components:
            arr = np.asarray(sim.get_array(component=c, center=center,
                                           size=size))
            if np.iscomplexobj(arr):
                f.create_dataset(f"{c}.r", data=arr.real)
                f.create_dataset(f"{c}.i", data=arr.imag)
            else:
                f.create_dataset(c, data=arr)
        f.attrs["time"] = sim.meep_time()


def output_epsilon_hdf5(sim, fname: str):
    import h5py

    sim.init_sim()
    with h5py.File(fname, "w") as f:
        f.create_dataset("eps", data=np.asarray(sim.get_epsilon()))


def save_dft_hdf5(sim, handle, fname: str):
    """Persist DFT accumulators (save_dft_hdf5, meep.hpp:1223) for
    restarted/normalization runs."""
    import h5py

    with h5py.File(fname, "w") as f:
        from ..stepper.step import dft_view
        for key, arr in sim.fields_state["dft"].items():
            if key.startswith(handle.name):
                a = np.asarray(dft_view(np.asarray(arr)))
                f.create_dataset(key + ".r", data=a.real)
                f.create_dataset(key + ".i", data=a.imag)


def load_dft_hdf5(sim, handle, fname: str):
    import h5py
    import jax.numpy as jnp

    sim.init_sim()
    dft = dict(sim.fields_state["dft"])
    with h5py.File(fname, "r") as f:
        for key in list(dft):
            if key.startswith(handle.name) and key + ".r" in f:
                dft[key] = jnp.asarray(np.stack(
                    [np.asarray(f[key + ".r"]), np.asarray(f[key + ".i"])],
                    axis=-1).astype(np.asarray(dft[key]).dtype))
    sim._state = {**sim._state, "dft": dft}
