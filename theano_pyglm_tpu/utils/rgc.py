"""Real-data loading for RGC-style recordings (SURVEY.md §2 "Harness
scripts", §4.2 "Real-data harness").

The reference fits the 27-neuron primate retinal ganglion cell dataset of
Pillow et al. 2008 from a .mat file holding per-cell spike-time vectors and
the full-field/spatial binary stimulus [M]. The real file is not
redistributable, so this module defines the *format contract* — a
``SpTimes`` cell array (seconds), a ``stim`` frame matrix with frame
interval ``dtStim`` — plus a loader robust to the cell-array shapes
scipy.io produces, and a fixture writer that emits a synthetic recording in
exactly that layout for CI (scripts/fit_rgc.py drives it end-to-end).

Event-format .npz (spike_times/spike_neurons/N/T_sec/dt) is handled by
utils.io.load_data; this module is only the .mat side.
"""

from __future__ import annotations

import numpy as np

__all__ = ["load_rgc_mat", "save_rgc_fixture_mat", "make_synthetic_rgc"]


def _cell_to_list(sp):
    """Flatten a scipy.io cell array (object ndarray of arrays) to a list of
    1-D float arrays, tolerating (N,1)/(1,N)/(N,) layouts and scalar cells."""
    sp = np.asarray(sp)
    if sp.dtype != object:
        # a plain 2-D array: rows are neurons (padded with NaN)
        return [row[np.isfinite(row)].astype(np.float64) for row in np.atleast_2d(sp)]
    out = []
    for cell in sp.ravel():
        arr = np.asarray(cell, dtype=np.float64).ravel()
        out.append(arr[np.isfinite(arr)])
    return out


def load_rgc_mat(path: str) -> dict:
    """Load a Pillow-style RGC .mat file.

    Expected variables:
      SpTimes: cell array of per-neuron spike-time vectors (seconds)
      stim:    (T_frames, D) stimulus frames (optional)
      dtStim:  stimulus frame interval in seconds (required if stim present)
      duration: recording length in seconds (optional; defaults to the last
                spike or the stimulus extent)

    Returns dict(times, neurons, N, T_sec[, stim, stim_dt]) — event format,
    ready for utils.binning.bin_spikes.
    """
    from scipy.io import loadmat

    raw = loadmat(path)
    if "SpTimes" not in raw:
        raise ValueError(f"{path!r} has no 'SpTimes' variable (keys: "
                         f"{[k for k in raw if not k.startswith('__')]})")
    per_neuron = _cell_to_list(raw["SpTimes"])
    N = len(per_neuron)
    times = np.concatenate(per_neuron) if N else np.zeros(0)
    neurons = np.concatenate(
        [np.full(len(t), n, dtype=np.int64) for n, t in enumerate(per_neuron)]
    ) if N else np.zeros(0, np.int64)
    order = np.argsort(times, kind="stable")
    out = {"times": times[order], "neurons": neurons[order], "N": N}

    stim = raw.get("stim")
    dt_stim = raw.get("dtStim")
    if stim is not None and stim.size:
        stim = np.asarray(stim, np.float64)
        if stim.ndim == 1:
            stim = stim[:, None]
        if dt_stim is None:
            raise ValueError("stim present but no dtStim frame interval")
        out["stim"] = stim
        out["stim_dt"] = float(np.asarray(dt_stim).ravel()[0])

    if "duration" in raw:
        out["T_sec"] = float(np.asarray(raw["duration"]).ravel()[0])
    elif "stim" in out:
        out["T_sec"] = out["stim"].shape[0] * out["stim_dt"]
    else:
        out["T_sec"] = float(times.max()) if times.size else 0.0
    return out


def make_synthetic_rgc(N: int = 8, T_sec: float = 20.0, dt: float = 1e-3,
                       stim_dt: float = 0.01, D_stim: int = 1, seed: int = 0):
    """Generate a synthetic RGC-style recording from the framework's own
    sparse network GLM: returns (per_neuron_times, stim, true_params, spec).

    Used by ``save_rgc_fixture_mat`` to ship a fixture in the real format,
    and by tests to check the round trip recovers the generating model.
    """
    import jax

    from theano_pyglm_tpu import Population, make_model

    spec = make_model("sparse_weighted_model", N)
    spec["bias"] = {"mu": 2.5, "sigma": 0.3}
    spec["bkgd"]["D_stim"] = D_stim
    pop = Population(spec)
    true = pop.sample(jax.random.PRNGKey(seed))
    T = int(round(T_sec / dt))
    rng = np.random.RandomState(seed)
    n_frames = int(np.ceil(T_sec / stim_dt))
    # binary full-field flicker, the Pillow-style stimulus class
    stim = (rng.rand(n_frames, D_stim) < 0.5).astype(np.float64) * 2.0 - 1.0
    S, _ = pop.simulate(jax.random.PRNGKey(seed + 1), true, T,
                        stim=stim, stim_dt=stim_dt)
    S = np.asarray(S)
    per_neuron = []
    for n in range(N):
        bins = np.repeat(np.arange(T), S[:, n].astype(int))
        # place spikes mid-bin so binning at the same dt is exact
        per_neuron.append((bins + 0.5) * dt)
    return per_neuron, stim, true, spec


def save_rgc_fixture_mat(path: str, N: int = 8, T_sec: float = 20.0,
                         dt: float = 1e-3, stim_dt: float = 0.01,
                         D_stim: int = 1, seed: int = 0) -> dict:
    """Write a synthetic recording as a Pillow-format .mat fixture
    (SpTimes cell array + stim + dtStim + duration). Returns the ground
    truth dict for recovery checks."""
    from scipy.io import savemat

    per_neuron, stim, true, spec = make_synthetic_rgc(
        N=N, T_sec=T_sec, dt=dt, stim_dt=stim_dt, D_stim=D_stim, seed=seed
    )
    cell = np.empty((len(per_neuron), 1), dtype=object)
    for i, t in enumerate(per_neuron):
        cell[i, 0] = t.reshape(-1, 1)
    savemat(path, {
        "SpTimes": cell,
        "stim": stim,
        "dtStim": np.asarray(stim_dt),
        "duration": np.asarray(T_sec),
    })
    return {"true": true, "spec": spec}
