"""Real-dataset loading for the canonical workloads.

The reference's model loaders read ``.pt`` tensors from a ``data/`` directory
(e.g. ``examples/models/movielens/movielens.py:12-22``); the tensor files are
not checked into its repo — users produce them with the reference's
data-munging scripts.  This helper honours the same file-name contract, so a
dataset directory prepared for the reference drops straight into this
framework: pass ``fake_data=False, data_dir=...`` to any canonical model's
``load_data_covariates``.  ``<stem>.pt`` loads via torch (CPU-only in this
image); ``<stem>.npy`` works without torch.
"""
import os

import numpy as np


def load_array(data_dir, stem):
    """Load ``<data_dir>/<stem>.pt`` (torch) or ``<stem>.npy`` as float32/int
    numpy.  Raises FileNotFoundError naming both candidates if absent."""
    pt = os.path.join(data_dir, stem + ".pt")
    npy = os.path.join(data_dir, stem + ".npy")
    if os.path.exists(pt):
        import torch
        x = torch.load(pt, map_location="cpu", weights_only=True)
        a = x.detach().numpy() if hasattr(x, "detach") else np.asarray(x)
    elif os.path.exists(npy):
        a = np.load(npy)
    else:
        raise FileNotFoundError(
            f"real dataset file not found: {pt} or {npy} "
            f"(pass fake_data=True to generate data from the prior)")
    if a.dtype == np.float64:
        a = a.astype(np.float32)
    return a


def load_train_test(data_dir, train_stem, test_stem, axis):
    """Load a train/test pair and return (train, concat(train, test, axis)) —
    the reference's standard extended-data construction."""
    tr = load_array(data_dir, train_stem)
    te = load_array(data_dir, test_stem)
    return tr, np.concatenate([tr, te], axis=axis)
