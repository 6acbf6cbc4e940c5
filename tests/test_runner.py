"""ExperimentRunner unit tests (the pipeline CLI is exercised end-to-end by
the catalog runs; these cover host-side dataset provisioning logic).

Reference analogue: the simulated-ground-truth datasets replace the
reference's R-exported ``target.csv`` samples (``data/bn_asia/README.md:5-12``)
for catalog networks without shipped data.
"""

import numpy as np
import pytest

from dags_vae_search_tpu.experiments.runner import ExperimentRunner
from dags_vae_search_tpu.graphs import sampler
from dags_vae_search_tpu.utils.config import ExperimentConfig


def _runner(tmp_path, n=9):
    config = ExperimentConfig(
        name="unit_sim", num_vertices=n, label_cardinality=n,
        simulate_cases=64,
    )
    return ExperimentRunner(config, data_dir=str(tmp_path))


def test_scoring_dataset_simulates_and_persists(tmp_path):
    r = _runner(tmp_path)
    ds = r.scoring_dataset()
    assert ds.codes.shape == (64, 9)
    # persisted and reloaded identically by a fresh runner
    r2 = _runner(tmp_path)
    ds2 = r2.scoring_dataset()
    np.testing.assert_array_equal(ds.codes, ds2.codes)
    np.testing.assert_array_equal(r._truth_adj, r2._truth_adj)


def test_scoring_dataset_constructive_fallback(tmp_path, monkeypatch):
    """When connected-ER rejection sampling exhausts its retry budget (the
    regime for andes n=223 / link n=724), the ground-truth graph falls back
    to the constructive spanning-tree sampler instead of crashing."""

    def exhausted(*args, **kwargs):
        raise RuntimeError("max_rounds exceeded with no connected DAG generated")

    monkeypatch.setattr(sampler, "sample_er_batch", exhausted)
    r = _runner(tmp_path)
    ds = r.scoring_dataset()
    truth = r._truth_adj
    assert ds.codes.shape == (64, 9)
    # constructive truth is a DAG in slot order and weakly connected:
    # every non-root vertex has at least one parent
    assert np.allclose(np.tril(truth), 0.0)
    assert (truth[:, 1:].sum(axis=0) >= 1).all()
