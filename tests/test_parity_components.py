"""Tests for the small parity components: isolates, PACE validity,
iso-dedup filter, D-VAE txt import, 3-way split, visualization layout."""

import numpy as np
import jax.numpy as jnp

from dags_vae_search_tpu.graphs import codec, nx_bridge, sampler
from dags_vae_search_tpu.graphs.dag import (
    is_connected_ignoring_isolates,
    is_valid_pace,
    isolate_mask,
    pace_wrap,
)
from dags_vae_search_tpu.training import data as data_lib
from dags_vae_search_tpu.utils import viz


def test_isolate_mask_and_tolerant_connectivity():
    adj = np.zeros((1, 5, 5), dtype=np.float32)
    adj[0, 0, 1] = adj[0, 1, 2] = adj[0, 2, 4] = 1.0  # vertex 3 isolated
    m = np.asarray(isolate_mask(jnp.asarray(adj)))[0]
    assert m.tolist() == [False, False, False, True, False]
    # connected when ignoring the isolate, NOT strictly connected
    from dags_vae_search_tpu.graphs.dag import is_weakly_connected

    assert not bool(is_weakly_connected(jnp.asarray(adj))[0])
    assert bool(is_connected_ignoring_isolates(jnp.asarray(adj))[0])


def test_is_valid_pace():
    rng = np.random.default_rng(0)
    labels, adj = sampler.sample_er_batch(rng, 4, 5, 6, 5)
    wrapped = pace_wrap(jnp.asarray(labels), jnp.asarray(adj))
    assert bool(np.all(is_valid_pace(wrapped.labels, wrapped.adj)))
    bad = np.asarray(wrapped.labels).copy()
    bad[0, 0] = 7  # no start vertex
    assert not bool(is_valid_pace(jnp.asarray(bad), wrapped.adj)[0])


def test_filter_non_isomorphic():
    rng = np.random.default_rng(1)
    labels, adj = sampler.sample_er_batch(rng, 6, 5, 6, 5)
    # duplicate the first graph at the end
    labels = np.concatenate([labels, labels[:1]])
    adj = np.concatenate([adj, adj[:1]])
    kept = nx_bridge.filter_non_isomorphic(labels, adj)
    assert 0 in kept
    assert len(kept) < 7  # the duplicate was dropped


def test_read_dvae_txt(tmp_path):
    path = tmp_path / "legacy.txt"
    path.write_text(
        "([[2], [0, 1], [3, 0, 1]], -12.5)\n([[1], [1, 0], [2, 1, 1]], 3.0)\n"
    )
    labels, adj, metrics = codec.read_dvae_txt(str(path))
    assert labels.tolist() == [[2, 0, 3], [1, 1, 2]]
    assert adj[0, 0, 1] == 1.0 and adj[0, 0, 2] == 0.0 and adj[0, 1, 2] == 1.0
    assert metrics.tolist() == [-12.5, 3.0]


def test_three_way_split():
    rng = np.random.default_rng(2)
    labels, adj = sampler.sample_er_batch(rng, 50, 5, 6, 5)
    corpus = data_lib.Corpus(labels, adj)
    train, test, val = data_lib.train_test_val_split(corpus, 0.2, 0.1, seed=1)
    assert len(test) == 10 and len(val) == 5 and len(train) == 35


def test_layered_layout_and_draw(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    adj = np.zeros((5, 5), dtype=np.float32)
    for a, b in [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4)]:
        adj[a, b] = 1.0
    pos = viz.layered_layout(adj)
    # children sit on lower y than parents
    assert pos[0, 1] > pos[2, 1] > pos[4, 1]
    fig, ax = plt.subplots()
    viz.draw_dag(adj, ax, labels=list("ABCDE"))
    fig.savefig(tmp_path / "dag.png")
    plt.close(fig)
    assert (tmp_path / "dag.png").stat().st_size > 0
