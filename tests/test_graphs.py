"""Graph-core tests: golden pairs from the reference test suite rebuilt as
tensor fixtures (tests/toolkit/test_labeled.py, tests/models/test_pace_utils.py),
plus closure/mask/sampler properties the reference leaves untested."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dags_vae_search_tpu.graphs import (
    DagBatch,
    attention_allowed,
    graphs_equal_exact,
    is_valid_labeled,
    is_weakly_connected,
    num_edges,
    pace_unwrap,
    pace_wrap,
    transitive_closure,
)
from dags_vae_search_tpu.graphs import codec, nx_bridge, sampler


def five_vertex_graph():
    """The 5-vertex golden graph from the reference tests: edges
    (0,1),(0,2),(1,2),(2,3),(3,4), labels 0..4."""
    n = 5
    labels = np.arange(n, dtype=np.int32)[None]
    adj = np.zeros((1, n, n), dtype=np.float32)
    for a, b in [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4)]:
        adj[0, a, b] = 1.0
    return labels, adj


def test_transitive_closure_paths():
    _, adj = five_vertex_graph()
    closure = np.asarray(transitive_closure(jnp.asarray(adj)))[0]
    # 0 reaches everything; 4 reaches nothing.
    assert closure[0].tolist() == [0, 1, 1, 1, 1]
    assert closure[:, 0].tolist() == [0, 0, 0, 0, 0]
    assert closure[1].tolist() == [0, 0, 1, 1, 1]
    assert closure[4].tolist() == [0, 0, 0, 0, 0]


def test_attention_allowed_ancestors_and_self():
    _, adj = five_vertex_graph()
    allowed = np.asarray(attention_allowed(jnp.asarray(adj)))[0]
    # Query attends ancestors + self: vertex 3's ancestors are {0,1,2}.
    assert allowed[3].tolist() == [True, True, True, True, False]
    assert allowed[0].tolist() == [True, False, False, False, False]


def test_attention_allowed_padding_blocks():
    _, adj = five_vertex_graph()
    allowed = np.asarray(attention_allowed(jnp.asarray(adj), n_valid=jnp.array([3])))[0]
    # Real/pad cross blocks are masked; pad block fully allowed.
    assert not allowed[0, 4] and not allowed[4, 0]
    assert allowed[3, 3] and allowed[3, 4] and allowed[4, 4]
    assert allowed[2, 0] and not allowed[2, 3]


def test_pace_wrap_matches_reference_golden_pair():
    # Golden pair from tests/models/test_pace_utils.py: wrapping the 5-vertex
    # graph yields an 8-vertex PACE graph with labels [2,0,3,4,5,6,7,1] and
    # edges start->input, input->0', 0'->1', 0'->2', 1'->2', 2'->3', 3'->4',
    # 4'->output (primes = +2 slot shift).
    labels, adj = five_vertex_graph()
    wrapped = pace_wrap(jnp.asarray(labels), jnp.asarray(adj))
    assert np.asarray(wrapped.labels)[0].tolist() == [2, 0, 3, 4, 5, 6, 7, 1]
    expected_edges = {(0, 1), (1, 2), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6), (6, 7)}
    got = set(zip(*np.nonzero(np.asarray(wrapped.adj)[0] > 0)))
    assert {(int(a), int(b)) for a, b in got} == expected_edges


def test_pace_roundtrip():
    labels, adj = five_vertex_graph()
    wrapped = pace_wrap(jnp.asarray(labels), jnp.asarray(adj))
    back = pace_unwrap(wrapped.labels, wrapped.adj)
    assert np.array_equal(np.asarray(back.labels), labels)
    assert np.array_equal(np.asarray(back.adj), adj)


def test_validity_and_equality():
    labels, adj = five_vertex_graph()
    assert bool(is_valid_labeled(jnp.asarray(labels), jnp.asarray(adj), 5)[0])
    bad_labels = labels.copy()
    bad_labels[0, 0] = 7
    assert not bool(is_valid_labeled(jnp.asarray(bad_labels), jnp.asarray(adj), 5)[0])
    bad_adj = adj.copy()
    bad_adj[0, 3, 1] = 1.0  # backward edge violates topological indexing
    assert not bool(is_valid_labeled(jnp.asarray(labels), jnp.asarray(bad_adj), 5)[0])

    assert bool(
        graphs_equal_exact(
            jnp.asarray(labels), jnp.asarray(adj), jnp.asarray(labels), jnp.asarray(adj)
        )[0]
    )
    other = adj.copy()
    other[0, 0, 1] = 0.0
    assert not bool(
        graphs_equal_exact(
            jnp.asarray(labels), jnp.asarray(adj), jnp.asarray(labels), jnp.asarray(other)
        )[0]
    )


def test_weak_connectivity():
    _, adj = five_vertex_graph()
    assert bool(is_weakly_connected(jnp.asarray(adj))[0])
    disconnected = adj.copy()
    disconnected[0, 3, 4] = 0.0
    disconnected[0, 2, 3] = 0.0
    assert not bool(is_weakly_connected(jnp.asarray(disconnected))[0])


def test_codec_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    labels, adj = sampler.sample_er_batch(rng, 64, 8, 10, 8)
    path = str(tmp_path / "ds")
    codec.write_dataset(path, labels, adj)
    labels2, adj2 = codec.read_dataset(path)
    assert np.array_equal(labels, labels2)
    assert np.array_equal(adj, adj2)


def test_codec_reads_reference_style_dict():
    # The hand-coded pydict from reference tests/toolkit/test_labeled.py:49-64
    # as one parquet row.
    import pyarrow as pa

    row = {
        "l0": [0], "l1": [1], "l2": [2], "l3": [3], "l4": [4],
        "e0": [""], "e1": ["1"], "e2": ["11"], "e3": ["001"], "e4": ["0001"],
    }
    table = pa.table(row).cast(codec.pyarrow_schema(5))
    labels, adj = codec.table_to_tensors(table)
    expect_labels, expect_adj = five_vertex_graph()
    assert np.array_equal(labels, expect_labels)
    assert np.array_equal(adj, expect_adj)


def test_host_sampler_properties():
    rng = np.random.default_rng(42)
    labels, adj = sampler.sample_er_batch(rng, 128, 8, 10, 8)
    assert np.all(np.asarray(num_edges(jnp.asarray(adj))) == 10)
    assert np.all(np.asarray(is_weakly_connected(jnp.asarray(adj))))
    assert bool(np.all(is_valid_labeled(jnp.asarray(labels), jnp.asarray(adj), 8)))
    # 'sample' labels are permutations (no repeats within a graph).
    assert all(len(set(row.tolist())) == 8 for row in labels)


def test_device_sampler_properties():
    key = jax.random.PRNGKey(0)
    labels, adj, ok = sampler.sample_er_dags(key, 64, 8, 10, 8)
    assert np.all(np.asarray(num_edges(adj)) == 10)
    assert np.asarray(is_weakly_connected(adj)).mean() > 0.9
    assert bool(np.all(is_valid_labeled(labels, adj, 8)))
    # the ok mask marks exactly the graphs whose retry budget connected
    assert np.array_equal(np.asarray(ok), np.asarray(is_weakly_connected(adj)))


def test_device_sampler_reports_exhausted_budget():
    # At the connectivity threshold (m = n - 1) with a budget of one attempt
    # some graphs must fail; they are flagged, not silently returned.
    key = jax.random.PRNGKey(1)
    labels, adj, ok = sampler.sample_er_dags(
        key, 256, 12, 11, 12, num_attempts=1
    )
    ok = np.asarray(ok)
    connected = np.asarray(is_weakly_connected(adj))
    assert np.array_equal(ok, connected)
    assert not ok.all()  # the failure mode actually occurs at this setting


def test_edge_count_schedule_parity():
    # asia recipe: n=8, density 0.4, 16 steps -> edge counts 7..11 with
    # (i+1)^2 batches (src/encoders/utils.py:36-51; data/bn_asia recipe).
    schedule = sampler.edge_count_schedule(8, 0.4, 16)
    edges = [e for e, _ in schedule]
    batches = [b for _, b in schedule]
    assert edges == sorted(set(np.linspace(7, 11, 16).astype(int).tolist()))
    assert batches == [(i + 1) ** 2 for i in range(len(edges))]


def test_nx_bridge_isomorphism():
    labels, adj = five_vertex_graph()
    # Permute vertices 1,2 is NOT an automorphism here, but an isomorphic
    # relabeled copy must be detected.
    perm = np.array([0, 2, 1, 3, 4])
    inv = np.argsort(perm)
    adj_p = adj[0][perm][:, perm]
    labels_p = labels[0][perm]
    assert nx_bridge.graph_equals_isomorphic(labels[0], adj[0], labels_p, adj_p)
    assert not nx_bridge.graph_equals_isomorphic(
        labels[0], adj[0], labels[0], np.zeros_like(adj[0])
    )


def test_blocked_closure_matches_dense():
    from dags_vae_search_tpu.ops.reachability import closure_blocked

    rng = np.random.default_rng(0)
    n = 300
    batch = 3
    adj = (rng.random((batch, n, n)) < 0.02).astype(np.float32)
    adj *= np.triu(np.ones((n, n), dtype=np.float32), k=1)
    dense = np.asarray(transitive_closure(jnp.asarray(adj)))
    blocked = np.asarray(closure_blocked(jnp.asarray(adj), tile=128))
    assert np.array_equal(dense, blocked)


def test_blocked_closure_small_passthrough():
    from dags_vae_search_tpu.ops.reachability import closure_blocked

    _, adj = five_vertex_graph()
    dense = np.asarray(transitive_closure(jnp.asarray(adj)))
    blocked = np.asarray(closure_blocked(jnp.asarray(adj), tile=128))
    assert np.array_equal(dense, blocked)


def test_constructive_connected_sampler():
    rng = np.random.default_rng(3)
    labels, adj = sampler.sample_connected_dags(rng, 16, 40, 60, 40)
    assert np.all(np.asarray(num_edges(jnp.asarray(adj))) == 60)
    assert np.all(np.asarray(is_weakly_connected(jnp.asarray(adj))))
    assert bool(np.all(is_valid_labeled(jnp.asarray(labels), jnp.asarray(adj), 40)))


def test_capped_sampler_feasibility():
    """In-degree-capped generation (scorer/decode feasibility alignment)."""
    rng = np.random.default_rng(11)
    _, adj = sampler.sample_er_batch(
        rng, 32, 37, 133, 37, on_exhaust="partial", max_in_degree=8
    )
    assert adj.shape[0] > 0
    assert (adj.sum(axis=1) <= 8).all()
    assert (adj.sum(axis=(1, 2)) == 133).all()
    assert np.all(np.asarray(is_weakly_connected(jnp.asarray(adj))))

    _, cadj = sampler.sample_connected_dags(rng, 8, 90, 260, 90, max_in_degree=4)
    assert (cadj.sum(axis=1) <= 4).all()
    assert (cadj.sum(axis=(1, 2)) == 260).all()
    assert np.all(np.asarray(is_weakly_connected(jnp.asarray(cadj))))


def test_capped_sampler_legacy_parity():
    """cap >= n-1 must reproduce the uncapped stream byte-for-byte (seeded
    corpora, e.g. asia's, regenerate identically)."""
    a = sampler.sample_er_batch(np.random.default_rng(5), 16, 8, 11, 8)
    b = sampler.sample_er_batch(
        np.random.default_rng(5), 16, 8, 11, 8, max_in_degree=7
    )
    assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])


def test_generate_corpus_clips_to_cap_feasible():
    """Schedule entries above the cap-feasible max are clipped + merged."""
    rng = np.random.default_rng(2)
    labels, adj = sampler.generate_corpus(rng, 80, 80, 2, 4, 0.5, max_in_degree=3)
    limit = sampler.max_edges_capped(80, 3)
    assert (adj.sum(axis=1) <= 3).all()
    assert int(adj.sum(axis=(1, 2)).max()) == limit
