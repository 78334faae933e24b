"""Scale-behavior pins for the graph family (the dedup-scale pattern):
planted structure at a few thousand nodes, exact recovery asserted,
wall bounded implicitly by the suite timeout."""

import itertools
import time

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gene_etl_ray.ops import graph

N_CLIQUES = 100
CLIQUE = 12


@pytest.fixture(scope="module")
def ring_of_cliques(ray_session):
    """100 cliques of 12, consecutive cliques bridged by one edge —
    2,400 nodes, ~13k directed edges, known community structure."""
    edges = []
    for c in range(N_CLIQUES):
        base = c * CLIQUE
        edges += [(base + a, base + b)
                  for a, b in itertools.permutations(range(CLIQUE), 2)]
        edges.append((base + CLIQUE - 1, ((c + 1) % N_CLIQUES) * CLIQUE))
    return pd.DataFrame(edges, columns=["src", "dst"])


def test_lpa_recovers_planted_cliques(ring_of_cliques):
    t0 = time.time()
    # force the Dataset-round path: the planted-structure tests exist
    # to exercise the DISTRIBUTED rounds, not the in-task kernel
    out = graph.label_propagation(
        rd.from_pandas(ring_of_cliques, override_num_blocks=8), iters=4,
        small_edge_limit=0)
    wall = time.time() - t0
    assert len(out) == N_CLIQUES * CLIQUE
    groups = out.groupby("community")["node"].apply(
        lambda s: tuple(sorted(s)))
    want = [tuple(range(c * CLIQUE, (c + 1) * CLIQUE))
            for c in range(N_CLIQUES)]
    assert sorted(groups.tolist()) == want
    assert wall < 300  # bounded: Dataset exchanges, no driver blowup


def test_pagerank_on_planted_graph(ring_of_cliques):
    pr = graph.pagerank(
        rd.from_pandas(ring_of_cliques, override_num_blocks=8), iters=5,
        small_edge_limit=0,
    ).to_pandas()
    assert len(pr) == N_CLIQUES * CLIQUE
    assert abs(pr["pr"].sum() - 1.0) < 1e-9
    # symmetry: every clique-internal (non-bridge) node has equal rank
    inner = pr[~pr["node"].mod(CLIQUE).isin([0, CLIQUE - 1])]
    assert inner["pr"].std() < 1e-12


def test_triangles_on_planted_graph(ring_of_cliques):
    out = graph.triangle_counts(
        rd.from_pandas(ring_of_cliques, override_num_blocks=8))
    # every node sits in C(11,2)=55 triangles of its own clique;
    # bridges add none (bridge endpoints share no third neighbor)
    per_clique = (CLIQUE - 1) * (CLIQUE - 2) // 2
    assert len(out) == N_CLIQUES * CLIQUE
    assert (out["n_tri"] == per_clique).all()
