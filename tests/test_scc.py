"""strongly_connected_components (ext/graph.py): FW-BW coloring vs an
in-test iterative Tarjan reference on fixed and seeded random digraphs
— labels must equal {node: min(SCC(node))} exactly, every node
assigned (caps sized to the fixpoint)."""

from __future__ import annotations

import random

from monzo_data_pipeline_spark.ext.graph import strongly_connected_components


def _tarjan_min_labels(nodes, edges):
    """{node: min node id of its SCC} — iterative Tarjan."""
    adj = {n: [] for n in nodes}
    for s, d in edges:
        adj[s].append(d)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    sccs = []
    counter = [0]
    for root in nodes:
        if root in index:
            continue
        work = [(root, iter(adj[root]))]
        index[root] = low[root] = counter[0]
        counter[0] += 1
        stack.append(root)
        on_stack.add(root)
        while work:
            v, it = work[-1]
            advanced = False
            for w in it:
                if w not in index:
                    index[w] = low[w] = counter[0]
                    counter[0] += 1
                    stack.append(w)
                    on_stack.add(w)
                    work.append((w, iter(adj[w])))
                    advanced = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                sccs.append(comp)
    out = {}
    for comp in sccs:
        m = min(comp)
        for n in comp:
            out[n] = m
    return out


def _run(spark, edges, outer_rounds=4, prop_rounds=12, **kw):
    df = spark.createDataFrame(edges, "src: long, dst: long")
    got = {
        r.node: r.scc
        for r in strongly_connected_components(
            df, outer_rounds, prop_rounds, **kw
        ).collect()
    }
    nodes = sorted({n for e in edges for n in e})
    want = _tarjan_min_labels(nodes, edges)
    # isolated self-loop-less nodes don't appear in the edge list,
    # so restrict the reference to edge-touching nodes (they all are)
    assert got == want
    return got


def test_scc_two_cycles_and_chain(spark):
    # 1→2→3→1 (SCC {1,2,3}), 4→5→4 (SCC {4,5}), chain 3→4, 5→6
    edges = [(1, 2), (2, 3), (3, 1), (4, 5), (5, 4), (3, 4), (5, 6)]
    got = _run(spark, edges)
    assert got[1] == got[2] == got[3] == 1
    assert got[4] == got[5] == 4
    assert got[6] == 6


def test_scc_nested_shadowed_roots(spark):
    # the second-outer-round case: SCC {8,9} is downstream of color 1,
    # so round 1 colors it 1 and captures only {1,2}; round 2 exposes
    # the root 8
    edges = [(1, 2), (2, 1), (1, 8), (8, 9), (9, 8)]
    got = _run(spark, edges)
    assert got[1] == got[2] == 1
    assert got[8] == got[9] == 8


def test_scc_dag_is_all_singletons(spark):
    edges = [(1, 2), (1, 3), (2, 4), (3, 4)]
    got = _run(spark, edges)
    assert got == {1: 1, 2: 2, 3: 3, 4: 4}


def test_scc_random_digraphs_match_tarjan(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 40
        edges = sorted(
            {
                (rng.randrange(n), rng.randrange(n))
                for _ in range(120)
            }
        )
        edges = [(s, d) for s, d in edges if s != d]
        _run(spark, edges, outer_rounds=8, prop_rounds=40)


def test_scc_distributed_path_matches_driver_finish(spark):
    """r11: the bounded driver finisher (Tarjan on residues under the
    collect caps) must agree with the distributed FW-BW peels — run
    the same seeded graph with the finisher disabled (caps=0) and at
    its default; exact SCC assignments are unique, so both must match
    the in-test Tarjan reference."""
    rng = random.Random(11)
    edges = sorted(
        {(rng.randrange(30), rng.randrange(30)) for _ in range(90)}
    )
    edges = [(s, d) for s, d in edges if s != d]
    got_driver = _run(spark, edges, outer_rounds=8, prop_rounds=40)
    got_dist = _run(
        spark,
        edges,
        outer_rounds=8,
        prop_rounds=40,
        driver_finish_nodes=0,
    )
    assert got_driver == got_dist


def test_scc_edge_cap_overflow_falls_through(spark):
    """A residue under the node cap but over the EDGE cap must fall
    through to the distributed peels (the limit-guard path) and still
    produce the exact assignment."""
    rng = random.Random(13)
    edges = sorted(
        {(rng.randrange(25), rng.randrange(25)) for _ in range(80)}
    )
    edges = [(s, d) for s, d in edges if s != d]
    _run(
        spark,
        edges,
        outer_rounds=8,
        prop_rounds=40,
        driver_finish_edges=1,
    )
