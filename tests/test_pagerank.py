"""PageRank gates (stages/graph.py). Rows-only at the driver; these
tests carry correctness: an independent single-process reference of the
same fixed-point spec, a planted star graph, parallelism invariance,
driver-fold == shuffle-fold parity, and mass conservation."""
import numpy as np
import pandas as pd
import pytest


def ref_pagerank(edges, iters=10, damping_pct=85, scale=1 << 40):
    """Plain dict/loop implementation of the same integer spec."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    deg = [0] * n
    for s, _ in edges:
        deg[idx[s]] += 1
    deg = [max(d, 1) for d in deg]
    base = ((scale * (100 - damping_pct)) // 100) // n
    rank = [scale // n] * n
    for _ in range(iters):
        acc = [0] * n
        for s, d in edges:
            acc[idx[d]] += rank[idx[s]] // deg[idx[s]]
        rank = [base + (a * damping_pct) // 100 for a in acc]
    return dict(zip(nodes, rank))


@pytest.fixture(scope="module")
def random_edges():
    rng = np.random.RandomState(3)
    e = [(int(a), int(b)) for a, b in
         zip(rng.randint(0, 60, 400), rng.randint(0, 60, 400))]
    return e


def _ds(ray, edges, parts):
    df = pd.DataFrame(edges, columns=["src", "dst"])
    return ray.data.from_pandas(df).repartition(parts)


def test_parity_vs_reference(ray_session, random_edges):
    import ray

    from database_delta_plugins_ray.stages.graph import pagerank

    got = (pagerank(_ds(ray, random_edges, 5), iters=6).to_pandas()
           .set_index("node")["rank_fp"].to_dict())
    want = ref_pagerank(random_edges, iters=6)
    assert got == want


def test_star_graph_center_wins(ray_session):
    import ray

    from database_delta_plugins_ray.stages.graph import pagerank, PR_SCALE

    e = []
    for i in range(1, 9):
        e += [(0, i), (i, 0)]
    r = (pagerank(_ds(ray, e, 3), iters=8).to_pandas()
         .sort_values("rank_fp", ascending=False))
    assert r.iloc[0]["node"] == 0
    assert r.iloc[0]["rank_fp"] > 2 * r.iloc[1]["rank_fp"]
    # mass conserved to deterministic rounding
    assert 0.99 * PR_SCALE < r["rank_fp"].sum() <= PR_SCALE


def test_parallelism_and_fold_invariance(ray_session, random_edges):
    import ray

    from database_delta_plugins_ray.stages.graph import pagerank

    a = pagerank(_ds(ray, random_edges, 1), iters=5).to_pandas()
    b = pagerank(_ds(ray, random_edges, 11), iters=5).to_pandas()
    c = pagerank(_ds(ray, random_edges, 7), iters=5,
                 fold="shuffle").to_pandas()
    key = lambda df: df.sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(key(a), key(b))
    pd.testing.assert_frame_equal(key(a), key(c))


def test_dangling_nodes_leak_to_teleport(ray_session):
    import ray

    from database_delta_plugins_ray.stages.graph import pagerank

    # 2 -> 0, 2 -> 1; nodes 0 and 1 are dangling (emit nothing)
    r = (pagerank(_ds(ray, [(2, 0), (2, 1)], 2), iters=4).to_pandas()
         .set_index("node")["rank_fp"].to_dict())
    want = ref_pagerank([(2, 0), (2, 1)], iters=4)
    assert r == want
    # the dangling sinks still tie exactly (same inbound structure)
    assert r[0] == r[1]
