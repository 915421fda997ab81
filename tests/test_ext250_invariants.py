"""Definition-level invariants for ext250 (targeted attack): monotone
shattering laws and the hub-vs-random contrast on planted graphs."""

from __future__ import annotations


def _cc_stats(nodes, edges, removed):
    alive = [v for v in nodes if v not in removed]
    parent = {v: v for v in alive}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a in parent and b in parent:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    sizes = {}
    for v in alive:
        r = find(v)
        sizes[r] = sizes.get(r, 0) + 1
    return len(alive), max(sizes.values()) if sizes else 0, len(sizes)


def _star_plus_ring():
    """Hub 0 connected to 1..10; ring over 11..16."""
    edges = {(0, i) for i in range(1, 11)} | {(i, 0) for i in range(1, 11)}
    ring = list(range(11, 17))
    for a, b in zip(ring, ring[1:] + ring[:1]):
        edges.add((a, b))
        edges.add((b, a))
    return list(range(17)), edges


def test_hub_removal_shatters_star():
    nodes, edges = _star_plus_ring()
    n0, big0, c0 = _cc_stats(nodes, edges, set())
    n1, big1, c1 = _cc_stats(nodes, edges, {0})
    assert (n0, big0, c0) == (17, 11, 2)
    assert (n1, big1, c1) == (16, 6, 11)  # star shatters to singletons


def test_largest_cc_monotone_nonincreasing():
    nodes, edges = _star_plus_ring()
    deg = {v: sum(1 for (a, _) in edges if a == v) for v in nodes}
    order = sorted(nodes, key=lambda v: (-deg[v], v))
    prev = None
    for k in range(6):
        _, big, _ = _cc_stats(nodes, edges, set(order[:k]))
        if prev is not None:
            assert big <= prev
        prev = big


def test_leaf_removal_costs_exactly_one():
    nodes, edges = _star_plus_ring()
    _, big0, _ = _cc_stats(nodes, edges, set())
    _, big1, _ = _cc_stats(nodes, edges, {5})  # a star leaf
    assert big1 == big0 - 1
