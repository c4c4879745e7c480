import pytest

from elfi_tpu.dag import DAG


def build():
    g = DAG()
    for n in ["a", "b", "c", "d"]:
        g.add_node(n)
    g.add_edge("a", "c")
    g.add_edge("b", "c")
    g.add_edge("c", "d")
    return g


def test_parents_order_is_positional():
    g = DAG()
    g.add_node("x")
    g.add_node("y")
    g.add_node("op")
    g.add_edge("y", "op")
    g.add_edge("x", "op")
    assert g.parents("op") == ["y", "x"]


def test_topological_order_deterministic():
    g = build()
    order = g.topological_order()
    assert order.index("a") < order.index("c") < order.index("d")
    assert order.index("b") < order.index("c")
    assert order == g.topological_order()


def test_reduce_to_outputs():
    g = build()
    g.add_node("orphan")
    assert "orphan" not in g.topological_order(["d"])


def test_cycle_detection():
    g = build()
    with pytest.raises(ValueError):
        g.add_edge("d", "a")
    # graph must be unchanged after the failed insert
    assert g.parents("a") == []
    assert "a" not in g.children("d")


def test_duplicate_node():
    g = build()
    with pytest.raises(ValueError):
        g.add_node("a")


def test_remove_node():
    g = build()
    g.remove_node("c")
    assert "c" not in g
    assert g.parents("d") == []
    assert g.children("a") == []


def test_copy_independent():
    g = build()
    h = g.copy()
    h.add_node("e")
    h.add_edge("d", "e")
    assert "e" not in g
    h.nodes["a"]["mark"] = 1
    assert "mark" not in g.nodes["a"]


def test_ancestors():
    g = build()
    assert g.ancestors(["d"]) == {"a", "b", "c", "d"}
    assert g.ancestors(["c"]) == {"a", "b", "c"}
