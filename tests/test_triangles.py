import pytest

from fogray import fixtures as fx
from fogray import oracle as orc
from fogray.triangles import triangle_count


@pytest.mark.parametrize(
    "name", ["triangles", "two_cliques_bridge", "selfloops", "dup_edges", "path5", "star_hub"]
)
def test_triangles_toys(ray_session, name):
    src, dst, w, n = fx.ALL_TOYS[name]()
    assert triangle_count((src, dst), n) == orc.triangle_count_bruteforce(src, dst, n)


def test_triangles_random(ray_session):
    src, dst, w, n = fx.random_graph(96, 0.08, seed=31)
    assert triangle_count((src, dst), n) == orc.triangle_count_bruteforce(src, dst, n)


@pytest.mark.parametrize("closure", ["broadcast", "shuffle"])
def test_triangles_closure_paths_agree(ray_session, closure):
    src, dst, w, n = fx.random_graph(80, 0.1, seed=17)
    assert triangle_count((src, dst), n, closure=closure) == orc.triangle_count_bruteforce(
        src, dst, n
    )
