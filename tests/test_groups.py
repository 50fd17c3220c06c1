import numpy as np
import pytest

from ndpp_tpu import groups
from ndpp_tpu.utils.errors import ConfigError


def test_registry_counts():
    for name, ng in [("uniform-lethargy-47", 47), ("uniform-lethargy-172", 172), ("uniform-lethargy-361", 361)]:
        g = groups.get(name)
        assert g.ng == ng
        assert g.bounds.size == ng + 1
        assert np.all(np.diff(g.bounds) > 0)


def test_group_of():
    g = groups.get("uniform-lethargy-47")
    assert g.group_of(g.bounds[0]) == 0
    assert g.group_of(g.bounds[-1]) == g.ng  # at/above top
    assert g.group_of(g.bounds[0] * 0.5) == -1
    mid = np.sqrt(g.bounds[3] * g.bounds[4])
    assert g.group_of(mid) == 3


def test_published_names_need_file():
    with pytest.raises(ConfigError, match="published"):
        groups.get("shem-361")


def test_from_file(tmp_path):
    p = tmp_path / "bounds.txt"
    p.write_text("# comment\n1.0 10.0\n100.0\n")
    g = groups.from_file(p)
    assert g.ng == 2
    assert g.checksum()


def test_uniform_lethargy_is_log_uniform():
    g = groups.uniform_lethargy("x", 10, 1.0, 1e5)
    ratios = g.bounds[1:] / g.bounds[:-1]
    assert np.allclose(ratios, ratios[0], rtol=1e-12)
