"""Native C++ ACE tokenizer: correctness, Fortran exponents, fallback parity."""

import numpy as np
import pytest

from ndpp_tpu import native


def test_tokenize_basic():
    out = native.tokenize_floats("1.0 2.5e3 -4.25D-02\n7 1.234567890123E+05")
    np.testing.assert_allclose(out, [1.0, 2500.0, -0.0425, 7.0, 123456.7890123])


def test_tokenize_matches_numpy_split(rng):
    vals = rng.uniform(-1e10, 1e10, 5000)
    text = "\n".join("".join(f"{v:20.12E}" for v in vals[i : i + 4]) for i in range(0, vals.size, 4))
    a = native.tokenize_floats(text)
    b = np.array(text.split(), dtype=np.float64)
    assert np.array_equal(a, b)


def test_count_tokens():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (fallback path active)")
    data = b"  1.0\n2.0 3.0\t4.0  "
    assert lib.ndpp_count_tokens(data, len(data)) == 4


def test_fallback_env(monkeypatch):
    import importlib

    monkeypatch.setenv("NDPP_TPU_NO_NATIVE", "1")
    # fresh module state so the env var is honored
    import ndpp_tpu.native as nat

    old_lib, old_tried = nat._lib, nat._tried
    nat._lib, nat._tried = None, False
    try:
        out = nat.tokenize_floats("5.0 6.0")
        np.testing.assert_allclose(out, [5.0, 6.0])
    finally:
        nat._lib, nat._tried = old_lib, old_tried


def test_parser_uses_tokenizer_end_to_end():
    from ndpp_tpu.host.ace import synth
    from ndpp_tpu.host.ace.parse import parse_ascii
    from ndpp_tpu.host.ace.write import format_ascii

    nuc = synth.build("h1")
    back = parse_ascii(format_ascii(nuc))
    np.testing.assert_allclose(back.energy, nuc.energy, rtol=1e-10)
