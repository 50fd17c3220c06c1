import numpy as np
import pytest

from ndpp_tpu.host import interp


def test_linlin():
    assert interp.interp_pair(1.5, 1.0, 2.0, 10.0, 20.0, interp.LINLIN) == pytest.approx(15.0)


def test_histogram():
    assert interp.interp_pair(1.9, 1.0, 2.0, 10.0, 20.0, interp.HISTOGRAM) == pytest.approx(10.0)


def test_loglog_power_law():
    # y = x^2 is exact under log-log
    x1, x2 = 2.0, 8.0
    y = interp.interp_pair(4.0, x1, x2, x1**2, x2**2, interp.LOGLOG)
    assert y == pytest.approx(16.0, rel=1e-12)


def test_loglin_exponential():
    # y = exp(x) is exact under log-lin (ln y linear in x)
    y = interp.interp_pair(1.5, 1.0, 2.0, np.e, np.e**2, interp.LOGLIN)
    assert y == pytest.approx(np.e**1.5, rel=1e-12)


def test_linlog():
    # y = ln(x) is exact under lin-log
    y = interp.interp_pair(4.0, 2.0, 8.0, np.log(2.0), np.log(8.0), interp.LINLOG)
    assert y == pytest.approx(np.log(4.0), rel=1e-12)


def test_tab1_regions():
    xs = np.array([1.0, 2.0, 3.0, 4.0])
    ys = np.array([1.0, 4.0, 9.0, 16.0])
    # first two panels lin-lin, last panel histogram
    out = interp.interp_tab1(np.array([1.5, 3.5]), xs, ys, nbt=np.array([3, 4]), law=np.array([2, 1]))
    assert out[0] == pytest.approx(2.5)
    assert out[1] == pytest.approx(9.0)


def test_tab1_clamps():
    xs = np.array([1.0, 2.0])
    ys = np.array([5.0, 6.0])
    out = interp.interp_tab1(np.array([0.5, 3.0]), xs, ys)
    assert out[0] == 5.0 and out[1] == 6.0


def test_tab1_scalar():
    xs = np.array([1.0, 2.0])
    ys = np.array([5.0, 6.0])
    assert np.ndim(interp.interp_tab1(1.5, xs, ys)) == 0


def test_cdf_builders():
    xs = np.array([0.0, 1.0, 3.0])
    pdf = np.array([0.5, 0.5, 0.0])
    cdf = interp.trapz_pdf_to_cdf(xs, pdf)
    assert cdf[-1] == pytest.approx(1.0)
    hcdf = interp.hist_pdf_to_cdf(xs, np.array([0.5, 0.25, 0.0]))
    assert hcdf[-1] == pytest.approx(1.0)
