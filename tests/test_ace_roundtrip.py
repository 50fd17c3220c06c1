"""Writer -> parser round-trip over every synthetic fixture (SURVEY.md section 4.1)."""

import numpy as np
import pytest

from ndpp_tpu.host.ace import synth
from ndpp_tpu.host.ace.parse import parse_ascii
from ndpp_tpu.host.ace.write import format_ascii

RTOL = 1e-10  # ASCII format carries 12 significant digits


def _assert_tab1_close(a, b):
    np.testing.assert_allclose(a.x, b.x, rtol=RTOL)
    np.testing.assert_allclose(a.y, b.y, rtol=RTOL)


@pytest.mark.parametrize("fixture", sorted(synth.ALL_FIXTURES))
def test_roundtrip(fixture):
    nuc = synth.build(fixture)
    text = format_ascii(nuc)
    back = parse_ascii(text)

    assert back.name == nuc.name
    assert back.zaid == nuc.zaid
    assert back.awr == pytest.approx(nuc.awr, rel=1e-6)
    assert back.kT == pytest.approx(nuc.kT, rel=1e-3)
    np.testing.assert_allclose(back.energy, nuc.energy, rtol=RTOL)
    np.testing.assert_allclose(back.sigma_el, nuc.sigma_el, rtol=RTOL)
    np.testing.assert_allclose(back.sigma_a, nuc.sigma_a, rtol=RTOL)

    assert sorted(back.reactions) == sorted(nuc.reactions)
    for mt, rxn in nuc.reactions.items():
        brx = back.reactions[mt]
        assert brx.frame == rxn.frame
        assert brx.threshold_idx == rxn.threshold_idx
        assert brx.is_fission == rxn.is_fission
        np.testing.assert_allclose(brx.sigma, rxn.sigma, rtol=RTOL)
        assert len(brx.energy_dists) == len(rxn.energy_dists)
        for bed, ed in zip(brx.energy_dists, rxn.energy_dists):
            assert bed.law == ed.law
            _assert_tab1_close(bed.applicability, ed.applicability)
            if ed.law == 3:
                assert bed.data.c1 == pytest.approx(ed.data.c1, rel=RTOL)
                assert bed.data.c2 == pytest.approx(ed.data.c2, rel=RTOL)
            elif ed.law in (4, 44, 61):
                np.testing.assert_allclose(bed.data.energies, ed.data.energies, rtol=RTOL)
                for bt, t in zip(bed.data.tables, ed.data.tables):
                    assert bt.intt == t.intt and bt.nd == t.nd
                    np.testing.assert_allclose(bt.e_out, t.e_out, rtol=RTOL)
                    np.testing.assert_allclose(bt.pdf, t.pdf, rtol=RTOL)
                    np.testing.assert_allclose(bt.cdf, t.cdf, rtol=RTOL, atol=1e-14)
                    if ed.law == 44:
                        np.testing.assert_allclose(bt.r, t.r, rtol=RTOL, atol=1e-14)
                        np.testing.assert_allclose(bt.a, t.a, rtol=RTOL, atol=1e-14)
                    if ed.law == 61:
                        assert len(bt.angular) == len(t.angular)
                        for ba, ta in zip(bt.angular, t.angular):
                            assert (ba is None) == (ta is None)
                            if ta is not None:
                                np.testing.assert_allclose(ba.mu, ta.mu, rtol=RTOL)
                                np.testing.assert_allclose(ba.pdf, ta.pdf, rtol=RTOL)
            elif ed.law in (7, 9):
                _assert_tab1_close(bed.data.theta, ed.data.theta)
                assert bed.data.restriction_u == pytest.approx(ed.data.restriction_u, abs=1e-6)
            elif ed.law == 11:
                _assert_tab1_close(bed.data.a_tab, ed.data.a_tab)
                _assert_tab1_close(bed.data.b_tab, ed.data.b_tab)
            elif ed.law == 66:
                assert bed.data.npsx == ed.data.npsx
                assert bed.data.ap == pytest.approx(ed.data.ap, rel=RTOL)

    # angular distributions
    if nuc.elastic_angular is None:
        assert back.elastic_angular is None
    else:
        ea, eb = nuc.elastic_angular, back.elastic_angular
        np.testing.assert_allclose(eb.energies, ea.energies, rtol=RTOL)
        assert eb.encodings == ea.encodings
        for ta, tb in zip(ea.tables, eb.tables):
            assert tb.interp == ta.interp
            np.testing.assert_allclose(tb.mu, ta.mu, rtol=RTOL, atol=1e-12)
            np.testing.assert_allclose(tb.pdf, ta.pdf, rtol=RTOL, atol=1e-12)

    # nu / delayed data
    for attr in ("nu_prompt", "nu_total", "nu_delayed"):
        a, b = getattr(nuc, attr), getattr(back, attr)
        if a is None:
            continue
        e_test = np.array([1.0, 1e5, 1e7])
        np.testing.assert_allclose(b(e_test), a(e_test), rtol=1e-9)
    assert len(back.precursors) == len(nuc.precursors)
    for pa, pb in zip(nuc.precursors, back.precursors):
        assert pb.decay_const == pytest.approx(pa.decay_const, rel=1e-9)
        _assert_tab1_close(pb.probability, pa.probability)
    assert len(back.delayed_spectra) == len(nuc.delayed_spectra)


def test_parse_rejects_truncated():
    nuc = synth.build("h1")
    text = format_ascii(nuc)
    lines = text.splitlines()
    from ndpp_tpu.utils.errors import AceFormatError

    with pytest.raises(AceFormatError):
        parse_ascii("\n".join(lines[: len(lines) // 2]))


@pytest.mark.parametrize(
    "mutate",
    [
        "truncate_xss",
        "bad_nxs_count",
        "garbage_tokens",
        "negative_locator",
        "empty",
        "short_header",
    ],
)
def test_malformed_ace_raises_typed_error(mutate):
    """Parser fuzz set (SURVEY.md section 5 'fault injection'): every
    corruption mode must surface as AceFormatError — the typed error the
    sweep quarantines on — never a crash or silent misparse."""
    from ndpp_tpu.utils.errors import AceFormatError

    text = format_ascii(synth.build("h1"))
    lines = text.splitlines()
    if mutate == "truncate_xss":
        text = "\n".join(lines[: len(lines) // 3])
    elif mutate == "bad_nxs_count":
        # corrupt NXS(1) (first 9-char int field on the first NXS line)
        i = 6  # header(2) + 4 IZ/AW lines
        lines[i] = f"{999999999:9d}" + lines[i][9:]
        text = "\n".join(lines)
    elif mutate == "garbage_tokens":
        lines[40] = "not a number at all ###"
        text = "\n".join(lines)
    elif mutate == "negative_locator":
        # flip every XSS value on one line negative (locator region)
        vals = lines[30]
        lines[30] = "".join(
            f"{-abs(float(vals[i : i + 20])):20.12E}" for i in range(0, len(vals), 20)
        )
        text = "\n".join(lines)
    elif mutate == "empty":
        text = ""
    elif mutate == "short_header":
        text = lines[0][:20]
    with pytest.raises(AceFormatError):
        parse_ascii(text)
