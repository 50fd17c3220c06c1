#!/usr/bin/env python
"""Prototype: exact free-gas moment density dF_l/dE' via the scattering law.

Derivation (free-gas S(alpha,beta); validated against the repo's dense
(v_r, V_cm) reference oracle.freegas_exact._dmoments_dy_dense):

  alpha = (E + E' - 2 mu sqrt(E E')) / (A kT)      (momentum transfer)
  beta  = (E' - E) / kT                            (energy transfer)
  sigma(E->E', mu) dmu ~ sqrt(E'/E) (4 pi alpha)^(-1/2)
                         exp(-(alpha+beta)^2/(4 alpha)) dmu

  mu(alpha) = m0 - m1 alpha is LINEAR in alpha (dalpha/dmu constant =
  -2 sqrt(EE')/(AkT), whose sqrt(E') cancels the flux factor), so

    dF_l/dE' ~ int_{a-}^{a+} P_l(mu(alpha)) alpha^(-1/2) e^{-(...)} dalpha,
    a-+ = (sqrt(E) -+ sqrt(E'))^2/(A kT).

  Substitute t = sqrt(alpha), then u = (t - c/t)/2 with c = |beta|:

    (t^2 + beta)^2/(4 t^2) = u^2 + max(beta, 0)   [identity: w^2 = u^2 + c]

  so for BOTH scatter directions the integrand is a smooth function times
  ONE Gaussian in u (the e^{-max(beta,0)} constant is detailed balance):

    dF_l/dE' ~ 2 e^{-max(beta,0)}
               int_{u(t-)}^{u(t+)} Poly_l(t(u)^2) (dt/du) e^{-u^2} du,
    t(u) = u + sqrt(u^2 + c)  (monotone),  dt/du = t/sqrt(u^2 + c).

  A fixed Gauss-Legendre rule on the clipped u-interval (the Gaussian
  kills |u| > ~8) integrates an analytic integrand — no kinks, no
  cancellation, ~24-32 nodes — replacing the production kernel's ~2400
  (v_r, V_cm) nodes per outgoing point.
"""

from __future__ import annotations

import numpy as np

from ndpp_tpu.oracle.freegas_exact import _dmoments_dy_dense

from ndpp_tpu.oracle.freegas_sab import dfl_de  # promoted to the package (round 3)


def main():
    KT = 0.0253
    ORDER = 5
    print(f"{'A':>8s} {'E':>9s}  max_rel_err over E' grid (one scale per (A,E))")
    worst = 0.0
    for awr in (0.999167, 15.858, 238.0):
        for e in (KT / 10, KT, 1.0, 9.9):
            gamma = awr / (awr + 1.0)
            betainv = 1.0 / np.sqrt(awr / KT)
            v = np.sqrt(e)
            ymax = v + 2.0 * gamma * (v + 8.0 * betainv)
            fracs = [f for f in (0.3, 0.8, 0.97, 1.0, 1.03, 1.2, 1.6) if 1e-6 < v * f < ymax]
            eps = np.array([(v * f) ** 2 for f in fracs])
            ref = np.stack(
                [
                    _dmoments_dy_dense(np.sqrt(epi), v, awr, KT, ORDER, 12, 24) / (2.0 * np.sqrt(epi))
                    for epi in eps
                ]
            )
            got = dfl_de(e, eps, awr, KT, ORDER)
            scale = ref[np.argmax(np.abs(ref[:, 0])), 0] / got[np.argmax(np.abs(ref[:, 0])), 0]
            rel = np.abs(got * scale - ref) / np.abs(ref).max()
            print(f"{awr:8.3f} {e:9.3e}  {rel.max():.2e}")
            worst = max(worst, rel.max())
    print(f"WORST: {worst:.2e}")


if __name__ == "__main__":
    main()
