"""Slow, independent reference implementations (test-only).

Every device kernel must match these to 1e-8 relative on every fixture
(SURVEY.md section 4.3) — the stand-in for 'match reference to 1e-8'
(BASELINE.json:5) until real reference outputs exist. Implementations are
deliberately structurally different from the device code: adaptive scipy
quadrature instead of fixed Gauss-Legendre panels.
"""
