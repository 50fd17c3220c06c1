"""Error taxonomy.

The reference fails hard with ``fatal_error`` on bad input (SURVEY.md section 5,
failure detection). Here errors are typed so the library sweep can quarantine a
single bad nuclide (AceFormatError) without aborting the whole run.
"""


class NdppError(Exception):
    """Base class for all ndpp-tpu errors."""


class ConfigError(NdppError):
    """Invalid run configuration / input deck."""


class AceFormatError(NdppError):
    """Malformed or unsupported ACE table content."""


class LibraryIndexError(NdppError):
    """Nuclide not found / bad library listing (xsdir or cross_sections-style)."""
