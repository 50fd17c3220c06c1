__version__ = "0.1.0"

# Version of the on-disk library format written by ndpp_tpu.io.library.
# Bump on any schema change; docs/format.md documents each version.
LIBRARY_FORMAT_VERSION = "1.2"
