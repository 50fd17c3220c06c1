from ndpp_tpu.host.ace.records import (
    AngularDistribution,
    AngularTable,
    EnergyDistribution,
    Nuclide,
    Reaction,
    Tab1,
)
from ndpp_tpu.host.ace.parse import read_ace
from ndpp_tpu.host.ace.write import write_ace

__all__ = [
    "AngularDistribution",
    "AngularTable",
    "EnergyDistribution",
    "Nuclide",
    "Reaction",
    "Tab1",
    "read_ace",
    "write_ace",
]
