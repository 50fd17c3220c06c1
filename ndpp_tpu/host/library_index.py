"""Library index: map nuclide name (ZAID.suffix) -> ACE file.

The reference reads an xsdir / cross_sections.xml-style listing (SURVEY.md
section 2 'Library index'). Supported here:

  - MCNP xsdir-style text:  ``name awr filename [route type address ...]``
    (only name/awr/filename are used; 'directory'/datapath headers skipped)
  - OpenMC-style cross_sections.xml: <cross_sections><ace_table name=..
    path=../></cross_sections> (also accepts <library materials=.. path=..>)
  - a plain directory: every ``*.ace`` file, identified by its header name
  - a TOML listing: [library] entries = {"1001.80c" = "path.ace"}
"""

from __future__ import annotations

import tomllib
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from pathlib import Path

from ndpp_tpu.utils.errors import LibraryIndexError


@dataclass
class LibraryIndex:
    entries: dict[str, Path] = field(default_factory=dict)  # name -> ace path
    root: Path = Path(".")

    def path_for(self, name: str) -> Path:
        if name in self.entries:
            return self.entries[name]
        # allow matching on the ZA prefix, e.g. '1001' matching '1001.80c'
        matches = [v for k, v in self.entries.items() if k.split(".")[0] == name]
        if len(matches) == 1:
            return matches[0]
        raise LibraryIndexError(
            f"nuclide '{name}' not in library index ({len(self.entries)} entries); "
            f"known: {sorted(self.entries)[:8]}{'...' if len(self.entries) > 8 else ''}"
        )

    def names(self) -> list[str]:
        return sorted(self.entries)


def _load_xsdir(path: Path) -> LibraryIndex:
    idx = LibraryIndex(root=path.parent)
    datapath = path.parent
    in_directory = False
    for raw in path.read_text().splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        low = line.lower()
        if low.startswith("datapath"):
            if "=" in line:
                datapath = Path(line.split("=", 1)[1].strip())
            continue
        if low == "directory":
            in_directory = True
            continue
        if not in_directory and low.split()[0] == "atomic":  # atomic weight ratios header
            continue
        toks = line.split()
        if len(toks) >= 3 and "." in toks[0]:
            try:
                float(toks[1])
            except ValueError:
                continue
            p = Path(toks[2])
            idx.entries[toks[0]] = p if p.is_absolute() else datapath / p
    return idx


def _load_xml(path: Path) -> LibraryIndex:
    idx = LibraryIndex(root=path.parent)
    tree = ET.parse(path)
    root = tree.getroot()
    base = path.parent
    dp = root.findtext("directory")
    if dp:
        base = Path(dp.strip())
    for tag in ("ace_table", "library"):
        for el in root.iter(tag):
            p = el.get("path")
            if not p:
                continue
            names = el.get("name") or el.get("materials") or ""
            for name in names.replace(",", " ").split():
                pp = Path(p)
                idx.entries[name] = pp if pp.is_absolute() else base / pp
    return idx


def _load_dir(path: Path) -> LibraryIndex:
    from ndpp_tpu.host.ace.parse import parse_ascii

    idx = LibraryIndex(root=path)
    for f in sorted(path.glob("*.ace")):
        # identify by header name without decoding the whole table
        first = f.read_text().splitlines()[0]
        name = first[:10].strip()
        if first.split() and first.split()[0].startswith("2.0"):
            name = first.split()[1]
        if not name:
            name = parse_ascii(f.read_text()).name
        idx.entries[name] = f
    return idx


def _load_toml(path: Path) -> LibraryIndex:
    idx = LibraryIndex(root=path.parent)
    with open(path, "rb") as f:
        data = tomllib.load(f)
    entries = data.get("library", {}).get("entries", {})
    for name, p in entries.items():
        pp = Path(p)
        idx.entries[name] = pp if pp.is_absolute() else path.parent / pp
    return idx


def load(path_or_dir: str | Path) -> LibraryIndex:
    p = Path(path_or_dir)
    if not p.exists():
        raise LibraryIndexError(f"library path not found: {p}")
    if p.is_dir():
        return _load_dir(p)
    if p.suffix == ".xml":
        return _load_xml(p)
    if p.suffix == ".toml":
        return _load_toml(p)
    return _load_xsdir(p)
