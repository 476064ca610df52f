"""docs/ARCHS.md must match the live registries (VERDICT r2 #6)."""

import subprocess
import sys
from pathlib import Path


def test_archs_doc_matches_registries():
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from scripts.gen_archs_doc import render

    committed = Path("docs/ARCHS.md").read_text()
    assert committed == render(), (
        "docs/ARCHS.md is stale — regenerate with "
        "`python scripts/gen_archs_doc.py`"
    )


def test_t5_dynamic_gguf_arch_renders():
    """The generator must read gguf_arch from instantiated specs: T5Arch
    sets it in __init__ (t5 vs t5encoder), which the old doc misrendered
    as 'llama' (the class attribute)."""
    from scripts.gen_archs_doc import arch_rows

    rows = {mt: arch for mt, _, arch, _ in arch_rows()}
    assert rows["t5"] == "t5"
    assert rows["umt5"] == "t5"
