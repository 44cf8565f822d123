"""docs/API.md freshness gate: the committed API reference must match a
regeneration from the live package (scripts/gen_api_docs.py), so docstring
or signature drift cannot ship with a stale index."""

import importlib.util
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _load_generator():
    spec = importlib.util.spec_from_file_location(
        "gen_api_docs", REPO / "scripts" / "gen_api_docs.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_api_docs_fresh():
    mod = _load_generator()
    text = mod.generate()
    committed = (REPO / "docs" / "API.md").read_text()
    assert text == committed, (
        "docs/API.md is stale — run `python scripts/gen_api_docs.py`"
    )


def test_api_docs_covers_key_surface():
    text = (REPO / "docs" / "API.md").read_text()
    for symbol in [
        "## `models.mrssm`",
        "## `models.mmtrssm`",
        "## `train.trainer`",
        "## `serving`",
        "### `MRSSMConfig`",
        "`conv_layout = 'auto'`",
        "## `ops.pallas.train_step`",
        "## `parallel.mesh`",
        "evaluate_word_transitions",
    ]:
        assert symbol in text, f"missing from API.md: {symbol}"
