"""``python -m multimodal_mtrssm_tpu <command>`` — the console entry points
(reference poe tasks, ``pyproject.toml:100-104``) without needing an
installed distribution.

Commands: train-mopoe-mrssm, train-mopoe-mmtrssm, evaluate-word-transitions,
serve. Remaining argv is passed through to the underlying script.
"""

from __future__ import annotations

import runpy
import sys
from pathlib import Path

from multimodal_mtrssm_tpu import cli

_COMMANDS = {
    "train-mopoe-mrssm": cli.train_mopoe_mrssm,
    "train-mopoe-mmtrssm": cli.train_mopoe_mmtrssm,
    "evaluate-word-transitions": cli.evaluate_word_transitions,
}


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        names = ", ".join([*_COMMANDS, "serve"])
        print(f"usage: python -m multimodal_mtrssm_tpu <command> [args]\ncommands: {names}")
        raise SystemExit(0 if len(sys.argv) >= 2 else 2)
    command, sys.argv = sys.argv[1], [sys.argv[0], *sys.argv[2:]]
    if command == "serve":
        script = Path(__file__).resolve().parent.parent / "scripts" / "serve.py"
        runpy.run_path(str(script), run_name="__main__")
        return
    fn = _COMMANDS.get(command)
    if fn is None:
        print(f"unknown command {command!r}; have: {', '.join([*_COMMANDS, 'serve'])}")
        raise SystemExit(2)
    fn()


if __name__ == "__main__":
    main()
